"""Reference (pure-XLA) multi-head attention with additive bias.

This is the numerics oracle for the Pallas flash kernel
(`dna_tpu.ops.flash_attention`), mirroring the reference's slow/fast pairing
of `fftconv_ref`/`fftconv_func` (reference `hyena.py:254-269`) and the torch
fallback in `BertUnpadSelfAttention` (`bert_layers.py:166-197`).

Semantics match the reference exactly: scores = q·kᵀ/sqrt(d) + bias;
bias carries both ALiBi and the additive padding mask.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def attention_ref(
    q: jax.Array,  # [B, S, H, D]
    k: jax.Array,  # [B, S, H, D]
    v: jax.Array,  # [B, S, H, D]
    bias: Optional[jax.Array] = None,  # broadcastable to [B, H, S, S]
    *,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    return_probs: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
):
    orig_dtype = q.dtype
    d = q.shape[-1]
    scale = softmax_scale if softmax_scale is not None else d ** -0.5
    # fp32 softmax for stability regardless of compute dtype
    scores = jnp.einsum("bshd,bthd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if causal:
        s, t = scores.shape[-2:]
        causal_mask = jnp.tril(jnp.ones((s, t), dtype=bool))
        scores = jnp.where(causal_mask, scores, jnp.float32(-1e10))
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        # attention-probability dropout, torch nn.Dropout semantics
        # (drop with p, scale survivors by 1/(1-p)) applied to the post-
        # softmax probs — reference `bert_layers.py:166-197` /
        # `modeling_esm.py:415`. Rows may no longer sum to 1 by design.
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhst,bthd->bshd", probs.astype(orig_dtype), v,
                     preferred_element_type=jnp.float32)
    out = out.astype(orig_dtype)
    if return_probs:
        return out, probs  # probs [B, H, S, S] fp32
    return out


def alibi_slopes(n_heads: int) -> jnp.ndarray:
    """ALiBi per-head slopes (geometric; non-power-of-2 workaround), matching
    the reference builder `bert_layers.py:379-395`."""
    import math

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * start ** i for i in range(n)]

    if math.log2(n_heads).is_integer():
        s = pow2_slopes(n_heads)
    else:
        closest = 2 ** math.floor(math.log2(n_heads))
        s = pow2_slopes(closest)
        extra = pow2_slopes(2 * closest)[0::2][: n_heads - closest]
        s = s + extra
    return jnp.asarray(s, dtype=jnp.float32)


def alibi_bias(n_heads: int, seq_len: int, *, causal: bool = False) -> jnp.ndarray:
    """[1, H, S, S] bias = -slope_h * |i - j| (bidirectional, as Mosaic BERT
    `bert_layers.py:398-407`); for the causal case -slope_h * (i - j) on the
    lower triangle is equivalent post-softmax."""
    pos = jnp.arange(seq_len)
    rel = jnp.abs(pos[None, :] - pos[:, None]).astype(jnp.float32)  # [S, S]
    slopes = alibi_slopes(n_heads)
    bias = -slopes[:, None, None] * rel[None, :, :]
    return bias[None]


def padding_bias(attention_mask: jax.Array) -> jax.Array:
    """[B, 1, 1, S] additive mask from a [B, S] 1/0 keep-mask (reference
    `bert_layers.py:423-426`: (1-mask)*-10000)."""
    return ((1.0 - attention_mask.astype(jnp.float32)) * -10000.0)[:, None, None, :]
