"""NTv2 / ESM-family encoder (rotary attention, SiLU-GLU MLP) — TPU-native.

Re-design of the reference `src/models/ntv2/modeling_esm.py` (Nucleotide
Transformer v2, an ESM-2 variant):

  * pre-LN transformer: x + attn(LN(x)); x + glu_mlp(LN(x)); final encoder LN
    (`modeling_esm.py:578-688`, `768-778`)
  * rotary position embeddings with the fork's learned per-head frequency
    mix: inv_freq_head = α_h·(100000^-r_h) + β_h·inv_freq_std
    (`modeling_esm.py:162-234`)
  * SiLU-GLU MLP: one [D → 2F] projection, silu(x1)·x2, no biases when
    `add_bias_fnn=false` (`modeling_esm.py:636-666`)
  * LM head: dense → exact-erf gelu → LN → untied decoder + bias
    (`modeling_esm.py:1332-1350`)
  * NTv2-500M config: hidden 1024, 29 layers, 16 heads, ff 4096, vocab 4107,
    rotary, no FFN biases (`nucleotide-transformer-v2-500m-multi-species/config.json`)
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dna_tpu import registry
from dna_tpu.config.core import ModelConfig
from dna_tpu.models.layers import (SequencePool, TokenEmbed, _remat_policy,
                                    dense, layer_norm)
from dna_tpu.ops.attention import multihead_attention


def rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


class LearnedRotary(nn.Module):
    """Per-head learned-frequency rotary (reference `RotaryEmbedding`,
    `modeling_esm.py:162-234`), vectorized over heads (the reference loops in
    Python per head)."""

    head_dim: int
    n_heads: int
    initial_alpha: float = 0.95
    initial_beta: float = 0.05
    initial_recpt_field: float = 0.5

    @nn.compact
    def __call__(self, q: jax.Array, k: jax.Array):
        """q, k: [B, S, H, D] → rotated q, k."""
        S, H, D = q.shape[1], self.n_heads, self.head_dim
        inv_freq = 1.0 / (100000 ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D))
        recpt = self.param("recpt_field",
                           nn.initializers.constant(self.initial_recpt_field),
                           (H,), jnp.float32)
        alpha = self.param("alpha", nn.initializers.constant(self.initial_alpha),
                           (H,), jnp.float32)
        beta = self.param("beta", nn.initializers.constant(self.initial_beta),
                          (H,), jnp.float32)
        inv_freq2 = 1.0 / (100000 ** recpt)[:, None]          # [H, 1]
        freq_h = alpha[:, None] * inv_freq2 + beta[:, None] * inv_freq[None]
        t = jnp.arange(S, dtype=jnp.float32)
        freqs = jnp.einsum("s,hd->shd", t, freq_h)            # [S, H, D/2]
        emb = jnp.concatenate([freqs, freqs], axis=-1)        # [S, H, D]
        cos = jnp.cos(emb)[None]
        sin = jnp.sin(emb)[None]

        def rot(x):
            x32 = x.astype(jnp.float32)
            return ((x32 * cos) + (rotate_half(x32) * sin)).astype(x.dtype)

        return rot(q), rot(k)


class EsmSelfAttention(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jax.Array, attention_mask: Optional[jax.Array],
                 *, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        H = cfg.n_heads
        D = cfg.d_model // H
        q = dense(cfg.d_model, ("embed", "heads"), dtype=dtype, name="query")(x)
        k = dense(cfg.d_model, ("embed", "heads"), dtype=dtype, name="key")(x)
        v = dense(cfg.d_model, ("embed", "heads"), dtype=dtype, name="value")(x)
        shape = (x.shape[0], x.shape[1], H, D)
        q, k, v = (t.reshape(shape) for t in (q, k, v))
        if cfg.rotary:
            q, k = LearnedRotary(D, H, name="rotary")(q, k)
        out = multihead_attention(
            q, k, v, attention_mask=attention_mask, alibi=False, causal=False,
            impl="auto" if cfg.use_flash else "ref")
        out = out.reshape(x.shape[0], x.shape[1], cfg.d_model)
        return dense(cfg.d_model, ("heads", "embed"), dtype=dtype,
                     name="out")(out)


class EsmLayer(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jax.Array, attention_mask: Optional[jax.Array],
                 *, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        h = layer_norm(eps=cfg.norm_eps, name="attn_ln")(x).astype(dtype)
        h = EsmSelfAttention(cfg, name="attention")(
            h, attention_mask, deterministic=deterministic)
        if cfg.dropout > 0.0:
            h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        x = x + h
        h = layer_norm(eps=cfg.norm_eps, name="mlp_ln")(x).astype(dtype)
        # SiLU-GLU, bias-free (add_bias_fnn=false in NTv2 config)
        h = dense(2 * cfg.d_ff, ("embed", "mlp"), use_bias=False, dtype=dtype,
                  name="wi")(h)
        x1, x2 = jnp.split(h, 2, axis=-1)
        h = jax.nn.silu(x1) * x2
        h = nn.with_logical_constraint(h, ("batch", "seq", "mlp"))
        h = dense(cfg.d_model, ("mlp", "embed"), use_bias=False, dtype=dtype,
                  name="wo")(h)
        if cfg.dropout > 0.0:
            h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        return x + h


class EsmEncoder(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        self.embed = TokenEmbed(cfg.vocab_size, cfg.d_model,
                                dtype=jnp.dtype(cfg.dtype))
        LayerCls = (nn.remat(EsmLayer, prevent_cse=False,
                             policy=_remat_policy(cfg.remat_policy))
                    if cfg.remat else EsmLayer)
        self.layers = [LayerCls(cfg, name=f"layer_{i}")
                       for i in range(cfg.n_layers)]
        self.final_ln = layer_norm(eps=cfg.norm_eps)

    def __call__(self, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        x = self.embed(input_ids)
        for layer in self.layers:
            x = layer(x, attention_mask, deterministic=deterministic)
        return self.final_ln(x).astype(x.dtype)


class EsmForMaskedLM(nn.Module):
    """NTv2 MLM (reference `EsmForMaskedLM`, `modeling_esm.py:1194-1330`;
    returns full-vocab fp32 logits, masked-position CE applied by the task)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 positions: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        h = EsmEncoder(cfg, name="esm")(input_ids, attention_mask,
                                        deterministic=deterministic)
        if positions is not None:
            h = jnp.take_along_axis(h, positions[..., None], axis=1)
        h = dense(cfg.d_model, ("embed", "embed_out"),
                  dtype=jnp.dtype(cfg.dtype), name="head_dense")(h)
        h = 0.5 * h * (1.0 + jax.lax.erf(h.astype(jnp.float32) /
                                         jnp.sqrt(jnp.float32(2.0))))
        h = layer_norm(eps=cfg.norm_eps, name="head_ln")(h)
        logits = dense(cfg.vocab_size, ("embed", "vocab"), use_bias=True,
                       dtype=jnp.float32, name="decoder")(h.astype(jnp.float32))
        return nn.with_logical_constraint(logits, ("batch", "seq", "vocab"))


class EsmForSequenceClassification(nn.Module):
    """Finetune head (reference `EsmForSequenceClassification`
    `modeling_esm.py:1360+`; the repo pipeline mean-pools hidden states via
    `SequenceDecoder(mode=pool)`)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        h = EsmEncoder(cfg, name="esm")(input_ids, attention_mask,
                                        deterministic=deterministic)
        pooled = SequencePool(cfg.pool)(h, attention_mask)
        return dense(cfg.n_classes, ("embed", "vocab"), dtype=jnp.float32,
                     name="score")(pooled.astype(jnp.float32))


class EsmForTokenClassification(nn.Module):
    """Per-position classification head (reference
    `EsmForTokenClassification`, `modeling_esm.py:1460+`)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        h = EsmEncoder(cfg, name="esm")(input_ids, attention_mask,
                                        deterministic=deterministic)
        return dense(cfg.n_classes, ("embed", "vocab"), dtype=jnp.float32,
                     name="classifier")(h.astype(jnp.float32))


@registry.model.register("ntv2_token_cls")
def _ntv2_token_cls(cfg: ModelConfig):
    return EsmForTokenClassification(cfg)


@registry.model.register("ntv2")
def _ntv2(cfg: ModelConfig):
    return EsmForMaskedLM(cfg)


@registry.model.register("ntv2_cls")
def _ntv2_cls(cfg: ModelConfig):
    return EsmForSequenceClassification(cfg)
