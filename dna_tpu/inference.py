"""Inference utilities: embedding extraction and autoregressive generation.

Reference equivalents: `huggingface.py:161` `inference_single` (single-
sequence embedding via the standalone model) and the flash-attn
`GenerationMixin` path (`long_conv_lm.py`). The reference's Hyena recurrence
is unimplemented upstream (`hyena.py:432-434` raises), so HyenaDNA
generation there is full-recompute per token — here the same strategy is a
`lax.scan` over a fixed-size buffer, jitted once, O(L) recomputes of an
O(L log L) model (attention models could use a KV cache; Hyena/Mamba reuse
the same path for simplicity and compile-once behavior).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def extract_embedding(model, params, input_ids: jax.Array,
                      attention_mask: Optional[jax.Array] = None,
                      *, pool: str = "mean") -> jax.Array:
    """Pooled hidden-state embedding from a backbone-bearing model.

    Works with LMHeadModel/DNAEmbeddingModel (`.backbone`) and the encoder
    models (BertForMLM `.encoder`, EsmForMaskedLM via apply on the encoder).
    """

    from dna_tpu.models.bert import BertEncoder
    from dna_tpu.models.esm import EsmEncoder
    from dna_tpu.models.lm import DNAEmbeddingModel, LMHeadModel
    from dna_tpu.models.mamba import CaduceusBackbone

    if isinstance(model, (LMHeadModel, DNAEmbeddingModel)):
        h = model.apply({"params": params}, input_ids,
                        method=lambda m, i: m.backbone(i, deterministic=True))
    elif "bert" in params:
        h = BertEncoder(model.cfg).apply(
            {"params": params["bert"]}, input_ids, attention_mask,
            deterministic=True)
    elif "esm" in params:
        h = EsmEncoder(model.cfg).apply(
            {"params": params["esm"]}, input_ids, attention_mask,
            deterministic=True)
    elif "backbone" in params:  # caduceus family
        h = CaduceusBackbone(model.cfg).apply(
            {"params": params["backbone"]}, input_ids, deterministic=True)
    else:
        h = model.apply({"params": params}, input_ids, attention_mask,
                        deterministic=True)
    if h.ndim == 3:
        if pool == "mean":
            if attention_mask is not None:
                m = attention_mask.astype(h.dtype)[..., None]
                return (h * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
            return h.mean(axis=1)
        if pool == "last":
            return h[:, -1]
    return h


@partial(jax.jit, static_argnames=("model", "num_tokens", "temperature",
                                  "greedy"))
def generate(model, params, prompt_ids: jax.Array, rng: jax.Array, *,
             num_tokens: int = 32, temperature: float = 1.0,
             greedy: bool = False) -> jax.Array:
    """Autoregressive sampling with a fixed-size token buffer.

    prompt_ids: [B, P]; returns [B, P + num_tokens]. The buffer is
    pre-padded, and each scan step runs the model over the full buffer and
    reads the logits at the current frontier — compile-once, static shapes.
    """
    B, P = prompt_ids.shape
    total = P + num_tokens
    buf = jnp.zeros((B, total), prompt_ids.dtype).at[:, :P].set(prompt_ids)

    def step(carry, _):
        buf, pos, key = carry
        logits = model.apply({"params": params}, buf, None,
                             deterministic=True)  # [B, total, V]
        idx = jnp.clip(pos - 1, 0, total - 1)
        next_logits = jax.lax.dynamic_index_in_dim(
            logits, idx, axis=1, keepdims=False)  # [B, V]
        key, sub = jax.random.split(key)
        if greedy:
            nxt = jnp.argmax(next_logits, axis=-1)
        else:
            nxt = jax.random.categorical(sub, next_logits / temperature)
        buf = jax.lax.dynamic_update_index_in_dim(
            buf, nxt.astype(buf.dtype), pos, axis=1)
        return (buf, pos + 1, key), None

    (buf, _, _), _ = jax.lax.scan(step, (buf, jnp.int32(P), rng), None,
                                  length=num_tokens)
    return buf


@partial(jax.jit, static_argnames=("model", "num_tokens", "temperature",
                                   "greedy"))
def generate_recurrent(model, params, prompt_ids: jax.Array, rng: jax.Array,
                       *, num_tokens: int = 32, temperature: float = 1.0,
                       greedy: bool = False) -> jax.Array:
    """O(1)-per-token autoregressive sampling for recurrent (mamba-mixer)
    LMs: one full prefill pass collects per-layer (conv window, ssm) states,
    then each new token is a constant-time `step` — the capability the
    reference gets from the CUDA `selective_state_update`
    (`pyramid.py:236-277`). Requires `model` to be an `LMHeadModel` with
    `mixer='mamba'` and `causal=True`."""
    B, P = prompt_ids.shape

    logits, states = model.apply({"params": params}, prompt_ids,
                                 method="prefill")
    last_logits = logits[:, -1]

    def sample(key, lg):
        if greedy:
            return jnp.argmax(lg, axis=-1)
        return jax.random.categorical(key, lg / temperature)

    def step(carry, _):
        tok, states, key = carry
        key, sub = jax.random.split(key)
        lg, states = model.apply({"params": params}, tok, states,
                                 method="step")
        nxt = sample(sub, lg).astype(prompt_ids.dtype)
        return (nxt, states, key), nxt

    rng, sub = jax.random.split(rng)
    first = sample(sub, last_logits).astype(prompt_ids.dtype)
    (_, _, _), rest = jax.lax.scan(step, (first, states, rng), None,
                                   length=num_tokens - 1)
    gen = jnp.concatenate([first[None], rest], axis=0)  # [T, B]
    return jnp.concatenate([prompt_ids, gen.swapaxes(0, 1)], axis=1)
