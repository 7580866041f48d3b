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
                                    dense, layer_norm, sow_act_norm)
from dna_tpu.ops.attention import multihead_attention
from dna_tpu.ops.attention_ref import attention_ref, padding_bias


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
        # cos/sin stay half-width (the full-D table is just [c, c]) and the
        # rotation runs in the activation dtype: the fp32 full-width form
        # cost ntv2-500m ~20 ms/step in tiny cos-table copies + rotate_half
        # concat fusions (r4 device trace). Tables are exact fp32 up to the
        # final cast; for fp32 activations this is bit-compatible modulo
        # reassociation.
        cos = jnp.cos(freqs)[None].astype(q.dtype)            # [1, S, H, D/2]
        sin = jnp.sin(freqs)[None].astype(q.dtype)

        def rot(x):
            x1, x2 = jnp.split(x, 2, axis=-1)
            return jnp.concatenate(
                [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)

        return rot(q), rot(k)


class CoPE(nn.Module):
    """Contextual Position Embedding (reference `CoPE`,
    `modeling_esm.py:93-117` — the fork's experiment): soft positions are
    reverse-cumulative sigmoid gates of the attention logits, and a learned
    per-(head_dim, position) table is interpolated at those fractional
    positions to produce an additive score term."""

    npos_max: int
    head_dim: int

    @nn.compact
    def __call__(self, query: jax.Array, attn_logits: jax.Array) -> jax.Array:
        # query [B, H, S, D]; attn_logits [B, H, S, S] (fp32)
        pos_emb = self.param(
            "pos_emb", nn.initializers.normal(0.01),
            (self.head_dim, self.npos_max), jnp.float32)
        gates = jax.nn.sigmoid(attn_logits)
        pos = jnp.flip(jnp.cumsum(jnp.flip(gates, -1), axis=-1), -1)
        pos = jnp.clip(pos, max=self.npos_max - 1)
        logits_int = jnp.einsum("bhsd,dp->bhsp",
                                query.astype(jnp.float32), pos_emb)
        pos_ceil = jnp.ceil(pos).astype(jnp.int32)
        pos_floor = jnp.floor(pos).astype(jnp.int32)
        logits_ceil = jnp.take_along_axis(logits_int, pos_ceil, axis=-1)
        logits_floor = jnp.take_along_axis(logits_int, pos_floor, axis=-1)
        w = pos - pos_floor
        return logits_ceil * w + logits_floor * (1 - w)


class LearnedPositionalEmbeddings(nn.Module):
    """ESM/NT-v1 learned positional embeddings (reference
    `ESMLearnedPositionalEmbeddings`, `nt.py:598-627`): positions are the
    pad-aware prefix count shifted by `padding_idx`, so padding rows all hit
    the shared `padding_idx` slot."""

    max_len: int
    d_model: int
    padding_idx: int

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        table = self.param(
            "embedding",
            nn.with_logical_partitioning(nn.initializers.normal(0.02),
                                         (None, "embed")),
            (self.max_len + self.padding_idx + 2, self.d_model), jnp.float32)
        mask = (input_ids != self.padding_idx).astype(jnp.int32)
        positions = jnp.cumsum(mask, axis=1) * mask + self.padding_idx
        from dna_tpu.ops.dense_grad import take_rows

        return take_rows(table, positions)  # matmul-bwd (no TPU scatter)


def tokens_dropout(x: jax.Array, input_ids: jax.Array, *, pad_token_id: int,
                   mask_token_id: int, masking_ratio: float = 0.15,
                   masking_prob: float = 0.8) -> jax.Array:
    """NT-v1 TokensDropout (reference `nt.py:629-670`): zero the [MASK]
    embeddings and rescale each row by (1 - expected mask ratio) /
    (1 - observed mask ratio) — ESM's train/eval consistency trick."""
    is_mask = input_ids == mask_token_id
    x = jnp.where(is_mask[..., None], 0.0, x)
    src_len = jnp.maximum((input_ids != pad_token_id).sum(-1), 1)
    observed = is_mask.sum(-1) / src_len
    train_ratio = masking_ratio * masking_prob
    scale = (1.0 - train_ratio) / jnp.maximum(1.0 - observed, 1e-6)
    return x * scale[:, None, None].astype(x.dtype)


class EsmSelfAttention(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jax.Array, attention_mask: Optional[jax.Array],
                 *, deterministic: bool = True,
                 output_attentions: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        H = cfg.n_heads
        D = cfg.d_model // H
        q = dense(cfg.d_model, ("embed", "heads"), dtype=dtype, name="query")(x)
        k = dense(cfg.d_model, ("embed", "heads"), dtype=dtype, name="key")(x)
        v = dense(cfg.d_model, ("embed", "heads"), dtype=dtype, name="value")(x)
        shape = (x.shape[0], x.shape[1], H, D)
        q, k, v = (t.reshape(shape) for t in (q, k, v))
        if cfg.cope:
            # CoPE needs the full score matrix (reference `CoPEAttention`,
            # `modeling_esm.py:118-160`) — computed inline on the XLA path
            qt, kt, vt = (t.swapaxes(1, 2) for t in (q, k, v))  # [B,H,S,D]
            scores = jnp.einsum("bhsd,bhtd->bhst", qt, kt,
                                preferred_element_type=jnp.float32)
            scores = scores / jnp.sqrt(jnp.float32(D))
            # mask BEFORE cope: gates of masked keys go to ~0, so they do
            # not advance the contextual position count (`:146-150`)
            if attention_mask is not None:
                scores = scores + padding_bias(attention_mask)
            scores = scores + CoPE(cfg.max_len, D, name="cope")(qt, scores)
            probs = jax.nn.softmax(scores, axis=-1)
            combine = probs
            if cfg.attn_dropout > 0.0 and not deterministic:
                keep = jax.random.bernoulli(self.make_rng("dropout"),
                                            1.0 - cfg.attn_dropout,
                                            probs.shape)
                combine = jnp.where(keep, probs / (1.0 - cfg.attn_dropout),
                                    0.0)
            out = jnp.einsum("bhst,bhtd->bshd", combine.astype(dtype), vt)
            out = out.reshape(x.shape[0], x.shape[1], cfg.d_model)
            out = dense(cfg.d_model, ("heads", "embed"), dtype=dtype,
                        name="out")(out)
            return (out, probs) if output_attentions else out
        if cfg.rotary:
            q, k = LearnedRotary(D, H, name="rotary")(q, k)
        probs = None
        if output_attentions:
            # Contact prediction needs the softmax maps — only the XLA
            # reference path can surface them (the flash kernel never
            # materializes S×S probabilities).
            bias = (padding_bias(attention_mask)
                    if attention_mask is not None else None)
            out, probs = attention_ref(q, k, v, bias, return_probs=True)
        else:
            drop = {}
            if cfg.attn_dropout > 0.0 and not deterministic:
                drop = dict(dropout_rate=cfg.attn_dropout,
                            dropout_rng=self.make_rng("dropout"))
            out = multihead_attention(
                q, k, v, attention_mask=attention_mask, alibi=False,
                causal=False, impl="auto" if cfg.use_flash else "ref",
                **drop)
        out = out.reshape(x.shape[0], x.shape[1], cfg.d_model)
        out = dense(cfg.d_model, ("heads", "embed"), dtype=dtype,
                    name="out")(out)
        if output_attentions:
            return out, probs
        return out


class EsmLayer(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jax.Array, attention_mask: Optional[jax.Array],
                 *, deterministic: bool = True,
                 output_attentions: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        h = layer_norm(eps=cfg.norm_eps, name="attn_ln")(x).astype(dtype)
        attn = EsmSelfAttention(cfg, name="attention")(
            h, attention_mask, deterministic=deterministic,
            output_attentions=output_attentions)
        h, probs = attn if output_attentions else (attn, None)
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
        if output_attentions:
            return x + h, probs
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
        if cfg.learned_pos_emb:
            self.pos_embed = LearnedPositionalEmbeddings(
                cfg.max_len, cfg.d_model, cfg.pad_token_id)

    def __call__(self, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 *, deterministic: bool = True,
                 output_attentions: bool = False):
        cfg = self.cfg
        x = self.embed(input_ids)
        if cfg.token_dropout:
            x = tokens_dropout(x, input_ids, pad_token_id=cfg.pad_token_id,
                               mask_token_id=cfg.mask_token_id)
        if cfg.learned_pos_emb:
            x = x + self.pos_embed(input_ids).astype(x.dtype)
        all_probs = []
        for i, layer in enumerate(self.layers):
            # pass the kwarg only when set: a python bool kwarg through a
            # remat-wrapped layer gets traced and breaks `if` branches
            if output_attentions:
                x, probs = layer(x, attention_mask,
                                 deterministic=deterministic,
                                 output_attentions=True)
                all_probs.append(probs)
            else:
                x = layer(x, attention_mask, deterministic=deterministic)
            sow_act_norm(self, i, x)
        x = self.final_ln(x).astype(x.dtype)
        if output_attentions:
            return x, jnp.stack(all_probs, axis=1)  # [B, L, H, S, S]
        return x


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
            from dna_tpu.ops.dense_grad import take_positions

            h = take_positions(h, positions)  # matmul-bwd (no TPU scatter)
        h = dense(cfg.d_model, ("embed", "embed_out"),
                  dtype=jnp.dtype(cfg.dtype), name="head_dense")(h)
        if cfg.gelu_approx:
            h = nn.gelu(h.astype(jnp.float32), approximate=True)
        else:
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


def symmetrize(x: jax.Array) -> jax.Array:
    """Make the last two (token) dims symmetric (reference
    `modeling_esm.py` `symmetrize`)."""
    return x + x.swapaxes(-1, -2)


def average_product_correct(x: jax.Array) -> jax.Array:
    """APC: subtract rowsum·colsum/totalsum (reference `modeling_esm.py`
    `average_product_correct`)."""
    a1 = x.sum(-1, keepdims=True)
    a2 = x.sum(-2, keepdims=True)
    a12 = x.sum((-1, -2), keepdims=True)
    return x - a1 * a2 / a12


class EsmContactHead(nn.Module):
    """Contact-prediction head (reference `EsmContactPredictionHead`,
    `modeling_esm.py:236-268`): mask eos attentions, drop cls/eos rows+cols,
    symmetrize + APC over the stacked (layer·head) attention maps, then a
    per-pair logistic regression."""

    eos_idx: int = 2

    @nn.compact
    def __call__(self, tokens: jax.Array,
                 attentions: jax.Array) -> jax.Array:
        # tokens [B, S]; attentions [B, L, H, S, S] fp32
        B, L, H, S, _ = attentions.shape
        eos_mask = (tokens != self.eos_idx).astype(attentions.dtype)  # [B, S]
        pair_mask = eos_mask[:, None, :] * eos_mask[:, :, None]       # [B,S,S]
        att = attentions * pair_mask[:, None, None, :, :]
        att = att[..., :-1, :-1][..., 1:, 1:]   # strip eos then cls
        att = att.reshape(B, L * H, S - 2, S - 2)
        att = average_product_correct(symmetrize(att))
        att = att.transpose(0, 2, 3, 1)          # [B, S', S', L·H]
        logits = dense(1, ("heads", "vocab"), dtype=jnp.float32,
                       name="regression")(att)
        return jax.nn.sigmoid(logits[..., 0])    # [B, S', S']


class EsmForContactPrediction(nn.Module):
    """Encoder + contact head. An inference/analysis model: attention maps
    are materialized (ref path), so remat is forced off."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        import dataclasses

        cfg = dataclasses.replace(self.cfg, remat=False)
        _, attn = EsmEncoder(cfg, name="esm")(
            input_ids, attention_mask, deterministic=deterministic,
            output_attentions=True)
        return EsmContactHead(name="contact_head")(input_ids, attn)


@registry.model.register("ntv2_contact")
def _ntv2_contact(cfg: ModelConfig):
    return EsmForContactPrediction(cfg)


@registry.model.register("ntv2_token_cls")
def _ntv2_token_cls(cfg: ModelConfig):
    return EsmForTokenClassification(cfg)


@registry.model.register("ntv2")
def _ntv2(cfg: ModelConfig):
    return EsmForMaskedLM(cfg)


@registry.model.register("ntv2_cls")
def _ntv2_cls(cfg: ModelConfig):
    return EsmForSequenceClassification(cfg)
