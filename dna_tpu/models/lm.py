"""Causal/bidirectional LM backbone hosting pluggable sequence mixers.

Re-design of the reference `LMBackbone`/`ConvLMHeadModel`/`BertLMHeadModel`
(`src/models/sequence/long_conv_lm.py:320-682`): GPT2 embeddings → n ×
pre-norm Block(mixer, MLP) → final LN → tied LM head. The mixer for each
layer index comes from `attn_layer_idx` (flash attention) or the layer
registry (Hyena), exactly the reference's `create_mixer_cls` switch
(`long_conv_lm.py:94-165`).

`DNAEmbeddingModel` (backbone sans head, `dna_embedding.py:18-141`) is the
same module with `return_hidden=True` — used by finetune decoders.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dna_tpu import registry
from dna_tpu.config.core import ModelConfig
from dna_tpu.models.layers import (Mlp, SequencePool, TokenEmbed,
                                    _remat_policy, dense, layer_norm,
                                    sow_act_norm)
from dna_tpu.models.hyena import HyenaOperator
from dna_tpu.ops.attention import multihead_attention


class MHAMixer(nn.Module):
    """Self-attention mixer for `attn_layer_idx` layers (reference flash-attn
    `MHA` with rotary off, `long_conv_lm.py:94-128`).

    Also supports KV-cached stepping for O(L)-per-token generation
    (VERDICT r3 #8): `__call__(return_state=True)` seeds a static
    [B, l_max, H, D] K/V buffer (the prefill), `step` appends one token's
    K/V and attends the new q over the cache — no full-sequence refeed. The
    buffer is a ring: writes wrap at l_max, and since this mixer has no
    positional encoding inside attention (no rotary/ALiBi), key order is
    immaterial — wraparound degrades exactly to sliding-window attention."""

    cfg: ModelConfig
    causal: bool = True
    l_max: int = 1024

    def setup(self):
        from dna_tpu.models.layers import default_kernel_init, kaiming_init

        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        # GPT-2 scheme (`long_conv_lm.py:292-299`): Wqkv and out_proj get
        # kaiming_normal when gpt2_init is on
        init = kaiming_init if cfg.gpt2_init else default_kernel_init
        self.wqkv = dense(3 * cfg.d_model, ("embed", "heads"), dtype=dtype,
                          kernel_init=init, name="wqkv")
        self.out_proj = dense(cfg.d_model, ("heads", "embed"), dtype=dtype,
                              kernel_init=init, name="out_proj")

    def __call__(self, x: jax.Array, *, deterministic: bool = True,
                 return_state: bool = False):
        cfg = self.cfg
        head_dim = cfg.d_model // cfg.n_heads
        B, S = x.shape[0], x.shape[1]
        qkv = self.wqkv(x).reshape(B, S, 3, cfg.n_heads, head_dim)
        from dna_tpu.ops.attention import multihead_attention_qkv

        out = multihead_attention_qkv(
            qkv, causal=self.causal, alibi=False,
            impl="auto" if cfg.use_flash else "ref")
        y = self.out_proj(out)
        if not return_state:
            return y
        if not self.causal:
            raise NotImplementedError("KV-cache stepping is causal-only")
        L = max(self.l_max, S)
        k, v = qkv[:, :, 1], qkv[:, :, 2]  # [B, S, H, D]
        kc = jnp.zeros((B, L, cfg.n_heads, head_dim), k.dtype).at[:, :S].set(k)
        vc = jnp.zeros_like(kc).at[:, :S].set(v)
        return y, (kc, vc, jnp.int32(S))

    def step(self, x_t: jax.Array, state):
        """x_t [B, D] → ([B, D], new state). One cached-attention token."""
        kc, vc, pos = state
        cfg = self.cfg
        H = cfg.n_heads
        Dh = cfg.d_model // H
        B, L = kc.shape[0], kc.shape[1]
        qkv = self.wqkv(x_t[:, None]).reshape(B, 1, 3, H, Dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        slot = jnp.mod(pos, L)
        kc = jax.lax.dynamic_update_slice_in_dim(kc, k, slot, axis=1)
        vc = jax.lax.dynamic_update_slice_in_dim(vc, v, slot, axis=1)
        scores = jnp.einsum("bshd,bthd->bhst", q, kc,
                            preferred_element_type=jnp.float32)
        scores = scores * (Dh ** -0.5)
        valid = jnp.arange(L)[None, None, None, :] <= jnp.minimum(pos, L - 1)
        scores = jnp.where(valid, scores, jnp.float32(-1e10))
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhst,bthd->bshd", probs.astype(q.dtype), vc)
        y = self.out_proj(out.reshape(B, 1, H * Dh))[:, 0]
        return y, (kc, vc, pos + 1)


class LMBlock(nn.Module):
    """Pre-norm block: x + mixer(LN(x)); x + MLP(LN(x)).

    Mamba-mixer blocks also support O(1) recurrent stepping
    (`__call__(return_state=True)` for prefill, then `step`) — the
    reference's `SequenceModel.step` contract (`model.py:124-134`)."""

    cfg: ModelConfig
    layer_idx: int
    attn_layer_idx: Tuple[int, ...] = ()
    l_max: int = 1024
    causal: bool = True

    def setup(self):
        cfg = self.cfg
        from dna_tpu.models.layers import kaiming_init

        self.mixer_ln = layer_norm(eps=cfg.norm_eps)
        self.mlp_ln = layer_norm(eps=cfg.norm_eps)
        if (cfg.moe_experts > 0
                and self.layer_idx % max(cfg.moe_every, 1)
                == max(cfg.moe_every, 1) - 1):
            from dna_tpu.models.moe import MoEMlp

            self.mlp = MoEMlp(cfg.d_ff, cfg.d_model,
                              n_experts=cfg.moe_experts,
                              top_k=cfg.moe_top_k,
                              capacity_factor=cfg.moe_capacity_factor,
                              aux_weight=cfg.moe_aux_weight,
                              approximate=cfg.gelu_approx,
                              dtype=jnp.dtype(cfg.dtype))
        else:
            self.mlp = Mlp(cfg.d_ff, cfg.d_model, dtype=jnp.dtype(cfg.dtype),
                           dropout=cfg.dropout,
                           approximate=cfg.gelu_approx,
                           out_init=kaiming_init if cfg.gpt2_init else None)
        if cfg.dropout > 0.0:
            self.drop = nn.Dropout(cfg.dropout)
        if self.layer_idx in self.attn_layer_idx:
            self.mixer = MHAMixer(cfg, causal=self.causal, l_max=self.l_max)
            self._mixer_kind = "attn"
        else:
            # mixer comes from the layer registry — the reference's
            # `create_mixer_cls` string switch (`long_conv_lm.py:74-118`)
            from dna_tpu import registry as _registry

            self.mixer = _registry.layer[cfg.mixer](
                cfg, l_max=self.l_max, causal=self.causal)
            self._mixer_kind = (cfg.mixer if self.causal or cfg.mixer != "mamba"
                                else "bimamba")

    def _mix(self, h, deterministic, return_state):
        if self._mixer_kind == "mamba":
            return self.mixer(h, return_state=return_state)
        if self._mixer_kind == "attn":
            return self.mixer(h, deterministic=deterministic,
                              return_state=return_state)
        if self._mixer_kind == "hyena":
            out = self.mixer(h, deterministic=deterministic)
        else:
            out = self.mixer(h)
        return (out, None) if return_state else out

    def __call__(self, x: jax.Array, *, deterministic: bool = True,
                 return_state: bool = False):
        cfg = self.cfg
        h = self.mixer_ln(x).astype(x.dtype)
        h = self._mix(h, deterministic, return_state)
        state = None
        if return_state:
            h, state = h
        if cfg.dropout > 0.0:
            h = self.drop(h, deterministic=deterministic)
        x = x + h
        h = self.mlp_ln(x).astype(x.dtype)
        h = self.mlp(h, deterministic=deterministic)
        if cfg.dropout > 0.0:
            h = self.drop(h, deterministic=deterministic)
        out = x + h
        if return_state:
            return out, state
        return out

    def step(self, x_t: jax.Array, state):
        """One-token recurrence (mamba: O(1) state; attn: KV cache).
        x_t [B, D]."""
        if self._mixer_kind not in ("mamba", "attn"):
            raise NotImplementedError(
                f"recurrent step unsupported for mixer {self._mixer_kind!r} "
                "(the reference's Hyena recurrence also raises, "
                "`hyena.py:432-434`)")
        h = self.mixer_ln(x_t).astype(x_t.dtype)
        h, state = self.mixer.step(h, state)
        x_t = x_t + h
        h = self.mlp_ln(x_t).astype(x_t.dtype)
        h = self.mlp(h, deterministic=True)
        return x_t + h, state


class LMBackbone(nn.Module):
    cfg: ModelConfig
    attn_layer_idx: Tuple[int, ...] = ()
    l_max: int = 1024
    causal: bool = True
    learned_pos_emb: bool = False

    def setup(self):
        cfg = self.cfg
        if cfg.encoder == "embedding":
            self.embed = TokenEmbed(cfg.vocab_size, cfg.d_model,
                                    dtype=jnp.dtype(cfg.dtype))
        else:
            # alternate input encoders via the adapter registry (reference
            # encoder registry, `src/tasks/encoders.py:295-331`)
            from dna_tpu import registry as _registry
            import dna_tpu.models.adapters  # noqa: F401 — populate

            self.embed = _registry.encoder[cfg.encoder](
                cfg.vocab_size, cfg.d_model, max_len=self.l_max)
        if self.learned_pos_emb:
            self.pos_emb = self.param(
                "pos_emb",
                nn.with_logical_partitioning(
                    nn.initializers.normal(0.02), (None, "embed")),
                (self.l_max, cfg.d_model), jnp.float32)
        BlockCls = LMBlock
        if cfg.remat:
            BlockCls = nn.remat(LMBlock, prevent_cse=False,
                                policy=_remat_policy(cfg.remat_policy))
        self.blocks = [
            BlockCls(cfg, layer_idx=i, attn_layer_idx=tuple(self.attn_layer_idx),
                     l_max=self.l_max, causal=self.causal, name=f"layer_{i}")
            for i in range(cfg.n_layers)]
        self.ln_f = layer_norm(eps=cfg.norm_eps)

    def __call__(self, input_ids: jax.Array, *, deterministic: bool = True,
                 soft_prefix: Optional[jax.Array] = None) -> jax.Array:
        x = self.embed(input_ids)
        if soft_prefix is not None:
            # soft-prompt tuning: trainable continuous tokens prepended to
            # the embedded sequence (reference capability declared by
            # `configs/evals/soft_prompting_genomics.yaml`)
            prefix = jnp.broadcast_to(
                soft_prefix.astype(x.dtype)[None],
                (x.shape[0], *soft_prefix.shape))
            x = jnp.concatenate([prefix, x], axis=1)
        if self.learned_pos_emb:
            x = x + self.pos_emb[None, : x.shape[1]].astype(x.dtype)
        for i, blk in enumerate(self.blocks):
            x = blk(x, deterministic=deterministic)
            sow_act_norm(self, i, x)
        return self.ln_f(x).astype(x.dtype)

    def prefill(self, input_ids: jax.Array):
        """Forward pass that also returns per-layer recurrent states (mamba
        mixers) for O(1) stepping."""
        if self.learned_pos_emb:
            # step() has no position index, so a learned pos-emb model would
            # silently diverge from the full forward — refuse instead
            raise NotImplementedError(
                "recurrent prefill/step unsupported with learned_pos_emb")
        x = self.embed(input_ids)
        states = []
        for blk in self.blocks:
            x, st = blk(x, deterministic=True, return_state=True)
            states.append(st)
        return self.ln_f(x).astype(x.dtype), tuple(states)

    def step(self, token: jax.Array, states):
        """token [B] → (hidden [B, D], new states)."""
        x = self.embed(token[:, None])[:, 0]
        new_states = []
        for blk, st in zip(self.blocks, states):
            x, st = blk.step(x, st)
            new_states.append(st)
        return self.ln_f(x).astype(x.dtype), tuple(new_states)


class LMHeadModel(nn.Module):
    """Backbone + tied LM head (reference `ConvLMHeadModel`,
    `long_conv_lm.py:684-786`)."""

    cfg: ModelConfig
    attn_layer_idx: Tuple[int, ...] = ()
    l_max: int = 1024
    causal: bool = True

    def setup(self):
        self.backbone = LMBackbone(
            self.cfg, attn_layer_idx=self.attn_layer_idx, l_max=self.l_max,
            causal=self.causal)

    def __call__(self, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 *, deterministic: bool = True,
                 soft_prefix: Optional[jax.Array] = None) -> jax.Array:
        del attention_mask  # causal LM pretraining uses packed full windows
        h = self.backbone(input_ids, deterministic=deterministic,
                          soft_prefix=soft_prefix)
        if soft_prefix is not None:
            h = h[:, soft_prefix.shape[0]:]  # logits for real positions only
        logits = self.backbone.embed.attend(h)
        return nn.with_logical_constraint(logits, ("batch", "seq", "vocab"))

    def prefill(self, input_ids: jax.Array):
        """(logits [B, P, V], per-layer recurrent states) — for O(1)
        autoregressive generation with mamba mixers."""
        h, states = self.backbone.prefill(input_ids)
        return self.backbone.embed.attend(h), states

    def step(self, token: jax.Array, states):
        """token [B] → (logits [B, V], new states)."""
        h, states = self.backbone.step(token, states)
        return self.backbone.embed.attend(h[:, None])[:, 0], states


class DNAEmbeddingModel(nn.Module):
    """Backbone without head + pooling + classification/regression score
    (reference `DNAEmbeddingModel` + `SequenceDecoder` pipeline)."""

    cfg: ModelConfig
    attn_layer_idx: Tuple[int, ...] = ()
    l_max: int = 1024
    causal: bool = True

    def setup(self):
        cfg = self.cfg
        self.backbone = LMBackbone(
            cfg, attn_layer_idx=self.attn_layer_idx, l_max=self.l_max,
            causal=self.causal)
        if cfg.l_output is not None or cfg.pool in ("pool", "ragged"):
            # full SequenceDecoder semantics (l_output restriction, running
            # pool, ragged) via the adapter registry
            from dna_tpu.models.adapters import SequenceDecoder

            self.decode = SequenceDecoder(
                d_output=cfg.n_classes, l_output=cfg.l_output,
                mode=cfg.pool if cfg.pool != "mean" else "pool")
            self.pool = None
        else:
            self.pool = SequencePool(cfg.pool)
            self.score = dense(cfg.n_classes, ("embed", "vocab"),
                               dtype=jnp.float32, name="score")

    def __call__(self, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        h = self.backbone(input_ids, deterministic=deterministic)
        if self.pool is None:
            return self.decode(h, attention_mask)
        pooled = self.pool(h, attention_mask)
        return self.score(pooled.astype(jnp.float32))


@registry.model.register("hyena_lm")
def _hyena_lm(cfg: ModelConfig, l_max: Optional[int] = None):
    return LMHeadModel(cfg, l_max=l_max or cfg.max_len, causal=True)


@registry.model.register("hyena_cls")
def _hyena_cls(cfg: ModelConfig, l_max: Optional[int] = None):
    return DNAEmbeddingModel(cfg, l_max=l_max or cfg.max_len, causal=True)


@registry.model.register("hyena_blm_cls")
def _hyena_blm_cls(cfg: ModelConfig, l_max: Optional[int] = None):
    """Bidirectional-backbone classifier: finetune head for `hyena_blm`
    MLM pretrains (reference bert_hg38 lineage, `long_conv_lm.py:578-682`
    + `DNAEmbeddingModel` finetune wiring `long_conv_lm.py:853-911` — the
    backbone subtree transfers 1:1, only causality differs)."""
    return DNAEmbeddingModel(cfg, l_max=l_max or cfg.max_len, causal=False)


@registry.model.register("transformer_lm")
def _transformer_lm(cfg: ModelConfig, l_max: Optional[int] = None):
    return LMHeadModel(cfg, attn_layer_idx=tuple(range(cfg.n_layers)),
                       l_max=l_max or cfg.max_len, causal=True)


@registry.model.register("hyena_blm")
def _hyena_blm(cfg: ModelConfig, l_max: Optional[int] = None):
    """Bidirectional LM-backbone MLM (reference `BertLMHeadModel` / `blm`,
    `long_conv_lm.py:578-682`: same backbone, bidirectional mixers)."""
    return LMHeadModel(cfg, l_max=l_max or cfg.max_len, causal=False)


@registry.model.register("mamba_lm")
def _mamba_lm(cfg: ModelConfig, l_max: Optional[int] = None):
    """Causal Mamba LM (reference `configs/experiment/hg38/mamba.yaml`)."""
    import dataclasses

    cfg = dataclasses.replace(cfg, mixer="mamba")
    return LMHeadModel(cfg, l_max=l_max or cfg.max_len, causal=True)
