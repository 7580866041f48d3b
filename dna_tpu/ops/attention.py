"""Multi-head attention dispatch: Pallas flash kernel or XLA reference.

API takes the *ingredients* of the bias (pad mask, ALiBi slopes, causal flag)
rather than a materialized [B, H, S, S] bias tensor: the reference has to
materialize ALiBi (`bert_layers.py:440-451`) because its Triton kernel wants a
bias operand, but on TPU the flash kernel regenerates bias per tile from
slopes — O(S²) HBM traffic avoided entirely.
"""

from __future__ import annotations

import os as _os
from typing import Optional

import jax

from dna_tpu.ops.attention_ref import alibi_bias, attention_ref, padding_bias


def _ambient_sp_mesh():
    """The mesh of the enclosing `with mesh:` block, if its sp axis is >1.

    Models are ordinary flax modules that only see logical axis names; when
    the train step traces them under a mesh with context parallelism active,
    the Pallas kernel must be wrapped in shard_map (XLA replicates custom
    calls instead of partitioning them along S). Detecting the ambient mesh
    here keeps model code mesh-agnostic.
    """
    from dna_tpu.parallel.mesh import ambient_mesh

    return ambient_mesh("sp")


def _ambient_tp_mesh():
    """Ambient mesh with tp > 1, if any (small-kernel dispatch guard)."""
    from dna_tpu.parallel.mesh import ambient_mesh

    return ambient_mesh("tp")


def multihead_attention(
    q: jax.Array,  # [B, S, H, D]
    k: jax.Array,
    v: jax.Array,
    *,
    attention_mask: Optional[jax.Array] = None,  # [B, S] 1=keep
    alibi: bool = False,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    impl: str = "auto",  # auto | flash | ref
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    B, S, H, D = q.shape
    sp_mesh = _ambient_sp_mesh()
    tp_mesh = _ambient_tp_mesh()
    if dropout_rate > 0.0 and dropout_rng is not None:
        # attention-prob dropout runs on the materialized-probs path — the
        # same fallback shape as the reference, whose Triton kernel also
        # can't do p>0 (`bert_layers.py:166-197`). checkpointed like the
        # p=0 ref path; the bernoulli bits regenerate identically in the
        # rematerialized bwd (same key).
        impl = "ref"
    if impl == "auto":
        # Flash pays off once the S×S score materialization dominates; at
        # short S (DNABERT-2's 128-token batches) the fused all-heads kernel
        # (`attention_small`) keeps softmax entirely in VMEM without the
        # per-(b,h) grid overhead that made the flash kernel lose there
        # (measured on v5e: 124k ref vs 99k flash tok/s at S=128, batch 256).
        from dna_tpu.ops import attention_small

        # DNA_TPU_FLASH_MIN_S: hardware-tuned crossover (measured on v5e;
        # re-measure per chip generation with scripts/bench_attn.py). Same
        # class of knob as DNA_TPU_ATTN_STREAM_S in flash_attention.py.
        min_s = int(_os.environ.get("DNA_TPU_FLASH_MIN_S", "512"))
        impl = "flash" if (D % 128 == 0 or D in (64,)) and S >= min_s else "ref"
        # the small kernel wins over flash everywhere supports() allows
        # (40 MB VMEM budget → S ≤ 512 at H·D=768): measured fwd+bwd on v5e
        # 2.1 vs 3.4 ms at S=384/B=48 and 2.1 vs 5.3 ms at S=512/B=32
        if (impl in ("ref", "flash") and sp_mesh is None and tp_mesh is None
                and attention_small.supports(S, H, D)
                and _os.environ.get("DNA_TPU_SMALL_ATTN", "1") != "0"):
            impl = "small"
        elif (impl in ("ref", "flash") and sp_mesh is None
                and tp_mesh is not None
                and H % tp_mesh.shape["tp"] == 0
                and attention_small.supports(S, H // tp_mesh.shape["tp"], D)
                and _os.environ.get("DNA_TPU_SMALL_ATTN", "1") != "0"):
            # tp>1: shard_map the kernel over the head axis (a bare custom
            # call would be replicated by GSPMD and all-gather the heads)
            impl = "small_tp"
        elif (impl in ("ref", "flash") and S >= min_s
                and sp_mesh is None and tp_mesh is None
                and _os.environ.get("DNA_TPU_MID_ATTN", "1") != "0"):
            # checked for BOTH ref and flash eligibility: shapes the flash
            # kernel refuses (e.g. D=32 — hg38_transformer) but mid
            # supports (any D dividing 128) were silently running the
            # materialized ref path at long S before r5
            # KV-resident paired-lane kernel for 512 < S ≤ 4096, extended
            # to S = 8192/16384 by the HD-tiled grid (r5; kill with
            # DNA_TPU_MID_ATTN_HDT=0). Keeps the packed lane layout (no
            # D=64 padding) and full-row softmax in VMEM. Default ON —
            # validated on real v5e (r4): numerics vs ref S=1024 fwd err
            # 0.0039, grad errs ≤2% of scale (bf16 tol); fwd+bwd vs the
            # flash kernel (scripts/bench_attn_mid.py, H=12 D=64): S=1024
            # 5.76 vs 10.28 ms, S=2048 9.69 vs 16.55, S=4096 13.27 vs
            # 29.04 — 1.8-2.2x.
            from dna_tpu.ops import attention_mid

            if attention_mid.supports(S, H, D):
                impl = "mid"
        if sp_mesh is not None and impl == "flash":
            # local q tiles must still be 128-aligned under sp sharding, and
            # the wrapper also shards heads over tp — H must divide
            if ((S // sp_mesh.shape["sp"]) % 128 != 0
                    or H % max(sp_mesh.shape.get("tp", 1), 1) != 0):
                impl = "ref"
    if impl == "small":
        from dna_tpu.ops.attention_small import fused_small_attention

        return fused_small_attention(
            q, k, v, attention_mask=attention_mask, alibi=alibi,
            causal=causal, softmax_scale=softmax_scale)
    if impl == "small_tp":
        from dna_tpu.ops.attention_small import tp_small_attention

        return tp_small_attention(
            q, k, v, tp_mesh, attention_mask=attention_mask, alibi=alibi,
            causal=causal, softmax_scale=softmax_scale)
    if impl == "mid":
        from dna_tpu.ops.attention_mid import mid_attention

        return mid_attention(
            q, k, v, attention_mask=attention_mask, alibi=alibi,
            causal=causal, softmax_scale=softmax_scale)
    if impl == "flash":
        try:
            from dna_tpu.ops.flash_attention import (
                context_parallel_flash_attention, flash_attention,
                ring_flash_attention)

            if sp_mesh is not None:
                # gather: all-gather K/V once (fewest collectives; peak
                # memory O(S)); ring: ppermute chunks (memory O(S/sp) —
                # for when the gathered K/V wouldn't fit)
                comm = _os.environ.get("DNA_TPU_CP_ATTN", "gather")
                cp = (ring_flash_attention if comm == "ring"
                      else context_parallel_flash_attention)
                return cp(
                    q, k, v, sp_mesh, attention_mask=attention_mask,
                    alibi=alibi, causal=causal, softmax_scale=softmax_scale)
            return flash_attention(
                q, k, v, attention_mask=attention_mask, alibi=alibi,
                causal=causal, softmax_scale=softmax_scale)
        except ImportError:
            impl = "ref"
    bias = None
    if alibi:
        bias = alibi_bias(H, S, causal=causal)
    if attention_mask is not None:
        pb = padding_bias(attention_mask)
        bias = pb if bias is None else bias + pb

    # jax.checkpoint around the reference attention: the [B, H, S, S] fp32
    # scores/probs are recomputed in the backward pass instead of being
    # written to and read back from HBM — the DNABERT-2 step at S=128 is
    # memory-bound (XLA cost analysis: 76 GB/step, memory SoL 93 ms vs
    # compute SoL 60 ms), and the S² tensors are the largest stored
    # activations. Values are unchanged; only the autodiff schedule is.
    @jax.checkpoint
    def _attn(q, k, v, bias):
        return attention_ref(q, k, v, bias, causal=causal,
                             softmax_scale=softmax_scale,
                             dropout_rate=dropout_rate,
                             dropout_rng=dropout_rng)

    return _attn(q, k, v, bias)


def multihead_attention_qkv(
    qkv: jax.Array,  # [B, S, 3, H, D] — packed fused-projection output
    *,
    attention_mask=None,
    alibi: bool = False,
    causal: bool = False,
    softmax_scale=None,
    impl: str = "auto",
    dropout_rate: float = 0.0,
    dropout_rng=None,
) -> jax.Array:
    """Attention on the packed QKV projection output; returns [B, S, H·D].

    When the fused small-S kernel applies, the packed tensor is consumed
    directly (q/k/v live at 128-aligned lane offsets) — XLA's q/k/v
    slice+reshape copies and the backward dqkv re-assembly disappear
    (~3.6 GB/step at the DNABERT-2 bench point, `scripts/probe_hlo.py`).
    Otherwise unpacks and falls back to `multihead_attention`.
    """
    from dna_tpu.ops import attention_small

    B, S, three, H, D = qkv.shape
    sp_mesh = _ambient_sp_mesh()
    tp_mesh = _ambient_tp_mesh()
    if dropout_rate > 0.0 and dropout_rng is not None:
        if (impl == "auto" and sp_mesh is None and tp_mesh is None
                and attention_small.supports_qkv(S, H, D)
                and _os.environ.get("DNA_TPU_SMALL_ATTN", "1") != "0"):
            # in-kernel dropout: the keep/scale mask rides along (the same
            # bernoulli draw attention_ref makes for this rng, so kernel
            # and ref paths agree exactly). EXCEEDS the reference, whose
            # Triton kernel can't do p>0 and falls back to torch.
            keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                        (B, H, S, S))
            dm = keep.astype(qkv.dtype) / (1.0 - dropout_rate)
            return attention_small.fused_small_attention_qkv(
                qkv, H, attention_mask=attention_mask, alibi=alibi,
                causal=causal, softmax_scale=softmax_scale, dropout_mask=dm)
        impl = "ref"  # p>0 otherwise runs the materialized-probs path
    if (impl == "auto" and sp_mesh is None and tp_mesh is None
            and attention_small.supports_qkv(S, H, D)
            and _os.environ.get("DNA_TPU_SMALL_ATTN", "1") != "0"):
        return attention_small.fused_small_attention_qkv(
            qkv, H, attention_mask=attention_mask, alibi=alibi,
            causal=causal, softmax_scale=softmax_scale)
    if (impl == "auto" and sp_mesh is None and tp_mesh is not None
            and H % tp_mesh.shape["tp"] == 0
            and attention_small.supports_qkv(S, H // tp_mesh.shape["tp"], D)
            and _os.environ.get("DNA_TPU_SMALL_ATTN", "1") != "0"):
        # shard_map over the head axis: each tp shard runs the kernel on its
        # own contiguous lane block (no replicated custom call / head gather)
        return attention_small.tp_small_attention_qkv(
            qkv, H, tp_mesh, attention_mask=attention_mask, alibi=alibi,
            causal=causal, softmax_scale=softmax_scale)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    out = multihead_attention(
        q, k, v, attention_mask=attention_mask, alibi=alibi, causal=causal,
        softmax_scale=softmax_scale, impl=impl, dropout_rate=dropout_rate,
        dropout_rng=dropout_rng)
    return out.reshape(B, S, H * D)
