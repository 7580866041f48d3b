"""Fused all-heads attention kernel for short sequences (Pallas TPU).

The DNABERT-2 pretrain point (S=128) is memory-bound, and the XLA reference
attention materializes fp32 [B, H, S, S] scores in HBM once in the forward
pass and again in the checkpointed backward recompute — ~1 GB/layer of pure
softmax traffic at B=128 (XLA cost analysis, `scripts/probe_cost.py`). The
per-(batch, head) flash kernel (`ops/flash_attention.py`) removes that
traffic but loses at small S to its own grid overhead: a [S=128, D=64] tile
per grid step leaves the pipeline idle (measured 99k vs 124k tok/s at S=128).

This kernel takes the opposite decomposition: **grid over batch only**, with
the full [S, H·D] activation row-block resident in VMEM. All heads are
processed by an unrolled Python loop over static lane slices — no
[B, H, S, D] transpose (the packed [B, S, H·D] layout is the natural output
of the QKV projection, and H·D is a multiple of 128 lanes, so nothing pads).
Softmax never touches HBM in either direction; the backward kernel recomputes
probabilities from q/k in VMEM (lse isn't even saved — at these sizes the
recompute is cheaper than the extra output).

Replaces the same reference component as the flash kernel: the Triton
flash-attention-with-bias (`src/models/sequence/flash_attn_triton.py:767+`)
used by DNABERT-2 (`bert_layers.py:183-197`), for the short-S regime.

Numerics: fp32 scores/softmax, bf16 operands on the MXU with fp32
accumulation. Matches `attention_ref` to bf16 tolerance (oracle tests in
`tests/test_flash_attention.py`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dna_tpu.ops.attention_ref import alibi_slopes

NEG_INF = -1e9


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _base_bias(S: int, mask_row, causal: bool):
    """[S, S] fp32 additive bias shared by all heads (pad mask + causal)."""
    bias = jnp.zeros((S, S), jnp.float32)
    if mask_row is not None:
        bias = bias + jnp.where(mask_row[None, :] != 0, 0.0, NEG_INF)
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        bias = jnp.where(rows >= cols, bias, NEG_INF)
    return bias


def _alibi_rel(S: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    return jnp.abs(rows - cols).astype(jnp.float32)


def _softmax_p(s):
    """Row softmax with fully-masked-row guard; returns fp32 probs."""
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.where(l == 0.0, 1.0, l)


def _fwd_kernel(slope_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                n_heads: int, head_dim: int, causal: bool, alibi: bool,
                scale: float):
    S = q_ref.shape[1]
    G = q_ref.shape[0]
    rel = _alibi_rel(S) if alibi else None
    for g in range(G):
      mask_row = mask_ref[g, 0, :] if mask_ref is not None else None
      bias = _base_bias(S, mask_row, causal)
      for h in range(n_heads):
        sl = pl.ds(h * head_dim, head_dim)
        qh = q_ref[g, :, sl]
        kh = k_ref[g, :, sl]
        vh = v_ref[g, :, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + bias
        if alibi:
            s = s - slope_ref[h] * rel
        p = _softmax_p(s)
        oh = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[g, :, sl] = oh.astype(o_ref.dtype)


def _bwd_kernel(slope_ref, q_ref, k_ref, v_ref, mask_ref, do_ref, o_ref,
                dq_ref, dk_ref, dv_ref, *, n_heads: int, head_dim: int,
                causal: bool, alibi: bool, scale: float):
    S = q_ref.shape[1]
    G = q_ref.shape[0]
    rel = _alibi_rel(S) if alibi else None
    for g in range(G):
      mask_row = mask_ref[g, 0, :] if mask_ref is not None else None
      bias = _base_bias(S, mask_row, causal)
      for h in range(n_heads):
        sl = pl.ds(h * head_dim, head_dim)
        qh = q_ref[g, :, sl]
        kh = k_ref[g, :, sl]
        vh = v_ref[g, :, sl]
        doh = do_ref[g, :, sl]
        oh = o_ref[g, :, sl].astype(jnp.float32)  # saved fwd output
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + bias
        if alibi:
            s = s - slope_ref[h] * rel
        p = _softmax_p(s)
        pb = p.astype(vh.dtype)
        do32 = doh.astype(jnp.float32)
        delta = jnp.sum(do32 * oh, axis=-1, keepdims=True)  # [S, 1]
        dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta) * scale).astype(qh.dtype)
        dq_ref[g, :, sl] = jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[g, :, sl] = jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)
        dv_ref[g, :, sl] = jax.lax.dot_general(
            pb, doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Tile variant: when D < 128, a head slice is not lane-aligned and Mosaic
# relayouts every [S, D] sub-tile. Instead, operate on full 128-lane tiles
# (T = 128 // D heads per tile) and isolate a head by multiplying the
# *contraction operand* with an in-register lane mask — zeros kill the other
# heads' contributions in the dot, so no sub-lane slicing ever happens.
# ---------------------------------------------------------------------------


def _lane_head_masks(S: int, T: int, dtype):
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1) * T // 128
    return [(lane == j).astype(dtype) for j in range(T)]


def _fwd_kernel_tile(slope_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                     n_heads: int, head_dim: int, causal: bool, alibi: bool,
                     scale: float):
    S = q_ref.shape[1]
    G = q_ref.shape[0]
    HD = q_ref.shape[2]
    T = 128 // head_dim
    rel = _alibi_rel(S) if alibi else None
    lane_masks = _lane_head_masks(S, T, q_ref.dtype)
    for g in range(G):
        mask_row = mask_ref[g, 0, :] if mask_ref is not None else None
        bias = _base_bias(S, mask_row, causal)
        for t in range(HD // 128):
            tl = pl.ds(t * 128, 128)
            qp = q_ref[g, :, tl]
            kp = k_ref[g, :, tl]
            vp = v_ref[g, :, tl]
            o_tile = jnp.zeros((S, 128), jnp.float32)
            for j in range(T):
                h = t * T + j
                s = jax.lax.dot_general(
                    qp * lane_masks[j], kp, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                s = s + bias
                if alibi:
                    s = s - slope_ref[h] * rel
                p = _softmax_p(s)
                of = jax.lax.dot_general(
                    p.astype(vp.dtype), vp, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o_tile = o_tile + of * lane_masks[j].astype(jnp.float32)
            o_ref[g, :, tl] = o_tile.astype(o_ref.dtype)


def _bwd_kernel_tile(slope_ref, q_ref, k_ref, v_ref, mask_ref, do_ref, o_ref,
                     dq_ref, dk_ref, dv_ref, *, n_heads: int, head_dim: int,
                     causal: bool, alibi: bool, scale: float):
    S = q_ref.shape[1]
    G = q_ref.shape[0]
    HD = q_ref.shape[2]
    T = 128 // head_dim
    rel = _alibi_rel(S) if alibi else None
    lane_masks = _lane_head_masks(S, T, q_ref.dtype)
    for g in range(G):
        mask_row = mask_ref[g, 0, :] if mask_ref is not None else None
        bias = _base_bias(S, mask_row, causal)
        for t in range(HD // 128):
            tl = pl.ds(t * 128, 128)
            qp = q_ref[g, :, tl]
            kp = k_ref[g, :, tl]
            vp = v_ref[g, :, tl]
            dop = do_ref[g, :, tl]
            op = o_ref[g, :, tl].astype(jnp.float32)  # saved fwd output
            dq_t = jnp.zeros((S, 128), jnp.float32)
            dk_t = jnp.zeros((S, 128), jnp.float32)
            dv_t = jnp.zeros((S, 128), jnp.float32)
            for j in range(T):
                h = t * T + j
                mj = lane_masks[j]
                mj32 = mj.astype(jnp.float32)
                qj = qp * mj
                doj = dop * mj
                s = jax.lax.dot_general(
                    qj, kp, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                s = s + bias
                if alibi:
                    s = s - slope_ref[h] * rel
                p = _softmax_p(s)
                pb = p.astype(vp.dtype)
                # doj is lane-masked, so the saved o picks head j's lanes
                delta = jnp.sum(doj.astype(jnp.float32) * op, axis=-1,
                                keepdims=True)
                dp = jax.lax.dot_general(doj, vp, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                ds = (p * (dp - delta) * scale).astype(qp.dtype)
                dq_t = dq_t + jax.lax.dot_general(
                    ds, kp * mj, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dk_t = dk_t + jax.lax.dot_general(
                    ds, qj, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dv_t = dv_t + jax.lax.dot_general(
                    pb, doj, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * mj32
            dq_ref[g, :, tl] = dq_t.astype(dq_ref.dtype)
            dk_ref[g, :, tl] = dk_t.astype(dk_ref.dtype)
            dv_ref[g, :, tl] = dv_t.astype(dv_ref.dtype)


def _use_tile(head_dim: int) -> bool:
    import os

    impl = os.environ.get("DNA_TPU_SMALL_ATTN_IMPL", "tile")
    return impl == "tile" and head_dim < 128 and 128 % head_dim == 0


# ---------------------------------------------------------------------------
# Packed-QKV variant: consumes the fused QKV projection's output
# [B, S, 3·H·D] directly (q, k, v live at 128-aligned lane offsets 0, HD,
# 2·HD) and emits a single dQKV cotangent. Slicing q/k/v out of the packed
# tensor in XLA costs real copies — measured 1.8 GB of slice+reshape writes
# plus 0.9 GB of backward add_any per step at the DNABERT-2 bench point
# (`scripts/probe_hlo.py`); done in-kernel they cost nothing.
# ---------------------------------------------------------------------------


def _cat_bias(bias, rel, slope_ref, t, T, alibi):
    """[T·S, S] bias: the shared pad/causal bias stacked per head with each
    head's ALiBi slope applied (heads ride the sublane axis)."""
    if not alibi:
        return jnp.concatenate([bias] * T, axis=0) if T > 1 else bias
    parts = [bias - slope_ref[t * T + j] * rel for j in range(T)]
    return jnp.concatenate(parts, axis=0) if T > 1 else parts[0]


def _fwd_kernel_qkv(slope_ref, qkv_ref, mask_ref, drop_ref, o_ref, *,
                    n_heads: int, head_dim: int, causal: bool, alibi: bool,
                    scale: float):
    # Heads within a 128-lane tile are STACKED along sublanes ([T·S, 128]):
    # one matmul and one softmax per algebra step for the whole tile, with
    # lane masks on the *contraction operand* isolating each head. Halves
    # the matmul/softmax issue count vs a per-head loop.
    S = qkv_ref.shape[1]
    G = qkv_ref.shape[0]
    HD = qkv_ref.shape[2] // 3
    T = max(1, 128 // head_dim)
    width = head_dim * T  # 128 when D <= 128
    rel = _alibi_rel(S) if alibi else None
    lane_masks = _lane_head_masks(S, T, qkv_ref.dtype) if T > 1 else None
    for g in range(G):
        mask_row = mask_ref[g, 0, :] if mask_ref is not None else None
        bias = _base_bias(S, mask_row, causal)
        for t in range(HD // width):
            qp = qkv_ref[g, :, pl.ds(t * width, width)]
            kp = qkv_ref[g, :, pl.ds(HD + t * width, width)]
            vp = qkv_ref[g, :, pl.ds(2 * HD + t * width, width)]
            if T > 1:
                q_cat = jnp.concatenate(
                    [qp * lane_masks[j] for j in range(T)], axis=0)
            else:
                q_cat = qp
            s = jax.lax.dot_general(
                q_cat, kp, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # [T·S, S]
            s = s + _cat_bias(bias, rel, slope_ref, t, T, alibi)
            p = _softmax_p(s)
            if drop_ref is not None:
                # attention-prob dropout rides along as a precomputed
                # keep/scale mask (0 or 1/(1-p)) in the stacked-head layout
                # — the same bernoulli draw the XLA ref path makes, so
                # kernel and ref agree exactly for a given rng
                p = p * drop_ref[g, t].astype(jnp.float32)
            o_cat = jax.lax.dot_general(
                p.astype(vp.dtype), vp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [T·S, width]
            if T > 1:
                o_tile = sum(o_cat[j * S:(j + 1) * S]
                             * lane_masks[j].astype(jnp.float32)
                             for j in range(T))
            else:
                o_tile = o_cat
            o_ref[g, :, pl.ds(t * width, width)] = o_tile.astype(o_ref.dtype)


def _bwd_kernel_qkv(slope_ref, qkv_ref, mask_ref, drop_ref, do_ref, o_ref,
                    dqkv_ref, *, n_heads: int, head_dim: int, causal: bool,
                    alibi: bool, scale: float):
    S = qkv_ref.shape[1]
    G = qkv_ref.shape[0]
    HD = qkv_ref.shape[2] // 3
    T = max(1, 128 // head_dim)
    width = head_dim * T
    rel = _alibi_rel(S) if alibi else None
    lane_masks = _lane_head_masks(S, T, qkv_ref.dtype) if T > 1 else None
    for g in range(G):
        mask_row = mask_ref[g, 0, :] if mask_ref is not None else None
        bias = _base_bias(S, mask_row, causal)
        for t in range(HD // width):
            qp = qkv_ref[g, :, pl.ds(t * width, width)]
            kp = qkv_ref[g, :, pl.ds(HD + t * width, width)]
            vp = qkv_ref[g, :, pl.ds(2 * HD + t * width, width)]
            dop = do_ref[g, :, pl.ds(t * width, width)]
            op = o_ref[g, :, pl.ds(t * width, width)]
            if T > 1:
                q_cat = jnp.concatenate(
                    [qp * lane_masks[j] for j in range(T)], axis=0)
                do_cat = jnp.concatenate(
                    [dop * lane_masks[j] for j in range(T)], axis=0)
                # do_cat is lane-masked, so the unmasked stacked o picks out
                # exactly head j's lanes in the delta product
                o_cat = jnp.concatenate([op] * T, axis=0)
            else:
                q_cat, do_cat, o_cat = qp, dop, op
            s = jax.lax.dot_general(
                q_cat, kp, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = s + _cat_bias(bias, rel, slope_ref, t, T, alibi)
            p = _softmax_p(s)                 # [T·S, S]
            # delta from the SAVED fwd output instead of a PV-recompute
            # matmul (o is resident in HBM anyway as the out-proj's input).
            # Exact under dropout too: o = (p∘m)V ⇒ rowsum(do∘o) =
            # rowsum((p∘m)∘(doVᵀ)), which is the softmax-vjp delta for
            # combine-weights q = p∘m.
            delta = jnp.sum(do_cat.astype(jnp.float32)
                            * o_cat.astype(jnp.float32), axis=-1,
                            keepdims=True)    # [T·S, 1]
            dp = jax.lax.dot_general(do_cat, vp, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if drop_ref is not None:
                dm = drop_ref[g, t].astype(jnp.float32)
                pb = (p * dm).astype(vp.dtype)   # combine-weights p∘m for dv
                ds = (p * (dm * dp - delta) * scale).astype(qp.dtype)
            else:
                pb = p.astype(vp.dtype)
                ds = (p * (dp - delta) * scale).astype(qp.dtype)
            # dq: unmasked kp puts head j's grad in its own lanes; mask+sum
            dq_cat = jax.lax.dot_general(
                ds, kp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if T > 1:
                dq_t = sum(dq_cat[j * S:(j + 1) * S]
                           * lane_masks[j].astype(jnp.float32)
                           for j in range(T))
            else:
                dq_t = dq_cat
            # dk/dv: contracting over the stacked T·S rows sums the per-head
            # masked contributions in one matmul
            dk_t = jax.lax.dot_general(
                ds, q_cat, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dv_t = jax.lax.dot_general(
                pb, do_cat, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqkv_ref[g, :, pl.ds(t * width, width)] = (
                dq_t.astype(dqkv_ref.dtype))
            dqkv_ref[g, :, pl.ds(HD + t * width, width)] = (
                dk_t.astype(dqkv_ref.dtype))
            dqkv_ref[g, :, pl.ds(2 * HD + t * width, width)] = (
                dv_t.astype(dqkv_ref.dtype))


def _tile_biases(S, n_t, T, slope_ref, causal, alibi):
    """Per-tile [T·S, S] additive bias (ALiBi slopes + causal), built ONCE
    per kernel invocation and reused across the batch-group loop — the v1
    kernels rebuilt it per (g, t), which `probe_trace` priced as a real VPU
    cost at S=128 (the bwd kernel ran at ~2.2× its speed-of-light)."""
    if not (causal or alibi):
        return [None] * n_t
    rel = _alibi_rel(S) if alibi else None
    causal_bias = None
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        causal_bias = jnp.where(rows >= cols, 0.0, NEG_INF)
    out = []
    for t in range(n_t):
        parts = []
        for j in range(T):
            b = jnp.zeros((S, S), jnp.float32)
            if causal_bias is not None:
                b = b + causal_bias
            if alibi:
                b = b - slope_ref[t * T + j] * rel
            parts.append(b)
        out.append(jnp.concatenate(parts, axis=0) if T > 1 else parts[0])
    return out


def _mask_bias_row(mask_ref, g):
    """[1, S] key-padding bias — broadcast-added to scores instead of being
    materialized into the [T·S, S] bias (one fewer S²-sized build)."""
    if mask_ref is None:
        return None
    return jnp.where(mask_ref[g, 0, :][None, :] != 0, 0.0, NEG_INF)


def _fwd_kernel_qkv_v2(slope_ref, qkv_ref, mask_ref, drop_ref, o_ref, *,
                       n_heads: int, head_dim: int, causal: bool, alibi: bool,
                       scale: float):
    """Pass-minimized rewrite of `_fwd_kernel_qkv`. Same stacked-head
    algebra; the fp32 [T·S, S] data is touched by as few VPU passes as the
    math allows: per-tile biases are precomputed once per invocation, the
    softmax normalization is deferred past the PV matmul (o rows scale by
    1/l — a [T·S, width] op instead of an S²-sized divide), and the key-pad
    bias stays a broadcast [1, S] row."""
    S = qkv_ref.shape[1]
    G = qkv_ref.shape[0]
    HD = qkv_ref.shape[2] // 3
    T = max(1, 128 // head_dim)
    width = head_dim * T
    n_t = HD // width
    lane_masks = _lane_head_masks(S, T, qkv_ref.dtype) if T > 1 else None
    tbias = _tile_biases(S, n_t, T, slope_ref, causal, alibi)
    for g in range(G):
        mb = _mask_bias_row(mask_ref, g)
        for t in range(n_t):
            qp = qkv_ref[g, :, pl.ds(t * width, width)]
            kp = qkv_ref[g, :, pl.ds(HD + t * width, width)]
            vp = qkv_ref[g, :, pl.ds(2 * HD + t * width, width)]
            if T > 1:
                q_cat = jnp.concatenate(
                    [qp * lane_masks[j] for j in range(T)], axis=0)
            else:
                q_cat = qp
            s = jax.lax.dot_general(
                q_cat, kp, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * scale + tbias[t] if tbias[t] is not None else s * scale
            if mb is not None:
                s = s + mb
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)                      # unnormalized probs
            l = jnp.sum(e, axis=-1, keepdims=True)
            inv_l = 1.0 / jnp.where(l == 0.0, 1.0, l)
            if drop_ref is not None:
                eb = (e * drop_ref[g, t].astype(jnp.float32)).astype(vp.dtype)
            else:
                eb = e.astype(vp.dtype)
            o_cat = jax.lax.dot_general(
                eb, vp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_cat = o_cat * inv_l                   # deferred normalization
            if T > 1:
                o_tile = sum(o_cat[j * S:(j + 1) * S]
                             * lane_masks[j].astype(jnp.float32)
                             for j in range(T))
            else:
                o_tile = o_cat
            o_ref[g, :, pl.ds(t * width, width)] = o_tile.astype(o_ref.dtype)


def _bwd_kernel_qkv_v2(slope_ref, qkv_ref, mask_ref, drop_ref, do_ref, o_ref,
                       dqkv_ref, *, n_heads: int, head_dim: int, causal: bool,
                       alibi: bool, scale: float):
    """Pass-minimized rewrite of `_bwd_kernel_qkv` (see `_fwd_kernel_qkv_v2`).
    Works on unnormalized probs e = exp(s−m): the 1/l softmax factor folds
    into the per-row scalar of ds (scale·inv_l) and into the do rows feeding
    dv (dv = ebᵀ·(do·inv_l)) — two [T·S, ·] column ops replace two S²-sized
    passes, and tile biases amortize across the batch group."""
    S = qkv_ref.shape[1]
    G = qkv_ref.shape[0]
    HD = qkv_ref.shape[2] // 3
    T = max(1, 128 // head_dim)
    width = head_dim * T
    n_t = HD // width
    lane_masks = _lane_head_masks(S, T, qkv_ref.dtype) if T > 1 else None
    tbias = _tile_biases(S, n_t, T, slope_ref, causal, alibi)
    for g in range(G):
        mb = _mask_bias_row(mask_ref, g)
        for t in range(n_t):
            qp = qkv_ref[g, :, pl.ds(t * width, width)]
            kp = qkv_ref[g, :, pl.ds(HD + t * width, width)]
            vp = qkv_ref[g, :, pl.ds(2 * HD + t * width, width)]
            dop = do_ref[g, :, pl.ds(t * width, width)]
            op = o_ref[g, :, pl.ds(t * width, width)]
            if T > 1:
                q_cat = jnp.concatenate(
                    [qp * lane_masks[j] for j in range(T)], axis=0)
                do_cat = jnp.concatenate(
                    [dop * lane_masks[j] for j in range(T)], axis=0)
                o_cat = jnp.concatenate([op] * T, axis=0)
            else:
                q_cat, do_cat, o_cat = qp, dop, op
            s = jax.lax.dot_general(
                q_cat, kp, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * scale + tbias[t] if tbias[t] is not None else s * scale
            if mb is not None:
                s = s + mb
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            l = jnp.sum(e, axis=-1, keepdims=True)
            inv_l = 1.0 / jnp.where(l == 0.0, 1.0, l)   # [T·S, 1]
            delta = jnp.sum(do_cat.astype(jnp.float32)
                            * o_cat.astype(jnp.float32), axis=-1,
                            keepdims=True)               # [T·S, 1]
            dp = jax.lax.dot_general(do_cat, vp, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            rowscale = scale * inv_l                     # [T·S, 1]
            if drop_ref is not None:
                dm = drop_ref[g, t].astype(jnp.float32)
                ds = (e * ((dm * dp - delta) * rowscale)).astype(qp.dtype)
                eb = (e * dm).astype(vp.dtype)
            else:
                ds = (e * ((dp - delta) * rowscale)).astype(qp.dtype)
                eb = e.astype(vp.dtype)
            # dv = pbᵀ·do with pb = e·(dm)/l: fold 1/l into the do rows
            do_scaled = (do_cat.astype(jnp.float32) * inv_l).astype(vp.dtype)
            dq_cat = jax.lax.dot_general(
                ds, kp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if T > 1:
                dq_t = sum(dq_cat[j * S:(j + 1) * S]
                           * lane_masks[j].astype(jnp.float32)
                           for j in range(T))
            else:
                dq_t = dq_cat
            dk_t = jax.lax.dot_general(
                ds, q_cat, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dv_t = jax.lax.dot_general(
                eb, do_scaled, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqkv_ref[g, :, pl.ds(t * width, width)] = (
                dq_t.astype(dqkv_ref.dtype))
            dqkv_ref[g, :, pl.ds(HD + t * width, width)] = (
                dk_t.astype(dqkv_ref.dtype))
            dqkv_ref[g, :, pl.ds(2 * HD + t * width, width)] = (
                dv_t.astype(dqkv_ref.dtype))


def _qkv_alg():
    """v2 (default): pass-minimized kernels; v1: the r2b originals
    (DNA_TPU_SMALL_ATTN_ALG=v1 for A/B probes)."""
    import os

    return os.environ.get("DNA_TPU_SMALL_ATTN_ALG", "v2")


def _mask_none_wrapper(kernel, mask_pos, *refs, **kw):
    refs = list(refs)
    refs.insert(mask_pos, None)
    return kernel(*refs, **kw)


def _none_wrapper(kernel, positions, *refs, **kw):
    """Insert None refs at the given (ascending) positions — for kernels
    whose optional inputs (mask, dropout mask) are absent this call."""
    refs = list(refs)
    for pos in positions:
        refs.insert(pos, None)
    return kernel(*refs, **kw)


VMEM_LIMIT = 100 * 1024 * 1024  # raise Mosaic's default 16 MB scoped limit
                                # (v5e has 128 MB); bigger batch-group blocks
                                # measured 3-5x faster per layer at S=128


def _group(B: int, S: int, HD: int, n_bufs: int,
           direction: str = "fwd") -> int:
    """Largest batch-group G (divisor of B, ≤16) whose double-buffered
    blocks fit the scoped-VMEM budget with room for the fp32 [T·S, S]
    temporaries. `DNA_TPU_SMALL_ATTN_G` forces both directions;
    `DNA_TPU_SMALL_ATTN_G_FWD` / `_BWD` force one."""
    import os

    env = (os.environ.get(f"DNA_TPU_SMALL_ATTN_G_{direction.upper()}")
           or os.environ.get("DNA_TPU_SMALL_ATTN_G"))
    budget = int(os.environ.get("DNA_TPU_SMALL_ATTN_VMEM",
                                VMEM_LIMIT * 2 // 5))
    per_row = n_bufs * 2 * S * HD * 2  # bf16, double-buffered
    g = max(1, min(16, budget // max(per_row, 1)))
    if env:
        g = int(env)
    while B % g:
        g -= 1
    return g


def _specs(B, S, HD, with_mask, G):
    xspec = pl.BlockSpec((G, S, HD), lambda b, *_: (b, 0, 0))
    in_specs = [xspec, xspec, xspec]
    if with_mask:
        # mask arrives [B, 1, S]: the unit second-to-last dim satisfies
        # Mosaic's block-shape rule (a (1, S) block over [B, S] does not)
        in_specs.append(pl.BlockSpec((G, 1, S), lambda b, *_: (b, 0, 0)))
    return xspec, in_specs


def _fwd_impl(q, k, v, mask, slopes, *, n_heads, causal, alibi, scale):
    B, S, HD = q.shape
    head_dim = HD // n_heads
    G = _group(B, S, HD, n_bufs=4, direction="fwd")
    xspec, in_specs = _specs(B, S, HD, mask is not None, G)
    inputs = [q, k, v] + ([mask] if mask is not None else [])
    kfn = _fwd_kernel_tile if _use_tile(head_dim) else _fwd_kernel
    kernel = functools.partial(kfn, n_heads=n_heads,
                               head_dim=head_dim, causal=causal, alibi=alibi,
                               scale=scale)
    if mask is None:
        kernel = functools.partial(_mask_none_wrapper, kernel, 4)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B // G,), in_specs=in_specs,
            out_specs=xspec),
        out_shape=jax.ShapeDtypeStruct((B, S, HD), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(slopes, *inputs)


def _bwd_impl(q, k, v, mask, slopes, do, o, *, n_heads, causal, alibi,
              scale):
    B, S, HD = q.shape
    head_dim = HD // n_heads
    G = _group(B, S, HD, n_bufs=8, direction="bwd")
    xspec, in_specs = _specs(B, S, HD, mask is not None, G)
    in_specs.append(xspec)  # do
    in_specs.append(xspec)  # o (saved fwd output, for delta)
    inputs = [q, k, v] + ([mask] if mask is not None else []) + [do, o]
    kfn = _bwd_kernel_tile if _use_tile(head_dim) else _bwd_kernel
    kernel = functools.partial(kfn, n_heads=n_heads,
                               head_dim=head_dim, causal=causal, alibi=alibi,
                               scale=scale)
    if mask is None:
        kernel = functools.partial(_mask_none_wrapper, kernel, 4)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B // G,), in_specs=in_specs,
            out_specs=(xspec, xspec, xspec)),
        out_shape=(jax.ShapeDtypeStruct((B, S, HD), q.dtype),
                   jax.ShapeDtypeStruct((B, S, HD), k.dtype),
                   jax.ShapeDtypeStruct((B, S, HD), v.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(slopes, *inputs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _small(q, k, v, mask, slopes, n_heads, causal, alibi, scale):
    return _fwd_impl(q, k, v, mask, slopes, n_heads=n_heads, causal=causal,
                     alibi=alibi, scale=scale)


def _small_fwd(q, k, v, mask, slopes, n_heads, causal, alibi, scale):
    o = _fwd_impl(q, k, v, mask, slopes, n_heads=n_heads, causal=causal,
                  alibi=alibi, scale=scale)
    return o, (q, k, v, mask, slopes, o)


def _small_bwd(n_heads, causal, alibi, scale, res, do):
    from dna_tpu.ops.flash_attention import _zero_ct

    q, k, v, mask, slopes, o = res
    dq, dk, dv = _bwd_impl(q, k, v, mask, slopes, do, o, n_heads=n_heads,
                           causal=causal, alibi=alibi, scale=scale)
    return dq, dk, dv, _zero_ct(mask), jnp.zeros_like(slopes)


_small.defvjp(_small_fwd, _small_bwd)


def _fwd_impl_qkv(qkv, mask, drop, slopes, *, n_heads, causal, alibi, scale):
    B, S, HD3 = qkv.shape
    HD = HD3 // 3
    head_dim = HD // n_heads
    G = _group(B, S, HD, n_bufs=4 if drop is None else 6, direction="fwd")
    qkv_spec = pl.BlockSpec((G, S, HD3), lambda b, *_: (b, 0, 0))
    o_spec = pl.BlockSpec((G, S, HD), lambda b, *_: (b, 0, 0))
    in_specs = [qkv_spec]
    if mask is not None:
        in_specs.append(pl.BlockSpec((G, 1, S), lambda b, *_: (b, 0, 0)))
    if drop is not None:
        in_specs.append(pl.BlockSpec(
            (G,) + drop.shape[1:], lambda b, *_: (b, 0, 0, 0)))
    inputs = ([qkv] + ([mask] if mask is not None else [])
              + ([drop] if drop is not None else []))
    kfn = _fwd_kernel_qkv_v2 if _qkv_alg() == "v2" else _fwd_kernel_qkv
    kernel = functools.partial(kfn, n_heads=n_heads,
                               head_dim=head_dim, causal=causal, alibi=alibi,
                               scale=scale)
    nones = [p for p, x in ((2, mask), (3, drop)) if x is None]
    if nones:
        kernel = functools.partial(_none_wrapper, kernel, nones)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B // G,), in_specs=in_specs,
            out_specs=o_spec),
        out_shape=jax.ShapeDtypeStruct((B, S, HD), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(slopes, *inputs)


def _bwd_impl_qkv(qkv, mask, drop, slopes, do, o, *, n_heads, causal, alibi,
                  scale):
    B, S, HD3 = qkv.shape
    HD = HD3 // 3
    head_dim = HD // n_heads
    G = _group(B, S, HD, n_bufs=9 if drop is None else 11, direction="bwd")
    qkv_spec = pl.BlockSpec((G, S, HD3), lambda b, *_: (b, 0, 0))
    o_spec = pl.BlockSpec((G, S, HD), lambda b, *_: (b, 0, 0))
    in_specs = [qkv_spec]
    if mask is not None:
        in_specs.append(pl.BlockSpec((G, 1, S), lambda b, *_: (b, 0, 0)))
    if drop is not None:
        in_specs.append(pl.BlockSpec(
            (G,) + drop.shape[1:], lambda b, *_: (b, 0, 0, 0)))
    in_specs.append(o_spec)  # do
    in_specs.append(o_spec)  # o (saved fwd output, for delta)
    inputs = ([qkv] + ([mask] if mask is not None else [])
              + ([drop] if drop is not None else []) + [do, o])
    kfn = _bwd_kernel_qkv_v2 if _qkv_alg() == "v2" else _bwd_kernel_qkv
    kernel = functools.partial(kfn, n_heads=n_heads,
                               head_dim=head_dim, causal=causal, alibi=alibi,
                               scale=scale)
    nones = [p for p, x in ((2, mask), (3, drop)) if x is None]
    if nones:
        kernel = functools.partial(_none_wrapper, kernel, nones)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B // G,), in_specs=in_specs,
            out_specs=qkv_spec),
        out_shape=jax.ShapeDtypeStruct((B, S, HD3), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(slopes, *inputs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _small_qkv(qkv, mask, drop, slopes, n_heads, causal, alibi, scale):
    return _fwd_impl_qkv(qkv, mask, drop, slopes, n_heads=n_heads,
                         causal=causal, alibi=alibi, scale=scale)


def _small_qkv_fwd(qkv, mask, drop, slopes, n_heads, causal, alibi, scale):
    o = _fwd_impl_qkv(qkv, mask, drop, slopes, n_heads=n_heads,
                      causal=causal, alibi=alibi, scale=scale)
    return o, (qkv, mask, drop, slopes, o)


def _small_qkv_bwd(n_heads, causal, alibi, scale, res, do):
    from dna_tpu.ops.flash_attention import _zero_ct

    qkv, mask, drop, slopes, o = res
    dqkv = _bwd_impl_qkv(qkv, mask, drop, slopes, do, o, n_heads=n_heads,
                         causal=causal, alibi=alibi, scale=scale)
    return dqkv, _zero_ct(mask), _zero_ct(drop), jnp.zeros_like(slopes)


_small_qkv.defvjp(_small_qkv_fwd, _small_qkv_bwd)


def supports_qkv(S: int, H: int, D: int) -> bool:
    return supports(S, H, D) and D <= 128 and (128 % D == 0 or D == 128)


def fused_small_attention_qkv(
    qkv: jax.Array,  # [B, S, 3, H, D] or [B, S, 3*H*D] — packed projection
    n_heads: int,
    *,
    attention_mask: Optional[jax.Array] = None,  # [B, S] 1=keep
    alibi: bool = False,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    slopes: Optional[jax.Array] = None,  # explicit per-head ALiBi slopes
                                         # (tp shard_map passes a head shard)
    dropout_mask: Optional[jax.Array] = None,  # [B, H, S, S] keep/scale
                                               # values: 0 or 1/(1-p)
) -> jax.Array:
    """Attention straight from the fused QKV projection output; returns
    [B, S, H·D]. Avoids the q/k/v slice + reshape copies entirely.

    `dropout_mask` enables attention-prob dropout IN KERNEL (the reference's
    Triton kernel can't do p>0 and falls back, `bert_layers.py:166-197`):
    the precomputed keep/scale mask rides along in the stacked-head layout
    and multiplies the post-softmax probs in fwd and the recomputed probs in
    bwd — identical numbers to the XLA ref path for the same bernoulli draw."""
    if qkv.ndim == 5:
        B, S, three, H, D = qkv.shape
        assert three == 3 and H == n_heads
        qkv = qkv.reshape(B, S, 3 * H * D)
    B, S, HD3 = qkv.shape
    D = HD3 // 3 // n_heads
    if not supports_qkv(S, n_heads, D):
        raise ValueError(f"fused_small_attention_qkv: unsupported "
                         f"S={S} H={n_heads} D={D}")
    scale = softmax_scale if softmax_scale is not None else D ** -0.5
    if slopes is None:
        slopes = alibi_slopes(n_heads) if alibi else jnp.zeros((n_heads,),
                                                               jnp.float32)
    mask = None
    if attention_mask is not None:
        mask = attention_mask.astype(jnp.int32)[:, None, :]
    drop = None
    if dropout_mask is not None:
        # [B, H, S, S] → [B, n_t, T·S, S]: heads split h = t·T + j into
        # (tile, sublane-block) — contiguous reshapes, no transpose
        T = max(1, 128 // D)
        n_t = n_heads // T
        drop = dropout_mask.reshape(B, n_t, T * S, S).astype(qkv.dtype)
    return _small_qkv(qkv, mask, drop, slopes, n_heads, causal, alibi, scale)


def supports(S: int, H: int, D: int) -> bool:
    """Shapes this kernel handles: 128-aligned packed lanes, and the
    backward pass's 7 double-buffered [S, H·D] bf16 blocks (plus fp32
    temporaries) fit the ~16 MB VMEM budget at G=1. The tile/packed-QKV
    kernels hold stacked [T·S, S] fp32 temporaries (T heads per 128-lane
    tile), so the temporaries term scales with T."""
    if not (128 % D == 0 or D % 128 == 0):
        # head slices must be lane-aligned: at e.g. D=48 (NTv2-250M,
        # 768/16) every [S, D] sub-tile slice forces a Mosaic relayout —
        # measured 44 ms of a 124 ms step (r5 250m trace) vs ~7 ms on the
        # ref path. Let the XLA reference attention serve these shapes.
        return False
    T = max(1, 128 // D) if 128 % D == 0 else 1
    # v2 precomputes ALL n_t fp32 [T·S, S] tile biases once per invocation
    # and keeps them live across the batch-group loop (`_tile_biases`), so
    # the resident-bias term scales with n_t, not just T (r4 advisor
    # finding) — counted always, conservatively covering alibi+causal.
    n_t = (H * D) // (T * D) if (H * D) % 128 == 0 else 1
    vmem = 8 * 2 * S * H * D * 2 + 6 * T * S * S * 4 + n_t * T * S * S * 4
    return (S % 128 == 0 and (H * D) % 128 == 0 and D <= 256
            and vmem <= VMEM_LIMIT * 2 // 5)


def fused_small_attention(
    q: jax.Array,  # [B, S, H, D]
    k: jax.Array,
    v: jax.Array,
    *,
    attention_mask: Optional[jax.Array] = None,  # [B, S] 1=keep
    alibi: bool = False,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    slopes: Optional[jax.Array] = None,  # explicit per-head ALiBi slopes
) -> jax.Array:
    B, S, H, D = q.shape
    if not supports(S, H, D):
        raise ValueError(f"fused_small_attention: unsupported shape "
                         f"S={S} H={H} D={D}")
    scale = softmax_scale if softmax_scale is not None else D ** -0.5
    if slopes is None:
        slopes = alibi_slopes(H) if alibi else jnp.zeros((H,), jnp.float32)
    mask = None
    if attention_mask is not None:
        mask = attention_mask.astype(jnp.int32)[:, None, :]
    # [B, S, H, D] → [B, S, H·D]: a row-major bitcast, not a transpose
    qf, kf, vf = (x.reshape(B, S, H * D) for x in (q, k, v))
    o = _small(qf, kf, vf, mask, slopes, H, causal, alibi, scale)
    return o.reshape(B, S, H, D)


def tp_small_attention_qkv(
    qkv: jax.Array,  # [B, S, 3, H, D] — H sharded over `head_axis`
    n_heads: int,
    mesh,
    *,
    attention_mask: Optional[jax.Array] = None,
    alibi: bool = False,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    head_axis: str = "tp",
    batch_axes=("dp", "fsdp"),
) -> jax.Array:
    """Small-S attention under tensor parallelism: shard_map over the head
    axis so each shard runs the fused kernel on its own heads (the packed
    lane layout is head-major, so a head shard is a contiguous lane block).
    Global ALiBi slopes are computed once and sharded alongside the heads —
    without this wrapper GSPMD replicates the custom call and all-gathers
    the head dimension (the tp>1 caveat in `ops/attention.py`)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P_

    B, S, three, H, D = qkv.shape
    tp = mesh.shape[head_axis]
    assert H % tp == 0 and H == n_heads
    scale = softmax_scale if softmax_scale is not None else D ** -0.5
    slopes = alibi_slopes(H) if alibi else jnp.zeros((H,), jnp.float32)
    qkv_spec = P_(tuple(batch_axes), None, None, head_axis, None)
    out_spec = P_(tuple(batch_axes), None, head_axis)
    args = [qkv, slopes]
    in_specs = [qkv_spec, P_(head_axis)]
    if attention_mask is not None:
        args.append(attention_mask.astype(jnp.int32))
        in_specs.append(P_(tuple(batch_axes), None))

    def local(qkv_s, sl, *rest):
        ms = rest[0] if rest else None
        H_loc = qkv_s.shape[3]
        return fused_small_attention_qkv(
            qkv_s, H_loc, attention_mask=ms, alibi=alibi, causal=causal,
            softmax_scale=scale, slopes=sl)

    fn = shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                   out_specs=out_spec, check_vma=False)
    # local outputs are [B_loc, S, H_loc·D] → global [B, S, H·D]
    return fn(*args)


def tp_small_attention(
    q: jax.Array,  # [B, S, H, D] — H sharded over `head_axis`
    k: jax.Array,
    v: jax.Array,
    mesh,
    *,
    attention_mask: Optional[jax.Array] = None,
    alibi: bool = False,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    head_axis: str = "tp",
    batch_axes=("dp", "fsdp"),
) -> jax.Array:
    """Separate-q/k/v variant of `tp_small_attention_qkv` (ESM family)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P_

    B, S, H, D = q.shape
    tp = mesh.shape[head_axis]
    assert H % tp == 0
    scale = softmax_scale if softmax_scale is not None else D ** -0.5
    slopes = alibi_slopes(H) if alibi else jnp.zeros((H,), jnp.float32)
    x_spec = P_(tuple(batch_axes), None, head_axis, None)
    args = [q, k, v, slopes]
    in_specs = [x_spec, x_spec, x_spec, P_(head_axis)]
    if attention_mask is not None:
        args.append(attention_mask.astype(jnp.int32))
        in_specs.append(P_(tuple(batch_axes), None))

    def local(qs, ks, vs, sl, *rest):
        ms = rest[0] if rest else None
        return fused_small_attention(
            qs, ks, vs, attention_mask=ms, alibi=alibi, causal=causal,
            softmax_scale=scale, slopes=sl)

    fn = shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                   out_specs=x_spec, check_vma=False)
    return fn(*args)
