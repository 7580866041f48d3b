"""Pallas TPU flash attention with in-kernel ALiBi bias and padding mask.

Replaces the reference's Triton flash-attention-with-bias kernel
(`src/models/sequence/flash_attn_triton.py:767+`, used by DNABERT-2's
`BertUnpadSelfAttention`, `bert_layers.py:183-197`) — the single most
important kernel for the DNABERT-2 workload (SURVEY §2.7 #3).

TPU-native design choices:
  * no unpad/repad and no materialized [B,H,S,S] bias: ALiBi is regenerated
    per tile from per-head slopes, the pad mask is read as a [S] vector —
    O(S²) HBM traffic for the bias disappears.
  * online-softmax streaming over K blocks; [Bq, D] fp32 accumulator in
    registers/VMEM; lse saved for the backward pass.
  * grid (B, H, nq): K/V blocks for a head stay resident in VMEM across all
    q-tiles (pallas only re-fetches when the block index changes).
  * backward = flash-style recomputation: one kernel for dq, one for dk/dv,
    both reusing the saved lse and the delta = rowsum(dO∘O) trick.

Numerics: softmax statistics in fp32; matmuls accumulate fp32 via
`preferred_element_type`. Matches `attention_ref` to bf16 tolerance.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dna_tpu.ops.attention_ref import alibi_slopes
from dna_tpu.ops.attention_small import VMEM_LIMIT

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
NEG_INF = -1e9


def _interpret() -> bool:
    # CPU tests run the kernels in interpreter mode; on TPU they compile.
    return jax.default_backend() != "tpu"


def _bias_tile(slope, qi, kj, bq, bk, causal, alibi, mask_tile, q_off=0,
               k_off=0):
    """fp32 additive bias for the (qi, kj) tile: ALiBi + pad mask + causal.
    `q_off`/`k_off` shift rows/cols to *global* positions when q and/or k/v
    are context-parallel shards of the sequence."""
    rows = q_off + qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    cols = k_off + kj * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    bias = jnp.zeros((bq, bk), jnp.float32)
    if alibi:
        bias = bias - slope * jnp.abs(rows - cols).astype(jnp.float32)
    if mask_tile is not None:
        bias = bias + jnp.where(mask_tile[None, :] != 0, 0.0, NEG_INF)
    if causal:
        bias = jnp.where(rows >= cols, bias, NEG_INF)
    return bias


def _fwd_kernel(slope_ref, qoff_ref, q_ref, k_ref, v_ref, mask_ref, o_ref,
                lse_ref, *, block_k: int, causal: bool, alibi: bool,
                scale: float, seq_len: int):
    bq = q_ref.shape[-2]
    d = q_ref.shape[-1]
    qi = pl.program_id(2)
    slope = slope_ref[pl.program_id(1)]
    q_off = qoff_ref[0]
    k_off = qoff_ref[1]

    q = q_ref[0, 0]  # [Bq, D]
    nk = seq_len // block_k
    if causal:
        # only iterate k blocks whose global col start is <= the last global
        # q row of this tile
        last_row = q_off + (qi + 1) * bq - 1
        nk_run = jnp.clip((last_row - k_off) // block_k + 1, 0, nk)
    else:
        nk_run = nk

    def body(j, carry):
        acc, m, l = carry
        kb = k_ref[0, 0, pl.ds(j * block_k, block_k), :]  # [Bk, D]
        vb = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [Bq, Bk]
        mask_tile = None
        if mask_ref is not None:
            mask_tile = mask_ref[0, 0, pl.ds(j * block_k, block_k)]
        s = s + _bias_tile(slope, qi, j, bq, block_k, causal, alibi, mask_tile,
                           q_off, k_off)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l

    acc = jnp.zeros((bq, d), jnp.float32)
    m = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, nk_run, body, (acc, m, l))

    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0, 0] = m + jnp.log(l_safe)  # [Bq, 1]


def _bwd_dq_kernel(slope_ref, qoff_ref, q_ref, k_ref, v_ref, mask_ref, do_ref,
                   lse_ref, delta_ref, dq_ref, *, block_k: int, causal: bool,
                   alibi: bool, scale: float, seq_len: int):
    bq = q_ref.shape[-2]
    qi = pl.program_id(2)
    slope = slope_ref[pl.program_id(1)]
    q_off = qoff_ref[0]
    k_off = qoff_ref[1]
    q = q_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0]      # [Bq, 1]
    delta = delta_ref[0, 0]  # [Bq, 1]

    nk = seq_len // block_k
    nk_run = (jnp.clip((q_off + (qi + 1) * bq - 1 - k_off) // block_k + 1,
                       0, nk) if causal else nk)

    def body(j, dq):
        kb = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        vb = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        mask_tile = None
        if mask_ref is not None:
            mask_tile = mask_ref[0, 0, pl.ds(j * block_k, block_k)]
        s = s + _bias_tile(slope, qi, j, bq, block_k, causal, alibi, mask_tile,
                           q_off, k_off)
        p = jnp.exp(s - lse)  # [Bq, Bk]
        dp = jax.lax.dot_general(do, vb.astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dq = dq + jax.lax.dot_general(ds.astype(kb.dtype), kb,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dq

    dq = jax.lax.fori_loop(0, nk_run, body, jnp.zeros_like(q, jnp.float32))
    dq_ref[0, 0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(slope_ref, qoff_ref, q_ref, k_ref, v_ref, mask_ref,
                    do_ref, lse_ref, delta_ref, dk_ref, dv_ref, *,
                    block_q: int, causal: bool, alibi: bool, scale: float,
                    q_len: int):
    bk = k_ref.shape[-2]
    d = k_ref.shape[-1]
    kj = pl.program_id(2)
    slope = slope_ref[pl.program_id(1)]
    q_off = qoff_ref[0]
    k_off = qoff_ref[1]
    kb = k_ref[0, 0]  # [Bk, D]
    vb = v_ref[0, 0]
    mask_tile = mask_ref[0, 0, :] if mask_ref is not None else None

    nq = q_len // block_q
    # causal: q blocks whose global rows end before this k block start
    # contribute nothing
    q_start = (jnp.minimum(jnp.maximum(k_off + kj * bk - q_off, 0)
                           // block_q, nq) if causal else 0)

    def body(i, carry):
        dk, dv = carry
        qb = q_ref[0, 0, pl.ds(i * block_q, block_q), :]
        dob = do_ref[0, 0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q), :]    # [Bq, 1]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q), :]
        s = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + _bias_tile(slope, i, kj, block_q, bk, causal, alibi, mask_tile,
                           q_off, k_off)
        p = jnp.exp(s - lse)  # [Bq, Bk]
        dv = dv + jax.lax.dot_general(p, dob, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(dob, vb.astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)  # [Bq, Bk]
        dk = dk + jax.lax.dot_general(ds, qb.astype(jnp.float32),
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    dk = jnp.zeros((bk, d), jnp.float32)
    dv = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(q_start, nq, body, (dk, dv))
    dk_ref[0, 0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _choose_blocks(q_len: int, kv_len: int):
    bq = min(DEFAULT_BLOCK_Q, q_len)
    bk = min(DEFAULT_BLOCK_K, kv_len)
    return bq, bk


def _stream_threshold() -> int:
    """Sequence length at/above which K/V (and q in the dk/dv kernel) are
    streamed through a fourth grid dimension instead of kept whole in VMEM.
    Whole-in-VMEM K/V caps out around S≈32k at D=64 bf16 (VERDICT weak #5:
    ≥16 MB for K+V alone at S=64k); streaming removes the cap so single-chip
    attention reaches the reference's long-context eval lengths
    (`configs/evals/soft_prompting_genomics.yaml:21`, 160k+)."""
    import os

    return int(os.environ.get("DNA_TPU_ATTN_STREAM_S", "16384"))


# ---------------------------------------------------------------------------
# Streaming (4-D grid) kernels for long sequences. The online-softmax state
# (acc, m, l) lives in VMEM scratch and persists across the innermost k-block
# grid dimension; outputs are written on the last k step. Same math as the
# resident kernels above — oracle-tested against them and attention_ref.
# ---------------------------------------------------------------------------


def _fwd_kernel_stream(slope_ref, qoff_ref, q_ref, k_ref, v_ref, mask_ref,
                       o_ref, lse_ref, acc_ref, m_ref, l_ref, *, causal: bool,
                       alibi: bool, scale: float):
    bq = q_ref.shape[-2]
    bk = k_ref.shape[-2]
    qi = pl.program_id(2)
    kj = pl.program_id(3)
    nk = pl.num_programs(3)
    slope = slope_ref[pl.program_id(1)]
    q_off = qoff_ref[0]
    k_off = qoff_ref[1]

    @pl.when(kj == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    # causal: blocks entirely above the diagonal contribute nothing
    def _compute():
        q = q_ref[0, 0]
        kb = k_ref[0, 0]
        vb = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        mask_tile = mask_ref[0, 0, :] if mask_ref is not None else None
        s = s + _bias_tile(slope, qi, kj, bq, bk, causal, alibi, mask_tile,
                           q_off, k_off)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    if causal:
        pl.when(q_off + (qi + 1) * bq - 1 >= k_off + kj * bk)(_compute)
    else:
        _compute()

    @pl.when(kj == nk - 1)
    def _():
        l = l_ref[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0] = m_ref[:] + jnp.log(l_safe)


def _bwd_dq_kernel_stream(slope_ref, qoff_ref, q_ref, k_ref, v_ref, mask_ref,
                          do_ref, lse_ref, delta_ref, dq_ref, dq_acc_ref, *,
                          causal: bool, alibi: bool, scale: float):
    bq = q_ref.shape[-2]
    bk = k_ref.shape[-2]
    qi = pl.program_id(2)
    kj = pl.program_id(3)
    nk = pl.num_programs(3)
    slope = slope_ref[pl.program_id(1)]
    q_off = qoff_ref[0]
    k_off = qoff_ref[1]

    @pl.when(kj == 0)
    def _():
        dq_acc_ref[:] = jnp.zeros_like(dq_acc_ref)

    def _compute():
        q = q_ref[0, 0]
        kb = k_ref[0, 0]
        vb = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        mask_tile = mask_ref[0, 0, :] if mask_ref is not None else None
        s = s + _bias_tile(slope, qi, kj, bq, bk, causal, alibi, mask_tile,
                           q_off, k_off)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, vb.astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dq_acc_ref[:] = dq_acc_ref[:] + jax.lax.dot_general(
            ds.astype(kb.dtype), kb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if causal:
        pl.when(q_off + (qi + 1) * bq - 1 >= k_off + kj * bk)(_compute)
    else:
        _compute()

    @pl.when(kj == nk - 1)
    def _():
        dq_ref[0, 0] = (dq_acc_ref[:] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel_stream(slope_ref, qoff_ref, q_ref, k_ref, v_ref, mask_ref,
                           do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                           dk_acc_ref, dv_acc_ref, *, causal: bool,
                           alibi: bool, scale: float):
    bk = k_ref.shape[-2]
    bq = q_ref.shape[-2]
    kj = pl.program_id(2)
    i = pl.program_id(3)
    nq = pl.num_programs(3)
    slope = slope_ref[pl.program_id(1)]
    q_off = qoff_ref[0]
    k_off = qoff_ref[1]

    @pl.when(i == 0)
    def _():
        dk_acc_ref[:] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[:] = jnp.zeros_like(dv_acc_ref)

    def _compute():
        kb = k_ref[0, 0]
        vb = v_ref[0, 0]
        qb = q_ref[0, 0]
        dob = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]
        mask_tile = mask_ref[0, 0, :] if mask_ref is not None else None
        s = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + _bias_tile(slope, i, kj, bq, bk, causal, alibi, mask_tile,
                           q_off, k_off)
        p = jnp.exp(s - lse)
        dv_acc_ref[:] = dv_acc_ref[:] + jax.lax.dot_general(
            p, dob, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(dob, vb.astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_acc_ref[:] = dk_acc_ref[:] + jax.lax.dot_general(
            ds, qb.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if causal:
        pl.when(q_off + (i + 1) * bq - 1 >= k_off + kj * bk)(_compute)
    else:
        _compute()

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0, 0] = (dk_acc_ref[:] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc_ref[:].astype(dv_ref.dtype)


def _fwd_impl_stream(q, k, v, mask, slopes, q_offset, *, causal, alibi,
                     scale):
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    if mask is not None and mask.ndim == 2:
        mask = mask[:, None, :]
    bq, bk = _choose_blocks(Sq, Sk)
    grid = (B, H, Sq // bq, Sk // bk)
    qspec = pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j, *_: (b, h, i, 0))
    kvspec = pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j, *_: (b, h, j, 0))
    in_specs = [qspec, kvspec, kvspec]
    inputs = [q, k, v]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, bk), lambda b, h, i, j, *_: (b, 0, j)))
        inputs.append(mask)
    kernel = functools.partial(_fwd_kernel_stream, causal=causal, alibi=alibi,
                               scale=scale)
    if mask is None:
        kernel = functools.partial(_mask_none_wrapper, kernel, 5)
    out_specs = (
        pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j, *_: (b, h, i, 0)),
        pl.BlockSpec((1, 1, bq, 1), lambda b, h, i, j, *_: (b, h, i, 0)),
    )
    o, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=grid, in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32),
                            pltpu.VMEM((bq, 1), jnp.float32),
                            pltpu.VMEM((bq, 1), jnp.float32)]),
        out_shape=(jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
                   jax.ShapeDtypeStruct((B, H, Sq, 1), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(slopes, q_offset, *inputs)
    return o, lse


def _bwd_impl_stream(q, k, v, mask, slopes, q_offset, o, lse, do, *, causal,
                     alibi, scale, dlse=None):
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    if mask is not None and mask.ndim == 2:
        mask = mask[:, None, :]
    bq, bk = _choose_blocks(Sq, Sk)
    delta = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1,
                    keepdims=True)
    if dlse is not None:
        delta = delta - dlse.astype(jnp.float32)

    qtile = pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j, *_: (b, h, i, 0))
    vtile = pl.BlockSpec((1, 1, bq, 1), lambda b, h, i, j, *_: (b, h, i, 0))
    ktile = pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j, *_: (b, h, j, 0))
    mask_k = pl.BlockSpec((1, 1, bk), lambda b, h, i, j, *_: (b, 0, j))

    in_specs = [qtile, ktile, ktile]
    inputs = [q, k, v]
    if mask is not None:
        in_specs.append(mask_k)
        inputs.append(mask)
    in_specs += [qtile, vtile, vtile]
    kernel = functools.partial(_bwd_dq_kernel_stream, causal=causal,
                               alibi=alibi, scale=scale)
    if mask is None:
        kernel = functools.partial(_mask_none_wrapper, kernel, 5)
    dq = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(B, H, Sq // bq, Sk // bk),
            in_specs=in_specs, out_specs=qtile,
            scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)]),
        out_shape=jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(slopes, q_offset, *inputs, do, lse, delta)

    # dk/dv: k tiles on dim 2, q streamed on dim 3
    qstream = pl.BlockSpec((1, 1, bq, D), lambda b, h, j, i, *_: (b, h, i, 0))
    vstream = pl.BlockSpec((1, 1, bq, 1), lambda b, h, j, i, *_: (b, h, i, 0))
    kfixed = pl.BlockSpec((1, 1, bk, D), lambda b, h, j, i, *_: (b, h, j, 0))
    mask_fixed = pl.BlockSpec((1, 1, bk), lambda b, h, j, i, *_: (b, 0, j))
    in_specs = [qstream, kfixed, kfixed]
    inputs = [q, k, v]
    if mask is not None:
        in_specs.append(mask_fixed)
        inputs.append(mask)
    in_specs += [qstream, vstream, vstream]
    kernel = functools.partial(_bwd_dkv_kernel_stream, causal=causal,
                               alibi=alibi, scale=scale)
    if mask is None:
        kernel = functools.partial(_mask_none_wrapper, kernel, 5)
    dk, dv = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(B, H, Sk // bk, Sq // bq),
            in_specs=in_specs, out_specs=(kfixed, kfixed),
            scratch_shapes=[pltpu.VMEM((bk, D), jnp.float32),
                            pltpu.VMEM((bk, D), jnp.float32)]),
        out_shape=(jax.ShapeDtypeStruct((B, H, Sk, D), k.dtype),
                   jax.ShapeDtypeStruct((B, H, Sk, D), v.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(slopes, q_offset, *inputs, do, lse, delta)
    return dq, dk, dv


def _fwd_impl(q, k, v, mask, slopes, q_offset, *, causal, alibi, scale):
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    if mask is not None and mask.ndim == 2:
        # [B, 1, S]: Mosaic requires the block's second-to-last dim to be
        # 8-divisible or equal to the array dim — a unit dim satisfies that
        mask = mask[:, None, :]
    if max(Sq, Sk) >= _stream_threshold():
        return _fwd_impl_stream(q, k, v, mask, slopes, q_offset,
                                causal=causal, alibi=alibi, scale=scale)
    bq, bk = _choose_blocks(Sq, Sk)
    grid = (B, H, Sq // bq)
    qspec = pl.BlockSpec((1, 1, bq, D), lambda b, h, i, *_: (b, h, i, 0))
    kvspec = pl.BlockSpec((1, 1, Sk, D), lambda b, h, i, *_: (b, h, 0, 0))
    in_specs = [qspec, kvspec, kvspec]
    inputs = [q, k, v]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, Sk), lambda b, h, i, *_: (b, 0, 0)))
        inputs.append(mask)
    kernel = functools.partial(
        _fwd_kernel, block_k=bk, causal=causal, alibi=alibi, scale=scale,
        seq_len=Sk)
    if mask is None:
        kernel = functools.partial(_mask_none_wrapper, kernel, 5)
    # lse kept as [B, H, S, 1]: the trailing unit dim satisfies mosaic's
    # block-shape constraint without jax's 128-lane broadcast workaround.
    out_shape = (
        jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
        jax.ShapeDtypeStruct((B, H, Sq, 1), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, 1, bq, D), lambda b, h, i, *_: (b, h, i, 0)),
        pl.BlockSpec((1, 1, bq, 1), lambda b, h, i, *_: (b, h, i, 0)),
    )
    o, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=grid, in_specs=in_specs,
            out_specs=out_specs),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(slopes, q_offset, *inputs)
    return o, lse


def _mask_none_wrapper(kernel, mask_pos, *refs, **kw):
    """Insert mask_ref=None at position `mask_pos` of the ref list."""
    refs = list(refs)
    refs.insert(mask_pos, None)
    return kernel(*refs, **kw)


def _bwd_impl(q, k, v, mask, slopes, q_offset, o, lse, do, *, causal, alibi,
              scale, dlse=None):
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    if mask is not None and mask.ndim == 2:
        mask = mask[:, None, :]
    if max(Sq, Sk) >= _stream_threshold():
        return _bwd_impl_stream(q, k, v, mask, slopes, q_offset, o, lse, do,
                                causal=causal, alibi=alibi, scale=scale,
                                dlse=dlse)
    bq, bk = _choose_blocks(Sq, Sk)
    delta = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1,
                    keepdims=True)  # [B, H, Sq, 1]
    if dlse is not None:
        # lse cotangent folds into delta: ds = p·(dp − delta + dlse)
        delta = delta - dlse.astype(jnp.float32)

    kv_full = pl.BlockSpec((1, 1, Sk, D), lambda b, h, i, *_: (b, h, 0, 0))
    q_full = pl.BlockSpec((1, 1, Sq, D), lambda b, h, i, *_: (b, h, 0, 0))
    vec_full = pl.BlockSpec((1, 1, Sq, 1), lambda b, h, i, *_: (b, h, 0, 0))
    qtile = pl.BlockSpec((1, 1, bq, D), lambda b, h, i, *_: (b, h, i, 0))
    vtile = pl.BlockSpec((1, 1, bq, 1), lambda b, h, i, *_: (b, h, i, 0))
    ktile = pl.BlockSpec((1, 1, bk, D), lambda b, h, j, *_: (b, h, j, 0))
    mask_spec = pl.BlockSpec((1, 1, Sk), lambda b, h, i, *_: (b, 0, 0))

    # dq: tile q, stream K/V
    in_specs = [qtile, kv_full, kv_full]
    inputs = [q, k, v]
    if mask is not None:
        in_specs.append(mask_spec)
        inputs.append(mask)
    in_specs += [qtile, vtile, vtile]
    kernel = functools.partial(_bwd_dq_kernel, block_k=bk, causal=causal,
                               alibi=alibi, scale=scale, seq_len=Sk)
    if mask is None:
        kernel = functools.partial(_mask_none_wrapper, kernel, 5)
    dq = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(B, H, Sq // bq),
            in_specs=in_specs, out_specs=qtile),
        out_shape=jax.ShapeDtypeStruct((B, H, Sq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(slopes, q_offset, *inputs, do, lse, delta)

    # dk/dv: tile K/V, stream q
    in_specs = [q_full, ktile, ktile]
    inputs = [q, k, v]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, bk), lambda b, h, j, *_: (b, 0, j)))
        inputs.append(mask)
    in_specs += [q_full, vec_full, vec_full]
    kernel = functools.partial(_bwd_dkv_kernel, block_q=bq, causal=causal,
                               alibi=alibi, scale=scale, q_len=Sq)
    if mask is None:
        kernel = functools.partial(_mask_none_wrapper, kernel, 5)
    dk, dv = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(B, H, Sk // bk),
            in_specs=in_specs, out_specs=(ktile, ktile)),
        out_shape=(jax.ShapeDtypeStruct((B, H, Sk, D), k.dtype),
                   jax.ShapeDtypeStruct((B, H, Sk, D), v.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(slopes, q_offset, *inputs, do, lse, delta)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _flash(q, k, v, mask, slopes, q_offset, causal, alibi, scale):
    o, _ = _fwd_impl(q, k, v, mask, slopes, q_offset, causal=causal,
                     alibi=alibi, scale=scale)
    return o


def _flash_fwd(q, k, v, mask, slopes, q_offset, causal, alibi, scale):
    o, lse = _fwd_impl(q, k, v, mask, slopes, q_offset, causal=causal,
                       alibi=alibi, scale=scale)
    return o, (q, k, v, mask, slopes, q_offset, o, lse)


def _zero_ct(x):
    """Zero cotangent matching JAX's tangent type (float0 for int primals —
    plain int zeros_like is rejected by stricter custom_vjp checking)."""
    if x is None:
        return None
    from jax.custom_derivatives import zero_from_primal

    return zero_from_primal(x)


def _flash_bwd(causal, alibi, scale, res, do):
    q, k, v, mask, slopes, q_offset, o, lse = res
    dq, dk, dv = _bwd_impl(q, k, v, mask, slopes, q_offset, o, lse, do,
                           causal=causal, alibi=alibi, scale=scale)
    return dq, dk, dv, _zero_ct(mask), jnp.zeros_like(slopes), _zero_ct(q_offset)


_flash.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# (o, lse)-returning variant — the building block for ring attention.
#
# Exposing lse lets partial attentions over K/V *chunks* be merged in plain
# (differentiable) JAX: o = Σ_c o_c·exp(lse_c − lse) with lse = logsumexp_c.
# The only extra autodiff plumbing is the lse cotangent: for
# L = f(o, lse), dL/ds_ij = p_ij·(dp_ij − delta_i + dlse_i), so the bwd
# kernels are reused verbatim with delta := rowsum(o∘do) − dlse.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _flash_lse(q, k, v, mask, slopes, offsets, causal, alibi, scale):
    return _fwd_impl(q, k, v, mask, slopes, offsets, causal=causal,
                     alibi=alibi, scale=scale)


def _flash_lse_fwd(q, k, v, mask, slopes, offsets, causal, alibi, scale):
    o, lse = _fwd_impl(q, k, v, mask, slopes, offsets, causal=causal,
                       alibi=alibi, scale=scale)
    return (o, lse), (q, k, v, mask, slopes, offsets, o, lse)


def _flash_lse_bwd(causal, alibi, scale, res, cts):
    do, dlse = cts
    q, k, v, mask, slopes, offsets, o, lse = res
    dq, dk, dv = _bwd_impl(q, k, v, mask, slopes, offsets, o, lse, do,
                           causal=causal, alibi=alibi, scale=scale,
                           dlse=dlse)
    return (dq, dk, dv, _zero_ct(mask), jnp.zeros_like(slopes),
            _zero_ct(offsets))


_flash_lse.defvjp(_flash_lse_fwd, _flash_lse_bwd)


def ring_flash_attention(
    q: jax.Array,  # [B, S, H, D] — S sharded over `sp_axis`
    k: jax.Array,
    v: jax.Array,
    mesh,
    *,
    attention_mask: Optional[jax.Array] = None,
    alibi: bool = False,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    sp_axis: str = "sp",
    batch_axes=("dp", "fsdp"),
    head_axis: str = "tp",
) -> jax.Array:
    """Ring attention over the sp axis: K/V chunks rotate around the ring via
    ppermute while each shard accumulates its partial attention, merged by
    the (o, lse) online-softmax rule. Memory stays O(S/sp) per chip (the
    all-gather variant peaks at O(S)); autodiff runs through the plain-JAX
    merge, the ppermutes, and the `_flash_lse` custom_vjp per chunk."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P_

    B, S, H, D = q.shape
    sp = mesh.shape[sp_axis]
    if (S // sp) % 128 != 0:
        raise ValueError(f"local length {S}/{sp} must be a multiple of 128")
    scale = softmax_scale if softmax_scale is not None else D ** -0.5
    slopes = alibi_slopes(H) if alibi else jnp.zeros((H,), jnp.float32)
    qkv_spec = P_(tuple(batch_axes), sp_axis, head_axis, None)
    args = [q, k, v, slopes]
    in_specs = [qkv_spec, qkv_spec, qkv_spec, P_(head_axis)]
    if attention_mask is not None:
        args.append(attention_mask.astype(jnp.int32))
        in_specs.append(P_(tuple(batch_axes), sp_axis))
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    def local(qs, ks, vs, sl, *rest):
        ms = rest[0] if rest else None
        S_loc = qs.shape[1]
        idx = jax.lax.axis_index(sp_axis)
        q_off = (idx * S_loc).astype(jnp.int32)
        qt = qs.swapaxes(1, 2)
        kt, vt = ks.swapaxes(1, 2), vs.swapaxes(1, 2)
        B_, H_, SL, _ = qt.shape

        # lax.scan over the ring (not a Python loop): HLO size and compile
        # time stay O(1) in sp instead of O(sp) (VERDICT r2 weak #8). The
        # online-softmax merge starts from the empty state (o=0, lse=-inf),
        # which absorbs the first chunk exactly; one trailing ppermute is
        # traded for the uniform body.
        def body(carry, step):
            kt, vt, mt, o_acc, lse_acc = carry
            # after `step` rotations we hold the chunk of shard (idx - step)
            src = (idx - step) % sp
            k_off = (src * S_loc).astype(jnp.int32)
            offsets = jnp.stack([q_off, k_off])
            o_p, lse_p = _flash_lse(qt, kt, vt, mt, sl, offsets, causal,
                                    alibi, scale)
            lse_new = jnp.logaddexp(lse_acc, lse_p)
            # fully-masked rows have lse = -inf on both sides
            lse_safe = jnp.where(jnp.isinf(lse_new), 0.0, lse_new)
            w_a = jnp.exp(lse_acc - lse_safe)
            w_p = jnp.exp(lse_p - lse_safe)
            o_acc = o_acc * w_a + o_p.astype(jnp.float32) * w_p
            kt = jax.lax.ppermute(kt, sp_axis, perm)
            vt = jax.lax.ppermute(vt, sp_axis, perm)
            if mt is not None:
                mt = jax.lax.ppermute(mt, sp_axis, perm)
            return (kt, vt, mt, o_acc, lse_new), None

        o0 = jnp.zeros(qt.shape, jnp.float32)
        lse0 = jnp.full((B_, H_, SL, 1), -jnp.inf, jnp.float32)
        carry0 = (kt, vt, ms, o0, lse0)
        (kt, vt, ms, o_acc, lse_acc), _ = jax.lax.scan(
            body, carry0, jnp.arange(sp, dtype=jnp.int32))
        return o_acc.astype(qs.dtype).swapaxes(1, 2)

    fn = shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                   out_specs=qkv_spec, check_vma=False)
    return fn(*args)


def context_parallel_flash_attention(
    q: jax.Array,  # [B, S, H, D] — S sharded over `sp_axis`
    k: jax.Array,
    v: jax.Array,
    mesh,
    *,
    attention_mask: Optional[jax.Array] = None,  # [B, S] 1=keep
    alibi: bool = False,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    sp_axis: str = "sp",
    batch_axes=("dp", "fsdp"),
    head_axis: str = "tp",
) -> jax.Array:
    """Flash attention under sequence/context parallelism (SURVEY §5.7 — a
    new capability vs the reference, whose SP splits only norm/dropout
    regions between TP ranks, `long_conv_lm.py:516-534`).

    shard_map over the sp mesh axis: each shard keeps its local q tile,
    all-gathers K/V (bf16, rides ICI; autodiff turns the gather into a
    reduce-scatter for dK/dV), and runs the Pallas kernel with a global
    `q_offset` so ALiBi distances and the causal frontier are exact. XLA
    cannot partition a pallas_call along S by itself — without this wrapper
    it replicates the whole sequence on every sp shard.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    B, S, H, D = q.shape
    sp = mesh.shape[sp_axis]
    if (S // sp) % 128 != 0:
        raise ValueError(f"local q length {S}/{sp} must be a multiple of 128")
    scale = softmax_scale if softmax_scale is not None else D ** -0.5
    slopes = alibi_slopes(H) if alibi else jnp.zeros((H,), jnp.float32)
    qkv_spec = P(tuple(batch_axes), sp_axis, head_axis, None)
    args = [q, k, v, slopes]
    in_specs = [qkv_spec, qkv_spec, qkv_spec, P(head_axis)]
    if attention_mask is not None:
        args.append(attention_mask.astype(jnp.int32))
        in_specs.append(P(tuple(batch_axes), sp_axis))

    def local(qs, ks, vs, sl, *rest):
        ms = rest[0] if rest else None
        kg = jax.lax.all_gather(ks, sp_axis, axis=1, tiled=True)
        vg = jax.lax.all_gather(vs, sp_axis, axis=1, tiled=True)
        mg = (jax.lax.all_gather(ms, sp_axis, axis=1, tiled=True)
              if ms is not None else None)
        off = (jax.lax.axis_index(sp_axis) * qs.shape[1]).astype(jnp.int32)
        offsets = jnp.stack([off, jnp.int32(0)])
        qt, kt, vt = (x.swapaxes(1, 2) for x in (qs, kg, vg))
        o = _flash(qt, kt, vt, mg, sl, offsets, causal, alibi, scale)
        return o.swapaxes(1, 2)

    fn = shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                   out_specs=qkv_spec, check_vma=False)
    return fn(*args)


def flash_attention(
    q: jax.Array,  # [B, Sq, H, D]
    k: jax.Array,  # [B, Sk, H, D]  (Sk == Sq unless context-parallel)
    v: jax.Array,
    *,
    attention_mask: Optional[jax.Array] = None,  # [B, Sk] 1=keep
    alibi: bool = False,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    q_offset: Optional[jax.Array] = None,  # global position of q row 0
) -> jax.Array:
    B, S, H, D = q.shape
    if S % 128 != 0 or k.shape[1] % 128 != 0:
        raise ValueError(f"flash_attention requires S % 128 == 0, got {S}")
    scale = softmax_scale if softmax_scale is not None else D ** -0.5
    # [B, S, H, D] → [B, H, S, D]
    qt, kt, vt = (x.swapaxes(1, 2) for x in (q, k, v))
    slopes = alibi_slopes(H) if alibi else jnp.zeros((H,), jnp.float32)
    mask = None
    if attention_mask is not None:
        mask = attention_mask.astype(jnp.int32)
    if q_offset is None:
        offsets = jnp.zeros((2,), jnp.int32)
    else:
        offsets = jnp.stack([jnp.asarray(q_offset, jnp.int32).reshape(()),
                             jnp.int32(0)])
    o = _flash(qt, kt, vt, mask, slopes, offsets, causal, alibi, scale)
    return o.swapaxes(1, 2)
