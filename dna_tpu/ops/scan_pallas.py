"""Pallas TPU selective-scan kernel (Mamba recurrence).

Replaces the XLA chunked associative scan for the hot path: the generic
combine materializes [B, L, D, N] fp32 intermediates in HBM and is
bandwidth-bound (measured 2.8 s/step for 1.4M-param Caduceus at B=64
L=1024). This kernel keeps the [N, dtile] state in VMEM and streams the
sequence once, like the reference's CUDA `selective_scan_fn`
(`mamba_ssm`, SURVEY §2.7 #4).

Kernel algebra (per (batch, d-tile) grid cell, state h: [N, dtile]):
    h   = exp(A ∘ dt_t) ∘ h + bᵗ_t ⊗ (dt_t ∘ x_t)     (outer product, MXU)
    y_t = c_t · h                                      ([1,N] @ [N,dtile])
All per-step tensors are loaded with dynamic *sublane* slices (allowed by
Mosaic); the N-coupling uses tiny dot_generals instead of lane-dim dynamic
indexing or transposes (which Mosaic cannot prove aligned).

Backward: custom_vjp with a second kernel that re-runs the forward
recurrence per CKPT-step segment from saved checkpoints, then scans the
segment in reverse accumulating du/ddelta/dA/dB/dC (reverse recurrence
g_t = exp(A∘dt_{t+1}) ∘ g_{t+1} + c_t ⊗ dy_t).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_DTILE = 512   # channels per grid cell (wider = fewer sequential grid cells)
UNROLL = 4        # steps unrolled per loop iteration (amortizes loop overhead)
CKPT = 128        # forward-state checkpoint interval for the backward pass
_VMEM_BUDGET = 11 * 1024 * 1024  # stay under the 16MB scoped-vmem limit


def _pick_dtile(L: int, N: int, Dp: int, n_stream: int, scratch_steps: int
                ) -> int:
    """Largest dtile (multiple of 128, ≤ MAX_DTILE) whose estimated VMEM
    footprint fits: n_stream double-buffered [L, dtile] f32 blocks + scan
    scratch/checkpoint [scratch_steps, N, dtile]."""
    for dtile in (MAX_DTILE, 384, 256, 128):
        if dtile > Dp or Dp % dtile or dtile % 128:
            continue
        est = (n_stream * L * dtile * 4 * 2 +
               scratch_steps * N * dtile * 4 +
               4 * L * N * 4 * 2)
        if est <= _VMEM_BUDGET:
            return dtile
    return 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _outer(row_n, row_d):
    """[1, N] ⊗ [1, D] → [N, D] via dot_general (contracts the unit dim)."""
    return jax.lax.dot_general(
        row_n, row_d, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _fwd_kernel(u_ref, dt_ref, A_ref, B_ref, C_ref, h0_ref, y_ref, hckpt_ref,
                hfin_ref, *, L: int):
    """u_ref/dt_ref/y_ref: [1, L, dtile] (dt post-softplus, fp32);
    A_ref: [N, dtile]; B_ref/C_ref: [1, L, N]; h0_ref/hfin_ref: [1, N, dtile]
    (initial/final state — carries across context-parallel shards);
    hckpt_ref: [1, L//CKPT, N, dtile]."""
    N = A_ref.shape[0]
    dtile = A_ref.shape[1]
    A = A_ref[:]

    def body(t0, h):
        t_base = t0 * UNROLL
        for k in range(UNROLL):
            t = t_base + k

            @pl.when(t % CKPT == 0)
            def _(h=h, t=t):
                hckpt_ref[0, t // CKPT] = h

            dt = dt_ref[0, pl.ds(t, 1), :]          # [1, dtile]
            x = u_ref[0, pl.ds(t, 1), :]            # [1, dtile]
            brow = B_ref[0, pl.ds(t, 1), :]         # [1, N]
            crow = C_ref[0, pl.ds(t, 1), :]         # [1, N]
            dA = jnp.exp(A * dt)                    # [N, dtile]
            h = dA * h + _outer(brow, dt * x)       # [N, dtile]
            y = jax.lax.dot_general(                # [1, dtile] = crow @ h
                crow, h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y_ref[0, pl.ds(t, 1), :] = y
        return h

    h_last = jax.lax.fori_loop(0, L // UNROLL, body, h0_ref[0])
    hfin_ref[0] = h_last


def _bwd_kernel(u_ref, dt_ref, A_ref, B_ref, C_ref, hckpt_ref, dy_ref,
                ghfin_ref, du_ref, ddt_ref, dA_ref, dB_ref, dC_ref, dh0_ref,
                hseg_ref, *, L: int):
    """Reverse scan per (batch, d-tile); hseg_ref scratch [CKPT, N, dtile]
    holds the state ENTERING each step of the current segment. ghfin_ref is
    the cotangent of the final state (nonzero under context parallelism);
    dh0_ref receives the cotangent of the initial state."""
    N = A_ref.shape[0]
    A = A_ref[:]
    n_seg = L // CKPT

    def seg_loop(si, carry):
        g, dA_acc = carry  # g = dL/dh entering the step AFTER this segment
        seg = n_seg - 1 - si
        base = seg * CKPT

        def fwd_body(i0, h):
            for k in range(UNROLL):
                i = i0 * UNROLL + k
                hseg_ref[i] = h
                t = base + i
                dt = dt_ref[0, pl.ds(t, 1), :]
                x = u_ref[0, pl.ds(t, 1), :]
                brow = B_ref[0, pl.ds(t, 1), :]
                dA_t = jnp.exp(A * dt)
                h = dA_t * h + _outer(brow, dt * x)
            return h

        h0 = hckpt_ref[0, seg]
        jax.lax.fori_loop(0, CKPT // UNROLL, fwd_body, h0)

        def bwd_body(j0, carry):
          g, dA_acc = carry
          for k in range(UNROLL):
            j = j0 * UNROLL + k
            i = CKPT - 1 - j
            t = base + i
            dt = dt_ref[0, pl.ds(t, 1), :]        # [1, dtile]
            x = u_ref[0, pl.ds(t, 1), :]
            brow = B_ref[0, pl.ds(t, 1), :]       # [1, N]
            crow = C_ref[0, pl.ds(t, 1), :]
            dy = dy_ref[0, pl.ds(t, 1), :]        # [1, dtile]
            h_prev = hseg_ref[i]
            dA_t = jnp.exp(A * dt)                # [N, dtile]
            h_t = dA_t * h_prev + _outer(brow, dt * x)

            gh = g + _outer(crow, dy)             # dL/dh_t, [N, dtile]
            # dC_t [1, N] = dy · h_tᵀ (contract dtile)
            dC_ref[0, 0, pl.ds(t, 1), :] = jax.lax.dot_general(
                dy, h_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            # dB_t [1, N] = (dt∘x) · ghᵀ
            dB_ref[0, 0, pl.ds(t, 1), :] = jax.lax.dot_general(
                dt * x, gh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            # du_t [1, dtile] = dt ∘ (brow @ gh)
            b_gh = jax.lax.dot_general(
                brow, gh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            du_ref[0, pl.ds(t, 1), :] = dt * b_gh
            # d(dt)_t = Σ_n gh∘dA∘A∘h_prev + x ∘ (brow @ gh)
            term1 = jnp.sum(gh * dA_t * A * h_prev, axis=0, keepdims=True)
            ddt_ref[0, pl.ds(t, 1), :] = term1 + x * b_gh
            dA_acc = dA_acc + gh * dA_t * h_prev * dt
            g = gh * dA_t
          return g, dA_acc

        return jax.lax.fori_loop(0, CKPT // UNROLL, bwd_body, (g, dA_acc))

    g0 = ghfin_ref[0]
    dA0 = jnp.zeros_like(A)
    g_final, dA_acc = jax.lax.fori_loop(0, n_seg, seg_loop, (g0, dA0))
    dA_ref[0, 0] = dA_acc
    dh0_ref[0] = g_final


def _pad_d(x, dp):
    d = x.shape[-1]
    if d == dp:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, dp - d)]
    return jnp.pad(x, pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _scan_core(u, dt, A, Bm, Cm, h0, L):
    """u/dt: [B, L, Dp] fp32 (dt post-softplus); A: [N, Dp]; Bm/Cm: [B,L,N];
    h0: [B, N, Dp] initial state. Returns (y [B,L,Dp], h_fin [B,N,Dp])."""
    y, _, hfin = _scan_fwd_impl(u, dt, A, Bm, Cm, h0, L)
    return y, hfin


def _scan_fwd_impl(u, dt, A, Bm, Cm, h0, L):
    B, _, Dp = u.shape
    N = A.shape[0]
    dtile = _pick_dtile(L, N, Dp, n_stream=3, scratch_steps=L // CKPT)
    grid = (B, Dp // dtile)
    dspec = pl.BlockSpec((1, L, dtile), lambda b, d: (b, 0, d))
    nspec = pl.BlockSpec((1, L, N), lambda b, d: (b, 0, 0))
    aspec = pl.BlockSpec((N, dtile), lambda b, d: (0, d))
    hspec = pl.BlockSpec((1, N, dtile), lambda b, d: (b, 0, d))
    y, hckpt, hfin = pl.pallas_call(
        functools.partial(_fwd_kernel, L=L),
        grid=grid,
        in_specs=[dspec, dspec, aspec, nspec, nspec, hspec],
        out_specs=(dspec,
                   pl.BlockSpec((1, L // CKPT, N, dtile),
                                lambda b, d: (b, 0, 0, d)),
                   hspec),
        out_shape=(jax.ShapeDtypeStruct((B, L, Dp), jnp.float32),
                   jax.ShapeDtypeStruct((B, L // CKPT, N, Dp), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, Dp), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=_interpret(),
    )(u, dt, A, Bm, Cm, h0)
    return y, hckpt, hfin


def _scan_core_fwd(u, dt, A, Bm, Cm, h0, L):
    y, hckpt, hfin = _scan_fwd_impl(u, dt, A, Bm, Cm, h0, L)
    return (y, hfin), (u, dt, A, Bm, Cm, hckpt)


def _scan_core_bwd(L, res, cts):
    dy, dhfin = cts
    u, dt, A, Bm, Cm, hckpt = res
    B, _, Dp = u.shape
    N = A.shape[0]
    dtile = _pick_dtile(L, N, Dp, n_stream=5,
                        scratch_steps=CKPT + L // CKPT)
    n_tiles = Dp // dtile
    grid = (B, n_tiles)
    dspec = pl.BlockSpec((1, L, dtile), lambda b, d: (b, 0, d))
    nspec = pl.BlockSpec((1, L, N), lambda b, d: (b, 0, 0))
    aspec = pl.BlockSpec((N, dtile), lambda b, d: (0, d))
    hspec = pl.BlockSpec((1, N, dtile), lambda b, d: (b, 0, d))
    ckspec = pl.BlockSpec((1, L // CKPT, N, dtile), lambda b, d: (b, 0, 0, d))
    # dA per (b, tile); dB/dC written per tile then reduced over tiles.
    du, ddt, dA_pb, dB_pt, dC_pt, dh0 = pl.pallas_call(
        functools.partial(_bwd_kernel, L=L),
        grid=grid,
        in_specs=[dspec, dspec, aspec, nspec, nspec, ckspec, dspec, hspec],
        out_specs=(
            dspec, dspec,
            pl.BlockSpec((1, 1, N, dtile), lambda b, d: (b, 0, 0, d)),
            pl.BlockSpec((1, 1, L, N), lambda b, d: (b, d, 0, 0)),
            pl.BlockSpec((1, 1, L, N), lambda b, d: (b, d, 0, 0)),
            hspec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, L, Dp), jnp.float32),
            jax.ShapeDtypeStruct((B, L, Dp), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, N, Dp), jnp.float32),
            jax.ShapeDtypeStruct((B, n_tiles, L, N), jnp.float32),
            jax.ShapeDtypeStruct((B, n_tiles, L, N), jnp.float32),
            jax.ShapeDtypeStruct((B, N, Dp), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((CKPT, N, dtile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=_interpret(),
    )(u, dt, A, Bm, Cm, hckpt, dy, dhfin)
    dA = jnp.sum(dA_pb, axis=(0, 1))          # [N, Dp], matches At
    dBm = jnp.sum(dB_pt, axis=1)              # [B, L, N]
    dCm = jnp.sum(dC_pt, axis=1)
    return du, ddt, dA, dBm, dCm, dh0


_scan_core.defvjp(_scan_core_fwd, _scan_core_bwd)


def selective_scan_pallas(
    u: jax.Array,      # [B, L, D]
    delta: jax.Array,  # [B, L, D]
    A: jax.Array,      # [D, N]
    B: jax.Array,      # [B, L, N]
    C: jax.Array,      # [B, L, N]
    D: Optional[jax.Array] = None,
    z: Optional[jax.Array] = None,
    delta_bias: Optional[jax.Array] = None,
    delta_softplus: bool = False,
    return_last_state: bool = False,
    initial_state: Optional[jax.Array] = None,  # [B, D, N]
):
    """Drop-in replacement for `dna_tpu.ops.scan.selective_scan` (forward
    numerics identical). `initial_state`/`return_last_state` use the
    mamba_ssm [B, D, N] layout; padded L steps have dt=0 so they leave the
    state untouched and the final state stays exact."""
    orig_dtype = u.dtype
    Bsz, L, Dd = u.shape
    N = A.shape[1]
    Dp = ((Dd + 127) // 128) * 128
    Lp = ((L + CKPT - 1) // CKPT) * CKPT

    dt = delta.astype(jnp.float32)
    if delta_bias is not None:
        dt = dt + delta_bias[None, None, :]
    if delta_softplus:
        dt = jax.nn.softplus(dt)

    u32 = _pad_d(u.astype(jnp.float32), Dp)
    dt = _pad_d(dt, Dp)
    At = _pad_d(A.astype(jnp.float32).T, Dp)          # [N, Dp]
    Bm = B.astype(jnp.float32)
    Cm = C.astype(jnp.float32)
    if Lp != L:
        padL = ((0, 0), (0, Lp - L), (0, 0))
        u32, dt, Bm, Cm = (jnp.pad(a, padL) for a in (u32, dt, Bm, Cm))
    if initial_state is None:
        h0 = jnp.zeros((Bsz, N, Dp), jnp.float32)
    else:
        h0 = _pad_d(initial_state.astype(jnp.float32).swapaxes(1, 2), Dp)

    y, hfin = _scan_core(u32, dt, At, Bm, Cm, h0, Lp)
    y = y[:, :L, :Dd]

    if D is not None:
        y = y + u.astype(jnp.float32) * D.astype(jnp.float32)[None, None, :]
    if z is not None:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    y = y.astype(orig_dtype)
    if return_last_state:
        return y, hfin[:, :, :Dd].swapaxes(1, 2)      # [B, D, N]
    return y


def context_parallel_selective_scan(
    u: jax.Array,      # [B, L, D] — L sharded over `sp_axis`
    delta: jax.Array,
    A: jax.Array,      # [D, N] (replicated)
    B: jax.Array,      # [B, L, N]
    C: jax.Array,
    mesh,
    D: Optional[jax.Array] = None,
    z: Optional[jax.Array] = None,
    delta_bias: Optional[jax.Array] = None,
    delta_softplus: bool = False,
    sp_axis: str = "sp",
    batch_axes=("dp", "fsdp"),
):
    """Selective scan under context parallelism (new capability vs the
    reference, SURVEY §5.7).

    The recurrence is sequential in L, but it decomposes across shards:
    pass 1 scans each shard locally from h=0 producing its final state F_i
    and total decay P_i = exp(A ∘ Σ_t dt_t) (elementwise — the decay over a
    span is exp of the dt-sum); the incoming carry of shard i is the
    exclusive combine h_in_i = Σ_{j<i} (Π_{j<k<i} P_k) ∘ F_j, computed from
    an all-gather of the tiny [B, N, D] summaries; pass 2 rescans locally
    from h_in. Wall-clock ≈ 2·L/sp sequential steps vs L unsharded —
    a sp/2 speedup plus L/sp activation memory per chip.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P_

    sp = mesh.shape[sp_axis]
    bspec = P_(tuple(batch_axes), sp_axis, None)

    def local(u_s, dt_s, A_, B_s, C_s, *rest):
        rest = list(rest)
        D_ = rest.pop(0) if D is not None else None
        z_s = rest.pop(0) if z is not None else None
        dbias = rest.pop(0) if delta_bias is not None else None
        # pass 1: local scan from zero state → (F_i, and the y we discard)
        _, F = selective_scan_pallas(
            u_s, dt_s, A_, B_s, C_s, D=None, z=None, delta_bias=dbias,
            delta_softplus=delta_softplus, return_last_state=True)
        # local decay product P_i = exp(A ∘ Σ dt) (post-bias/softplus dt)
        dt32 = dt_s.astype(jnp.float32)
        if dbias is not None:
            dt32 = dt32 + dbias[None, None, :]
        if delta_softplus:
            dt32 = jax.nn.softplus(dt32)
        sum_dt = dt32.sum(axis=1)                             # [B, D]
        P_i = jnp.exp(sum_dt[:, :, None] * A_.astype(jnp.float32)[None])
        # exclusive combine over shards from the gathered summaries
        F_g = jax.lax.all_gather(F, sp_axis)                  # [sp, B, D, N]
        P_g = jax.lax.all_gather(P_i, sp_axis)
        idx = jax.lax.axis_index(sp_axis)
        h_in = jnp.zeros_like(F)
        carry = jnp.zeros_like(F)
        for j in range(sp):
            h_in = jnp.where(idx == j, carry, h_in)
            carry = P_g[j] * carry + F_g[j]
        # pass 2: local scan from the true incoming state
        return selective_scan_pallas(
            u_s, dt_s, A_, B_s, C_s, D=D_, z=z_s, delta_bias=dbias,
            delta_softplus=delta_softplus, initial_state=h_in)

    args = [u, delta, A, B, C]
    in_specs = [bspec, bspec, P_(None, None), bspec, bspec]
    for extra in (D, z, delta_bias):
        if extra is not None:
            args.append(extra)
            in_specs.append(bspec if extra.ndim == 3 else P_(None))
    fn = shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                   out_specs=bspec, check_vma=False)
    return fn(*args)
