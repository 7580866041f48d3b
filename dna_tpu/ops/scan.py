"""Selective state-space scan (Mamba) — TPU-native.

Replaces `mamba_ssm`'s CUDA `selective_scan_fn` (reference
`pyramid.py:11-26`, used by the in-tree Mamba at `pyramid.py:222-234` and by
Caduceus via `modeling_caduceus.py:25-65`). Semantics matched to the CUDA
kernel:

    delta = softplus(delta + delta_bias)
    h_t = exp(delta_t ⊙ A) · h_{t-1} + delta_t ⊙ B_t ⊙ u_t       (per channel d, state n)
    y_t = C_t · h_t + D ⊙ u_t
    out  = y ⊙ silu(z)                    (when z given)

Implementation: chunked parallel scan. The sequence is cut into chunks; a
`jax.lax.associative_scan` runs within each chunk (parallel, MXU/VPU
friendly) and a sequential `lax.scan` carries the [B, D, N] state across
chunks. The chunk body is wrapped in `jax.checkpoint` so backward memory
stays O(chunk) instead of O(L). All state math in fp32.

The step-by-step `lax.scan` reference (`selective_scan_ref`) is the numerics
oracle, mirroring the reference repo's `selective_scan_ref` in mamba_ssm.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _inputs_fp32(u, delta, A, B, C, D, z, delta_bias, delta_softplus):
    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias[None, None, :]
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    return u, delta, A.astype(jnp.float32), B.astype(jnp.float32), C.astype(jnp.float32)


def selective_scan_ref(
    u: jax.Array,      # [B, L, D]
    delta: jax.Array,  # [B, L, D]
    A: jax.Array,      # [D, N]
    B: jax.Array,      # [B, L, N]
    C: jax.Array,      # [B, L, N]
    D: Optional[jax.Array] = None,      # [D]
    z: Optional[jax.Array] = None,      # [B, L, D]
    delta_bias: Optional[jax.Array] = None,  # [D]
    delta_softplus: bool = False,
    return_last_state: bool = False,
):
    """Sequential oracle: lax.scan over L, one state update per step."""
    orig_dtype = u.dtype
    u32, delta, A, B, C = _inputs_fp32(u, delta, A, B, C, D, z, delta_bias,
                                       delta_softplus)
    Bsz, L, Dd = u32.shape
    N = A.shape[1]

    def step(h, inputs):
        u_t, d_t, B_t, C_t = inputs  # [B,D],[B,D],[B,N],[B,N]
        dA = jnp.exp(d_t[:, :, None] * A[None])            # [B, D, N]
        dBu = d_t[:, :, None] * B_t[:, None, :] * u_t[:, :, None]
        h = dA * h + dBu
        y = jnp.einsum("bdn,bn->bd", h, C_t)
        return h, y

    h0 = jnp.zeros((Bsz, Dd, N), jnp.float32)
    xs = (u32.swapaxes(0, 1), delta.swapaxes(0, 1),
          B.swapaxes(0, 1), C.swapaxes(0, 1))
    h_last, ys = jax.lax.scan(step, h0, xs)
    y = ys.swapaxes(0, 1)  # [B, L, D]
    if D is not None:
        y = y + u32 * D.astype(jnp.float32)[None, None, :]
    if z is not None:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    y = y.astype(orig_dtype)
    return (y, h_last) if return_last_state else y


def _chunk_combine(e1, e2):
    a1, b1 = e1
    a2, b2 = e2
    return a2 * a1, a2 * b1 + b2


def selective_scan(
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
    chunk: Optional[int] = None,
):
    import os as _os

    if chunk is None:
        chunk = int(_os.environ.get("DNA_TPU_SCAN_CHUNK", "128"))
    """Chunked parallel scan; identical numerics to `selective_scan_ref`."""
    orig_dtype = u.dtype
    u32, delta, A, Bm, Cm = _inputs_fp32(u, delta, A, B, C, D, z, delta_bias,
                                         delta_softplus)
    Bsz, L, Dd = u32.shape
    N = A.shape[1]
    chunk = min(chunk, L)
    pad = (-L) % chunk
    if pad:
        u32 = jnp.pad(u32, ((0, 0), (0, pad), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, pad), (0, 0)))
        Bm = jnp.pad(Bm, ((0, 0), (0, pad), (0, 0)))
        Cm = jnp.pad(Cm, ((0, 0), (0, pad), (0, 0)))
    nc = u32.shape[1] // chunk

    def chunk_body(h_prev, xs):
        u_c, d_c, B_c, C_c = xs  # [B, chunk, D] / [B, chunk, N]
        a = jnp.exp(d_c[..., None] * A[None, None])               # [B,c,D,N]
        b = d_c[..., None] * B_c[:, :, None, :] * u_c[..., None]  # [B,c,D,N]
        a_cum, b_acc = jax.lax.associative_scan(_chunk_combine, (a, b), axis=1)
        h = b_acc + a_cum * h_prev[:, None]                       # [B,c,D,N]
        y = jnp.einsum("bcdn,bcn->bcd", h, C_c)
        return h[:, -1], y

    import os as _os

    if _os.environ.get("DNA_TPU_SCAN_REMAT", "1") == "1":
        chunk_body = jax.checkpoint(chunk_body)

    to_chunks = lambda x: x.reshape(Bsz, nc, chunk, -1).swapaxes(0, 1)
    xs = (to_chunks(u32), to_chunks(delta), to_chunks(Bm), to_chunks(Cm))
    h0 = jnp.zeros((Bsz, Dd, N), jnp.float32)
    h_last, ys = jax.lax.scan(chunk_body, h0, xs)
    y = ys.swapaxes(0, 1).reshape(Bsz, nc * chunk, Dd)[:, :L]

    if D is not None:
        y = y + u32[:, :L] * D.astype(jnp.float32)[None, None, :]
    if z is not None:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    y = y.astype(orig_dtype)
    return (y, h_last) if return_last_state else y


def selective_scan_auto(
    u, delta, A, B, C, D=None, z=None, delta_bias=None,
    delta_softplus: bool = False, return_last_state: bool = False,
    chunk: Optional[int] = None,
):
    """Dispatch: Pallas kernel on TPU (state stays in VMEM, one pass over L),
    chunked associative scan elsewhere / when the last state is needed."""
    import os as _os

    impl = _os.environ.get("DNA_TPU_SCAN_IMPL", "auto")
    use_pallas = (impl == "pallas") or (
        impl == "auto" and jax.default_backend() == "tpu")
    if impl in ("auto", "pallas") and not return_last_state:
        # Context parallelism active? The kernel must be shard_mapped over
        # the sp axis (XLA replicates custom calls along sharded dims).
        from dna_tpu.parallel.mesh import ambient_mesh

        sp_mesh = ambient_mesh("sp")
        if sp_mesh is not None:
            from dna_tpu.ops.scan_pallas import (
                context_parallel_selective_scan)

            return context_parallel_selective_scan(
                u, delta, A, B, C, sp_mesh, D=D, z=z,
                delta_bias=delta_bias, delta_softplus=delta_softplus)
    if use_pallas:
        from dna_tpu.ops.scan_pallas import selective_scan_pallas

        return selective_scan_pallas(
            u, delta, A, B, C, D=D, z=z, delta_bias=delta_bias,
            delta_softplus=delta_softplus,
            return_last_state=return_last_state)
    return selective_scan(
        u, delta, A, B, C, D=D, z=z, delta_bias=delta_bias,
        delta_softplus=delta_softplus, return_last_state=return_last_state,
        chunk=chunk)
