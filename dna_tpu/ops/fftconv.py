"""FFT long convolution (the Hyena workhorse).

Replaces the reference's CUDA `fftconv` extension and its torch fallback
(`src/ops/fftconv.py:15-103`, `hyena.py:60-92` `fftconv_ref`). Semantics
matched exactly:

  * zero-pad to 2L (no circular wrap), causal linear convolution
    y[i] = Σ_j u[j]·k[i−j], truncated to the first L outputs
  * fp32 FFTs regardless of input dtype (reference casts u to k's fp32)
  * optional `bidirectional`: input is shifted by ~L/2 so the kernel acts
    centered (reference `hyena.py:68-77` padding scheme)
  * optional skip term `+ u * D` and gelu (reference `fftconv_ref` tail)

A `custom_vjp` stores the two forward FFTs and reuses them in the backward
pass (reference `FFTConvFunc.backward`, `src/ops/fftconv.py` /
`hyena.py:45-58`): du = irfft(dy_f · conj(k_f)), dk = irfft(dy_f · conj(u_f)).

Layout: channel-minor [..., L] on the FFT axis (last), matching XLA's FFT
expectations; callers transpose once around the op.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _rfft(x, n):
    return jnp.fft.rfft(x.astype(jnp.float32), n=n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _causal_fftconv(u: jax.Array, k: jax.Array, fft_size: int) -> jax.Array:
    """Causal linear conv of u [..., L] with kernel k broadcastable [..., L]."""
    L = u.shape[-1]
    y = jnp.fft.irfft(_rfft(u, fft_size) * _rfft(k, fft_size), n=fft_size)
    return y[..., :L]


def _fftconv_fwd(u, k, fft_size):
    L = u.shape[-1]
    u_f = _rfft(u, fft_size)
    k_f = _rfft(k, fft_size)
    y = jnp.fft.irfft(u_f * k_f, n=fft_size)[..., :L]
    return y, (u_f, k_f, u.shape, k.shape)


def _fftconv_bwd(fft_size, res, dy):
    u_f, k_f, u_shape, k_shape = res
    L = dy.shape[-1]
    dy_f = _rfft(dy, fft_size)
    du = jnp.fft.irfft(dy_f * jnp.conj(k_f), n=fft_size)[..., :L]
    dk = jnp.fft.irfft(dy_f * jnp.conj(u_f), n=fft_size)[..., :L]
    # un-broadcast dk to the kernel's shape
    extra = dk.ndim - len(k_shape)
    if extra:
        dk = dk.sum(axis=tuple(range(extra)))
    for ax, (dk_d, k_d) in enumerate(zip(dk.shape, k_shape)):
        if k_d == 1 and dk_d != 1:
            dk = dk.sum(axis=ax, keepdims=True)
    du = du.reshape(u_shape)
    return du.astype(jnp.float32), dk.reshape(k_shape).astype(jnp.float32)


_causal_fftconv.defvjp(_fftconv_fwd, _fftconv_bwd)


def fftconv(
    u: jax.Array,              # [..., L]
    k: jax.Array,              # broadcastable to u's shape, length L on last axis
    D: Optional[jax.Array] = None,   # skip/bias term, broadcastable to u[..., None] shape
    *,
    gelu: bool = False,
    bidirectional: bool = False,
    k_rev: Optional[jax.Array] = None,
) -> jax.Array:
    L = u.shape[-1]
    fft_size = 2 * L
    orig_dtype = u.dtype

    if k_rev is not None or bidirectional:
        # Bidirectional path keeps the reference's exact formulation: forward
        # kernel plus conjugated (time-reversed) kernel, and/or a centered
        # input shift via symmetric padding (`hyena.py:62-77`).
        k_f = _rfft(k, fft_size) / fft_size
        if k_rev is not None:
            k_f = k_f + jnp.conj(_rfft(k_rev, fft_size) / fft_size)
        if bidirectional:
            # centered kernel: shift input right by L//2 (reference pads
            # symmetrically then truncates — same effect with n=2L rfft)
            u_in = jnp.pad(u.astype(jnp.float32),
                           [(0, 0)] * (u.ndim - 1) + [(L // 2, 0)])
            u_f = jnp.fft.rfft(u_in, n=fft_size)
        else:
            u_f = _rfft(u, fft_size)
        # norm='forward' irfft (no 1/n) — fold the 1/fft_size in k_f back out
        y = jnp.fft.irfft(u_f * k_f, n=fft_size) * fft_size
        y = y[..., :L]
    else:
        y = _causal_fftconv(u, k, fft_size)

    if D is not None:
        y = y + u.astype(jnp.float32) * D
    if gelu:
        y = jax.nn.gelu(y, approximate=False)
    return y.astype(orig_dtype)
