"""FFT long convolution (the Hyena workhorse) — channel-last layout.

Replaces the reference's CUDA `fftconv` extension and its torch fallback
(`src/ops/fftconv.py:15-103`, `hyena.py:60-92` `fftconv_ref`). Semantics
matched exactly:

  * zero-pad to 2L (no circular wrap), causal linear convolution
    y[l] = Σ_j u[j]·k[l−j], truncated to the first L outputs
  * fp32 FFTs regardless of input dtype (reference casts u to k's fp32)
  * optional `bidirectional`: input shifted by L/2 so the kernel acts
    centered (reference `hyena.py:68-77` padding scheme)
  * optional skip term `+ u ∘ D` and gelu (reference `fftconv_ref` tail)

TPU/XLA notes: the convolution axis is the *sequence* axis (-2) of a
[B, L, D] channel-last tensor — no transposes around the op (the reference
works channel-major and pays two transposes per conv), and XLA's FFT handles
the non-minor axis internally. This layout also sidesteps an XLA-CPU
fft_thunk layout RET_CHECK that the explicit-transpose form triggers under
sharded channels.

A `custom_vjp` stores the two forward FFTs and reuses them in the backward
pass (reference `FFTConvFunc.backward`, `hyena.py:45-58`):
du = irfft(dy_f · conj(k_f)), dk = irfft(dy_f · conj(u_f)).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _rfft(x, n):
    return jnp.fft.rfft(x.astype(jnp.float32), n=n, axis=-2)


def _irfft(x, n):
    return jnp.fft.irfft(x, n=n, axis=-2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _causal_fftconv(u: jax.Array, k: jax.Array, fft_size: int) -> jax.Array:
    """Causal linear conv along axis -2 of u [..., L, D]; k broadcastable."""
    L = u.shape[-2]
    y = _irfft(_rfft(u, fft_size) * _rfft(k, fft_size), fft_size)
    return y[..., :L, :]


def _fftconv_fwd(u, k, fft_size):
    L = u.shape[-2]
    u_f = _rfft(u, fft_size)
    k_f = _rfft(k, fft_size)
    y = _irfft(u_f * k_f, fft_size)[..., :L, :]
    return y, (u_f, k_f, u.shape, k.shape)


def _fftconv_bwd(fft_size, res, dy):
    u_f, k_f, u_shape, k_shape = res
    L = dy.shape[-2]
    dy_f = _rfft(dy, fft_size)
    du = _irfft(dy_f * jnp.conj(k_f), fft_size)[..., :L, :]
    dk = _irfft(dy_f * jnp.conj(u_f), fft_size)[..., :L, :]
    # un-broadcast dk to the kernel's shape
    extra = dk.ndim - len(k_shape)
    if extra:
        dk = dk.sum(axis=tuple(range(extra)))
    for ax, (dk_d, k_d) in enumerate(zip(dk.shape, k_shape)):
        if k_d == 1 and dk_d != 1:
            dk = dk.sum(axis=ax, keepdims=True)
    return (du.reshape(u_shape).astype(jnp.float32),
            dk.reshape(k_shape).astype(jnp.float32))


_causal_fftconv.defvjp(_fftconv_fwd, _fftconv_bwd)


def fftconv(
    u: jax.Array,              # [..., L, D] — conv along axis -2
    k: jax.Array,              # [L, D] (or broadcastable)
    D: Optional[jax.Array] = None,   # skip/bias [D] or broadcastable
    *,
    gelu: bool = False,
    bidirectional: bool = False,
    k_rev: Optional[jax.Array] = None,
) -> jax.Array:
    L = u.shape[-2]
    fft_size = 2 * L
    orig_dtype = u.dtype

    if k_rev is not None or bidirectional:
        # Bidirectional path keeps the reference's exact formulation: forward
        # kernel plus conjugated (time-reversed) kernel and/or a centered
        # input shift (`hyena.py:62-77`).
        k_f = _rfft(k, fft_size)
        if k_rev is not None:
            k_f = k_f + jnp.conj(_rfft(k_rev, fft_size))
        if bidirectional:
            pad = [(0, 0)] * (u.ndim - 2) + [(L // 2, 0), (0, 0)]
            u_in = jnp.pad(u.astype(jnp.float32), pad)
        else:
            u_in = u
        y = _irfft(_rfft(u_in, fft_size) * k_f, fft_size)[..., :L, :]
    else:
        # enter the custom_vjp with fp32 primals so cotangent dtypes are
        # uniform (bf16 inputs otherwise mismatch the fp32 backward)
        y = _causal_fftconv(u.astype(jnp.float32), k.astype(jnp.float32),
                            fft_size)

    if D is not None:
        y = y + u.astype(jnp.float32) * D
    if gelu:
        y = jax.nn.gelu(y, approximate=False)
    return y.astype(orig_dtype)
