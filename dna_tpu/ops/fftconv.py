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


# ---------------------------------------------------------------------------
# Blocked (two-stage Cooley–Tukey) FFT along axis -2.
#
# At Hyena long-context lengths (L ≥ 64k → FFT size ≥ 128k) a single
# monolithic XLA FFT is pathological to compile through the remote-compile
# tunnel. Decompose N = N1·N2: FFT_N1 over the block index, twiddle
# W_N^{n2·k1}, FFT_N2 over the within-block index — XLA only ever sees two
# batched FFTs of ≤ 4096 points plus elementwise complex math (the
# FlashFFTConv decomposition idea, arXiv:2311.05908, realized with XLA ops
# instead of a fused kernel). The intermediate keeps its frequency indices in
# the permuted [k1, k2] layout; `_blocked_ifft` reverses the exact steps, so
# pointwise products between two forward transforms are consistent and no
# reordering transpose is ever materialized.
# ---------------------------------------------------------------------------


def _split_fft_size(n: int, max_radix: int = 4096):
    """n = n1·n2 with both factors ≤ max_radix and as square as possible."""
    best = None
    n1 = 1
    while n1 * n1 <= n:
        if n % n1 == 0:
            n2 = n // n1
            if n1 <= max_radix and n2 <= max_radix:
                best = (n1, n2)
        n1 += 1
    if best is None:
        raise ValueError(f"cannot factor fft size {n} into radices "
                         f"≤ {max_radix}")
    return best


def _factorable(n: int, max_radix: int = 4096) -> bool:
    """True when the decomposed (blocked / matmul-DFT) path can handle n.
    auto-mode dispatch uses this so an awkward length (e.g. 2·L with a prime
    factor > 4096) silently falls back to the monolithic rfft instead of
    raising mid-trace."""
    try:
        _split_fft_size(n, max_radix)
        return True
    except ValueError:
        return False


def _twiddle(n1: int, n2: int) -> jax.Array:
    # W_N^{k1·n2}: [n1, n2] with N = n1·n2 (fp64 phase then complex64 —
    # float32 phases lose ~1e-3 accuracy at N ≥ 1e5)
    import numpy as np

    k1 = np.arange(n1)[:, None]
    n2i = np.arange(n2)[None, :]
    phase = -2.0 * np.pi * (k1 * n2i) / (n1 * n2)
    return jnp.asarray(np.exp(1j * phase), jnp.complex64)


def _dft_mat(n: int, inverse: bool = False) -> jax.Array:
    """[n, n] DFT (or 1/n-normalized inverse) matrix; fp64 phases →
    complex64, same accuracy discipline as `_twiddle`."""
    import numpy as np

    k = np.arange(n, dtype=np.float64)
    sign = 2.0 if inverse else -2.0
    m = np.exp(sign * 1j * np.pi * np.outer(k, k) / n)
    if inverse:
        m = m / n
    return jnp.asarray(m, jnp.complex64)


def _use_matmul_dft() -> bool:
    import os as _os

    return _os.environ.get("DNA_TPU_FFT_IMPL", "auto") in ("matmul", "auto")


# W_n above this stays an FFT op: a 512-point DFT matrix is 2 MB complex64
# (fine, MXU-shaped); the largest hyena length in the zoo (L=65536 →
# N=131072 = 256·512) still runs fully on matmuls
MATMUL_DFT_MAX_FACTOR = 512


def _fft_axis(x: jax.Array, axis: int, inverse: bool = False) -> jax.Array:
    """FFT along one factor axis — a DFT matmul by default: the factors are
    small, so W_n fits comfortably and the contraction runs on the MXU as
    fusable dot_generals instead of XLA's internal radix pipeline (which
    materializes layout-copied fp32 stage tensors — scripts/probe_hlo.py
    priced those at ~17 GB/step on the hg38_hyena L=1024 step).
    DNA_TPU_FFT_IMPL=blocked keeps FFT ops for the factors."""
    n = x.shape[axis]
    if _use_matmul_dft() and n <= MATMUL_DFT_MAX_FACTOR:
        W = _dft_mat(n, inverse)
        x_m = jnp.moveaxis(x, axis, -1)
        y = jnp.einsum("ij,...j->...i", W, x_m,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.moveaxis(y, -1, axis)
    return (jnp.fft.ifft if inverse else jnp.fft.fft)(x, axis=axis)


def _blocked_fft(x: jax.Array, n: int) -> jax.Array:
    """DFT_n of x (complex, zero-padded) along axis -2; output [..., n1, n2,
    D] in the permuted layout X[k1 + n1·k2] = out[..., k1, k2, :]."""
    n1, n2 = _split_fft_size(n)
    L = x.shape[-2]
    if L < n:
        pad = [(0, 0)] * (x.ndim - 2) + [(0, n - L), (0, 0)]
        x = jnp.pad(x, pad)
    # x[n1_idx·n2 + n2_idx] → [..., n1_idx, n2_idx, D]
    xb = x.reshape(*x.shape[:-2], n1, n2, x.shape[-1])
    a = _fft_axis(xb, -3)                          # over n1 → k1
    a = a * _twiddle(n1, n2)[..., None]
    return _fft_axis(a, -2)                        # over n2 → k2


def _blocked_ifft(X: jax.Array, n: int) -> jax.Array:
    """Inverse of `_blocked_fft` (same permuted layout in); returns
    [..., n, D] complex."""
    n1, n2 = X.shape[-3], X.shape[-2]
    a = _fft_axis(X, -2, inverse=True)
    a = a * jnp.conj(_twiddle(n1, n2))[..., None]
    x = _fft_axis(a, -3, inverse=True)
    return x.reshape(*X.shape[:-3], n1 * n2, X.shape[-1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _causal_fftconv_blocked(u: jax.Array, k: jax.Array, fft_size: int):
    L = u.shape[-2]
    u_f = _blocked_fft(u.astype(jnp.complex64), fft_size)
    k_f = _blocked_fft(k.astype(jnp.complex64), fft_size)
    y = _blocked_ifft(u_f * k_f, fft_size)
    return y.real[..., :L, :]


def _blocked_fwd(u, k, fft_size):
    L = u.shape[-2]
    u_f = _blocked_fft(u.astype(jnp.complex64), fft_size)
    k_f = _blocked_fft(k.astype(jnp.complex64), fft_size)
    y = _blocked_ifft(u_f * k_f, fft_size).real[..., :L, :]
    return y, (u_f, k_f, u.shape, k.shape)


def _blocked_bwd(fft_size, res, dy):
    u_f, k_f, u_shape, k_shape = res
    L = dy.shape[-2]
    dy_f = _blocked_fft(dy.astype(jnp.complex64), fft_size)
    du = _blocked_ifft(dy_f * jnp.conj(k_f), fft_size).real[..., :L, :]
    dk = _blocked_ifft(dy_f * jnp.conj(u_f), fft_size).real[..., :L, :]
    extra = dk.ndim - len(k_shape)
    if extra:
        dk = dk.sum(axis=tuple(range(extra)))
    for ax, (dk_d, k_d) in enumerate(zip(dk.shape, k_shape)):
        if k_d == 1 and dk_d != 1:
            dk = dk.sum(axis=ax, keepdims=True)
    return (du.reshape(u_shape).astype(jnp.float32),
            dk.reshape(k_shape).astype(jnp.float32))


_causal_fftconv_blocked.defvjp(_blocked_fwd, _blocked_bwd)

# Impl crossover, measured on v5e (r4, full hg38_hyena train steps, losses
# identical across impls at every point):
#   L       matmul-DFT   blocked    xla-monolithic
#   1024/B32   64.9       65.5        82.1 ms
#   4096/B4    34.3       38.0        39.9
#   16384/B1   46.9       52.1        50.7
#   65536/B1  242.1        —         304.2
# The matmul-DFT decomposition (factor DFTs as MXU dot_generals) wins at
# every length — auto uses it unconditionally. DNA_TPU_FFT_IMPL ∈
# {xla, blocked, matmul} forces an impl.
BLOCKED_FFT_MAX_SIZE = 1 << 62  # auto: decomposed path at every size


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
    import os as _os

    L = u.shape[-2]
    fft_size = 2 * L
    orig_dtype = u.dtype
    impl = _os.environ.get("DNA_TPU_FFT_IMPL", "auto")
    use_blocked = (impl in ("blocked", "matmul")) or (
        impl == "auto" and fft_size <= BLOCKED_FFT_MAX_SIZE
        and _factorable(fft_size))

    if k_rev is not None or bidirectional:
        # Bidirectional path keeps the reference's exact formulation: forward
        # kernel plus conjugated (time-reversed) kernel and/or a centered
        # input shift (`hyena.py:62-77`).
        if bidirectional:
            pad = [(0, 0)] * (u.ndim - 2) + [(L // 2, 0), (0, 0)]
            u_in = jnp.pad(u.astype(jnp.float32), pad)
        else:
            u_in = u
        if use_blocked:
            k_f = _blocked_fft(k.astype(jnp.complex64), fft_size)
            if k_rev is not None:
                # conj in time ↔ reversed kernel: conj(FFT(k_rev)) in the
                # permuted layout still pairs the right frequencies
                k_f = k_f + jnp.conj(
                    _blocked_fft(k_rev.astype(jnp.complex64), fft_size))
            y = _blocked_ifft(
                _blocked_fft(u_in.astype(jnp.complex64), fft_size) * k_f,
                fft_size).real[..., :L, :]
        else:
            k_f = _rfft(k, fft_size)
            if k_rev is not None:
                k_f = k_f + jnp.conj(_rfft(k_rev, fft_size))
            y = _irfft(_rfft(u_in, fft_size) * k_f, fft_size)[..., :L, :]
    else:
        # enter the custom_vjp with fp32 primals so cotangent dtypes are
        # uniform (bf16 inputs otherwise mismatch the fp32 backward)
        conv = _causal_fftconv_blocked if use_blocked else _causal_fftconv
        y = conv(u.astype(jnp.float32), k.astype(jnp.float32), fft_size)

    if D is not None:
        y = y + u.astype(jnp.float32) * D
    if gelu:
        y = jax.nn.gelu(y, approximate=False)
    return y.astype(orig_dtype)
