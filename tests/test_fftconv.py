"""FFT-conv numerics: causal linear convolution semantics + gradients.

The oracle is direct O(L²) convolution; the reference pair is
`fftconv_ref`/`fftconv_func` (`hyena.py:60-92`, `src/ops/fftconv.py`).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dna_tpu.ops.fftconv import fftconv


def _direct_causal_conv(u, k):
    """y[i] = sum_{j<=i} u[j] k[i-j] per channel."""
    L = u.shape[-1]
    y = np.zeros_like(u, dtype=np.float64)
    for i in range(L):
        for j in range(i + 1):
            y[..., i] += u[..., j] * k[..., i - j]
    return y


def test_causal_conv_matches_direct():
    rng = np.random.default_rng(0)
    u = rng.normal(size=(2, 3, 32)).astype(np.float32)
    k = rng.normal(size=(3, 32)).astype(np.float32)
    y = fftconv(jnp.asarray(u), jnp.asarray(k))
    ref = _direct_causal_conv(u, np.broadcast_to(k, u.shape))
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)


def test_skip_term_and_gelu():
    rng = np.random.default_rng(1)
    u = rng.normal(size=(2, 4, 16)).astype(np.float32)
    k = rng.normal(size=(4, 16)).astype(np.float32)
    D = rng.normal(size=(4, 1)).astype(np.float32)
    y = fftconv(jnp.asarray(u), jnp.asarray(k), D=jnp.asarray(D), gelu=True)
    ref = _direct_causal_conv(u, np.broadcast_to(k, u.shape)) + u * D
    ref = np.asarray(jax.nn.gelu(jnp.asarray(ref), approximate=False))
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)


def test_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.normal(size=(2, 3, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 64)).astype(np.float32))

    def loss_custom(u, k):
        return (fftconv(u, k) ** 2).sum()

    def loss_plain(u, k):
        L = u.shape[-1]
        y = jnp.fft.irfft(jnp.fft.rfft(u, n=2 * L) * jnp.fft.rfft(k, n=2 * L),
                          n=2 * L)[..., :L]
        return (y ** 2).sum()

    gu_c, gk_c = jax.grad(loss_custom, argnums=(0, 1))(u, k)
    gu_p, gk_p = jax.grad(loss_plain, argnums=(0, 1))(u, k)
    np.testing.assert_allclose(np.asarray(gu_c), np.asarray(gu_p), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gk_c), np.asarray(gk_p), atol=1e-3)


def test_bidirectional_sees_future():
    """Bidirectional conv must mix information from future positions."""
    u = jnp.zeros((1, 1, 32)).at[0, 0, 20].set(1.0)
    k = jnp.ones((1, 32))
    y_causal = fftconv(u, k)
    y_bidir = fftconv(u, k, bidirectional=True)
    # causal: positions before 20 unaffected by the impulse
    assert float(jnp.abs(y_causal[0, 0, :20]).max()) < 1e-5
    # bidirectional: impulse leaks into earlier positions
    assert float(jnp.abs(y_bidir[0, 0, :20]).max()) > 0.1
