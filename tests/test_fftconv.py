"""FFT-conv numerics: causal linear convolution semantics + gradients.

The oracle is direct O(L²) convolution; the reference pair is
`fftconv_ref`/`fftconv_func` (`hyena.py:60-92`, `src/ops/fftconv.py`).
Layout: [..., L, D], convolution along axis -2.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dna_tpu.ops.fftconv import fftconv


def _direct_causal_conv(u, k):
    """y[i, d] = sum_{j<=i} u[j, d] k[i-j, d]."""
    L = u.shape[-2]
    y = np.zeros_like(u, dtype=np.float64)
    for i in range(L):
        for j in range(i + 1):
            y[..., i, :] += u[..., j, :] * k[..., i - j, :]
    return y


import pytest


@pytest.mark.parametrize("impl", ["xla", "blocked", "matmul"])
def test_causal_conv_matches_direct(impl, monkeypatch):
    """All three impls (monolithic rfft, blocked Cooley-Tukey with FFT-op
    factors, matmul-DFT factors — the TPU default) against the O(L²)
    oracle."""
    monkeypatch.setenv("DNA_TPU_FFT_IMPL", impl)
    rng = np.random.default_rng(0)
    u = rng.normal(size=(2, 32, 3)).astype(np.float32)
    k = rng.normal(size=(32, 3)).astype(np.float32)
    y = fftconv(jnp.asarray(u), jnp.asarray(k))
    ref = _direct_causal_conv(u, np.broadcast_to(k, u.shape))
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)


@pytest.mark.parametrize("impl", ["blocked", "matmul"])
def test_impl_grads_agree(impl, monkeypatch):
    monkeypatch.setenv("DNA_TPU_FFT_IMPL", impl)
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.normal(size=(2, 48, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(48, 3)).astype(np.float32))
    gu, gk = jax.grad(lambda u, k: (fftconv(u, k) ** 2).sum(),
                      argnums=(0, 1))(u, k)
    monkeypatch.setenv("DNA_TPU_FFT_IMPL", "xla")
    ru, rk = jax.grad(lambda u, k: (fftconv(u, k) ** 2).sum(),
                      argnums=(0, 1))(u, k)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(ru), atol=2e-3)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=2e-3)


def test_auto_unfactorable_falls_back(monkeypatch):
    # fft_size = 2·4099 has the prime factor 4099 > 4096, so the decomposed
    # path can't take it — auto must silently use the monolithic rfft
    # instead of raising mid-trace (r4 advisor finding).
    monkeypatch.setenv("DNA_TPU_FFT_IMPL", "auto")
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=(1, 4099, 2)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(4099, 2)).astype(np.float32))
    y = fftconv(u, k)
    monkeypatch.setenv("DNA_TPU_FFT_IMPL", "xla")
    ref = fftconv(u, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)


def test_skip_term_and_gelu():
    rng = np.random.default_rng(1)
    u = rng.normal(size=(2, 16, 4)).astype(np.float32)
    k = rng.normal(size=(16, 4)).astype(np.float32)
    D = rng.normal(size=(1, 4)).astype(np.float32)
    y = fftconv(jnp.asarray(u), jnp.asarray(k), D=jnp.asarray(D), gelu=True)
    ref = _direct_causal_conv(u, np.broadcast_to(k, u.shape)) + u * D
    ref = np.asarray(jax.nn.gelu(jnp.asarray(ref), approximate=False))
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)


def test_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))

    def loss_custom(u, k):
        return (fftconv(u, k) ** 2).sum()

    def loss_plain(u, k):
        L = u.shape[-2]
        y = jnp.fft.irfft(
            jnp.fft.rfft(u, n=2 * L, axis=-2) * jnp.fft.rfft(k, n=2 * L, axis=-2),
            n=2 * L, axis=-2)[..., :L, :]
        return (y ** 2).sum()

    gu_c, gk_c = jax.grad(loss_custom, argnums=(0, 1))(u, k)
    gu_p, gk_p = jax.grad(loss_plain, argnums=(0, 1))(u, k)
    np.testing.assert_allclose(np.asarray(gu_c), np.asarray(gu_p), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gk_c), np.asarray(gk_p), atol=1e-3)


def test_bidirectional_sees_future():
    """Bidirectional conv must mix information from future positions."""
    u = jnp.zeros((1, 32, 1)).at[0, 20, 0].set(1.0)
    k = jnp.ones((32, 1))
    y_causal = fftconv(u, k)
    y_bidir = fftconv(u, k, bidirectional=True)
    assert float(jnp.abs(y_causal[0, :20, 0]).max()) < 1e-5
    assert float(jnp.abs(y_bidir[0, :20, 0]).max()) > 0.1


def test_sharded_tp_mesh_grad(devices):
    """The exact mesh layout that broke the transpose formulation on XLA-CPU
    (tp-sharded channels) must work in fwd+bwd."""
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(mesh_utils.create_device_mesh((2, 2, 2)), ("dp", "fsdp", "tp"))
    B, L, D = 8, 64, 16
    u = jax.device_put(jnp.ones((B, L, D)),
                       NamedSharding(mesh, P(("dp", "fsdp"), None, "tp")))
    k = jax.device_put(jnp.ones((L, D)), NamedSharding(mesh, P(None, "tp")))
    g = jax.jit(jax.grad(lambda u: (fftconv(u, k) ** 2).sum()))(u)
    assert np.isfinite(np.asarray(g)).all()
