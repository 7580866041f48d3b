"""Flash-attention kernel numerics vs the XLA reference oracle.

The slow/fast oracle-pair strategy mirrors the reference's
`fftconv_ref`/`fftconv_func` pairing (`hyena.py:254-269`). On CPU the Pallas
kernels run in interpreter mode; the same tests compile on real TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dna_tpu.ops.attention_ref import alibi_bias, attention_ref, padding_bias
from dna_tpu.ops.flash_attention import flash_attention


def _rand_qkv(key, B=2, S=256, H=4, D=64, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    shape = (B, S, H, D)
    return tuple(jax.random.normal(k, shape, dtype) * 0.5 for k in ks)


@pytest.mark.parametrize("alibi", [False, True])
@pytest.mark.parametrize("causal", [False, True])
def test_forward_matches_ref(alibi, causal):
    q, k, v = _rand_qkv(jax.random.key(0))
    out = flash_attention(q, k, v, alibi=alibi, causal=causal)
    H, S = q.shape[2], q.shape[1]
    bias = alibi_bias(H, S) if alibi else None
    ref = attention_ref(q, k, v, bias, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_forward_with_padding_mask():
    q, k, v = _rand_qkv(jax.random.key(1), B=2, S=256)
    mask = jnp.ones((2, 256), jnp.int32).at[:, 200:].set(0)
    out = flash_attention(q, k, v, attention_mask=mask, alibi=True)
    bias = alibi_bias(q.shape[2], 256) + padding_bias(mask)
    ref = attention_ref(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out)[:, :200],
                               np.asarray(ref)[:, :200], atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("alibi,causal", [(True, False), (False, True)])
def test_grads_match_ref(alibi, causal):
    q, k, v = _rand_qkv(jax.random.key(2), B=1, S=256, H=2)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, alibi=alibi, causal=causal) ** 2).sum()

    def loss_ref(q, k, v):
        bias = alibi_bias(q.shape[2], q.shape[1]) if alibi else None
        return (attention_ref(q, k, v, bias, causal=causal) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4, err_msg=f"d{name}")


def test_grads_with_mask():
    q, k, v = _rand_qkv(jax.random.key(3), B=1, S=128, H=2)
    mask = jnp.ones((1, 128), jnp.int32).at[:, 100:].set(0)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, attention_mask=mask, alibi=True)
        return (out[:, :100] ** 2).sum()

    def loss_ref(q, k, v):
        bias = alibi_bias(q.shape[2], 128) + padding_bias(mask)
        return (attention_ref(q, k, v, bias)[:, :100] ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4, err_msg=f"d{name}")


def test_bf16_forward_close():
    q, k, v = _rand_qkv(jax.random.key(4), dtype=jnp.bfloat16, S=128)
    out = flash_attention(q, k, v, alibi=True)
    ref = attention_ref(q, k, v, alibi_bias(q.shape[2], q.shape[1]))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)


def test_alibi_slopes_known_values():
    """Slopes match the published ALiBi geometric sequence (8 heads:
    1/2^1 .. 1/2^8)."""
    from dna_tpu.ops.attention_ref import alibi_slopes

    s8 = np.asarray(alibi_slopes(8))
    np.testing.assert_allclose(s8, [2.0 ** -(i + 1) for i in range(8)],
                               rtol=1e-6)
    s12 = np.asarray(alibi_slopes(12))  # non-power-of-2 workaround
    assert len(s12) == 12 and (np.diff(s8) < 0).all()


# --- fused all-heads small-S kernel (`ops/attention_small.py`) ---

from dna_tpu.ops.attention_small import fused_small_attention


@pytest.mark.parametrize("alibi,causal", [(False, False), (True, False),
                                          (False, True), (True, True)])
def test_small_forward_matches_ref(alibi, causal):
    q, k, v = _rand_qkv(jax.random.key(3), B=3, S=128, H=4, D=64)
    out = fused_small_attention(q, k, v, alibi=alibi, causal=causal)
    bias = alibi_bias(q.shape[2], q.shape[1]) if alibi else None
    ref = attention_ref(q, k, v, bias, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_small_forward_with_padding_mask():
    q, k, v = _rand_qkv(jax.random.key(4), B=2, S=128, H=4, D=64)
    mask = jnp.ones((2, 128), jnp.int32).at[:, 100:].set(0)
    out = fused_small_attention(q, k, v, attention_mask=mask, alibi=True)
    bias = alibi_bias(q.shape[2], 128) + padding_bias(mask)
    ref = attention_ref(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out)[:, :100],
                               np.asarray(ref)[:, :100], atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("alibi,causal", [(True, False), (False, True)])
def test_small_grads_match_ref(alibi, causal):
    q, k, v = _rand_qkv(jax.random.key(5), B=2, S=128, H=2, D=64)
    mask = jnp.ones((2, 128), jnp.int32).at[:, 112:].set(0)

    def loss_small(q, k, v):
        o = fused_small_attention(q, k, v, attention_mask=mask, alibi=alibi,
                                  causal=causal)
        return (o ** 2).sum()

    def loss_ref(q, k, v):
        bias = padding_bias(mask)
        if alibi:
            bias = bias + alibi_bias(q.shape[2], q.shape[1])
        return (attention_ref(q, k, v, bias, causal=causal) ** 2).sum()

    gs = jax.grad(loss_small, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gs, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4, err_msg=f"d{name}")


def test_small_bf16_close_to_fp32_ref():
    q, k, v = _rand_qkv(jax.random.key(6), B=2, S=256, H=6, D=64,
                        dtype=jnp.bfloat16)
    out = fused_small_attention(q, k, v, alibi=True)
    ref = attention_ref(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32),
                        alibi_bias(q.shape[2], q.shape[1]))
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


# --- K/V-streaming (4-D grid) long-L kernels ---


@pytest.mark.parametrize("alibi,causal", [(False, False), (True, False),
                                          (False, True)])
def test_stream_forward_matches_resident(monkeypatch, alibi, causal):
    q, k, v = _rand_qkv(jax.random.key(7), B=2, S=512, H=2, D=64)
    mask = jnp.ones((2, 512), jnp.int32).at[:, 480:].set(0)
    resident = flash_attention(q, k, v, attention_mask=mask, alibi=alibi,
                               causal=causal)
    monkeypatch.setenv("DNA_TPU_ATTN_STREAM_S", "256")
    streamed = flash_attention(q, k, v, attention_mask=mask, alibi=alibi,
                               causal=causal)
    np.testing.assert_allclose(np.asarray(streamed)[:, :480],
                               np.asarray(resident)[:, :480],
                               atol=2e-5, rtol=2e-5)
    bias = padding_bias(mask)
    if alibi:
        bias = bias + alibi_bias(q.shape[2], q.shape[1])
    ref = attention_ref(q, k, v, bias, causal=causal)
    np.testing.assert_allclose(np.asarray(streamed)[:, :480],
                               np.asarray(ref)[:, :480], atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_stream_grads_match_ref(monkeypatch, causal):
    monkeypatch.setenv("DNA_TPU_ATTN_STREAM_S", "256")
    q, k, v = _rand_qkv(jax.random.key(8), B=1, S=512, H=2, D=64)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, alibi=True, causal=causal) ** 2).sum()

    def loss_ref(q, k, v):
        bias = alibi_bias(q.shape[2], q.shape[1])
        return (attention_ref(q, k, v, bias, causal=causal) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4, err_msg=f"d{name}")


# --- packed-QKV small kernel ---

from dna_tpu.ops.attention_small import fused_small_attention_qkv


@pytest.mark.parametrize("alibi,causal", [(True, False), (False, True),
                                          (True, True)])
def test_small_qkv_forward_matches_ref(alibi, causal):
    q, k, v = _rand_qkv(jax.random.key(9), B=4, S=128, H=4, D=64)
    mask = jnp.ones((4, 128), jnp.int32).at[:, 112:].set(0)
    qkv = jnp.stack([q, k, v], axis=2)  # [B, S, 3, H, D]
    out = fused_small_attention_qkv(qkv, 4, attention_mask=mask, alibi=alibi,
                                    causal=causal)
    bias = padding_bias(mask)
    if alibi:
        bias = bias + alibi_bias(4, 128)
    ref = attention_ref(q, k, v, bias, causal=causal)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref.reshape(4, 128, -1)),
        atol=2e-5, rtol=2e-5)


def test_small_qkv_grads_match_ref():
    q, k, v = _rand_qkv(jax.random.key(10), B=2, S=128, H=2, D=64)
    mask = jnp.ones((2, 128), jnp.int32).at[:, 96:].set(0)

    def loss_qkv(q, k, v):
        qkv = jnp.stack([q, k, v], axis=2)
        o = fused_small_attention_qkv(qkv, 2, attention_mask=mask, alibi=True)
        return (o ** 2).sum()

    def loss_ref(q, k, v):
        bias = padding_bias(mask) + alibi_bias(2, 128)
        return (attention_ref(q, k, v, bias) ** 2).sum()

    gq = jax.grad(loss_qkv, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gq, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4, err_msg=f"d{name}")


def test_small_qkv_d128_head_loop():
    # D=128: T=1 path (no lane masks)
    q, k, v = _rand_qkv(jax.random.key(11), B=2, S=128, H=2, D=128)
    qkv = jnp.stack([q, k, v], axis=2)
    out = fused_small_attention_qkv(qkv, 2, causal=True)
    ref = attention_ref(q, k, v, None, causal=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref.reshape(2, 128, -1)),
                               atol=2e-5, rtol=2e-5)
