"""KV-resident paired-lane mid-S attention vs the XLA oracle (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dna_tpu.ops.attention_mid import mid_attention, supports
from dna_tpu.ops.attention_ref import alibi_bias, attention_ref, padding_bias


def _ref(q, k, v, mask, causal, alibi):
    H, S = q.shape[2], q.shape[1]
    bias = None
    if alibi:
        bias = alibi_bias(H, S, causal=causal)
    if mask is not None:
        pb = padding_bias(mask)
        bias = pb if bias is None else bias + pb
    return attention_ref(q, k, v, bias, causal=causal)


@pytest.mark.parametrize("causal,alibi,with_mask", [
    (False, False, False),
    (False, True, True),
    (True, False, False),
    (True, True, True),
])
def test_mid_attention_matches_ref(causal, alibi, with_mask):
    B, S, H, D = 2, 512, 4, 64
    assert supports(S, H, D)
    key = jax.random.key(0)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, S, H, D),
                                 jnp.float32) * 0.5 for i in range(3))
    mask = None
    if with_mask:
        mask = (jax.random.uniform(jax.random.fold_in(key, 9), (B, S))
                > 0.2).astype(jnp.int32)
        mask = mask.at[:, :4].set(1)
    out = mid_attention(q, k, v, attention_mask=mask, causal=causal,
                        alibi=alibi)
    ref = _ref(q, k, v, mask, causal, alibi)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_mid_attention_grads_match_ref():
    B, S, H, D = 2, 512, 4, 64
    key = jax.random.key(1)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, S, H, D),
                                 jnp.float32) * 0.5 for i in range(3))
    mask = (jax.random.uniform(jax.random.fold_in(key, 9), (B, S))
            > 0.2).astype(jnp.int32)
    mask = mask.at[:, :4].set(1)
    w = jax.random.normal(jax.random.fold_in(key, 5), (B, S, H, D))

    def loss_mid(q, k, v):
        return (mid_attention(q, k, v, attention_mask=mask, alibi=True)
                * w).sum()

    def loss_ref(q, k, v):
        return (_ref(q, k, v, mask, False, True) * w).sum()

    g_mid = jax.grad(loss_mid, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gm, gr, name in zip(g_mid, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gm), np.asarray(gr),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=f"d{name}")


def test_mid_attention_multi_qtile_causal():
    """S large enough that the grid has several q tiles (exercises the
    revisited dk/dv accumulation and per-tile causal offsets)."""
    B, S, H, D = 1, 1024, 2, 64
    key = jax.random.key(2)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, S, H, D),
                                 jnp.float32) * 0.5 for i in range(3))

    def loss_mid(q, k, v):
        return mid_attention(q, k, v, causal=True).astype(jnp.float32).sum()

    def loss_ref(q, k, v):
        return _ref(q, k, v, None, True, False).astype(jnp.float32).sum()

    np.testing.assert_allclose(loss_mid(q, k, v), loss_ref(q, k, v),
                               rtol=1e-4)
    g_mid = jax.grad(loss_mid, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gm, gr, name in zip(g_mid, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gm), np.asarray(gr),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=f"d{name}")


def test_mid_supports_bounds():
    assert supports(1024, 12, 64)
    assert supports(4096, 12, 64)
    assert supports(8192, 12, 64)       # HD-tiled grid takes over
    assert supports(16384, 12, 64)
    assert not supports(32768, 12, 64)  # tiled plan no longer fits
    assert not supports(520, 12, 64)    # not 128-aligned


def test_mid_plan_paths():
    from dna_tpu.ops.attention_mid import _plan, _plan_t

    assert _plan(4096, 12, 64) is not None   # resident path serves ≤4096
    assert _plan(8192, 12, 64) is None
    assert _plan_t(8192, 12, 64, "bwd") is not None
    assert _plan_t(16384, 12, 64, "fwd") is not None


@pytest.mark.parametrize("causal,alibi,with_mask", [
    (False, False, False),
    (False, True, True),
    (True, True, True),
])
def test_mid_hdt_matches_ref(monkeypatch, causal, alibi, with_mask):
    """HD-tiled grid vs the XLA oracle (forced via DNA_TPU_MID_ATTN_IMPL
    so it runs at a CPU-friendly S with several q tiles and lane tiles)."""
    monkeypatch.setenv("DNA_TPU_MID_ATTN_IMPL", "hdt")
    B, S, H, D = 2, 512, 4, 64   # HD=256 → 2 lane tiles; 128-row q tiles
    key = jax.random.key(3)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, S, H, D),
                                 jnp.float32) * 0.5 for i in range(3))
    mask = None
    if with_mask:
        mask = (jax.random.uniform(jax.random.fold_in(key, 9), (B, S))
                > 0.2).astype(jnp.int32)
        mask = mask.at[:, :4].set(1)
    out = mid_attention(q, k, v, attention_mask=mask, causal=causal,
                        alibi=alibi)
    ref = _ref(q, k, v, mask, causal, alibi)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_mid_hdt_grads_match_ref(monkeypatch):
    monkeypatch.setenv("DNA_TPU_MID_ATTN_IMPL", "hdt")
    B, S, H, D = 1, 512, 4, 64
    key = jax.random.key(4)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, S, H, D),
                                 jnp.float32) * 0.5 for i in range(3))
    mask = (jax.random.uniform(jax.random.fold_in(key, 9), (B, S))
            > 0.2).astype(jnp.int32)
    mask = mask.at[:, :4].set(1)
    w = jax.random.normal(jax.random.fold_in(key, 5), (B, S, H, D))

    def loss_mid(q, k, v):
        return (mid_attention(q, k, v, attention_mask=mask, alibi=True,
                              causal=True) * w).sum()

    def loss_ref(q, k, v):
        return (_ref(q, k, v, mask, True, True) * w).sum()

    np.testing.assert_allclose(loss_mid(q, k, v), loss_ref(q, k, v),
                               rtol=1e-4)
    g_mid = jax.grad(loss_mid, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gm, gr, name in zip(g_mid, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gm), np.asarray(gr),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=f"d{name}")
