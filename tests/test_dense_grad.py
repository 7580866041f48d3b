"""Matmul-backward gathers (`ops/dense_grad`) match XLA's scatter VJPs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dna_tpu.ops.dense_grad import take_positions, take_rows
from dna_tpu.train.step import gather_mlm_positions


def test_take_rows_matches_take_grad():
    key = jax.random.key(0)
    table = jax.random.normal(key, (64, 32), jnp.float32)
    ids = jax.random.randint(jax.random.fold_in(key, 1), (4, 16), 0, 64)

    def ref(t):
        return (jnp.take(t, ids, axis=0) * 0.1).sum()

    def ours(t):
        return (take_rows(t, ids) * 0.1).sum()

    np.testing.assert_allclose(ours(table), ref(table), rtol=1e-6)
    g_ref = jax.grad(ref)(table)
    g_new = jax.grad(ours)(table)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_take_rows_duplicate_ids_sum():
    table = jnp.eye(4, 3, dtype=jnp.float32)
    ids = jnp.array([2, 2, 2, 0])
    g = jax.grad(lambda t: take_rows(t, ids).sum())(table)
    assert g[2, 0] == 3.0 and g[0, 0] == 1.0 and g[1, 0] == 0.0


def test_take_positions_matches_take_along_axis_grad():
    key = jax.random.key(1)
    h = jax.random.normal(key, (3, 16, 8), jnp.float32)
    pos = jax.random.randint(jax.random.fold_in(key, 2), (3, 5), 0, 16)
    w = jax.random.normal(jax.random.fold_in(key, 3), (3, 5, 8))

    def ref(x):
        return (jnp.take_along_axis(x, pos[..., None], axis=1) * w).sum()

    def ours(x):
        return (take_positions(x, pos) * w).sum()

    np.testing.assert_allclose(ours(h), ref(h), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(jax.grad(ours)(h)),
                               np.asarray(jax.grad(ref)(h)),
                               rtol=1e-5, atol=1e-6)


def test_take_positions_bf16_dtype_roundtrip():
    h = jnp.ones((2, 8, 4), jnp.bfloat16)
    pos = jnp.zeros((2, 3), jnp.int32)
    out, vjp = jax.vjp(lambda x: take_positions(x, pos), h)
    (dh,) = vjp(jnp.ones_like(out))
    assert out.dtype == jnp.bfloat16 and dh.dtype == jnp.bfloat16
    # all three gathered rows hit position 0 → grad 3 there, 0 elsewhere
    assert float(dh[0, 0, 0]) == 3.0 and float(dh[0, 1, 0]) == 0.0


@pytest.mark.parametrize("budget", [4, 8])
def test_gather_mlm_positions_matches_nonzero(budget):
    labels = jnp.array([
        [-100, 5, -100, 7, 2, -100, -100, 1],
        [-100, -100, -100, -100, -100, -100, -100, -100],
        [3, 4, 5, 6, 7, 8, 9, 10],
    ])
    idx, glab = gather_mlm_positions(labels, budget)
    mask = np.asarray(labels) != -100
    for r in range(labels.shape[0]):
        want = np.nonzero(mask[r])[0][:budget]
        n = len(want)
        got = np.asarray(idx[r])
        np.testing.assert_array_equal(got[:n], want)
        np.testing.assert_array_equal(got[n:], 0)
        np.testing.assert_array_equal(np.asarray(glab[r])[:n],
                                      np.asarray(labels)[r][want])
        assert (np.asarray(glab[r])[n:] == -100).all()
