"""Selective scan numerics + Mamba/Caduceus model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dna_tpu.config.core import ModelConfig
from dna_tpu.models.mamba import (
    BiMambaWrapper,
    CaduceusForMaskedLM,
    Mamba,
    char_complement_map,
)
from dna_tpu.ops.scan import selective_scan, selective_scan_ref


def _scan_inputs(key, B=2, L=96, D=8, N=4):
    ks = jax.random.split(key, 6)
    u = jax.random.normal(ks[0], (B, L, D))
    delta = jax.random.normal(ks[1], (B, L, D)) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (D, N)) * 0.3)
    Bm = jax.random.normal(ks[3], (B, L, N))
    Cm = jax.random.normal(ks[4], (B, L, N))
    Dv = jax.random.normal(ks[5], (D,))
    return u, delta, A, Bm, Cm, Dv


def _numpy_scan(u, delta, A, B, C):
    """Straight-line numpy oracle."""
    u, delta, A, B, C = (np.asarray(x, np.float64) for x in (u, delta, A, B, C))
    Bsz, L, D = u.shape
    N = A.shape[1]
    h = np.zeros((Bsz, D, N))
    ys = np.zeros((Bsz, L, D))
    for t in range(L):
        dA = np.exp(delta[:, t, :, None] * A[None])
        dBu = delta[:, t, :, None] * B[:, t, None, :] * u[:, t, :, None]
        h = dA * h + dBu
        ys[:, t] = np.einsum("bdn,bn->bd", h, C[:, t])
    return ys


def test_scan_ref_matches_numpy():
    u, delta, A, Bm, Cm, Dv = _scan_inputs(jax.random.key(0))
    y = selective_scan_ref(u, delta, A, Bm, Cm)
    ref = _numpy_scan(u, delta, A, Bm, Cm)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("chunk", [16, 33, 96, 128])
def test_chunked_scan_matches_ref(chunk):
    u, delta, A, Bm, Cm, Dv = _scan_inputs(jax.random.key(1))
    z = jax.random.normal(jax.random.key(7), u.shape)
    kw = dict(D=Dv, z=z, delta_bias=jnp.ones(u.shape[-1]) * 0.1,
              delta_softplus=True)
    y_ref, h_ref = selective_scan_ref(u, delta, A, Bm, Cm,
                                      return_last_state=True, **kw)
    y, h = selective_scan(u, delta, A, Bm, Cm, chunk=chunk,
                          return_last_state=True, **kw)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), rtol=2e-4, atol=2e-4)


def test_chunked_scan_grads_match_ref():
    u, delta, A, Bm, Cm, Dv = _scan_inputs(jax.random.key(2), L=64)

    def loss(fn, u, A):
        return (fn(u, delta, A, Bm, Cm, D=Dv, delta_softplus=True) ** 2).sum()

    gu_c, gA_c = jax.grad(lambda u, A: loss(
        lambda *a, **k: selective_scan(*a, chunk=16, **k), u, A),
        argnums=(0, 1))(u, A)
    gu_r, gA_r = jax.grad(lambda u, A: loss(selective_scan_ref, u, A),
                          argnums=(0, 1))(u, A)
    np.testing.assert_allclose(np.asarray(gu_c), np.asarray(gu_r), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gA_c), np.asarray(gA_r), rtol=1e-3, atol=1e-3)


def test_mamba_causal():
    m = Mamba(d_model=16, d_state=4, expand=2)
    u = jax.random.normal(jax.random.key(0), (1, 64, 16))
    params = m.init(jax.random.key(1), u)
    y0 = m.apply(params, u)
    y1 = m.apply(params, u.at[0, 40:].set(3.0))
    np.testing.assert_allclose(np.asarray(y0[0, :37]), np.asarray(y1[0, :37]),
                               atol=1e-4)
    assert float(jnp.abs(y0[0, 45:] - y1[0, 45:]).max()) > 1e-4


def test_bimamba_sees_both_directions():
    m = BiMambaWrapper(d_model=16, d_state=4)
    u = jax.random.normal(jax.random.key(0), (1, 64, 16))
    params = m.init(jax.random.key(1), u)
    y0 = m.apply(params, u)
    y1 = m.apply(params, u.at[0, 60:].set(3.0))
    # future perturbation must affect strictly-earlier outputs (bidirectional);
    # check nearby positions since the scan state decays with distance
    assert float(jnp.abs(y0[0, 52:58] - y1[0, 52:58]).max()) > 1e-5


def test_rcps_equivariance():
    """RCPS Caduceus: logits(RC(x)) == flip-L + complement-permute of
    logits(x) — the defining property (`modeling_rcps.py`)."""
    cfg = ModelConfig(name="caduceus", vocab_size=12, d_model=16, n_layers=2,
                      d_state=4, rcps=True, dtype="float32")
    model = CaduceusForMaskedLM(cfg)
    ids = jax.random.randint(jax.random.key(0), (2, 32), 7, 11)
    params = model.init(jax.random.key(1), ids, None, deterministic=True)
    comp = char_complement_map(12)
    rc_ids = jnp.asarray(comp)[jnp.flip(ids, axis=-1)]
    logits = model.apply(params, ids, None, deterministic=True)
    logits_rc = model.apply(params, rc_ids, None, deterministic=True)
    expected = jnp.flip(logits, axis=1)[..., jnp.asarray(comp)]
    np.testing.assert_allclose(np.asarray(logits_rc), np.asarray(expected),
                               atol=1e-3)


def test_caduceus_mlm_trains():
    import optax
    from dna_tpu.train.tasks import mlm_loss

    cfg = ModelConfig(name="caduceus", vocab_size=16, d_model=32, n_layers=2,
                      d_state=8, dtype="float32", bidirectional=True)
    model = CaduceusForMaskedLM(cfg)
    rng = np.random.default_rng(0)
    base = rng.integers(7, 11, (8, 64)).astype(np.int32)
    mask = rng.random((8, 64)) < 0.3
    masked = np.where(mask, 3, base)
    batch = {"input_ids": jnp.asarray(masked),
             "labels": jnp.asarray(np.where(mask, base, -100))}

    params = model.init(jax.random.key(0), batch["input_ids"], None,
                        deterministic=True)["params"]
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply({"params": p}, batch["input_ids"], None,
                                 deterministic=True)
            return mlm_loss(logits, batch)[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    first = None
    for i in range(40):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < first - 0.3, (first, float(loss))


def test_pallas_scan_matches_ref():
    from dna_tpu.ops.scan_pallas import selective_scan_pallas

    u, delta, A, Bm, Cm, Dv = _scan_inputs(jax.random.key(5), B=2, L=256, D=24,
                                           N=8)
    z = jax.random.normal(jax.random.key(8), u.shape)
    kw = dict(D=Dv, z=z, delta_bias=jnp.ones(u.shape[-1]) * 0.1,
              delta_softplus=True)
    y_ref = selective_scan_ref(u, delta, A, Bm, Cm, **kw)
    y = selective_scan_pallas(u, delta, A, Bm, Cm, **kw)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_scan_grads_match_ref():
    from dna_tpu.ops.scan_pallas import selective_scan_pallas

    u, delta, A, Bm, Cm, Dv = _scan_inputs(jax.random.key(6), B=1, L=256,
                                           D=16, N=4)

    def loss(fn, u, delta, A, Bm, Cm):
        return (fn(u, delta, A, Bm, Cm, D=Dv, delta_softplus=True) ** 2).sum()

    gp = jax.grad(lambda *a: loss(selective_scan_pallas, *a),
                  argnums=(0, 1, 2, 3, 4))(u, delta, A, Bm, Cm)
    gr = jax.grad(lambda *a: loss(selective_scan_ref, *a),
                  argnums=(0, 1, 2, 3, 4))(u, delta, A, Bm, Cm)
    for a, b, name in zip(gp, gr, ["du", "ddelta", "dA", "dB", "dC"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3, err_msg=name)
