"""Hyena operator and LM backbone tests."""

import jax
import jax.numpy as jnp
import numpy as np

from dna_tpu.config.core import ModelConfig
from dna_tpu.models.hyena import HyenaOperator, positional_embedding
from dna_tpu.models.lm import LMHeadModel


def test_positional_embedding_shape():
    z = positional_embedding(33, 128)
    assert z.shape == (128, 33)
    # first column is normalized time
    np.testing.assert_allclose(z[:, 0], np.linspace(0, 1, 128), atol=1e-6)


def test_hyena_operator_causal():
    """Causal hyena: output at position t must not depend on inputs > t."""
    op = HyenaOperator(d_model=16, l_max=64, order=2, filter_order=16,
                       filter_emb_dim=5, dtype=jnp.float32)
    rng = jax.random.key(0)
    u = jax.random.normal(jax.random.key(1), (1, 64, 16))
    params = op.init(rng, u)
    y0 = op.apply(params, u)
    u2 = u.at[0, 50:].set(7.0)  # perturb the future
    y2 = op.apply(params, u2)
    np.testing.assert_allclose(np.asarray(y0[0, :48]), np.asarray(y2[0, :48]),
                               atol=1e-4)
    assert float(jnp.abs(y0[0, 55:] - y2[0, 55:]).max()) > 1e-3


def test_hyena_order3():
    op = HyenaOperator(d_model=8, l_max=32, order=3, filter_order=8,
                       filter_emb_dim=3, dtype=jnp.float32)
    u = jax.random.normal(jax.random.key(2), (2, 32, 8))
    params = op.init(jax.random.key(0), u)
    y = op.apply(params, u)
    assert y.shape == (2, 32, 8)
    assert np.isfinite(np.asarray(y)).all()


def test_hyena_lm_trains():
    """A tiny Hyena causal LM must fit a repeated pattern."""
    import optax

    cfg = ModelConfig(name="hyena_lm", vocab_size=16, d_model=32, n_layers=2,
                      n_heads=4, d_ff=64, hyena_filter_order=16,
                      hyena_filter_emb_dim=5, dtype="float32")
    model = LMHeadModel(cfg, l_max=32, causal=True)
    rng = np.random.default_rng(0)
    seq = jnp.asarray(np.tile(np.arange(8), 16)[None, :33].repeat(4, 0))
    batch = {"input_ids": seq[:, :-1], "labels": seq[:, 1:]}

    params = model.init(jax.random.key(0), batch["input_ids"],
                        deterministic=True)["params"]
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    from dna_tpu.train.tasks import lm_loss

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply({"params": p}, batch["input_ids"],
                                 deterministic=True)
            return lm_loss(logits, batch)[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < 0.5, losses[::10]  # deterministic pattern → near-zero CE


def test_hyena_num_blocks_first_block_matches():
    """num_blocks=z makes the long conv block-local (reference
    `hyena.py:343,358-360`). Since the conv is causal and filter(L/z) ==
    filter(L)[:L/z], the FIRST block's outputs must be bit-identical to the
    num_blocks=1 operator with the same params."""
    kw = dict(d_model=16, l_max=64, order=2, filter_order=16,
              filter_emb_dim=5, dtype=jnp.float32)
    op1 = HyenaOperator(num_blocks=1, **kw)
    op2 = HyenaOperator(num_blocks=2, **kw)
    u = jax.random.normal(jax.random.key(1), (2, 64, 16))
    params = op1.init(jax.random.key(0), u)
    y1 = op1.apply(params, u)
    y2 = op2.apply(params, u)
    assert y2.shape == y1.shape
    np.testing.assert_allclose(np.asarray(y2[:, :32]), np.asarray(y1[:, :32]),
                               atol=1e-5)
    # and the blocks are genuinely independent: the long conv must NOT carry
    # information across the boundary (only the short conv's k-1=2 taps do)
    u_pert = u.at[:, :16].add(3.0)  # perturb deep inside block 1
    y2p = op2.apply(params, u_pert)
    np.testing.assert_allclose(np.asarray(y2p[:, 34:]), np.asarray(y2[:, 34:]),
                               atol=1e-5)
    # whereas with one block the perturbation propagates across the boundary
    # (the init filter decays fast, so compare leakage magnitudes, not an
    # absolute threshold)
    y1p = op1.apply(params, u_pert)
    leak_z1 = np.abs(np.asarray(y1p[:, 34:]) - np.asarray(y1[:, 34:])).max()
    leak_z2 = np.abs(np.asarray(y2p[:, 34:]) - np.asarray(y2[:, 34:])).max()
    assert leak_z1 > 100 * max(leak_z2, 1e-9), (leak_z1, leak_z2)


def test_hyena_num_blocks_rejects_indivisible():
    op = HyenaOperator(d_model=8, l_max=48, order=2, filter_order=8,
                       filter_emb_dim=5, num_blocks=5, dtype=jnp.float32)
    u = jnp.zeros((1, 48, 8))
    import pytest
    with pytest.raises(ValueError, match="num_blocks"):
        op.init(jax.random.key(0), u)
