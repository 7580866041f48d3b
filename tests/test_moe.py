"""Mixture-of-Experts MLP + ep mesh axis (capability beyond the reference).

Coverage mirrors the kernel-test strategy elsewhere in the suite: an exact
oracle (MoE with enough capacity == gate-weighted dense experts computed
naively), routing/capacity semantics, the aux-loss plumbing through the
train step, and an ep-sharded end-to-end train step on the CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dna_tpu.config.core import (DataConfig, ExperimentConfig, MeshConfig,
                                 ModelConfig, OptimizerConfig,
                                 SchedulerConfig, TaskConfig, TrainConfig)
from dna_tpu.models.moe import MoEMlp


def _params(model, x, seed=0):
    return model.init(jax.random.key(seed), x)


def test_moe_matches_naive_dense_combine():
    """With capacity ample enough that nothing drops, MoE output must equal
    the naive Σ_k gate_k · FFN_{e_k}(x) computed densely per token."""
    D, F, E, K = 16, 32, 4, 2
    m = MoEMlp(d_ff=F, d_model=D, n_experts=E, top_k=K,
               capacity_factor=float(E),  # C = N·K: nothing can drop
               approximate=False,  # oracle below uses the exact-erf form
               dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(1), (2, 8, D), jnp.float32)
    variables = _params(m, x)
    out = m.apply(variables, x)

    import flax.linen as nn
    p = nn.meta.unbox(variables["params"])
    wr, w1, w2 = p["router"], p["w1"], p["w2"]
    xf = np.asarray(x).reshape(-1, D)
    logits = xf @ np.asarray(wr)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    topk = np.argsort(-probs, axis=-1)[:, :K]
    expect = np.zeros_like(xf)
    from scipy.special import erf

    def gelu(v):
        return v * 0.5 * (1.0 + erf(v / np.sqrt(2.0)))

    for n in range(xf.shape[0]):
        g = probs[n, topk[n]]
        g = g / g.sum()
        for k in range(K):
            e = topk[n, k]
            h = gelu(xf[n] @ np.asarray(w1)[e])
            expect[n] += g[k] * (h @ np.asarray(w2)[e])
    np.testing.assert_allclose(np.asarray(out).reshape(-1, D), expect,
                               atol=2e-5, rtol=1e-4)


def test_moe_capacity_drops_overflow():
    """With capacity 1 slot/expert, total combined mass must shrink (tokens
    past capacity are dropped, not silently duplicated)."""
    D, F, E = 8, 16, 2
    m_full = MoEMlp(d_ff=F, d_model=D, n_experts=E, top_k=1,
                    capacity_factor=float(E), dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(2), (1, 16, D), jnp.float32)
    variables = _params(m_full, x)
    out_full = m_full.apply(variables, x)
    m_tiny = MoEMlp(d_ff=F, d_model=D, n_experts=E, top_k=1,
                    capacity_factor=1.0 / 16.0, dtype=jnp.float32)  # C=1
    out_tiny = m_tiny.apply(variables, x)
    # exactly E slots survive → at most E non-zero rows
    nz = np.abs(np.asarray(out_tiny).reshape(-1, D)).sum(-1) > 1e-7
    assert nz.sum() <= E, nz.sum()
    assert not np.allclose(np.asarray(out_tiny), np.asarray(out_full))


def test_moe_aux_loss_sown_only_when_mutable():
    D, F = 8, 16
    m = MoEMlp(d_ff=F, d_model=D, n_experts=2, top_k=1, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(3), (1, 8, D), jnp.float32)
    variables = _params(m, x)
    # no mutable: no sow, plain output
    out = m.apply(variables, x)
    assert out.shape == x.shape
    # mutable: aux loss appears and is a positive scalar (≥1 at balance)
    out2, mut = m.apply(variables, x, mutable=["losses"])
    leaves = jax.tree_util.tree_leaves(mut["losses"])
    assert len(leaves) == 1
    aux = float(jnp.asarray(leaves[0]).sum())
    assert aux > 0.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


def test_moe_lm_trains_on_ep_mesh():
    """End-to-end: transformer LM with MoE MLPs, dp×ep mesh, loss falls and
    the aux loss is reported; expert weights land ep-sharded."""
    from dna_tpu.data.loader import ShardedLoader
    from dna_tpu.experiments import build
    from dna_tpu.parallel.mesh import build_mesh
    from dna_tpu.train.state import create_train_state
    from dna_tpu.train.step import make_train_step

    cfg = ExperimentConfig(
        name="moe_lm",
        model=ModelConfig(name="transformer_lm", vocab_size=64, d_model=32,
                          n_layers=2, n_heads=2, d_ff=64, use_flash=False,
                          dtype="float32", moe_experts=4, moe_top_k=2,
                          max_len=32),
        data=DataConfig(dataset="synthetic_lm", tokenizer="char",
                        max_length=32, batch_size=16, num_samples=64),
        task=TaskConfig(name="lm"),
        optimizer=OptimizerConfig(name="adamw", lr=3e-3),
        scheduler=SchedulerConfig(name="constant", warmup_steps=1,
                                  total_steps=30),
        train=TrainConfig(steps=20),
        mesh=MeshConfig(dp=4, fsdp=1, tp=1, pp=1, sp=1, ep=2),
    )
    mesh = build_mesh(cfg.mesh)
    exp = build(cfg, mesh=mesh)
    dummy = jnp.zeros((2, 32), jnp.int32)
    init = lambda r: exp.model.init(r, dummy, None, deterministic=True)["params"]
    state, sh = create_train_state(init, exp.tx, mesh, exp.rules,
                                   jax.random.key(0))

    # expert-dim params are sharded over ep
    import flax.linen as nn
    w1 = nn.meta.unbox(state.params)["backbone"]["layer_0"]["mlp"]["w1"]
    spec = w1.sharding.spec
    assert spec[0] == "ep", spec

    step = make_train_step(exp.model, exp.task_fn, exp.tx, mesh, exp.rules,
                           sh)
    losses = []
    for i, b in enumerate(ShardedLoader(exp.dataset, 16, seed=0)):
        if i >= 20:
            break
        state, metrics = step(state, b)
        losses.append(float(metrics["loss"]))
    assert "aux_loss" in metrics
    assert 0.0 < float(metrics["aux_loss"]) < 1.0
    assert losses[-1] < losses[0], (losses[0], losses[-1])


def test_moe_under_remat_keeps_aux_loss():
    """The sown aux loss must survive nn.remat around the block (flagship
    configs use remat)."""
    from dna_tpu.data.loader import ShardedLoader
    from dna_tpu.experiments import build
    from dna_tpu.parallel.mesh import build_mesh
    from dna_tpu.train.state import create_train_state
    from dna_tpu.train.step import make_train_step

    cfg = ExperimentConfig(
        name="moe_remat",
        model=ModelConfig(name="transformer_lm", vocab_size=64, d_model=32,
                          n_layers=2, n_heads=2, d_ff=64, use_flash=False,
                          dtype="float32", moe_experts=4, max_len=32,
                          remat=True),
        data=DataConfig(dataset="synthetic_lm", tokenizer="char",
                        max_length=32, batch_size=8, num_samples=16),
        task=TaskConfig(name="lm"),
        optimizer=OptimizerConfig(),
        scheduler=SchedulerConfig(warmup_steps=1, total_steps=5),
        train=TrainConfig(steps=1),
        mesh=MeshConfig(dp=4, ep=2),
    )
    mesh = build_mesh(cfg.mesh)
    exp = build(cfg, mesh=mesh)
    dummy = jnp.zeros((2, 32), jnp.int32)
    init = lambda r: exp.model.init(r, dummy, None,
                                    deterministic=True)["params"]
    state, sh = create_train_state(init, exp.tx, mesh, exp.rules,
                                   jax.random.key(0))
    step = make_train_step(exp.model, exp.task_fn, exp.tx, mesh, exp.rules,
                           sh)
    state, m = step(state, next(iter(ShardedLoader(exp.dataset, 8, seed=0))))
    assert np.isfinite(float(m["loss"]))
    assert float(m["aux_loss"]) > 0.0
