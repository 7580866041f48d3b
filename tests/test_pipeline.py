"""GPipe pipeline executor: forward + gradients vs sequential reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dna_tpu.parallel.pipeline import gpipe, microbatch, unmicrobatch


def _mesh(pp):
    from jax.experimental import mesh_utils

    devs = mesh_utils.create_device_mesh((pp,), devices=jax.devices()[:pp])
    return Mesh(devs, ("pp",))


def _stage_fn(params, x):
    w, b = params
    return jnp.tanh(x @ w + b)


def _make_params(key, pp, d):
    kw, kb = jax.random.split(key)
    w = jax.random.normal(kw, (pp, d, d)) * 0.3
    b = jax.random.normal(kb, (pp, d)) * 0.1
    return (w, b)


def _sequential(params, x):
    w, b = params
    for i in range(w.shape[0]):
        x = _stage_fn((w[i], b[i]), x)
    return x


@pytest.mark.parametrize("pp,n_micro", [(2, 4), (4, 4), (4, 8)])
def test_gpipe_forward_matches_sequential(pp, n_micro):
    mesh = _mesh(pp)
    d = 16
    params = _make_params(jax.random.key(0), pp, d)
    x = jax.random.normal(jax.random.key(1), (8 * n_micro // 8 * 8, d))
    x = jax.random.normal(jax.random.key(1), (n_micro * 4, d))

    xm = microbatch(x, n_micro)
    out = jax.jit(lambda p, xm: gpipe(_stage_fn, p, xm, mesh=mesh))(params, xm)
    out = unmicrobatch(out)
    ref = _sequential(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gpipe_grads_match_sequential():
    pp, n_micro, d = 4, 4, 8
    mesh = _mesh(pp)
    params = _make_params(jax.random.key(2), pp, d)
    x = jax.random.normal(jax.random.key(3), (n_micro * 2, d))

    def loss_pipe(params):
        out = gpipe(_stage_fn, params, microbatch(x, n_micro), mesh=mesh)
        return (unmicrobatch(out) ** 2).sum()

    def loss_seq(params):
        return (_sequential(params, x) ** 2).sum()

    gp = jax.jit(jax.grad(loss_pipe))(params)
    gs = jax.jit(jax.grad(loss_seq))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_pipelined_bert_matches_scan_and_trains():
    """PipelinedBertForMLM with pp=2 must match its own pp=1 (lax.scan)
    forward given identical params, and train."""
    import optax
    from dna_tpu.config.core import ModelConfig
    from dna_tpu.models.pipelined import PipelinedBertForMLM
    from dna_tpu.train.tasks import mlm_loss

    cfg = ModelConfig(vocab_size=32, d_model=32, n_layers=4, n_heads=2,
                      d_ff=64, use_flash=False, dtype="float32")
    mesh = _mesh(2)
    ids = jax.random.randint(jax.random.key(0), (8, 16), 7, 11)

    seq_model = PipelinedBertForMLM(cfg, pp=1)
    pp_model = PipelinedBertForMLM(cfg, pp=2, n_microbatches=4, mesh=mesh)

    params = seq_model.init(jax.random.key(1), ids, None,
                            deterministic=True)["params"]
    out_seq = seq_model.apply({"params": params}, ids, None,
                              deterministic=True)
    out_pp = pp_model.apply({"params": params}, ids, None, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_pp), np.asarray(out_seq),
                               atol=2e-4)

    # trains under the pipeline
    rng = np.random.default_rng(0)
    base = rng.integers(7, 11, (8, 16)).astype(np.int32)
    mask = rng.random((8, 16)) < 0.3
    batch = {"input_ids": jnp.asarray(np.where(mask, 3, base)),
             "labels": jnp.asarray(np.where(mask, base, -100))}
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = pp_model.apply({"params": p}, batch["input_ids"], None,
                                    deterministic=True)
            return mlm_loss(logits, batch)[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    first = None
    for _ in range(30):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < first - 0.2, (first, float(loss))


def test_gpipe_aux_side_input_indexes_per_microbatch():
    """aux[m] must reach the stage working on microbatch m at every stage."""
    pp, n_micro, d = 2, 4, 8
    mesh = _mesh(pp)
    params = _make_params(jax.random.key(4), pp, d)
    x = jax.random.normal(jax.random.key(5), (n_micro * 2, d))
    # per-microbatch additive aux (broadcast over rows)
    aux = jnp.arange(n_micro, dtype=x.dtype)[:, None, None] * jnp.ones(
        (n_micro, 2, d), x.dtype)

    def stage_aux(p, h, a):
        return _stage_fn(p, h) + a

    out = unmicrobatch(gpipe(stage_aux, params, microbatch(x, n_micro),
                             mesh=mesh, aux=aux))

    w, b = params
    ref = x
    for i in range(pp):
        ref = _stage_fn((w[i], b[i]), microbatch(ref, n_micro))
        ref = unmicrobatch(ref + aux)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipelined_bert_mask_parity_with_padding():
    """The pp model must honor attention_mask: padded inputs give the same
    logits on real positions as the pp=1 path (VERDICT weak #10)."""
    from dna_tpu.config.core import ModelConfig
    from dna_tpu.models.pipelined import PipelinedBertForMLM

    cfg = ModelConfig(name="dnabert2_pp", vocab_size=32, d_model=32,
                      n_layers=4, n_heads=4, d_ff=64, use_flash=False,
                      dtype="float32")
    ids = jax.random.randint(jax.random.key(0), (4, 16), 7, 12)
    mask = jnp.asarray(np.tile([1] * 12 + [0] * 4, (4, 1)), jnp.int32)

    seq_model = PipelinedBertForMLM(cfg, pp=1)
    params = seq_model.init(jax.random.key(1), ids, mask,
                            deterministic=True)["params"]
    ref = seq_model.apply({"params": params}, ids, mask, deterministic=True)

    mesh = _mesh(2)
    pp_model = PipelinedBertForMLM(cfg, pp=2, n_microbatches=2, mesh=mesh)
    with mesh:
        out = pp_model.apply({"params": params}, ids, mask,
                             deterministic=True)
    np.testing.assert_allclose(np.asarray(out[:, :12]),
                               np.asarray(ref[:, :12]), atol=2e-4)
    # and masked vs unmasked differ (the mask is actually applied)
    with mesh:
        out_nomask = pp_model.apply({"params": params}, ids, None,
                                    deterministic=True)
    assert np.abs(np.asarray(out) - np.asarray(out_nomask)).max() > 1e-4


def test_pp_with_sp_rejected_at_config_time():
    """pp×sp would silently compute block-local attention inside the gpipe
    shard_map (cp wrappers are disabled there) — must be a ConfigError."""
    import pytest
    from dna_tpu.config.core import MeshConfig
    from dna_tpu.parallel.mesh import ConfigError, resolve_mesh_shape

    with pytest.raises(ConfigError, match="pp=2 with sp=2"):
        resolve_mesh_shape(MeshConfig(dp=1, fsdp=1, tp=1, pp=2, sp=2), 4)
    # pp alone and sp alone remain fine
    assert resolve_mesh_shape(
        MeshConfig(dp=2, fsdp=1, tp=1, pp=2, sp=1), 4) == (2, 1, 1, 2, 1, 1)
    assert resolve_mesh_shape(
        MeshConfig(dp=2, fsdp=1, tp=1, pp=1, sp=2), 4) == (2, 1, 1, 1, 2, 1)


def test_pipelined_bert_tp_inside_pp_trains():
    """tp×pp composition (VERDICT r3 #5): gpipe is manual only over pp
    (shard_map auto axes), so GSPMD keeps tensor-parallel param shardings
    alive inside pipeline stages. One full train step on a dp2×pp2×tp2 mesh;
    stacked wqkv must be sharded over BOTH pp (layers) and tp (heads)."""
    import numpy as np
    import optax

    from dna_tpu.config.core import ModelConfig
    from dna_tpu.models.pipelined import PipelinedBertForMLM
    from dna_tpu.parallel.mesh import logical_rules
    from dna_tpu.train.state import create_train_state
    from dna_tpu.train.step import make_train_step
    from dna_tpu.train.tasks import mlm_loss

    from dna_tpu.config.core import MeshConfig
    from dna_tpu.parallel.mesh import build_mesh

    mesh = build_mesh(MeshConfig(dp=2, fsdp=1, tp=2, pp=2, sp=1))
    cfg = ModelConfig(name="dnabert2_pp", vocab_size=64, d_model=32,
                      n_layers=4, n_heads=4, d_ff=64, use_flash=False,
                      dtype="float32")
    model = PipelinedBertForMLM(cfg, pp=2, n_microbatches=2, mesh=mesh)
    dummy = jnp.zeros((4, 32), jnp.int32)

    def init_params(rng):
        return model.init(rng, dummy, None, deterministic=True)["params"]

    tx = optax.adamw(1e-3)
    state, shardings = create_train_state(init_params, tx, mesh,
                                          logical_rules(), jax.random.key(0))
    import flax.linen as nn

    wqkv = nn.meta.unbox(state.params)["layers"]["attention"]["wqkv"]["kernel"]
    spec = wqkv.sharding.spec  # [n_layers, d_model, 3*d_model]
    assert spec[0] == "pp", spec
    assert "tp" in tuple(spec), spec

    step = make_train_step(model, mlm_loss, tx, mesh, logical_rules(),
                           shardings)
    ids = np.random.default_rng(0).integers(7, 12, (8, 32)).astype(np.int32)
    labels = np.where(np.random.default_rng(1).random(ids.shape) < 0.2,
                      ids, -100).astype(np.int32)
    state, metrics = step(state, {"input_ids": ids, "labels": labels})
    assert np.isfinite(float(metrics["loss"]))
