"""Resume exactness + multi-host data feeding (VERDICT round-1 items 4/5/6).

The loader's resume contract is the reference fault-tolerant sampler's
fast-forward guarantee (`fault_tolerant_sampler.py:111-115`): a checkpoint
taken after consuming batch N resumes at exactly batch N+1 — regardless of
producer-thread prefetch depth.
"""

import numpy as np
import jax
import pytest

from dna_tpu.data.loader import LoaderState, ShardedLoader
from dna_tpu.data.synthetic import SyntheticLMDataset
from dna_tpu.data.tokenizers import CharTokenizer
from dna_tpu.parallel.mesh import build_mesh
from dna_tpu.config.core import MeshConfig
from dna_tpu.parallel.multihost import make_global_batch
from dna_tpu.train.optim import make_accum_schedule


def _ds(n=64, L=16):
    return SyntheticLMDataset(CharTokenizer(), max_length=L, num_samples=n)


def _first_ids(batch):
    return np.asarray(batch["input_ids"])


def test_loader_state_tracks_consumption_not_production():
    ds = _ds()
    # uninterrupted run: record 10 batches
    ref = [b["input_ids"].copy() for b in ShardedLoader(
        ds, 8, seed=3, prefetch=4).take(10)]

    # consume 5 with a deep prefetch, snapshot the state mid-iteration
    loader = ShardedLoader(ds, 8, seed=3, prefetch=4)
    it = iter(loader)
    for _ in range(5):
        next(it)
    snap = LoaderState(loader.state.epoch, loader.state.step)
    # prefetch must NOT have advanced the snapshot past the consumed point
    assert (snap.epoch, snap.step) == (0, 5)

    # resume from the snapshot: batches 6..10 match the uninterrupted run
    resumed = ShardedLoader(ds, 8, seed=3, prefetch=4, state=snap)
    for j, b in enumerate(resumed.take(5)):
        np.testing.assert_array_equal(b["input_ids"], ref[5 + j],
                                      err_msg=f"batch {5 + j} diverged")


def test_loader_resume_across_epoch_boundary():
    ds = _ds(n=32)  # 4 batches/epoch at batch 8
    ref = [b["input_ids"].copy() for b in ShardedLoader(ds, 8, seed=0).take(9)]
    loader = ShardedLoader(ds, 8, seed=0)
    it = iter(loader)
    for _ in range(6):  # into epoch 1
        next(it)
    assert (loader.state.epoch, loader.state.step) == (1, 2)
    resumed = ShardedLoader(ds, 8, seed=0, state=loader.state)
    for j, b in enumerate(resumed.take(3)):
        np.testing.assert_array_equal(b["input_ids"], ref[6 + j])


def test_two_hosts_partition_the_global_batch_exactly():
    ds = _ds()
    single = next(iter(ShardedLoader(ds, 8, seed=1)))
    h0 = next(iter(ShardedLoader(ds, 8, seed=1, host_id=0, host_count=2)))
    h1 = next(iter(ShardedLoader(ds, 8, seed=1, host_id=1, host_count=2)))
    np.testing.assert_array_equal(
        np.concatenate([_first_ids(h0), _first_ids(h1)]), _first_ids(single))


def test_make_global_batch_shards_inputs_and_replicates_targets():
    mesh = build_mesh(MeshConfig(dp=4, sp=2))
    batch = {
        "input_ids": np.zeros((8, 16), np.int32),
        "labels": np.zeros((8, 3), np.float32),   # [B, n_targets]: no sp!
        "attention_mask": np.ones((8, 16), np.int32),
    }
    out = make_global_batch(batch, mesh)
    specs = {k: v.sharding.spec for k, v in out.items()}
    assert specs["input_ids"] == jax.sharding.PartitionSpec(("dp", "fsdp"), "sp")
    assert specs["attention_mask"][1] == "sp"
    # rank-2 non-sequence labels keep axis 1 replicated
    assert len([a for a in specs["labels"] if a is not None]) == 1


def test_make_global_batch_rank1_labels():
    mesh = build_mesh(MeshConfig(dp=8))
    batch = {"input_ids": np.zeros((8, 16), np.int32),
             "labels": np.zeros((8,), np.int32)}
    out = make_global_batch(batch, mesh)
    assert out["labels"].shape == (8,)


def test_accum_schedule_piecewise():
    stages = ((64, 8, 4), (128, 4, 6, 2), (256, 2, 4, 4))
    sched = make_accum_schedule(stages)
    # optimizer-step stage extents: 4/1=4, 6//2=3, 4//4=1
    expect = [1] * 4 + [2] * 3 + [4] * 1
    got = [int(sched(g)) for g in range(len(expect))]
    assert got == expect
    assert int(sched(100)) == 4  # clamps to the last stage

    assert make_accum_schedule(((64, 8, 4), (128, 4, 6))) is None


def test_trainloop_uses_process_slots(monkeypatch):
    """TrainLoop must construct loaders with this process's host slot."""
    from dna_tpu.experiments import build, get_experiment
    from dna_tpu.train.loop import TrainLoop

    cfg = get_experiment("hg38_hyena_tiny",
                         ["train.steps=1", "data.num_samples=256",
                          "data.batch_size=8", "train.log_every=0"])
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        exp = build(cfg)
    loop = TrainLoop(exp, verbose=False)
    slots = loop._host_slots()
    assert slots == {"host_id": jax.process_index(),
                     "host_count": jax.process_count()}

    captured = {}
    orig = ShardedLoader.__init__

    def spy(self, *a, **kw):
        captured.update(kw)
        return orig(self, *a, **kw)

    monkeypatch.setattr(ShardedLoader, "__init__", spy)
    loop.run(steps=1)
    assert captured.get("host_id") == jax.process_index()
    assert captured.get("host_count") == jax.process_count()


def test_resharded_restore_mesh_a_to_mesh_b(tmp_path):
    """Save a TrainState on one mesh, restore it onto a DIFFERENT mesh via
    orbax abstract state (the reference's `shard_state_dict_tp` equivalence,
    PARITY §2.6) — params must match exactly and a train step must run on
    the new mesh."""
    import jax.numpy as jnp

    from dna_tpu.config.core import (DataConfig, ExperimentConfig, MeshConfig,
                                     ModelConfig, OptimizerConfig,
                                     SchedulerConfig, TaskConfig, TrainConfig)
    from dna_tpu.data.loader import ShardedLoader
    from dna_tpu.experiments import build
    from dna_tpu.train.checkpoint import CheckpointManager
    from dna_tpu.train.state import create_train_state
    from dna_tpu.train.step import make_train_step

    cfg = ExperimentConfig(
        name="reshard",
        model=ModelConfig(name="dnabert2", vocab_size=128, d_model=64,
                          n_layers=2, n_heads=4, d_ff=128, use_flash=False,
                          dtype="float32"),
        data=DataConfig(dataset="synthetic_mlm", tokenizer="char",
                        max_length=32, batch_size=16, num_samples=32),
        task=TaskConfig(name="mlm"),
        optimizer=OptimizerConfig(),
        scheduler=SchedulerConfig(warmup_steps=2, total_steps=10),
        train=TrainConfig(steps=1),
    )

    def make(mesh_cfg):
        mesh = build_mesh(mesh_cfg)
        exp = build(cfg, mesh=mesh)
        dummy = jnp.zeros((2, 32), jnp.int32)
        init = lambda r: exp.model.init(r, dummy, None,
                                        deterministic=True)["params"]
        state, sh = create_train_state(init, exp.tx, mesh, exp.rules,
                                       jax.random.key(0))
        step = make_train_step(exp.model, exp.task_fn, exp.tx, mesh,
                               exp.rules, sh)
        return mesh, exp, state, sh, step

    # mesh A: pure dp. Train one step so opt state is non-trivial, save.
    mesh_a, exp_a, state_a, _, step_a = make(MeshConfig(dp=8, fsdp=1, tp=1))
    loader = ShardedLoader(exp_a.dataset, 16, seed=0)
    batch = next(iter(loader))
    state_a, _ = step_a(state_a, batch)
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    ckpt.save(1, state_a, None)

    # mesh B: fsdp x tp — different layout for params AND opt state
    mesh_b, exp_b, state_b, sh_b, step_b = make(MeshConfig(dp=1, fsdp=4, tp=2))
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        state_b)
    restored, _, _ = ckpt.restore(abstract)
    ckpt.close()

    # restored params equal the mesh-A params exactly
    flat_a = jax.tree_util.tree_leaves(jax.device_get(state_a.params))
    flat_b = jax.tree_util.tree_leaves(jax.device_get(restored.params))
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the restored state trains on the new mesh
    restored, metrics = step_b(restored, batch)
    assert np.isfinite(float(metrics["loss"]))


# ---------------------------------------------------------------------------
# multi-host host-metric reduction (VERDICT r3 #4): local_rows +
# all_hosts_concat must reproduce the single-host metric at any world size.
# Simulated with a fake 2-process slot layout (no real pod in this env).
# ---------------------------------------------------------------------------


def test_local_rows_slices_this_hosts_slab(monkeypatch):
    from dna_tpu.parallel import multihost

    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    arr = jax.device_put(x)  # fully addressable
    # single host: identity
    np.testing.assert_array_equal(multihost.local_rows(arr), x)
    # fake host 1 of 2: rows [4, 8)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    np.testing.assert_array_equal(multihost.local_rows(arr), x[4:8])


class _FakeShard:
    def __init__(self, index, data):
        self.index = index
        self.data = data


class _FakeGlobalArray:
    """Mimics a non-fully-addressable jax.Array: only this host's shards are
    visible, split along both batch and sequence axes."""

    is_fully_addressable = False

    def __init__(self, full, host_rows, seq_splits):
        self.shape = full.shape
        self.dtype = full.dtype
        self.addressable_shards = []
        r0, r1 = host_rows
        S = full.shape[1]
        step = S // seq_splits
        for j in range(seq_splits):
            idx = (slice(r0, r1), slice(j * step, (j + 1) * step))
            self.addressable_shards.append(
                _FakeShard(idx, full[idx]))


def test_local_rows_assembles_from_shards(monkeypatch):
    from dna_tpu.parallel import multihost

    full = np.arange(8 * 6, dtype=np.float32).reshape(8, 6)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    arr = _FakeGlobalArray(full, host_rows=(4, 8), seq_splits=3)
    np.testing.assert_array_equal(multihost.local_rows(arr), full[4:8])


def test_all_hosts_concat_matches_single_host_metric(monkeypatch):
    """MCC computed from gathered per-host slabs == MCC from the full set."""
    from dna_tpu.parallel import multihost
    from dna_tpu.train import metrics_host

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(32, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=(32,))
    want = metrics_host.compute_metric("mcc", labels, logits)

    # fake 2-process world: process_allgather stacks per-host slabs
    slabs_logits = [logits[:16], logits[16:]]
    slabs_labels = [labels[:16], labels[16:]]
    monkeypatch.setattr(jax, "process_count", lambda: 2)

    class _FakeMHU:
        @staticmethod
        def process_allgather(local):
            if local.shape == slabs_logits[0].shape and local.dtype == np.float32:
                return np.stack(slabs_logits)
            return np.stack(slabs_labels)

    import importlib

    jax_experimental = importlib.import_module("jax.experimental")
    monkeypatch.setattr(jax_experimental, "multihost_utils", _FakeMHU,
                        raising=False)
    import sys

    monkeypatch.setitem(sys.modules, "jax.experimental.multihost_utils",
                        _FakeMHU)
    got_logits = multihost.all_hosts_concat(slabs_logits[0])
    got_labels = multihost.all_hosts_concat(slabs_labels[0])
    np.testing.assert_array_equal(got_logits, logits)
    np.testing.assert_array_equal(got_labels, labels)
    assert metrics_host.compute_metric("mcc", got_labels, got_logits) == want
