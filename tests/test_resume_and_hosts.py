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
