"""Train loop, checkpoint/resume, host metrics."""

import os

import jax
import numpy as np
import pytest

from dna_tpu.config.core import MeshConfig
from dna_tpu.experiments import build, get_experiment
from dna_tpu.parallel.mesh import build_mesh
from dna_tpu.train import metrics_host as mh


# ---------------- host metrics vs known values ----------------

def test_mcc_matches_sklearn_values():
    y_true = np.array([1, 1, 1, 0, 0, 0, 1, 0])
    y_pred = np.array([1, 0, 1, 0, 0, 1, 1, 0])
    # sklearn.metrics.matthews_corrcoef == 0.5 for this case
    assert abs(mh.mcc(y_true, y_pred) - 0.5) < 1e-9
    # perfect / inverted
    assert abs(mh.mcc(y_true, y_true) - 1.0) < 1e-9
    assert abs(mh.mcc(y_true, 1 - y_true) + 1.0) < 1e-9


def test_f1_variants():
    y_true = np.array([0, 1, 1, 0, 1])
    y_pred = np.array([0, 1, 0, 0, 1])
    # binary: tp=2 fp=0 fn=1 → 2*2/(4+0+1)=0.8
    assert abs(mh.f1(y_true, y_pred, "binary") - 0.8) < 1e-9
    assert abs(mh.f1(y_true, y_pred, "micro") - 0.8) < 1e-9


def test_roc_auc_rank_statistic():
    y = np.array([0, 0, 1, 1])
    s = np.array([0.1, 0.4, 0.35, 0.8])
    assert abs(mh.roc_auc(y, s) - 0.75) < 1e-9  # sklearn value
    assert mh.roc_auc(y, y.astype(float)) == 1.0


def test_pearson():
    x = np.arange(10.0)
    assert abs(mh.pearsonr(x, 2 * x + 1) - 1.0) < 1e-9
    assert abs(mh.pearsonr(x, -x) + 1.0) < 1e-9


def test_multilabel_auc():
    y = np.array([[0, 1], [1, 1], [1, 0], [0, 0]])
    s = np.array([[0.1, 0.9], [0.8, 0.7], [0.9, 0.2], [0.2, 0.1]])
    v = mh.roc_auc_multilabel(y, s)
    assert 0.9 < v <= 1.0


# ---------------- loop + checkpoint ----------------

def _loop(tmp_path, steps=6, resume=True):
    from dna_tpu.train.loop import TrainLoop

    cfg = get_experiment("dnabert2_pretrain_tiny", [
        "data.batch_size=16",
        f"train.checkpoint_dir={tmp_path}/ckpt",
        "train.checkpoint_every=3",
        "train.log_every=2",
        f"train.steps={steps}",
        f"train.resume={'true' if resume else 'false'}",
    ])
    mesh = build_mesh(MeshConfig(dp=4, fsdp=2))
    exp = build(cfg, mesh=mesh)
    return TrainLoop(exp, log_dir=str(tmp_path), verbose=False)


def test_loop_runs_and_checkpoints(tmp_path):
    loop = _loop(tmp_path)
    res = loop.run()
    assert res.steps_done == 6
    assert np.isfinite(res.final_metrics["loss"])
    assert loop.ckpt.latest_step() == 6
    loop.ckpt.close()

    # resume continues from step 6 without redoing work
    loop2 = _loop(tmp_path, steps=8)
    res2 = loop2.run()
    assert res2.steps_done == 2
    assert int(loop2.state.step) == 8
    loop2.ckpt.close()


def test_backbone_transfer():
    import flax
    import jax.numpy as jnp
    from dna_tpu.config.core import ModelConfig
    from dna_tpu.models.bert import BertForMLM, BertForSequenceClassification
    from dna_tpu.train.checkpoint import load_backbone

    mcfg = ModelConfig(vocab_size=32, d_model=16, n_layers=1, n_heads=2,
                       d_ff=32, use_flash=False, dtype="float32")
    ids = jnp.zeros((1, 8), jnp.int32)
    mlm = BertForMLM(mcfg).init(jax.random.key(0), ids, None,
                                deterministic=True)["params"]
    cls = BertForSequenceClassification(mcfg).init(
        jax.random.key(1), ids, None, deterministic=True)["params"]

    merged = load_backbone(cls, mlm, strict=False)
    # encoder weights transferred
    a = flax.traverse_util.flatten_dict(flax.core.unfreeze(merged))
    b = flax.traverse_util.flatten_dict(flax.core.unfreeze(mlm))
    key = next(p for p in a if "layer_0" in p and "wqkv" in p and p[-1] == "kernel")
    old = next(b[p] for p in b if "layer_0" in p and "wqkv" in p and p[-1] == "kernel")
    import numpy as np
    av = a[key].unbox() if hasattr(a[key], "unbox") else a[key]
    ov = old.unbox() if hasattr(old, "unbox") else old
    np.testing.assert_array_equal(np.asarray(av), np.asarray(ov))


def test_seqlen_warmup_stages(tmp_path):
    """Staged seqlen-warmup (reference SeqlenWarmupReload): params/optimizer
    carry across stage boundaries, each stage re-jits at its shape."""
    from dna_tpu.train.loop import TrainLoop

    cfg = get_experiment("dnabert2_pretrain_tiny", [
        "data.batch_size=16", "train.log_every=0",
    ])
    import dataclasses as dc

    cfg = dc.replace(cfg, train=dc.replace(
        cfg.train, seqlen_stages=((32, 16, 4), (64, 8, 4))))
    mesh = build_mesh(MeshConfig(dp=4, fsdp=2))
    exp = build(cfg, mesh=mesh)
    loop = TrainLoop(exp, verbose=False)
    res = loop.run_stages()
    assert int(loop.state.step) == 8  # 4 + 4 across both stages
    assert np.isfinite(res.final_metrics["loss"])


def test_named_eval_loaders(tmp_path):
    """Multiplexed named eval datasets report under their own prefixes."""
    from dna_tpu.data.synthetic import SyntheticMLMDataset
    from dna_tpu.train.loop import TrainLoop

    cfg = get_experiment("dnabert2_pretrain_tiny", [
        "data.batch_size=16", "train.steps=4", "train.eval_every=2",
        "train.eval_steps=2", "train.log_every=0",
    ])
    mesh = build_mesh(MeshConfig(dp=2))
    exp = build(cfg, mesh=mesh)
    val = SyntheticMLMDataset(exp.tokenizer, max_length=cfg.data.max_length,
                              num_samples=64, seed=77)
    test = SyntheticMLMDataset(exp.tokenizer, max_length=cfg.data.max_length,
                               num_samples=64, seed=88)
    loop = TrainLoop(exp, eval_dataset=val, eval_datasets={"test": test},
                     verbose=False)
    res = loop.run()
    evals = [h for h in res.history if any(k.startswith("test/") for k in h)]
    assert evals, res.history
    assert "val/loss" in evals[-1] and "test/loss" in evals[-1]


def test_debug_mode_caps_steps_and_validates(tmp_path):
    """Reference `config.debug` → fast_dev_run + validate_at_start
    (`src/utils/train.py:79-91`, `train.py:685-687`)."""
    from dna_tpu.data.synthetic import SyntheticMLMDataset
    from dna_tpu.train.loop import TrainLoop

    cfg = get_experiment("dnabert2_pretrain_tiny", [
        "data.batch_size=16", "train.steps=50", "train.debug=true",
        "train.eval_steps=1", "train.log_every=1",
    ])
    mesh = build_mesh(MeshConfig(dp=2))
    exp = build(cfg, mesh=mesh)
    val = SyntheticMLMDataset(exp.tokenizer, max_length=cfg.data.max_length,
                              num_samples=32, seed=5)
    loop = TrainLoop(exp, eval_dataset=val, verbose=False)
    res = loop.run()
    assert res.steps_done == 2  # debug_steps cap, not 50
    # val-at-start record present (step 0)
    assert any(h.get("step") == 0 and "val/loss" in h for h in res.history)


def test_track_param_norms(tmp_path):
    """Per-parameter grad-norm metrics (reference TrackNorms callback)."""
    cfg = get_experiment("dnabert2_pretrain_tiny", [
        "data.batch_size=16", "train.steps=2", "train.log_every=1",
        "train.track_param_norms=true",
    ])
    mesh = build_mesh(MeshConfig(dp=2))
    exp = build(cfg, mesh=mesh)
    from dna_tpu.train.loop import TrainLoop

    loop = TrainLoop(exp, verbose=False)
    res = loop.run()
    per_param = [k for k in res.history[-1] if k.startswith("grad_norm/")]
    assert len(per_param) > 3, res.history[-1].keys()
    assert all(np.isfinite(res.history[-1][k]) for k in per_param)


def test_resolution_stages(tmp_path):
    """Progressive resizing: stride subsampling, params carry across."""
    cfg = get_experiment("dnabert2_pretrain_tiny", [
        "data.batch_size=16", "train.log_every=0",
        'train.resolution_stages=[[4, 2], [1, 2]]',
    ])
    mesh = build_mesh(MeshConfig(dp=2))
    exp = build(cfg, mesh=mesh)
    from dna_tpu.train.loop import TrainLoop

    loop = TrainLoop(exp, verbose=False)
    res = loop.run_resolution_stages()
    assert int(loop.state.step) == 4
    assert np.isfinite(res.final_metrics["loss"])


def test_subsample_batch():
    from dna_tpu.train.loop import subsample_batch

    b = {"input_ids": np.arange(32).reshape(2, 16), "labels": np.ones((2, 16))}
    out = subsample_batch(b, 4)
    assert out["input_ids"].shape == (2, 4)
    np.testing.assert_array_equal(out["input_ids"][0], [0, 4, 8, 12])
    assert subsample_batch(b, 1) is b


def test_wandb_sink_with_fake_module(tmp_path, monkeypatch):
    """The wandb mirror engages when wandb is importable and degrades to
    JSONL-only otherwise (reference CustomWandbLogger semantics)."""
    import sys
    import types

    logged = []

    fake = types.ModuleType("wandb")

    class _Run:
        def log(self, rec, step=None):
            logged.append((step, rec))

        def finish(self):
            pass

    fake.init = lambda **kw: _Run()
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from dna_tpu.train.loop import MetricsLogger

    lg = MetricsLogger(str(tmp_path), "t", wandb_project="proj")
    lg.log({"loss": 1.0, "step": 3})
    lg.close()
    assert logged == [(3, {"loss": 1.0, "step": 3})]
    # JSONL written too
    with open(lg.path) as f:
        assert '"loss": 1.0' in f.read()


def test_wandb_sink_absent_is_noop(tmp_path, monkeypatch):
    import builtins
    import sys

    monkeypatch.setitem(sys.modules, "wandb", None)  # forces ImportError? no
    sys.modules.pop("wandb", None)
    real_import = builtins.__import__

    def deny(name, *a, **k):
        if name == "wandb":
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", deny)
    from dna_tpu.train.loop import MetricsLogger

    lg = MetricsLogger(str(tmp_path), "t2", wandb_project="proj")
    lg.log({"loss": 2.0, "step": 1})
    lg.close()
    assert lg._wandb is None


def test_act_norms_and_watch(tmp_path):
    """track_act_norms publishes per-layer `act_.../norm/i` scalars
    (reference `model.py:86-102`); wandb_watch samples ride under _watch/
    and are stripped from the JSONL stream."""
    from dna_tpu.train.loop import TrainLoop

    cfg = get_experiment("dnabert2_pretrain_tiny", [
        "data.batch_size=8",
        "train.steps=2",
        "train.log_every=1",
        "train.track_act_norms=true",
        "train.wandb_watch=true",
        "train.wandb_watch_freq=1",
    ])
    mesh = build_mesh(MeshConfig(dp=4, fsdp=2))
    exp = build(cfg, mesh=mesh)
    loop = TrainLoop(exp, log_dir=str(tmp_path), verbose=False)
    res = loop.run()
    acts = [k for k in res.final_metrics if k.startswith("act_")]
    n_layers = cfg.model.n_layers
    assert len(acts) == n_layers, acts
    for k in acts:
        assert np.isfinite(res.final_metrics[k])
        assert res.final_metrics[k] > 0
    # watch samples never leak into the scalar metric records
    assert not any(k.startswith("_watch/") for k in res.final_metrics)
    for rec in res.history:
        assert not any(k.startswith("_watch/") for k in rec)
