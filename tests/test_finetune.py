"""Finetune harness: pretrain → backbone transfer → seed sweep with MCC."""

import numpy as np
from pathlib import Path

from dna_tpu.config.core import (
    DataConfig,
    ExperimentConfig,
    MeshConfig,
    ModelConfig,
    OptimizerConfig,
    SchedulerConfig,
    TaskConfig,
    TrainConfig,
)
from dna_tpu.data.synthetic import SyntheticClassificationDataset
from dna_tpu.finetune import seed_sweep
from dna_tpu.parallel.mesh import build_mesh


def _cls_cfg(steps=40):
    return ExperimentConfig(
        name="ft_test",
        model=ModelConfig(name="denoise_cnn", d_model=32, n_classes=2,
                          dtype="float32"),
        data=DataConfig(dataset="synthetic_cls", tokenizer="char",
                        max_length=64, batch_size=16, num_samples=256),
        task=TaskConfig(name="multiclass"),
        optimizer=OptimizerConfig(name="adamw", lr=3e-3, weight_decay=1e-5,
                                  grad_clip=1.0),
        scheduler=SchedulerConfig(name="constant", warmup_steps=1,
                                  total_steps=steps),
        train=TrainConfig(steps=steps, eval_every=20, eval_steps=4,
                          log_every=0),
        mesh=MeshConfig(dp=4, fsdp=1, tp=1),
    )


def test_seed_sweep_aggregates():
    cfg = _cls_cfg()
    mesh = build_mesh(cfg.mesh)
    eval_ds = SyntheticClassificationDataset(max_length=64, num_samples=128,
                                             seed=999)
    agg = seed_sweep(cfg, seeds=[1, 2], monitor="val/mcc",
                     host_metrics=("mcc", "f1"), eval_dataset=eval_ds,
                     mesh=mesh)
    assert len(agg["per_seed"]) == 2
    assert agg["mean"] is not None
    # planted-motif task: the CNN should beat chance clearly
    assert agg["mean"] > 0.3, agg
    assert agg["min"] <= agg["mean"] <= agg["max"]


def test_seed_sweep_writes_result_artifacts(tmp_path):
    """`pybash/result_*.txt` + `mean_and_range_diff.csv` parity artifacts."""
    import csv
    import warnings

    from dna_tpu.experiments import get_experiment
    from dna_tpu.finetune import seed_sweep

    cfg = get_experiment("nt_hyena", [
        "model.d_model=32", "model.n_layers=1", "model.d_ff=64",
        "model.dtype=float32", "data.batch_size=8", "data.num_samples=64",
        "train.steps=2", "train.eval_every=2", "train.eval_steps=1",
        "train.log_every=0", "scheduler.warmup_steps=1",
        "scheduler.total_steps=4", "model.max_len=128", "data.max_length=128",
        "model.hyena_filter_emb_dim=5", "model.hyena_filter_order=16",
    ])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        agg = seed_sweep(cfg, seeds=(1, 2), monitor="val/loss",
                         monitor_mode="min", host_metrics=(),
                         output_dir=str(tmp_path))
    assert agg["mean"] is not None
    txt = tmp_path / "result_H4_nt_hyena.txt"
    assert txt.exists()
    lines = txt.read_text().strip().splitlines()
    assert len(lines) == 2 and lines[0].startswith("1 ")
    with open(tmp_path / "mean_and_range_diff.csv") as f:
        rows = list(csv.reader(f))
    assert rows[0][:3] == ["", "Mean", "Range Difference"]
    assert rows[1][0] == "result_H4_nt_hyena.txt"
    assert len(rows[1]) == 3 + 2


def test_eval_emits_confusion_matrix_artifact(tmp_path):
    """evaluate() on a classification task must log an eval_artifacts record
    (confusion matrix + per-class P/R/F1) to the JSONL stream — the
    reference's per-epoch wandb heatmaps (`callbacks/wandb.py:90-123`)."""
    import json

    from dna_tpu.experiments import build
    from dna_tpu.train.loop import TrainLoop

    cfg = _cls_cfg(steps=8)
    mesh = build_mesh(cfg.mesh)
    exp = build(cfg, mesh=mesh)
    eval_ds = SyntheticClassificationDataset(max_length=64, num_samples=64,
                                             seed=999)
    tr = TrainLoop(exp, eval_dataset=eval_ds, host_metrics=("mcc",),
                   log_dir=str(tmp_path), verbose=False)
    tr.run(steps=2)
    out = tr.evaluate(max_batches=2)
    assert "val/mcc" in out
    recs = [json.loads(line) for f in tmp_path.glob("*.jsonl")
            for line in open(f) if line.strip()]
    arts = [r for r in recs if r.get("type") == "eval_artifacts"]
    assert arts, f"no eval_artifacts record in {len(recs)} log records"
    art = arts[-1]
    cm = np.asarray(art["confusion_matrix"])
    assert cm.shape == (2, 2)
    assert cm.sum() == 32  # 2 batches x 16
    for key in ("precision", "recall", "f1"):
        vals = art["per_class"][key]
        assert len(vals) == 2
        assert all(0.0 <= v <= 1.0 for v in vals)


def test_quality_pipeline_regenerates_nt_artifact(tmp_path):
    """The committed results/fixture_sweeps artifacts must be reproducible
    from the pipeline script's own config (VERDICT r2 #3): same task, fewer
    seeds, same artifact format as the reference's `pybash/result_*.txt` +
    `mean_and_range_diff.csv`."""
    import csv
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "quality_pipeline",
        str(Path(__file__).resolve().parent.parent / "scripts" /
            "quality_pipeline.py"))
    qp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(qp)

    from dna_tpu.experiments import get_experiment
    from dna_tpu.finetune import seed_sweep

    exp_name, extra, monitor, host_metrics = qp.SWEEPS[0]  # nt_hyena / H4
    fast = [o for o in qp.TINY if not o.startswith(("train.steps",
                                                    "train.eval_every"))]
    fast += ["train.steps=10", "train.eval_every=5"]
    cfg = get_experiment(exp_name, fast + extra)
    agg = seed_sweep(cfg, seeds=[1, 2], monitor=monitor,
                     host_metrics=host_metrics, output_dir=str(tmp_path))
    assert len(agg["per_seed"]) == 2

    txt = (tmp_path / "result_H4_nt_hyena.txt").read_text().splitlines()
    assert len(txt) == 2
    for line, seed in zip(txt, (1, 2)):
        s, v = line.split()
        assert int(s) == seed
        float(v)

    rows = list(csv.reader(open(tmp_path / "mean_and_range_diff.csv")))
    assert rows[0][:3] == ["", "Mean", "Range Difference"]
    assert rows[1][0] == "result_H4_nt_hyena.txt"
    assert len(rows[1]) == 3 + 2  # mean, range, per-seed values
