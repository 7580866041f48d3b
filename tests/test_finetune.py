"""Finetune harness: pretrain → backbone transfer → seed sweep with MCC."""

import numpy as np

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
