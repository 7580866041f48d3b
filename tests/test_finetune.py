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
