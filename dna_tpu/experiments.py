"""Named experiments and the wiring harness.

The reference's Hydra experiment groups (`configs/experiment/...`) become
registered Python functions returning `ExperimentConfig`; `build(cfg)` does
the auto-wiring the reference spreads across `SequenceLightningModule.setup`
(`train.py:162-214`) and the encoder/decoder attr tables
(`src/tasks/encoders.py:311-331`).
"""

from __future__ import annotations

import dataclasses
from dataclasses import replace
from typing import Any

from dna_tpu import registry
from dna_tpu.config.core import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    OptimizerConfig,
    SchedulerConfig,
    TaskConfig,
    TrainConfig,
)
from dna_tpu.data.tokenizers import get_tokenizer


# --------------------------------------------------------------------------
# Named experiments (reference `configs/experiment/` equivalents)
# --------------------------------------------------------------------------


@registry.experiment.register("dnabert2_pretrain")
def dnabert2_pretrain() -> ExperimentConfig:
    """DNABERT-2-117M MLM pretrain — the north-star workload (reference
    `configs/experiment/dnabert2/dnabert2_hg38_pretrain.yaml`)."""
    return ExperimentConfig(
        name="dnabert2_pretrain",
        # mlm_gather: masked-token-only LM head, like the reference's
        # masked-only prediction_scores (`bert_layers.py:817-833`) — cuts the
        # head matmul + fp32 CE to the gathered positions (measured +2%
        # tokens/sec at S=128). Budget 0.375 = 48 positions at S=128: the
        # per-token Bernoulli(0.15) mask makes a row's count Binomial(128,
        # 0.15) (mean 19.2, sd 4.0), so 48 is a ~7σ bound — overflow
        # (silently dropped positions) is ~1e-12 per row.
        model=ModelConfig(name="dnabert2", vocab_size=4096, d_model=768,
                          n_layers=12, n_heads=12, d_ff=3072, alibi=True,
                          mlm_gather=0.375),
        data=DataConfig(dataset="dnabert2", tokenizer="bpe", max_length=128,
                        batch_size=512, mlm_probability=0.15),
        task=TaskConfig(name="mlm"),
        # bf16 Adam moments halve the optimizer-state HBM traffic
        # (mu: 84.3 -> 83.6 ms/step r4; nu: 123.1 -> 122.6 at B=192 r5)
        # and are loss-neutral: 1000-step flagship 3-arm A/B
        # (results/mu_ab/) — fp32 8.0705 vs mu-bf16 8.0747 vs mu+nu-bf16
        # 8.0758. optimizer.{mu,nu}_dtype=float32 restores exact
        # reference numerics.
        optimizer=OptimizerConfig(name="adamw", lr=5e-4, weight_decay=1e-5,
                                  mu_dtype="bfloat16",
                                  nu_dtype="bfloat16"),
        scheduler=SchedulerConfig(name="linear_warmup", warmup_steps=120_000,
                                  total_steps=2_000_000),
        train=TrainConfig(steps=1000),
    )


@registry.experiment.register("dnabert2_pretrain_tiny")
def dnabert2_pretrain_tiny() -> ExperimentConfig:
    cfg = dnabert2_pretrain()
    return replace(
        cfg,
        name="dnabert2_pretrain_tiny",
        model=replace(cfg.model, d_model=128, n_layers=2, n_heads=4, d_ff=256),
        data=replace(cfg.data, batch_size=16, max_length=64, num_samples=1024,
                     tokenizer="char"),
        scheduler=replace(cfg.scheduler, warmup_steps=10, total_steps=200),
        train=replace(cfg.train, steps=50),
    )


@registry.experiment.register("hg38_hyena")
def hg38_hyena() -> ExperimentConfig:
    """HyenaDNA causal-LM pretrain on hg38 (reference
    `configs/experiment/hg38/hg38_hyena.yaml`: d_model 128, 2 layers,
    L=1024 char-level)."""
    return ExperimentConfig(
        name="hg38_hyena",
        model=ModelConfig(name="hyena_lm", d_model=256, n_layers=4, n_heads=1,
                          d_ff=1024, max_len=1024, hyena_order=2,
                          hyena_filter_order=64, hyena_filter_emb_dim=5),
        data=DataConfig(dataset="hg38", tokenizer="char",
                        max_length=1024, batch_size=256),
        task=TaskConfig(name="lm"),
        # filter_lr/lr_pos_emb: the reference pins the implicit-filter MLP at
        # the base lr with wd=0 and freezes the filter positional embedding
        # (`hg38_hyena.yaml:27-30` lr=${optimizer.lr}, wd=0, lr_pos_emb=0).
        optimizer=OptimizerConfig(name="adamw", lr=6e-4, weight_decay=0.1,
                                  filter_lr=6e-4, lr_pos_emb=0.0),
        scheduler=SchedulerConfig(name="cosine_warmup", warmup_steps=1000,
                                  total_steps=100_000),
        train=TrainConfig(steps=1000),
    )


@registry.experiment.register("hg38_hyena_tiny")
def hg38_hyena_tiny() -> ExperimentConfig:
    cfg = hg38_hyena()
    return replace(
        cfg, name="hg38_hyena_tiny",
        model=replace(cfg.model, d_model=64, d_ff=128, max_len=128,
                      hyena_filter_order=16, dtype="float32"),
        data=replace(cfg.data, max_length=128, batch_size=16, num_samples=1024),
        scheduler=replace(cfg.scheduler, warmup_steps=10, total_steps=200),
        train=replace(cfg.train, steps=50),
    )


@registry.experiment.register("caduceus_pretrain")
def caduceus_pretrain() -> ExperimentConfig:
    """Caduceus-ph MLM pretrain (reference Caduceus configs: bidirectional
    weight-tied Mamba, char tokenizer, MLM)."""
    return ExperimentConfig(
        name="caduceus_pretrain",
        model=ModelConfig(name="caduceus", d_model=118, n_layers=4,
                          d_state=16, bidirectional=True,
                          bidirectional_strategy="add", rcps=False),
        data=DataConfig(dataset="bert_hg38", tokenizer="char",
                        max_length=1024, batch_size=128),
        task=TaskConfig(name="mlm"),
        optimizer=OptimizerConfig(name="adamw", lr=8e-3, weight_decay=1e-5),
        scheduler=SchedulerConfig(name="cosine_warmup", warmup_steps=1000,
                                  total_steps=50_000),
        train=TrainConfig(steps=1000),
    )


@registry.experiment.register("caduceus_pretrain_tiny")
def caduceus_pretrain_tiny() -> ExperimentConfig:
    cfg = caduceus_pretrain()
    return replace(
        cfg, name="caduceus_pretrain_tiny",
        model=replace(cfg.model, d_model=32, n_layers=2, d_state=8,
                      dtype="float32"),
        data=replace(cfg.data, max_length=64, batch_size=16, num_samples=1024),
        scheduler=replace(cfg.scheduler, warmup_steps=10, total_steps=200),
        train=replace(cfg.train, steps=50),
    )


def _model_vocab_for_tokenizer(mcfg: ModelConfig, tokenizer) -> ModelConfig:
    """Auto-wire vocab size / pad id from the tokenizer (reference
    encoder `dataset_attrs` table semantics)."""
    vocab = max(tokenizer.vocab_size, 8)
    # round vocab up to a lane-friendly multiple for the MXU
    vocab = ((vocab + 127) // 128) * 128 if vocab > 128 else vocab
    return replace(mcfg, vocab_size=max(mcfg.vocab_size, vocab),
                   pad_token_id=tokenizer.pad_token_id,
                   mask_token_id=getattr(tokenizer, "mask_token_id",
                                         mcfg.mask_token_id))


@dataclasses.dataclass
class Experiment:
    """Everything `train.loop` needs, fully wired."""

    cfg: ExperimentConfig
    tokenizer: Any
    dataset: Any
    model: Any
    task_fn: Any
    tx: Any
    schedule: Any
    mesh: Any
    rules: Any
    eval_dataset: Any = None


def build(cfg: ExperimentConfig, mesh=None) -> Experiment:
    from dna_tpu.parallel.mesh import build_mesh, logical_rules
    from dna_tpu.train.optim import build_optimizer
    import dna_tpu.models  # noqa: F401 — populate registries
    import dna_tpu.data  # noqa: F401
    import dna_tpu.train  # noqa: F401
    import dna_tpu.catalog  # noqa: F401

    tokenizer = get_tokenizer(cfg.data.tokenizer, cfg.data.tokenizer_path)
    mcfg = _model_vocab_for_tokenizer(cfg.model, tokenizer)
    dataset = registry.dataset[cfg.data.dataset](tokenizer, cfg.data)
    eval_dataset = build_eval_dataset(cfg, tokenizer)
    model = registry.model[mcfg.name](mcfg)
    task_fn = registry.task[cfg.task.name]
    tx, schedule = build_optimizer(
        cfg.optimizer, cfg.scheduler,
        accum_stages=getattr(cfg.train, "seqlen_stages", ()))
    if mesh is None:
        mesh = build_mesh(cfg.mesh)
    return Experiment(
        cfg=replace(cfg, model=mcfg), tokenizer=tokenizer, dataset=dataset,
        model=model, task_fn=task_fn, tx=tx, schedule=schedule, mesh=mesh,
        rules=logical_rules(), eval_dataset=eval_dataset)


def build_eval_dataset(cfg: ExperimentConfig, tokenizer, split: str = "val"):
    """Build the validation-split dataset for the experiment's dataset family
    (reference val-loader wiring, `train.py:558-582`). Synthetic stand-ins
    use a disjoint seed; file-backed datasets whose split assets are missing
    return None (no eval)."""
    import warnings

    # families without a val split fall back to test (the reference
    # evaluates named val+test loaders each epoch, `train.py:558-582`;
    # GenomicBenchmarks/NT ship train+test only)
    for s in ((split, "test") if split == "val" else (split,)):
        data = replace(cfg.data, split=s, seed=cfg.data.seed + 7919)
        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")  # fallback warning shown once
                return registry.dataset[cfg.data.dataset](tokenizer, data)
        except (FileNotFoundError, ValueError, KeyError, OSError):
            continue
    return None


def get_experiment(name: str, overrides=()) -> ExperimentConfig:
    from dna_tpu.config.core import apply_overrides
    import dna_tpu.catalog  # noqa: F401 — populate the experiment registry

    cfg = registry.experiment[name]()
    return apply_overrides(cfg, list(overrides))
