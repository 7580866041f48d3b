"""Full experiment catalog — the reference's `configs/experiment/` matrix.

Registered names mirror the reference experiment groups (SURVEY §2.2):
pretraining (hg38 hyena/transformer/mamba/bert, DNABERT-2 MLM, NTv2 MLM at
4 sizes, Caduceus) and finetuning (NT benchmark per-task, GenomicBenchmarks,
GUE, DeepSEA, DeepSTARR, chromatin profile, species, ICL).

Data-less environments: dataset paths default to synthetic stand-ins; point
`data.fasta_path`/`data.bed_path` at real assets via overrides to train on
actual genomes (formats documented in `dna_tpu.data`).
"""

from __future__ import annotations

from dataclasses import replace

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
from dna_tpu.data.genomics import GB_TASKS, NT_TASKS

# --------------------------------------------------------------------------
# hg38 pretraining family (reference `configs/experiment/hg38/*`)
# --------------------------------------------------------------------------


def _hg38_data(max_length=1024, batch=256):
    return DataConfig(dataset="hg38", tokenizer="char",
                      max_length=max_length, batch_size=batch)


@registry.experiment.register("hg38_transformer")
def hg38_transformer() -> ExperimentConfig:
    """`hg38_attention.yaml`: attention-mixer causal LM."""
    return ExperimentConfig(
        name="hg38_transformer",
        model=ModelConfig(name="transformer_lm", d_model=256, n_layers=4,
                          n_heads=8, d_ff=1024, max_len=1024, alibi=False),
        data=_hg38_data(),
        task=TaskConfig(name="lm"),
        optimizer=OptimizerConfig(name="adamw", lr=6e-4, weight_decay=0.1),
        scheduler=SchedulerConfig(name="cosine_warmup", warmup_steps=1000,
                                  total_steps=100_000),
        train=TrainConfig(steps=1000),
    )


@registry.experiment.register("hg38_transformer_moe")
def hg38_transformer_moe() -> ExperimentConfig:
    """Mixture-of-Experts variant of the attention LM (capability beyond the
    reference): 8 experts, top-2 routing, shard over the ep mesh axis."""
    cfg = hg38_transformer()
    return replace(cfg, name="hg38_transformer_moe",
                   model=replace(cfg.model, moe_experts=8, moe_top_k=2))


@registry.experiment.register("hg38_mamba")
def hg38_mamba() -> ExperimentConfig:
    """`mamba.yaml`: causal Mamba LM."""
    cfg = hg38_transformer()
    return replace(cfg, name="hg38_mamba",
                   model=replace(cfg.model, name="mamba_lm", mixer="mamba"))


@registry.experiment.register("hg38_bert")
def hg38_bert() -> ExperimentConfig:
    """`hg38_bert.yaml` / `bert_hg38_hyena.yaml`: bidirectional hyena
    backbone + MLM objective over hg38."""
    return ExperimentConfig(
        name="hg38_bert",
        model=ModelConfig(name="hyena_blm", d_model=256, n_layers=4,
                          d_ff=1024, max_len=1024),
        data=DataConfig(dataset="bert_hg38", tokenizer="char",
                        max_length=1024, batch_size=128),
        task=TaskConfig(name="mlm"),
        optimizer=OptimizerConfig(name="adamw", lr=6e-4, weight_decay=0.1),
        scheduler=SchedulerConfig(name="cosine_warmup", warmup_steps=1000,
                                  total_steps=100_000),
        train=TrainConfig(steps=1000),
    )


@registry.experiment.register("hg38_hyena_seqlen_warmup")
def hg38_hyena_seqlen_warmup() -> ExperimentConfig:
    """`hg38_hyena_seqlen_warmup_reload.yaml`: staged 1k→8k curriculum."""
    from dna_tpu.experiments import hg38_hyena

    cfg = hg38_hyena()
    return replace(
        cfg, name="hg38_hyena_seqlen_warmup",
        model=replace(cfg.model, max_len=8192),
        train=replace(cfg.train, seqlen_stages=(
            (1024, 256, 200), (2048, 128, 200), (4096, 64, 200),
            (8192, 32, 400))),
    )


# --------------------------------------------------------------------------
# NTv2 MLM pretraining at 4 sizes (`configs/experiment/ntv2/*`)
# --------------------------------------------------------------------------

_NTV2_SIZES = {
    "50m": dict(d_model=512, n_layers=12, n_heads=16, d_ff=2048),
    "100m": dict(d_model=512, n_layers=22, n_heads=16, d_ff=2048),
    "250m": dict(d_model=768, n_layers=24, n_heads=16, d_ff=3072),
    "500m": dict(d_model=1024, n_layers=29, n_heads=16, d_ff=4096),
}


def _ntv2_pretrain(size: str) -> ExperimentConfig:
    dims = _NTV2_SIZES[size]
    return ExperimentConfig(
        name=f"ntv2_pretrain_{size}",
        model=ModelConfig(name="ntv2", vocab_size=4107, rotary=True,
                          alibi=False, remat=True, **dims),
        # real corpus when data.dest_path points at the DNABERT-2 text corpus
        # (the reference's dnabert2_pretrain pipeline), synthetic stand-in
        # otherwise — same fallback pattern as dnabert2_pretrain
        data=DataConfig(dataset="dnabert2", tokenizer="kmer",
                        max_length=128, batch_size=512),
        task=TaskConfig(name="mlm"),
        # bf16 Adam moments: at 500m the fp32 optimizer update is ~19 ms of
        # a 226 ms step (r4 device trace, pure HBM traffic) — bf16 m/v cut
        # state traffic in half and are loss-neutral (1000-step flagship
        # 3-arm A/B, see dnabert2_pretrain note + results/mu_ab/)
        optimizer=OptimizerConfig(name="adamw", lr=6e-4, weight_decay=1e-5,
                                  mu_dtype="bfloat16",
                                  nu_dtype="bfloat16"),
        scheduler=SchedulerConfig(name="cosine_warmup", warmup_steps=10_000,
                                  total_steps=1_000_000, min_lr_ratio=0.0),
        train=TrainConfig(steps=1000),
    )


for _size in _NTV2_SIZES:
    registry.experiment.register(f"ntv2_pretrain_{_size}")(
        (lambda s: (lambda: _ntv2_pretrain(s)))(_size))


@registry.experiment.register("nt_v1_pretrain")
def nt_v1_pretrain() -> ExperimentConfig:
    """NT-v1 (reference torch port `src/models/sequence/nt.py`): ESM encoder
    with *learned* positional embeddings (`nt.py:598-627`) and TokensDropout
    (`nt.py:629-670`) instead of NTv2's rotary; 500M layout."""
    return ExperimentConfig(
        name="nt_v1_pretrain",
        model=ModelConfig(name="ntv2", vocab_size=4107, rotary=False,
                          alibi=False, learned_pos_emb=True,
                          token_dropout=True, max_len=1024, remat=True,
                          d_model=1280, n_layers=24, n_heads=20, d_ff=5120),
        data=DataConfig(dataset="dnabert2", tokenizer="kmer",
                        max_length=128, batch_size=512),
        task=TaskConfig(name="mlm"),
        optimizer=OptimizerConfig(name="adamw", lr=1e-4, weight_decay=1e-5),
        scheduler=SchedulerConfig(name="cosine_warmup", warmup_steps=16_000,
                                  total_steps=1_000_000),
        train=TrainConfig(steps=1000),
    )


# --------------------------------------------------------------------------
# Finetuning suites
# --------------------------------------------------------------------------


def _finetune_base(name, model: ModelConfig, n_classes: int, max_length: int,
                   task: str = "multiclass", batch: int = 128,
                   lr: float = 6e-4, steps: int = 2000,
                   dataset: str = "synthetic_cls", tokenizer: str = "char",
                   n_targets=None) -> ExperimentConfig:
    return ExperimentConfig(
        name=name,
        model=replace(model, n_classes=n_classes),
        data=DataConfig(dataset=dataset, tokenizer=tokenizer,
                        max_length=max_length, batch_size=batch,
                        n_targets=n_targets),
        task=TaskConfig(name=task),
        optimizer=OptimizerConfig(name="adamw", lr=lr, weight_decay=1e-5),
        scheduler=SchedulerConfig(name="cosine_warmup", warmup_steps=100,
                                  total_steps=steps),
        train=TrainConfig(steps=steps, eval_every=200, eval_steps=20),
    )


_CADUCEUS_PH = ModelConfig(name="caduceus_cls", d_model=118, n_layers=4,
                           d_state=16, bidirectional=True, pool="mean")
_DENOISE = ModelConfig(name="denoise_cnn", d_model=128)
_HYENA_CLS = ModelConfig(name="hyena_cls", d_model=128, n_layers=2, d_ff=512)
_DNABERT2_CLS = ModelConfig(name="dnabert2_cls", vocab_size=4096, d_model=768,
                            n_layers=12, n_heads=12, d_ff=3072)


@registry.experiment.register("nt_caduceus")
def nt_caduceus() -> ExperimentConfig:
    """`py_nt_caduceus.yaml` — source of the published NT numbers; select the
    task with data.dataset_name (H4, H4ac, promoter_all, …)."""
    card = NT_TASKS["H4"]
    cfg = _finetune_base("nt_caduceus", _CADUCEUS_PH, card[1], card[2],
                         lr=1e-3, batch=256,
                         dataset="nucleotide_transformer")
    return replace(cfg, data=replace(cfg.data, dataset_name="H4"))


@registry.experiment.register("nt_denoisecnn")
def nt_denoisecnn() -> ExperimentConfig:
    """`nt_denoisecnn.yaml`: RC-gated dilated CNN on NT tasks."""
    card = NT_TASKS["H4"]
    cfg = _finetune_base("nt_denoisecnn", _DENOISE, card[1], card[2],
                         lr=3e-3, batch=256,
                         dataset="nucleotide_transformer")
    return replace(cfg, data=replace(cfg.data, dataset_name="H4"))


@registry.experiment.register("nt_hyena")
def nt_hyena() -> ExperimentConfig:
    """`nt_hyena1.6M.yaml`: pretrained-hyena classifier on NT tasks."""
    card = NT_TASKS["H4"]
    cfg = _finetune_base("nt_hyena", _HYENA_CLS, card[1], card[2],
                         dataset="nucleotide_transformer")
    return replace(cfg, data=replace(cfg.data, dataset_name="H4"))


@registry.experiment.register("genomic_benchmark")
def genomic_benchmark() -> ExperimentConfig:
    """`genomic_benchmark*.yaml`: 8-task suite; pick with dataset_name."""
    card = GB_TASKS["human_nontata_promoters"]
    cfg = _finetune_base("genomic_benchmark", _HYENA_CLS, card[1],
                         min(card[2], 512), dataset="genomic_benchmark")
    return replace(cfg, data=replace(
        cfg.data, dataset_name="human_nontata_promoters"))


@registry.experiment.register("gue_dnabert2")
def gue_dnabert2() -> ExperimentConfig:
    """`gue.yaml`: DNABERT-2 on the GUE suite (BPE tokens)."""
    return _finetune_base("gue_dnabert2", _DNABERT2_CLS, 2, 128, batch=64,
                          lr=3e-5, dataset="gue", tokenizer="bpe")


@registry.experiment.register("deepsea_denoise")
def deepsea_denoise() -> ExperimentConfig:
    """`deepsea_denoise.yaml`: 919-label multilabel chromatin profile."""
    cfg = _finetune_base("deepsea_denoise", _DENOISE, 919, 1000,
                         task="multilabel", lr=1e-3, dataset="deepsea",
                         n_targets=919)
    return cfg


@registry.experiment.register("chromatin_profile")
def chromatin_profile() -> ExperimentConfig:
    """`chromatin_profile.yaml`: DeepSEA-style 919-target profile via the
    hyena backbone."""
    return _finetune_base("chromatin_profile", _HYENA_CLS, 919, 1000,
                          task="multilabel", dataset="chromatin_profile",
                          n_targets=919)


@registry.experiment.register("deepstarr_denoise")
def deepstarr_denoise() -> ExperimentConfig:
    """`deepstarr_denoise.yaml`: 2-output enhancer-activity regression."""
    cfg = _finetune_base(
        "deepstarr_denoise",
        replace(_DENOISE, name="denoise_cnn_regression"), 2, 249,
        task="regression", lr=2e-3, dataset="deepstarr", n_targets=2)
    return cfg


@registry.experiment.register("deepstarr_cnn")
def deepstarr_cnn() -> ExperimentConfig:
    """Reference DeepSTARR conv net (`deepstarr_cnn.py`)."""
    return _finetune_base("deepstarr_cnn",
                          ModelConfig(name="deepstarr_cnn", dropout=0.4),
                          2, 248, task="regression", lr=2e-3,
                          dataset="deepstarr", n_targets=2)


@registry.experiment.register("species_classification")
def species_classification() -> ExperimentConfig:
    """`species` experiments: which-species classification over windows."""
    return _finetune_base("species_classification", _HYENA_CLS, 5, 1024,
                          dataset="species")


@registry.experiment.register("dnaberts_pretrain")
def dnaberts_pretrain() -> ExperimentConfig:
    """DNABERT-S pair-corpus MLM pretrain (reference DNABERTSDataset,
    `datasets/dnaberts.py`); select the column with data.dataset_name
    (seq_a/seq_b)."""
    return ExperimentConfig(
        name="dnaberts_pretrain",
        model=ModelConfig(name="dnabert2", vocab_size=4096, d_model=768,
                          n_layers=12, n_heads=12, d_ff=3072, alibi=True,
                          mlm_gather=0.375),
        data=DataConfig(dataset="dnaberts", tokenizer="bpe", max_length=128,
                        batch_size=256, mlm_probability=0.15),
        task=TaskConfig(name="mlm"),
        optimizer=OptimizerConfig(name="adamw", lr=5e-4, weight_decay=1e-5),
        scheduler=SchedulerConfig(name="linear_warmup", warmup_steps=10_000,
                                  total_steps=500_000),
        train=TrainConfig(steps=1000),
    )


@registry.experiment.register("hg38_hyena_icl")
def hg38_hyena_icl() -> ExperimentConfig:
    """`hg38_hyena_icl.yaml`: few-shot in-context episodes consumed by a
    causal LM; dataset wraps a classification base into episodes."""
    return ExperimentConfig(
        name="hg38_hyena_icl",
        model=ModelConfig(name="hyena_lm", d_model=128, n_layers=2, d_ff=512,
                          max_len=2048),
        data=DataConfig(dataset="synthetic_cls", tokenizer="char",
                        max_length=2048, batch_size=32),
        task=TaskConfig(name="lm"),
        optimizer=OptimizerConfig(name="adamw", lr=6e-4),
        scheduler=SchedulerConfig(name="cosine_warmup", warmup_steps=100,
                                  total_steps=10_000),
        train=TrainConfig(steps=1000),
    )
