"""Typed dataclass config system with dotted-path overrides.

Replaces the reference's Hydra/OmegaConf stack (`configs/` + `train.py:47-48`
resolvers). Experiments are Python functions returning an `ExperimentConfig`;
CLI overrides are `a.b.c=value` strings applied onto the dataclass tree, so
there is no arbitrary-`eval` escape hatch (the reference's `eval` resolver
even shells out to nvidia-smi — `configs/experiment/hg38/hg38_hyena.yaml:97`).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, List, Optional, Tuple


def _parse_scalar(s: str) -> Any:
    """Parse a CLI override value: JSON first, then bool/None literals, else str."""
    low = s.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("null", "none"):
        return None
    try:
        return json.loads(s)
    except (json.JSONDecodeError, ValueError):
        return s


def apply_overrides(cfg: Any, overrides: List[str]) -> Any:
    """Apply `a.b.c=value` overrides to a (possibly nested) dataclass, returning
    a new instance (dataclasses are treated immutably)."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} must be key=value")
        key, _, raw = ov.partition("=")
        cfg = _set_path(cfg, key.strip().split("."), _parse_scalar(raw.strip()))
    return cfg


def _set_path(obj: Any, path: List[str], value: Any) -> Any:
    name = path[0]
    if is_dataclass(obj):
        if not hasattr(obj, name):
            raise AttributeError(f"{type(obj).__name__} has no field {name!r}")
        cur = getattr(obj, name)
        new = value if len(path) == 1 else _set_path(cur, path[1:], value)
        return dataclasses.replace(obj, **{name: new})
    if isinstance(obj, dict):
        cur = obj.get(name)
        new = value if len(path) == 1 else _set_path(cur, path[1:], value)
        out = dict(obj)
        out[name] = new
        return out
    raise TypeError(f"cannot descend into {type(obj)} at {name!r}")


def to_dict(cfg: Any) -> Any:
    if is_dataclass(cfg):
        return {f.name: to_dict(getattr(cfg, f.name)) for f in fields(cfg)}
    if isinstance(cfg, dict):
        return {k: to_dict(v) for k, v in cfg.items()}
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    return cfg


def pretty(cfg: Any) -> str:
    return json.dumps(to_dict(cfg), indent=2, default=str)


# ---------------------------------------------------------------------------
# Config groups (mirroring the reference's Hydra groups, SURVEY §2.2)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. Axis sizes of -1 mean "use all remaining devices".

    Axes:
      dp   — pure data parallel (params replicated, grads psum)
      fsdp — data parallel with params/optimizer sharded (ZeRO-3 analog)
      tp   — tensor parallel (heads/mlp/vocab sharded); Megatron-style
             sequence parallelism reuses this axis for norm/dropout regions
      pp   — pipeline parallel (stage dimension over layers)
      sp   — sequence/context parallel (activations sharded along L)
      ep   — expert parallel (MoE expert dimension; exceeds the reference,
             which has no MoE)
    """

    dp: int = -1
    fsdp: int = 1
    tp: int = 1
    pp: int = 1
    sp: int = 1
    ep: int = 1


@dataclass(frozen=True)
class OptimizerConfig:
    name: str = "adamw"
    lr: float = 5e-4
    weight_decay: float = 1e-5
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    # Per-layer learning-rate decay (reference `train.py:489-523`).
    layer_decay: Optional[float] = None
    # Per-parameter absolute-lr overrides (reference `_optim` hooks,
    # `hyena.py:228-231`; `lr_pos_emb`, `hg38_hyena.yaml:27-30`): None = no
    # override, 0.0 = freeze the group. Both groups always get wd=0.
    filter_lr: Optional[float] = None
    lr_pos_emb: Optional[float] = None
    grad_clip: Optional[float] = 1.0
    # dtype for Adam's first moment (optax mu_dtype). The optimizer update
    # runs at fp32 HBM-traffic speed-of-light (~4.4 ms/step profiled on the
    # flagship); "bfloat16" halves the m read+write (~-1 ms) at a small,
    # well-studied accuracy cost (T5X-style). Default fp32 = reference parity.
    mu_dtype: Optional[str] = None
    # dtype for Adam's second moment (no optax equivalent — implemented in
    # train/optim.py): bf16 nu halves the v read+write too. Riskier than
    # mu (v is squared-gradient scale; bf16's 8 mantissa bits → ~0.2%
    # update-magnitude noise after the sqrt) — opt-in, never default.
    nu_dtype: Optional[str] = None
    # Gradient accumulation (reference `accumulate_grad_batches`,
    # `train.py:644-661`): one optimizer step per N micro-batches.
    accumulate_steps: int = 1


@dataclass(frozen=True)
class SchedulerConfig:
    name: str = "cosine_warmup"  # cosine_warmup | linear_warmup | constant | invsqrt
    warmup_steps: int = 1000
    total_steps: int = 100_000
    min_lr_ratio: float = 0.0


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "synthetic_mlm"
    dataset_name: Optional[str] = None  # task within a suite (e.g. NT "H4")
    tokenizer: str = "char"  # char | bpe | kmer
    tokenizer_path: Optional[str] = None
    fasta_path: Optional[str] = None
    bed_path: Optional[str] = None
    # Suite/corpus root for file-backed datasets (reference `dest_path` /
    # `text_file` kwargs, e.g. `genomics.py:1322-1501`): the GUE/NT/GB suite
    # directory, DeepSEA .npz, DeepSTARR dir, species FASTA dir, the
    # DNABERT-2 2-bit corpus dir, … — see each dataset factory's docstring.
    dest_path: Optional[str] = None
    split: str = "train"
    # Output width for multilabel/regression synthetics standing in for
    # real targets (DeepSEA 919, DeepSTARR 2).
    n_targets: Optional[int] = None
    max_length: int = 128
    batch_size: int = 256  # global batch size (across all data-parallel replicas)
    mlm_probability: float = 0.15
    random_token_prob: float = 0.1
    unchanged_token_prob: float = 0.1
    rc_aug: bool = False
    num_samples: int = 1 << 16  # synthetic epoch size
    seed: int = 0


@dataclass(frozen=True)
class ModelConfig:
    """Union-ish model config; `name` picks the flax module from the registry,
    unused fields are ignored by other families."""

    name: str = "dnabert2"
    vocab_size: int = 4096
    # token-type table size (reference BertEmbeddings always has one,
    # `bert_layers.py:48-50`; genomics batches carry no type ids, so only row
    # 0 ever contributes — kept for checkpoint-conversion parity, default off)
    type_vocab_size: int = 0
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    d_ff: int = 3072
    max_len: int = 512
    dropout: float = 0.0
    # attention-probability dropout (reference: `bert_layers.py:166-197`,
    # ESM `modeling_esm.py:391-467` — both fall back to a materialized-probs
    # path when p>0; dna_tpu mirrors that by routing to attention_ref)
    attn_dropout: float = 0.0
    dtype: str = "bfloat16"  # compute dtype; params always f32
    # Mixture-of-Experts MLP for the LM-backbone families (EXCEEDS the
    # reference — it has no MoE). moe_experts=0 disables; moe_every=n puts a
    # MoE MLP in every n-th block (1 = all blocks).
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_aux_weight: float = 0.01
    moe_every: int = 1
    # tanh-form GELU everywhere a reference model uses torch's exact-erf
    # F.gelu. On TPU the erf lowering costs ~13x tanh on the VPU (measured
    # 2.1 ms vs 0.16 ms per [16384,3072] fp32 apply on v5e) and the erf sits
    # fused inside the MLP backward, throttling it to ~37% MFU; tanh-GELU
    # cut the DNABERT-2 flagship step 104 -> 86 ms. Set False for bitwise
    # parity with torch checkpoints (converters / torch-oracle tests).
    gelu_approx: bool = True
    # GPT-2 init scheme for the LM-backbone families: kaiming_normal on
    # out_proj/fc2/Wqkv, normal(0.02) elsewhere (reference `_init_weights`,
    # `long_conv_lm.py:270-318`). Default on, matching the reference.
    gpt2_init: bool = True
    # hyena
    hyena_order: int = 2
    hyena_filter_order: int = 64
    hyena_filter_emb_dim: int = 33
    hyena_filter_shift: float = 0.0  # 0.05 for HF HyenaDNA checkpoints
    # block-local long conv: L split into z independent chunks inside the
    # operator (reference `hyena.py:343,358-360`)
    hyena_num_blocks: int = 1
    short_filter_len: int = 3
    # mamba / caduceus
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    bidirectional: bool = True
    bidirectional_strategy: str = "add"  # add | ew_multiply
    rcps: bool = False
    # denoise CNN family (reference `denoise.py:273-406` modes)
    cnn_mode: str = "dilation"  # dilation | pure_gate | up_down | convnext
    # classification / regression heads
    n_classes: int = 2
    pool: str = "mean"  # mean | last | first | sum | pool | ragged
    # SequenceDecoder length restriction (reference `decoders.py:50-75`):
    # None = pooled scalar head; 0 = length-1 squeezed; k>0 = last/first k.
    l_output: Optional[int] = None
    # input encoder adapter (reference `encoders.py:295-331` registry):
    # embedding | onehot | linear | position | conv1d
    encoder: str = "embedding"
    # LM-backbone mixer family: hyena | mamba (attention layers selected
    # separately via attn_layer_idx, reference `create_mixer_cls`)
    mixer: str = "hyena"
    # attention
    use_flash: bool = True
    rotary: bool = False
    alibi: bool = True
    # CoPE contextual position embedding (NTv2 fork experiment,
    # `modeling_esm.py:93-160`); XLA path only (needs the full score matrix)
    cope: bool = False
    # NT-v1 specifics (reference `src/models/sequence/nt.py:598-670`):
    # ESM-style learned positional embeddings (pad-aware cumsum positions)
    # and TokensDropout (zero [MASK] embeddings + observed-ratio rescale).
    learned_pos_emb: bool = False
    token_dropout: bool = False
    mask_token_id: int = 3  # wired from the tokenizer by experiments.build
    # Masked-position-only MLM head (reference masked-token-only prediction,
    # `bert_layers.py:817-833`): gather this fraction of positions before the
    # LM head + CE; 0 = full-length head.
    mlm_gather: float = 0.0
    # misc
    tie_embeddings: bool = True
    norm_eps: float = 1e-12
    pad_token_id: int = 3
    remat: bool = False
    # rematerialization policy: "full" recomputes everything;
    # "dots" saves matmul outputs (less recompute, more memory)
    remat_policy: str = "full"


@dataclass(frozen=True)
class TaskConfig:
    name: str = "mlm"  # mlm | lm | multiclass | multilabel | regression
    metrics: Tuple[str, ...] = ()
    ignore_index: int = -100


@dataclass(frozen=True)
class TrainConfig:
    steps: int = 1000
    eval_every: int = 0  # 0 = no eval
    eval_steps: int = 10
    log_every: int = 50
    checkpoint_every: int = 0
    checkpoint_dir: Optional[str] = None
    resume: bool = True
    seed: int = 2222  # reference fixed seed (`long_conv_lm.py:270-318`)
    ema: float = 0.0
    # Staged sequence-length warmup: tuple of (seq_len, batch_size, steps).
    seqlen_stages: Tuple[Tuple[int, int, int], ...] = ()
    # Progressive resizing (reference ProgressiveResizing callback,
    # `src/callbacks/progressive_resizing.py`): stages of
    # (resolution, steps) — sequences subsampled x[:, ::resolution].
    resolution_stages: Tuple[Tuple[int, int], ...] = ()
    # Per-parameter gradient-norm logging (reference TrackNorms callback,
    # `src/callbacks/norms.py:6-39`); adds one metric per param leaf.
    track_param_norms: bool = False
    # Per-layer activation-norm plane (reference `model.py:86-102`
    # track_norms publishes `norm/i` per block output); adds one `act_.../
    # norm/i` scalar per layer to the metrics stream.
    track_act_norms: bool = False
    # wandb.watch equivalent (reference `callbacks/wandb.py`): log per-leaf
    # gradient + parameter histograms (1024-element strided device samples)
    # to the wandb mirror every `wandb_watch_freq` steps.
    wandb_watch: bool = False
    wandb_watch_freq: int = 1000
    # Fast-dev/debug mode (reference `config.debug` → PL fast_dev_run +
    # validate_at_start, `src/utils/train.py:79-91`, `train.py:685-687`):
    # caps the run at `debug_steps`, runs an eval pass before training, and
    # asserts the loss stays finite every step (NaN-assert parity,
    # `long_conv_lm.py:537-541`).
    debug: bool = False
    debug_steps: int = 2
    validate_at_start: bool = False
    # wandb sink behind the JSONL logger (reference CustomWandbLogger,
    # `train.py:52-132`); no-op when wandb isn't installed.
    wandb_project: Optional[str] = None
    # upload code snapshot at start + best checkpoints as wandb artifacts
    # (the upload half of `src/callbacks/wandb.py`); needs wandb_project
    wandb_upload: bool = False


@dataclass(frozen=True)
class ExperimentConfig:
    name: str = "experiment"
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    task: TaskConfig = field(default_factory=TaskConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    # Transfer learning: load a pretrained backbone, keep head at scratch
    # (reference `load_backbone` hook, `long_conv_lm.py:853-911`).
    pretrained_backbone: Optional[str] = None
    freeze_backbone: bool = False
