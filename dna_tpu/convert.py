"""HF-hub / reference checkpoint converters → dna_tpu flax params.

The reference ecosystem ships torch checkpoints (SURVEY Appendix B):
HyenaDNA (`LongSafari/hyenadna-*`, `weights.ckpt` keys prefixed `model.`,
`huggingface.py:47-66`), Caduceus (`kuleshov-group/caduceus-*`,
`modeling_caduceus.py`), DNABERT-2 (`zhihan1996/DNABERT-2-117M`,
`bert_layers.py`) and NTv2 (`modeling_esm.py`). These converters map each
torch state dict onto the corresponding dna_tpu model's param pytree so
pretrained backbones can be finetuned here.

Conventions:
  * torch nn.Linear stores weight as [out, in]; flax Dense kernel is
    [in, out] → transpose.
  * torch Conv1d depthwise weight is [C, 1, K] → our [C, K].
  * LayerNorm/RMSNorm weight/bias → scale/bias.
  * non-trainable buffers (inv_freq, position_ids, pos_emb.t) are skipped.

All converters take a flat `{key: np.ndarray}` state dict (use
`load_torch_state_dict` for .bin/.ckpt files) and return the nested params
dict matching `model.init(...)["params"]`.

NOTE: for bitwise agreement with the torch source model, build the dna_tpu
model with `gelu_approx=False` — the converted checkpoints were trained with
torch's exact-erf F.gelu, while dna_tpu defaults to the tanh form (TPU VPU:
erf ≈ 13× tanh; see ModelConfig.gelu_approx). For *finetuning from* a
converted checkpoint the tanh default is fine (the forms agree to ~3e-4).
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

from dna_tpu.config.core import ModelConfig


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint file to {key: np.ndarray} (CPU)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy())
            for k, v in obj.items() if hasattr(v, "detach")}


def to_numpy_state_dict(module) -> Dict[str, np.ndarray]:
    """torch nn.Module → {key: np.ndarray}."""
    return {k: np.asarray(v.detach().cpu().numpy())
            for k, v in module.state_dict().items()}


def _unflatten(flat: Dict[str, Any]) -> Dict[str, Any]:
    from flax.traverse_util import unflatten_dict

    return unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()})


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


class _SD:
    """State-dict view with strict key accounting."""

    def __init__(self, sd: Dict[str, np.ndarray], prefix: str = ""):
        self.sd = dict(sd)
        self.prefix = prefix
        self.used = set()

    def __call__(self, key: str) -> np.ndarray:
        full = self.prefix + key
        self.used.add(full)
        return np.asarray(self.sd[full], np.float32)

    def has(self, key: str) -> bool:
        return self.prefix + key in self.sd

    def unused(self, skip_patterns=(r"\.t$", r"inv_freq", r"position_ids",
                                    r"token_type")):
        rest = set(self.sd) - self.used
        return sorted(k for k in rest
                      if not any(re.search(p, k) for p in skip_patterns))


# ---------------------------------------------------------------------------
# HyenaDNA (LongSafari/hyenadna-*; standalone_hyenadna.py module layout)
# ---------------------------------------------------------------------------


def _convert_hyena_mixer(sd: _SD, base: str, out: Dict[str, np.ndarray],
                         dst: str, d_model: int, order: int,
                         num_inner_mlps: int = 2):
    out[f"{dst}/in_proj/kernel"] = _t(sd(f"{base}.in_proj.weight"))
    out[f"{dst}/in_proj/bias"] = sd(f"{base}.in_proj.bias")
    out[f"{dst}/out_proj/kernel"] = _t(sd(f"{base}.out_proj.weight"))
    out[f"{dst}/out_proj/bias"] = sd(f"{base}.out_proj.bias")
    out[f"{dst}/short_filter"] = sd(f"{base}.short_filter.weight")[:, 0, :]
    out[f"{dst}/short_filter_bias"] = sd(f"{base}.short_filter.bias")
    # implicit filter: bias [(o-1)·d] → [(o-1), d] (order-major, matching the
    # reference rearrange '(o d) -> o d', standalone_hyenadna.py:283)
    out[f"{dst}/hyena_filter_bias"] = sd(f"{base}.filter_fn.bias").reshape(
        order - 1, d_model)
    ff = f"{dst}/hyena_filter"
    out[f"{ff}/pos_z"] = sd(f"{base}.filter_fn.pos_emb.z")[0]
    out[f"{ff}/mlp_in/kernel"] = _t(sd(f"{base}.filter_fn.implicit_filter.0.weight"))
    out[f"{ff}/mlp_in/bias"] = sd(f"{base}.filter_fn.implicit_filter.0.bias")
    out[f"{ff}/sin_freq_0"] = sd(f"{base}.filter_fn.implicit_filter.1.freq")
    for i in range(num_inner_mlps):
        src = f"{base}.filter_fn.implicit_filter.{2 * i + 2}"
        out[f"{ff}/mlp_{i}/kernel"] = _t(sd(f"{src}.weight"))
        out[f"{ff}/mlp_{i}/bias"] = sd(f"{src}.bias")
        out[f"{ff}/sin_freq_{i + 1}"] = sd(
            f"{base}.filter_fn.implicit_filter.{2 * i + 3}.freq")
    out[f"{ff}/mlp_out/kernel"] = _t(sd(
        f"{base}.filter_fn.implicit_filter.{2 * num_inner_mlps + 2}.weight"))
    out[f"{ff}/mod_deltas"] = sd(
        f"{base}.filter_fn.modulation.deltas").reshape(-1)


def convert_hyenadna(state_dict: Dict[str, np.ndarray], cfg: ModelConfig,
                     *, prefix: str = "", strict: bool = True
                     ) -> Dict[str, Any]:
    """HyenaDNA LM checkpoint → `LMHeadModel` params. `prefix` strips e.g.
    'model.' for raw HF `weights.ckpt` files (`huggingface.py:57-60`)."""
    sd = _SD(state_dict, prefix)
    out: Dict[str, np.ndarray] = {}
    bb = "backbone"
    out[f"{bb}/embed/embedding"] = sd(
        "backbone.embeddings.word_embeddings.weight")
    for i in range(cfg.n_layers):
        src = f"backbone.layers.{i}"
        dst = f"{bb}/layer_{i}"
        out[f"{dst}/mixer_ln/scale"] = sd(f"{src}.norm1.weight")
        out[f"{dst}/mixer_ln/bias"] = sd(f"{src}.norm1.bias")
        out[f"{dst}/mlp_ln/scale"] = sd(f"{src}.norm2.weight")
        out[f"{dst}/mlp_ln/bias"] = sd(f"{src}.norm2.bias")
        out[f"{dst}/mlp/wi/kernel"] = _t(sd(f"{src}.mlp.fc1.weight"))
        out[f"{dst}/mlp/wi/bias"] = sd(f"{src}.mlp.fc1.bias")
        out[f"{dst}/mlp/wo/kernel"] = _t(sd(f"{src}.mlp.fc2.weight"))
        out[f"{dst}/mlp/wo/bias"] = sd(f"{src}.mlp.fc2.bias")
        _convert_hyena_mixer(sd, f"{src}.mixer", out, f"{dst}/mixer",
                             cfg.d_model, cfg.hyena_order)
    out[f"{bb}/ln_f/scale"] = sd("backbone.ln_f.weight")
    out[f"{bb}/ln_f/bias"] = sd("backbone.ln_f.bias")
    if strict:
        leftover = [k for k in sd.unused() if "lm_head" not in k]
        if leftover:
            raise ValueError(f"unconverted keys: {leftover[:8]}")
    return _unflatten(out)


# ---------------------------------------------------------------------------
# Caduceus (kuleshov-group/caduceus-ph*; modeling_caduceus.py layout)
# ---------------------------------------------------------------------------


def _convert_mamba_core(sd: _SD, src: str, out: Dict[str, np.ndarray],
                        dst: str):
    out[f"{dst}/conv_w"] = sd(f"{src}.conv1d.weight")[:, 0, :]
    out[f"{dst}/conv_b"] = sd(f"{src}.conv1d.bias")
    out[f"{dst}/x_proj/kernel"] = _t(sd(f"{src}.x_proj.weight"))
    out[f"{dst}/dt_kernel"] = _t(sd(f"{src}.dt_proj.weight"))
    out[f"{dst}/dt_bias"] = sd(f"{src}.dt_proj.bias")
    out[f"{dst}/A_log"] = sd(f"{src}.A_log")
    out[f"{dst}/ssm_D"] = sd(f"{src}.D")


def convert_caduceus(state_dict: Dict[str, np.ndarray], cfg: ModelConfig,
                     *, prefix: str = "", strict: bool = True
                     ) -> Dict[str, Any]:
    """CaduceusForMaskedLM (weight-tied bidirectional, non-RCPS 'ph' flavor)
    → `CaduceusForMaskedLM` params."""
    sd = _SD(state_dict, prefix)
    out: Dict[str, np.ndarray] = {}
    bb = "caduceus.backbone"
    out["backbone/embedding"] = sd(f"{bb}.embeddings.word_embeddings.weight")
    for i in range(cfg.n_layers):
        src = f"{bb}.layers.{i}"
        dst = f"backbone/mixer_{i}"
        out[f"backbone/norm_{i}/scale"] = sd(f"{src}.norm.weight")
        # weight tying: fwd's in/out projections are the shared pair
        out[f"{dst}/in_proj/kernel"] = _t(sd(f"{src}.mixer.mamba_fwd.in_proj.weight"))
        out[f"{dst}/out_proj/kernel"] = _t(sd(f"{src}.mixer.mamba_fwd.out_proj.weight"))
        _convert_mamba_core(sd, f"{src}.mixer.mamba_fwd", out,
                            f"{dst}/core_fwd")
        _convert_mamba_core(sd, f"{src}.mixer.mamba_rev", out,
                            f"{dst}/core_rev")
        # tied rev projections, if materialized in the file, are duplicates
        for tied in (f"{src}.mixer.mamba_rev.in_proj.weight",
                     f"{src}.mixer.mamba_rev.out_proj.weight"):
            if sd.has(tied):
                sd(tied)
    out["backbone/norm_f/scale"] = sd(f"{bb}.norm_f.weight")
    out["lm_head/kernel"] = _t(sd("lm_head.weight"))
    if strict:
        leftover = sd.unused()
        if leftover:
            raise ValueError(f"unconverted keys: {leftover[:8]}")
    return _unflatten(out)


# ---------------------------------------------------------------------------
# DNABERT-2 (zhihan1996/DNABERT-2-117M; bert_layers.py layout)
# ---------------------------------------------------------------------------


def convert_dnabert2(state_dict: Dict[str, np.ndarray], cfg: ModelConfig,
                     *, prefix: str = "", strict: bool = True
                     ) -> Dict[str, Any]:
    """BertForMaskedLM (MosaicBERT) → `BertForMLM` params (tied head)."""
    sd = _SD(state_dict, prefix)
    out: Dict[str, np.ndarray] = {}
    out["bert/embed/embedding"] = sd("bert.embeddings.word_embeddings.weight")
    if sd.has("bert.embeddings.token_type_embeddings.weight"):
        # separate param (cfg.type_vocab_size must match): folding row 0 into
        # the word table would corrupt the tied MLM decoder
        if cfg.type_vocab_size <= 0:
            raise ValueError(
                "checkpoint has token_type_embeddings — set "
                "model.type_vocab_size to convert it")
        out["bert/type_embed"] = sd(
            "bert.embeddings.token_type_embeddings.weight")
    out["bert/embed_ln/scale"] = sd("bert.embeddings.LayerNorm.weight")
    out["bert/embed_ln/bias"] = sd("bert.embeddings.LayerNorm.bias")
    for i in range(cfg.n_layers):
        src = f"bert.encoder.layer.{i}"
        dst = f"bert/layer_{i}"
        out[f"{dst}/attention/wqkv/kernel"] = _t(sd(f"{src}.attention.self.Wqkv.weight"))
        out[f"{dst}/attention/wqkv/bias"] = sd(f"{src}.attention.self.Wqkv.bias")
        out[f"{dst}/attention/out/kernel"] = _t(sd(f"{src}.attention.output.dense.weight"))
        out[f"{dst}/attention/out/bias"] = sd(f"{src}.attention.output.dense.bias")
        out[f"{dst}/attn_ln/scale"] = sd(f"{src}.attention.output.LayerNorm.weight")
        out[f"{dst}/attn_ln/bias"] = sd(f"{src}.attention.output.LayerNorm.bias")
        out[f"{dst}/mlp/wi/kernel"] = _t(sd(f"{src}.mlp.gated_layers.weight"))
        out[f"{dst}/mlp/wo/kernel"] = _t(sd(f"{src}.mlp.wo.weight"))
        if sd.has(f"{src}.mlp.wo.bias"):
            out[f"{dst}/mlp/wo/bias"] = sd(f"{src}.mlp.wo.bias")
        out[f"{dst}/mlp_ln/scale"] = sd(f"{src}.mlp.layernorm.weight")
        out[f"{dst}/mlp_ln/bias"] = sd(f"{src}.mlp.layernorm.bias")
    out["transform/kernel"] = _t(sd("cls.predictions.transform.dense.weight"))
    out["transform/bias"] = sd("cls.predictions.transform.dense.bias")
    out["transform_ln/scale"] = sd("cls.predictions.transform.LayerNorm.weight")
    out["transform_ln/bias"] = sd("cls.predictions.transform.LayerNorm.bias")
    out["decoder_bias"] = sd("cls.predictions.decoder.bias")
    # tied decoder weight, if materialized, duplicates the embedding
    if sd.has("cls.predictions.decoder.weight"):
        sd("cls.predictions.decoder.weight")
    if strict:
        leftover = sd.unused(
            skip_patterns=(r"inv_freq", r"position_ids",
                           r"pooler", r"seq_relationship"))
        if leftover:
            raise ValueError(f"unconverted keys: {leftover[:8]}")
    return _unflatten(out)


# ---------------------------------------------------------------------------
# NTv2 / ESM (modeling_esm.py layout with learned-rotary + GLU fork changes)
# ---------------------------------------------------------------------------


def convert_ntv2(state_dict: Dict[str, np.ndarray], cfg: ModelConfig,
                 *, prefix: str = "", strict: bool = True) -> Dict[str, Any]:
    """EsmForMaskedLM (NTv2 fork) → `EsmForMaskedLM` params."""
    sd = _SD(state_dict, prefix)
    out: Dict[str, np.ndarray] = {}
    out["esm/embed/embedding"] = sd("esm.embeddings.word_embeddings.weight")
    for i in range(cfg.n_layers):
        src = f"esm.encoder.layer.{i}"
        dst = f"esm/layer_{i}"
        att = f"{dst}/attention"
        for name in ("query", "key", "value"):
            out[f"{att}/{name}/kernel"] = _t(sd(f"{src}.attention.self.{name}.weight"))
            out[f"{att}/{name}/bias"] = sd(f"{src}.attention.self.{name}.bias")
        if sd.has(f"{src}.attention.self.rotary_embeddings.alpha"):
            rot = f"{src}.attention.self.rotary_embeddings"
            out[f"{att}/rotary/alpha"] = sd(f"{rot}.alpha")
            out[f"{att}/rotary/beta"] = sd(f"{rot}.beta")
            out[f"{att}/rotary/recpt_field"] = sd(f"{rot}.recpt_field")
        out[f"{att}/out/kernel"] = _t(sd(f"{src}.attention.output.dense.weight"))
        out[f"{att}/out/bias"] = sd(f"{src}.attention.output.dense.bias")
        out[f"{dst}/attn_ln/scale"] = sd(f"{src}.attention.LayerNorm.weight")
        out[f"{dst}/attn_ln/bias"] = sd(f"{src}.attention.LayerNorm.bias")
        out[f"{dst}/wi/kernel"] = _t(sd(f"{src}.intermediate.dense.weight"))
        out[f"{dst}/wo/kernel"] = _t(sd(f"{src}.output.dense.weight"))
        out[f"{dst}/mlp_ln/scale"] = sd(f"{src}.LayerNorm.weight")
        out[f"{dst}/mlp_ln/bias"] = sd(f"{src}.LayerNorm.bias")
    out["esm/final_ln/scale"] = sd("esm.encoder.emb_layer_norm_after.weight")
    out["esm/final_ln/bias"] = sd("esm.encoder.emb_layer_norm_after.bias")
    out["head_dense/kernel"] = _t(sd("lm_head.dense.weight"))
    out["head_dense/bias"] = sd("lm_head.dense.bias")
    out["head_ln/scale"] = sd("lm_head.layer_norm.weight")
    out["head_ln/bias"] = sd("lm_head.layer_norm.bias")
    out["decoder/kernel"] = _t(sd("lm_head.decoder.weight"))
    out["decoder/bias"] = sd("lm_head.bias")
    if strict:
        leftover = sd.unused(
            # position_embeddings: the reference creates the absolute table
            # unconditionally (`modeling_esm.py:300`) but applies it only
            # when position_embedding_type == "absolute" (`:358-360`); the
            # NTv2 pretrain configs are rotary, so it is dead weight
            skip_patterns=(r"inv_freq", r"position_ids", r"token_type",
                           r"pooler", r"contact_head", r"\.mask$",
                           r"esm\.embeddings\.position_embeddings"))
        if leftover:
            raise ValueError(f"unconverted keys: {leftover[:8]}")
    return _unflatten(out)


CONVERTERS = {
    "hyenadna": convert_hyenadna,
    "caduceus": convert_caduceus,
    "dnabert2": convert_dnabert2,
    "ntv2": convert_ntv2,
}


def convert(family: str, state_dict: Dict[str, np.ndarray],
            cfg: ModelConfig, **kw) -> Dict[str, Any]:
    try:
        fn = CONVERTERS[family]
    except KeyError:
        raise KeyError(f"unknown family {family!r}; "
                       f"available: {sorted(CONVERTERS)}") from None
    if getattr(cfg, "gelu_approx", False):
        import warnings

        warnings.warn(
            f"convert({family!r}): cfg.gelu_approx=True but the torch source "
            "model was trained with exact-erf GELU — converted weights will "
            "drift ~3e-4/layer at inference. Set gelu_approx=False for "
            "bitwise eval parity (the tanh default is fine for finetuning).",
            stacklevel=2)
    return fn(state_dict, cfg, **kw)


_HUB_FAMILY_PATTERNS = (
    ("hyenadna", r"hyenadna"),
    ("caduceus", r"caduceus"),
    ("dnabert2", r"dnabert-?2"),
    ("ntv2", r"nucleotide-transformer|ntv2|esm"),
)


def family_for_repo(repo_id: str) -> str:
    """Infer the converter family from an HF repo id (reference
    `huggingface.py:84` model-name switch)."""
    low = repo_id.lower()
    for fam, pat in _HUB_FAMILY_PATTERNS:
        if re.search(pat, low):
            return fam
    raise ValueError(
        f"cannot infer converter family from repo id {repo_id!r}; "
        f"pass family= explicitly (one of {sorted(CONVERTERS)})")


def from_hub(repo_id: str, cfg: ModelConfig, *, family: str = None,
             revision: str = None, cache_dir: str = None, **kw):
    """Download a torch checkpoint from the HuggingFace hub and convert it
    (the reference's hub pull, `huggingface.py:47-84` /
    `caduceus.py:12-28`). Looks for the usual weight filenames; requires
    network access — in offline environments download the file separately
    and call `convert(family, load_torch_state_dict(path), cfg)`."""
    from huggingface_hub import hf_hub_download  # type: ignore

    family = family or family_for_repo(repo_id)
    last_err = None
    for fname in ("pytorch_model.bin", "weights.ckpt", "model.ckpt"):
        try:
            path = hf_hub_download(repo_id, fname, revision=revision,
                                   cache_dir=cache_dir)
            break
        except Exception as e:  # file missing / offline
            last_err = e
    else:
        raise FileNotFoundError(
            f"no torch weight file found in {repo_id!r} "
            f"(tried pytorch_model.bin, weights.ckpt, model.ckpt): {last_err}")
    return convert(family, load_torch_state_dict(path), cfg, **kw)
