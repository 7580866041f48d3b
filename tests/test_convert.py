"""HF/reference checkpoint converters.

Two layers of checking:
  * numerical parity against the reference's pure-torch standalone HyenaDNA
    (skipped when the reference checkout isn't mounted) — the converted
    params must reproduce the torch hidden states;
  * structural roundtrips for families whose reference modules need CUDA
    deps (caduceus/dnabert2/ntv2): a synthetic torch-style state dict with
    reference shapes must convert into exactly the pytree our models init.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dna_tpu.config.core import ModelConfig
from dna_tpu.convert import (convert, convert_caduceus, convert_dnabert2,
                             convert_hyenadna, convert_ntv2)

REF = "/root/reference"


def _tree_shapes(params):
    import flax.linen as nn
    from flax.traverse_util import flatten_dict

    params = nn.meta.unbox(params)
    return {"/".join(k): tuple(v.shape)
            for k, v in flatten_dict(params).items()}


def _assert_same_structure(converted, inited):
    a, b = _tree_shapes(converted), _tree_shapes(inited)
    assert set(a) == set(b), (sorted(set(a) - set(b))[:5],
                              sorted(set(b) - set(a))[:5])
    for k in a:
        assert a[k] == b[k], (k, a[k], b[k])


# ---------------------------------------------------------------------------
# HyenaDNA: torch-oracle parity
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not os.path.exists(f"{REF}/standalone_hyenadna.py"),
                    reason="reference checkout not mounted")
def test_hyenadna_conversion_matches_torch():
    import importlib.util
    import sys
    import types

    import torch

    if "torchvision" not in sys.modules:
        # the standalone file imports torchvision only for StochasticDepth
        # (drop_path, 0.0 at inference) — stub it as identity
        tv = types.ModuleType("torchvision")
        tv_ops = types.ModuleType("torchvision.ops")

        class _StochasticDepth(torch.nn.Identity):
            def __init__(self, p=0.0, mode="row"):
                super().__init__()

        tv_ops.StochasticDepth = _StochasticDepth
        tv.ops = tv_ops
        # transformers probes torchvision.__spec__ — give the stub one
        tv.__spec__ = importlib.util.spec_from_loader("torchvision",
                                                      loader=None)
        tv_ops.__spec__ = importlib.util.spec_from_loader("torchvision.ops",
                                                          loader=None)
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops

    spec = importlib.util.spec_from_file_location(
        "standalone_hyenadna", f"{REF}/standalone_hyenadna.py")
    shd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(shd)

    torch.manual_seed(0)
    d_model, n_layer, d_inner, vocab, L = 32, 2, 128, 12, 64
    layer_cfg = {"_name_": "hyena", "emb_dim": 5, "filter_order": 16,
                 "short_filter_order": 3, "l_max": L, "modulate": True,
                 "w": 10, "lr": 6e-4, "wd": 0.0, "lr_pos_emb": 0.0}
    tmodel = shd.HyenaDNAModel(d_model=d_model, n_layer=n_layer,
                               d_inner=d_inner, vocab_size=vocab,
                               layer=layer_cfg, use_head=False,
                               embed_dropout=0.0)
    tmodel.eval()
    sd = {k: np.asarray(v.detach().numpy())
          for k, v in tmodel.state_dict().items()}

    cfg = ModelConfig(
        vocab_size=vocab, d_model=d_model, n_layers=n_layer, d_ff=d_inner,
        hyena_order=2, hyena_filter_order=16, hyena_filter_emb_dim=5,
        short_filter_len=3, hyena_filter_shift=0.05, dtype="float32",
        use_flash=False, norm_eps=1e-5, gelu_approx=False)
    params = convert_hyenadna(sd, cfg)

    from dna_tpu.models.lm import LMHeadModel

    model = LMHeadModel(cfg, l_max=L, causal=True)
    ids_np = np.random.default_rng(0).integers(0, vocab, (2, L))
    # structure must match a fresh init exactly
    inited = model.init(jax.random.key(0), jnp.asarray(ids_np), None,
                        deterministic=True)["params"]
    _assert_same_structure(params, inited)

    with torch.no_grad():
        t_hidden = tmodel(torch.as_tensor(ids_np)).numpy()
    j_hidden = np.asarray(model.apply(
        {"params": params}, jnp.asarray(ids_np),
        method=lambda m, x: m.backbone(x)))
    np.testing.assert_allclose(j_hidden, t_hidden, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Caduceus / DNABERT-2 / NTv2: structural roundtrips from synthetic torch sds
# ---------------------------------------------------------------------------


def _caduceus_torch_sd(cfg: ModelConfig, rng):
    d, di = cfg.d_model, cfg.expand * cfg.d_model
    N, K = cfg.d_state, cfg.d_conv
    dtr = -(-d // 16)
    sd = {"caduceus.backbone.embeddings.word_embeddings.weight":
          rng.normal(size=(cfg.vocab_size, d))}
    for i in range(cfg.n_layers):
        p = f"caduceus.backbone.layers.{i}"
        sd[f"{p}.norm.weight"] = rng.normal(size=(d,))
        for dirn in ("fwd", "rev"):
            m = f"{p}.mixer.mamba_{dirn}"
            sd[f"{m}.conv1d.weight"] = rng.normal(size=(di, 1, K))
            sd[f"{m}.conv1d.bias"] = rng.normal(size=(di,))
            sd[f"{m}.x_proj.weight"] = rng.normal(size=(dtr + 2 * N, di))
            sd[f"{m}.dt_proj.weight"] = rng.normal(size=(di, dtr))
            sd[f"{m}.dt_proj.bias"] = rng.normal(size=(di,))
            sd[f"{m}.A_log"] = rng.normal(size=(di, N))
            sd[f"{m}.D"] = rng.normal(size=(di,))
            # tied projections materialized on both directions
            sd[f"{m}.in_proj.weight"] = rng.normal(size=(2 * di, d))
            sd[f"{m}.out_proj.weight"] = rng.normal(size=(d, di))
        sd[f"{p}.mixer.mamba_fwd.in_proj.weight"] = rng.normal(size=(2 * di, d))
        sd[f"{p}.mixer.mamba_fwd.out_proj.weight"] = rng.normal(size=(d, di))
    sd["caduceus.backbone.norm_f.weight"] = rng.normal(size=(d,))
    sd["lm_head.weight"] = rng.normal(size=(cfg.vocab_size, d))
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def test_caduceus_conversion_structure_and_forward():
    cfg = ModelConfig(name="caduceus", vocab_size=16, d_model=32, n_layers=2,
                      dtype="float32", bidirectional=True)
    sd = _caduceus_torch_sd(cfg, np.random.default_rng(0))
    params = convert_caduceus(sd, cfg)

    from dna_tpu.models.mamba import CaduceusForMaskedLM

    model = CaduceusForMaskedLM(cfg)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 16, (2, 32)))
    inited = model.init(jax.random.key(0), ids, None,
                        deterministic=True)["params"]
    _assert_same_structure(params, inited)
    out = model.apply({"params": params}, ids, None, deterministic=True)
    assert out.shape == (2, 32, 16)
    assert np.isfinite(np.asarray(out)).all()
    # transposition spot-checks
    np.testing.assert_array_equal(
        np.asarray(params["backbone"]["mixer_0"]["in_proj"]["kernel"]),
        sd["caduceus.backbone.layers.0.mixer.mamba_fwd.in_proj.weight"].T)
    np.testing.assert_array_equal(
        np.asarray(params["backbone"]["mixer_0"]["core_rev"]["conv_w"]),
        sd["caduceus.backbone.layers.0.mixer.mamba_rev.conv1d.weight"][:, 0])


def _dnabert2_torch_sd(cfg: ModelConfig, rng):
    d, f = cfg.d_model, cfg.d_ff
    sd = {
        "bert.embeddings.word_embeddings.weight":
            rng.normal(size=(cfg.vocab_size, d)),
        "bert.embeddings.LayerNorm.weight": rng.normal(size=(d,)),
        "bert.embeddings.LayerNorm.bias": rng.normal(size=(d,)),
        "cls.predictions.transform.dense.weight": rng.normal(size=(d, d)),
        "cls.predictions.transform.dense.bias": rng.normal(size=(d,)),
        "cls.predictions.transform.LayerNorm.weight": rng.normal(size=(d,)),
        "cls.predictions.transform.LayerNorm.bias": rng.normal(size=(d,)),
        "cls.predictions.decoder.weight":
            rng.normal(size=(cfg.vocab_size, d)),
        "cls.predictions.decoder.bias": rng.normal(size=(cfg.vocab_size,)),
    }
    for i in range(cfg.n_layers):
        p = f"bert.encoder.layer.{i}"
        sd[f"{p}.attention.self.Wqkv.weight"] = rng.normal(size=(3 * d, d))
        sd[f"{p}.attention.self.Wqkv.bias"] = rng.normal(size=(3 * d,))
        sd[f"{p}.attention.output.dense.weight"] = rng.normal(size=(d, d))
        sd[f"{p}.attention.output.dense.bias"] = rng.normal(size=(d,))
        sd[f"{p}.attention.output.LayerNorm.weight"] = rng.normal(size=(d,))
        sd[f"{p}.attention.output.LayerNorm.bias"] = rng.normal(size=(d,))
        sd[f"{p}.mlp.gated_layers.weight"] = rng.normal(size=(2 * f, d))
        sd[f"{p}.mlp.wo.weight"] = rng.normal(size=(d, f))
        sd[f"{p}.mlp.wo.bias"] = rng.normal(size=(d,))
        sd[f"{p}.mlp.layernorm.weight"] = rng.normal(size=(d,))
        sd[f"{p}.mlp.layernorm.bias"] = rng.normal(size=(d,))
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def test_dnabert2_conversion_structure_and_forward():
    cfg = ModelConfig(name="dnabert2", vocab_size=32, d_model=32, n_layers=2,
                      n_heads=4, d_ff=64, dtype="float32", use_flash=False)
    sd = _dnabert2_torch_sd(cfg, np.random.default_rng(0))
    params = convert_dnabert2(sd, cfg)

    from dna_tpu.models.bert import BertForMLM

    model = BertForMLM(cfg)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 32, (2, 16)))
    inited = model.init(jax.random.key(0), ids, None,
                        deterministic=True)["params"]
    _assert_same_structure(params, inited)
    out = model.apply({"params": params}, ids, None, deterministic=True)
    assert out.shape == (2, 16, 32)
    assert np.isfinite(np.asarray(out)).all()


def _ntv2_torch_sd(cfg: ModelConfig, rng):
    d, f, H = cfg.d_model, cfg.d_ff, cfg.n_heads
    sd = {
        "esm.embeddings.word_embeddings.weight":
            rng.normal(size=(cfg.vocab_size, d)),
        "esm.encoder.emb_layer_norm_after.weight": rng.normal(size=(d,)),
        "esm.encoder.emb_layer_norm_after.bias": rng.normal(size=(d,)),
        "lm_head.dense.weight": rng.normal(size=(d, d)),
        "lm_head.dense.bias": rng.normal(size=(d,)),
        "lm_head.layer_norm.weight": rng.normal(size=(d,)),
        "lm_head.layer_norm.bias": rng.normal(size=(d,)),
        "lm_head.decoder.weight": rng.normal(size=(cfg.vocab_size, d)),
        "lm_head.bias": rng.normal(size=(cfg.vocab_size,)),
    }
    for i in range(cfg.n_layers):
        p = f"esm.encoder.layer.{i}"
        for name in ("query", "key", "value"):
            sd[f"{p}.attention.self.{name}.weight"] = rng.normal(size=(d, d))
            sd[f"{p}.attention.self.{name}.bias"] = rng.normal(size=(d,))
        rot = f"{p}.attention.self.rotary_embeddings"
        sd[f"{rot}.alpha"] = rng.normal(size=(H,))
        sd[f"{rot}.beta"] = rng.normal(size=(H,))
        sd[f"{rot}.recpt_field"] = rng.normal(size=(H,))
        sd[f"{p}.attention.output.dense.weight"] = rng.normal(size=(d, d))
        sd[f"{p}.attention.output.dense.bias"] = rng.normal(size=(d,))
        sd[f"{p}.attention.LayerNorm.weight"] = rng.normal(size=(d,))
        sd[f"{p}.attention.LayerNorm.bias"] = rng.normal(size=(d,))
        sd[f"{p}.intermediate.dense.weight"] = rng.normal(size=(2 * f, d))
        sd[f"{p}.output.dense.weight"] = rng.normal(size=(d, f))
        sd[f"{p}.LayerNorm.weight"] = rng.normal(size=(d,))
        sd[f"{p}.LayerNorm.bias"] = rng.normal(size=(d,))
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def test_ntv2_conversion_structure_and_forward():
    cfg = ModelConfig(name="ntv2", vocab_size=24, d_model=32, n_layers=2,
                      n_heads=4, d_ff=64, rotary=True, dtype="float32",
                      use_flash=False)
    sd = _ntv2_torch_sd(cfg, np.random.default_rng(0))
    params = convert_ntv2(sd, cfg)

    from dna_tpu.models.esm import EsmForMaskedLM

    model = EsmForMaskedLM(cfg)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 24, (2, 16)))
    inited = model.init(jax.random.key(0), ids, None,
                        deterministic=True)["params"]
    _assert_same_structure(params, inited)
    out = model.apply({"params": params}, ids, None, deterministic=True)
    assert out.shape == (2, 16, 24)
    assert np.isfinite(np.asarray(out)).all()


def test_convert_registry_and_strictness():
    with pytest.raises(KeyError):
        convert("nope", {}, ModelConfig())
    cfg = ModelConfig(vocab_size=16, d_model=32, n_layers=1, dtype="float32")
    sd = _caduceus_torch_sd(cfg, np.random.default_rng(0))
    sd["caduceus.backbone.layers.0.mixer.mamba_fwd.unexpected"] = \
        np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unconverted"):
        convert_caduceus(sd, cfg)


# ---------------------------------------------------------------------------
# DNABERT-2 / NTv2: torch-oracle numerical parity (VERDICT r2 #2)
#
# The reference DNABERT-2 hard-disables its Triton kernel
# (`bert_layers.py:130-133` sets flash_attn_qkvpacked_func = None), so its
# pytorch fallback runs on CPU; NTv2 is pure torch. Both give exact oracles
# for the converted models. A few environment shims are needed (documented
# inline); none change the reference's math.
# ---------------------------------------------------------------------------


def _ref_torch_env():
    """Shim the reference's import environment (omegaconf + old transformers
    helpers + old-torch full_like semantics). Returns the torch module."""
    import sys
    import types

    import torch

    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")

        class _OC:
            @staticmethod
            def to_container(x):
                return dict(x)

        om.OmegaConf = _OC
        sys.modules["omegaconf"] = om
    # transformers moved these helpers to pytorch_utils
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as ptu

    for n in ("find_pruneable_heads_and_indices", "prune_linear_layer"):
        if not hasattr(mu, n):
            setattr(mu, n, getattr(ptu, n))
    # old torch allowed a 0-d tensor as full_like's fill_value
    if not getattr(torch.full_like, "_dna_tpu_shim", False):
        orig = torch.full_like

        def full_like(input, fill_value, **kw):
            if isinstance(fill_value, torch.Tensor):
                fill_value = fill_value.item()
            return orig(input, fill_value, **kw)

        full_like._dna_tpu_shim = True
        torch.full_like = full_like
    if REF not in sys.path:
        sys.path.insert(0, REF)
    return torch


@pytest.mark.skipif(not os.path.exists(f"{REF}/src/models/DNABERT2"),
                    reason="reference checkout not mounted")
def test_dnabert2_conversion_matches_torch():
    """Converted DNABERT-2 must reproduce the reference's pytorch-fallback
    logits exactly (`bert_layers.py:755-843`), incl. a pad-masked batch."""
    torch = _ref_torch_env()
    from src.models.DNABERT2 import bert_layers
    from src.models.DNABERT2.configuration_bert import BertConfig

    torch.manual_seed(0)
    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=128,
                     max_position_embeddings=64,
                     attention_probs_dropout_prob=0.0,
                     hidden_dropout_prob=0.0)
    d = cfg.to_dict()
    d["hyena_framework"] = False
    tmodel = bert_layers.BertForMaskedLM(d)
    tmodel.eval()
    sd = {k: np.asarray(v.numpy()) for k, v in tmodel.state_dict().items()}

    jcfg = ModelConfig(vocab_size=64, d_model=32, n_layers=2, n_heads=2,
                       d_ff=128, alibi=True, use_flash=False,
                       dtype="float32", type_vocab_size=2,
                       gelu_approx=False)
    from dna_tpu.models.bert import BertForMLM

    jmodel = BertForMLM(jcfg)
    params = convert_dnabert2(sd, jcfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 64, (2, 16))
    inited = jmodel.init(jax.random.key(0), jnp.asarray(ids), None,
                         deterministic=True)["params"]
    _assert_same_structure(params, inited)

    mask_full = np.ones_like(ids)
    mask_pad = mask_full.copy()
    mask_pad[1, 12:] = 0
    for mask in (mask_full, mask_pad):
        with torch.no_grad():
            t_logits = tmodel(None, input_ids=torch.as_tensor(ids),
                              attention_mask=torch.as_tensor(mask)
                              ).logits.numpy()
        j_logits = np.asarray(jmodel.apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
            deterministic=True))
        valid = mask.astype(bool)
        np.testing.assert_allclose(j_logits[valid], t_logits[valid],
                                   atol=2e-5, rtol=1e-4)


@pytest.mark.skipif(not os.path.exists(f"{REF}/src/models/ntv2"),
                    reason="reference checkout not mounted")
def test_ntv2_conversion_matches_torch():
    """Converted NTv2 (learned-rotary ESM) must reproduce the reference's
    pure-torch hidden states + LM-head logits (`modeling_esm.py:1194-1310`).

    The oracle calls `tm.esm(...)` + `tm.lm_head(...)` directly: the wrapper
    forward derives the pad mask by downloading a tokenizer from HF hub
    (`modeling_esm.py:1262-1267`), unavailable here. apply_rotary_pos_emb is
    shimmed to the broadcast-agnostic slice — the snapshot's 4-index slicing
    of a 3-D cos tensor raises on any torch (`modeling_esm.py:64` with the
    per-head [1, S, D] tables of `:228`); the math is unchanged."""
    torch = _ref_torch_env()
    from src.models.ntv2 import modeling_esm

    orig_rope = modeling_esm.apply_rotary_pos_emb

    def _apply_rope(x, cos, sin):
        cos = cos[..., : x.shape[-2], :]
        sin = sin[..., : x.shape[-2], :]
        return (x * cos) + (modeling_esm.rotate_half(x) * sin)

    modeling_esm.apply_rotary_pos_emb = _apply_rope
    try:
        torch.manual_seed(0)
        cfgd = dict(vocab_size=64, mask_token_id=2, pad_token_id=1,
                    hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=2, intermediate_size=64,
                    hidden_dropout_prob=0.0,
                    attention_probs_dropout_prob=0.0,
                    max_position_embeddings=128,
                    position_embedding_type="rotary", add_bias_fnn=False,
                    emb_layer_norm_before=False, token_dropout=False,
                    tie_word_embeddings=False, hyena_framework=False,
                    finetune=False, use_cache=False, layer_norm_eps=1e-12)
        tmodel = modeling_esm.EsmForMaskedLM(cfgd)
        tmodel.eval()
        sd = {k: np.asarray(v.numpy())
              for k, v in tmodel.state_dict().items()}

        jcfg = ModelConfig(vocab_size=64, d_model=32, n_layers=2, n_heads=2,
                           d_ff=64, use_flash=False, dtype="float32",
                           tie_embeddings=False, rotary=True,
                           gelu_approx=False)
        from dna_tpu.models.esm import EsmForMaskedLM

        jmodel = EsmForMaskedLM(jcfg)
        params = convert_ntv2(sd, jcfg)
        rng = np.random.default_rng(0)
        ids = rng.integers(4, 64, (2, 16))
        inited = jmodel.init(jax.random.key(0), jnp.asarray(ids), None,
                             deterministic=True)["params"]
        _assert_same_structure(params, inited)

        mask = np.ones_like(ids)
        mask[1, 12:] = 0
        with torch.no_grad():
            h = tmodel.esm(torch.as_tensor(ids),
                           attention_mask=torch.as_tensor(mask))[0]
            t_logits = tmodel.lm_head(h).numpy()
        j_logits = np.asarray(jmodel.apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
            deterministic=True))
        valid = mask.astype(bool)
        np.testing.assert_allclose(j_logits[valid], t_logits[valid],
                                   atol=2e-5, rtol=1e-4)
    finally:
        modeling_esm.apply_rotary_pos_emb = orig_rope


def test_family_for_repo_inference():
    """Hub pull path (reference `huggingface.py:84`): family inferred from
    the repo id; unknown ids raise with the available families listed."""
    import pytest

    from dna_tpu.convert import family_for_repo

    assert family_for_repo("LongSafari/hyenadna-small-32k-seqlen") == "hyenadna"
    assert family_for_repo("kuleshov-group/caduceus-ph_seqlen-131k") == "caduceus"
    assert family_for_repo("zhihan1996/DNABERT-2-117M") == "dnabert2"
    assert family_for_repo(
        "InstaDeepAI/nucleotide-transformer-v2-100m-multi-species") == "ntv2"
    with pytest.raises(ValueError, match="cannot infer"):
        family_for_repo("some/random-model")
