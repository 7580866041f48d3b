"""NTv2/ESM and CNN family tests: shapes, rotary properties, RC gating,
trainability on planted signal."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dna_tpu.config.core import ModelConfig
from dna_tpu.models.cnn import ConvNeXt1D, DeepSTARRCNN, DenoiseCNN, rc_ids, to_acgtn
from dna_tpu.models.esm import EsmForMaskedLM, EsmForSequenceClassification, LearnedRotary


def test_rotary_preserves_norm():
    rot = LearnedRotary(head_dim=16, n_heads=4)
    q = jax.random.normal(jax.random.key(0), (2, 32, 4, 16))
    k = jax.random.normal(jax.random.key(1), (2, 32, 4, 16))
    params = rot.init(jax.random.key(2), q, k)
    q2, k2 = rot.apply(params, q, k)
    # rotations preserve per-vector norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(q2), axis=-1),
        np.linalg.norm(np.asarray(q), axis=-1), rtol=1e-5)


def test_rotary_relative_position():
    """Rotary q·k depends only on relative offset (per head)."""
    rot = LearnedRotary(head_dim=8, n_heads=1)
    v = jax.random.normal(jax.random.key(0), (8,))
    q = jnp.tile(v, (1, 16, 1, 1))
    k = jnp.tile(v, (1, 16, 1, 1))
    params = rot.init(jax.random.key(1), q, k)
    q2, k2 = rot.apply(params, q, k)
    dots = np.asarray(jnp.einsum("bshd,bthd->bst", q2, k2))[0]
    # same-offset dot products equal along diagonals
    np.testing.assert_allclose(np.diag(dots, 3), np.diag(dots, 3)[0],
                               rtol=1e-4)
    np.testing.assert_allclose(np.diag(dots, -5), np.diag(dots, -5)[0],
                               rtol=1e-4)


def test_esm_mlm_shapes_and_finite():
    cfg = ModelConfig(name="ntv2", vocab_size=64, d_model=32, n_layers=2,
                      n_heads=4, d_ff=64, rotary=True, alibi=False,
                      dtype="float32")
    model = EsmForMaskedLM(cfg)
    ids = jax.random.randint(jax.random.key(0), (2, 24), 0, 64)
    mask = jnp.ones((2, 24), jnp.int32).at[:, 20:].set(0)
    params = model.init(jax.random.key(1), ids, mask, deterministic=True)
    logits = model.apply(params, ids, mask, deterministic=True)
    assert logits.shape == (2, 24, 64)
    assert np.isfinite(np.asarray(logits)).all()


def test_esm_mlm_trains():
    """A tiny NTv2/ESM must drive MLM loss down on a fixed batch."""
    from dna_tpu.train.tasks import mlm_loss

    cfg = ModelConfig(name="ntv2", vocab_size=16, d_model=32, n_layers=2,
                      n_heads=4, d_ff=64, rotary=True, alibi=False,
                      dtype="float32")
    model = EsmForMaskedLM(cfg)
    rng = np.random.default_rng(0)
    base = rng.integers(7, 11, (8, 64)).astype(np.int32)
    mask = rng.random((8, 64)) < 0.3
    batch = {"input_ids": jnp.asarray(np.where(mask, 3, base)),
             "labels": jnp.asarray(np.where(mask, base, -100))}

    params = model.init(jax.random.key(0), batch["input_ids"], None,
                        deterministic=True)["params"]
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply({"params": p}, batch["input_ids"], None,
                                 deterministic=True)
            return mlm_loss(logits, batch)[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    first = None
    for _ in range(60):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < first - 0.4, (first, float(loss))


def test_to_acgtn_and_rc():
    char_ids = np.array([7, 8, 9, 10, 11, 4, 0])  # A C G T N PAD CLS
    out = np.asarray(to_acgtn(jnp.asarray(char_ids)))
    np.testing.assert_array_equal(out, [0, 1, 2, 3, 4, 4, 0])
    rc = np.asarray(rc_ids(jnp.asarray([0, 1, 2, 3, 4])))
    np.testing.assert_array_equal(rc, [3, 2, 1, 0, 4])


@pytest.mark.parametrize("mode", ["dilation", "pure_gate"])
def test_denoise_cnn_shapes(mode):
    m = DenoiseCNN(hidden_dim=32, num_conv1d=3, mode=mode, n_out=2,
                   head="cls")
    ids = jax.random.randint(jax.random.key(0), (2, 64), 0, 5)
    params = m.init(jax.random.key(1), ids)
    out = m.apply(params, ids)
    assert out.shape == (2, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_denoise_cnn_fits_planted_signal():
    from dna_tpu.data.synthetic import SyntheticClassificationDataset

    m = DenoiseCNN(hidden_dim=32, num_conv1d=3, n_out=2, head="cls")
    ds = SyntheticClassificationDataset(max_length=64, num_samples=64)
    xs = jnp.asarray(np.stack([ds[i]["input_ids"] for i in range(64)]))
    ys = jnp.asarray(np.stack([ds[i]["labels"] for i in range(64)]))
    params = m.init(jax.random.key(0), xs[:2])["params"]
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = m.apply({"params": p}, xs)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, ys).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    for _ in range(80):
        params, opt, loss = step(params, opt)
    logits = m.apply({"params": params}, xs)
    acc = float((jnp.argmax(logits, -1) == ys).mean())
    assert acc > 0.85, acc


def test_convnext_and_deepstarr_shapes():
    ids = jax.random.randint(jax.random.key(0), (2, 248), 0, 5)
    cx = ConvNeXt1D(n_out=3)
    p = cx.init(jax.random.key(1), ids)
    assert cx.apply(p, ids).shape == (2, 3)

    ds = DeepSTARRCNN(n_out=2, dropout=0.0)
    p = ds.init(jax.random.key(2), ids)
    out = ds.apply(p, ids)
    assert out.shape == (2, 2)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("mode", ["up_down", "convnext"])
def test_denoise_cnn_extra_modes(mode):
    """U-Net (`denoise.py:286-312,588-622`) and RC-gated ConvNeXt
    (`denoise.py:412-421,623-645`) modes."""
    m = DenoiseCNN(hidden_dim=36, mode=mode, n_out=2, head="cls")
    ids = jax.random.randint(jax.random.key(0), (2, 64), 0, 5)
    params = m.init(jax.random.key(1), ids)
    out = m.apply(params, ids)
    assert out.shape == (2, 2)
    assert np.isfinite(np.asarray(out)).all()
    grads = jax.grad(lambda p: m.apply(p, ids).sum())(params)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_denoise_updown_preserves_length():
    """The U-Net decoder restores the input resolution, so the pretrain
    (per-position) head still works."""
    m = DenoiseCNN(hidden_dim=36, mode="up_down", head="pretrain")
    ids = jax.random.randint(jax.random.key(0), (2, 64), 0, 5)
    params = m.init(jax.random.key(1), ids)
    out = m.apply(params, ids)
    assert out.shape == (2, 64, 5)


def test_esm_contact_prediction_head():
    """Contact head (`modeling_esm.py:236-268`): symmetric [B, S-2, S-2]
    probabilities from stacked attention maps."""
    from dna_tpu.config.core import ModelConfig
    from dna_tpu.models.esm import (EsmForContactPrediction,
                                    average_product_correct, symmetrize)

    cfg = ModelConfig(vocab_size=16, d_model=32, n_layers=2, n_heads=4,
                      d_ff=64, rotary=True, dtype="float32")
    m = EsmForContactPrediction(cfg)
    ids = jax.random.randint(jax.random.key(0), (2, 12), 0, 16)
    mask = jnp.ones((2, 12), jnp.int32)
    params = m.init(jax.random.key(1), ids, mask)
    out = np.asarray(m.apply(params, ids, mask))
    assert out.shape == (2, 10, 10)
    assert ((out >= 0) & (out <= 1)).all()
    np.testing.assert_allclose(out, out.swapaxes(-1, -2), atol=1e-5)

    # symmetrize/APC invariants
    x = jax.random.normal(jax.random.key(2), (1, 3, 5, 5))
    s = symmetrize(x)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s).swapaxes(-1, -2),
                               rtol=1e-6)
    a = average_product_correct(jnp.abs(x) + 1.0)
    assert a.shape == x.shape


def test_cope_attention():
    """CoPE contextual position embedding (`modeling_esm.py:93-160`):
    module matches a hand-mirrored numpy implementation of the reference
    formula, and the cope-enabled ESM trains (grads reach the table)."""
    from dna_tpu.config.core import ModelConfig
    from dna_tpu.models.esm import CoPE, EsmForMaskedLM

    B, H, S, D, P = 1, 2, 6, 4, 5
    rng = np.random.default_rng(1)
    q = rng.normal(size=(B, H, S, D)).astype(np.float32)
    logits = rng.normal(size=(B, H, S, S)).astype(np.float32)
    pe = rng.normal(size=(D, P)).astype(np.float32)

    gates = 1 / (1 + np.exp(-logits))
    pos = np.flip(np.cumsum(np.flip(gates, -1), -1), -1).clip(max=P - 1)
    li = np.einsum("bhsd,dp->bhsp", q, pe)
    ce, fl = np.ceil(pos).astype(int), np.floor(pos).astype(int)
    w = pos - fl
    expected = (np.take_along_axis(li, ce, -1) * w +
                np.take_along_axis(li, fl, -1) * (1 - w))

    got = CoPE(P, D).apply({"params": {"pos_emb": jnp.asarray(pe)}},
                           jnp.asarray(q), jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)

    cfg = ModelConfig(vocab_size=16, d_model=32, n_layers=1, n_heads=4,
                      d_ff=64, cope=True, max_len=8, dtype="float32")
    m = EsmForMaskedLM(cfg)
    ids = jnp.asarray(rng.integers(0, 16, (2, 12)))
    mask = jnp.ones((2, 12), jnp.int32)
    params = m.init(jax.random.key(0), ids, mask)
    grads = jax.grad(lambda p: m.apply(p, ids, mask).sum())(params)
    import flax
    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(
        grads["params"]))
    cope_grads = [v for k, v in flat.items()
                  if "cope" in "/".join(map(str, k))]
    assert cope_grads and all((np.asarray(g) != 0).any() for g in cope_grads)


def test_gpt2_init_scheme_statistics():
    """GPT-2 init scheme (reference `long_conv_lm.py:270-318`): kaiming
    (std = sqrt(2/fan_in)) on wqkv/out_proj/mlp-wo, normal(0.02) elsewhere;
    flag off reverts everything to normal(0.02)."""
    import dataclasses
    import math

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dna_tpu.config.core import ModelConfig
    from dna_tpu.models.lm import LMHeadModel

    cfg = ModelConfig(vocab_size=64, d_model=128, n_layers=2, n_heads=4,
                      d_ff=512, use_flash=False, dtype="float32",
                      gpt2_init=True)
    model = LMHeadModel(cfg, attn_layer_idx=(0,), l_max=64)
    ids = jnp.zeros((2, 64), jnp.int32)
    params = nn.meta.unbox(
        model.init(jax.random.key(0), ids, deterministic=True)["params"])
    lyr = params["backbone"]["layer_0"]["mixer"]
    mlp = params["backbone"]["layer_0"]["mlp"]

    def std(x):
        return float(np.asarray(x).std())

    # kaiming targets: fan_in is the kernel's first dim
    assert abs(std(lyr["wqkv"]["kernel"]) - math.sqrt(2 / 128)) < 0.01
    assert abs(std(lyr["out_proj"]["kernel"]) - math.sqrt(2 / 128)) < 0.01
    assert abs(std(mlp["wo"]["kernel"]) - math.sqrt(2 / 512)) < 0.005
    # untouched: first mlp proj and embeddings stay at 0.02
    assert abs(std(mlp["wi"]["kernel"]) - 0.02) < 0.003
    assert abs(std(params["backbone"]["embed"]["embedding"]) - 0.02) < 0.003
    # hyena layer (layer_1, mixer=hyena default): out_proj kaiming too
    hy = params["backbone"]["layer_1"]["mixer"]
    assert abs(std(hy["out_proj"]["kernel"]) - math.sqrt(2 / 128)) < 0.01
    assert abs(std(hy["in_proj"]["kernel"]) - 0.02) < 0.003

    # flag off: everything normal(0.02)
    cfg_off = dataclasses.replace(cfg, gpt2_init=False)
    params_off = nn.meta.unbox(
        LMHeadModel(cfg_off, attn_layer_idx=(0,), l_max=64).init(
            jax.random.key(0), ids, deterministic=True)["params"])
    lyr_off = params_off["backbone"]["layer_0"]["mixer"]
    assert abs(std(lyr_off["wqkv"]["kernel"]) - 0.02) < 0.003
    assert abs(std(lyr_off["out_proj"]["kernel"]) - 0.02) < 0.003
    assert abs(std(params_off["backbone"]["layer_0"]["mlp"]["wo"]["kernel"])
               - 0.02) < 0.003
