"""Encoder/decoder adapter registry (reference `src/tasks/encoders.py` /
`decoders.py` registries) — VERDICT round-1 item on adapter breadth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dna_tpu.models  # noqa: F401 — populate registries
from dna_tpu import registry
from dna_tpu.models.adapters import SequenceDecoder


def _x():
    return jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 4)),
                       jnp.float32)


def test_encoders_produce_model_dim():
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 12, (2, 16)),
                      jnp.int32)
    for name in ("embedding", "onehot", "linear", "position", "conv1d"):
        enc = registry.encoder[name](16, 32)
        inp = ids if name != "linear" else jax.nn.one_hot(ids, 16)
        params = enc.init(jax.random.key(0), inp)
        out = enc.apply(params, inp)
        assert out.shape == (2, 16, 32), name


def test_decoder_l_output_restriction_modes():
    x = _x()
    for mode, expect in [
        ("last", np.asarray(x[:, -3:])),
        ("first", np.asarray(x[:, :3])),
        ("sum", np.asarray(jnp.cumsum(x, 1)[:, -3:])),
    ]:
        dec = SequenceDecoder(l_output=3, mode=mode)
        out = dec.apply(dec.init(jax.random.key(0), x), x)
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6,
                                   err_msg=mode)


def test_decoder_l_output_zero_squeezes():
    x = _x()
    dec = SequenceDecoder(d_output=5, l_output=0, mode="last")
    out = dec.apply(dec.init(jax.random.key(0), x), x)
    assert out.shape == (2, 5)


def test_decoder_pool_masked_matches_mean_over_valid():
    x = _x()
    mask = jnp.asarray([[1] * 5 + [0] * 3, [1] * 8], jnp.int32)
    dec = SequenceDecoder(l_output=0, mode="pool")
    out = dec.apply(dec.init(jax.random.key(0), x), x, mask)
    # running mean gathered at each row's own length == plain prefix mean
    np.testing.assert_allclose(np.asarray(out[0]),
                               np.asarray(x[0, :5]).mean(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]),
                               np.asarray(x[1]).mean(0), rtol=1e-5)


def test_decoder_ragged_mode():
    x = _x()
    mask = jnp.asarray([[1] * 4 + [0] * 4, [1] * 8], jnp.int32)
    dec = SequenceDecoder(mode="ragged")
    out = dec.apply(dec.init(jax.random.key(0), x, mask), x, mask)
    np.testing.assert_allclose(np.asarray(out[0]),
                               np.asarray(x[0, :4]).mean(0), rtol=1e-5)
    with pytest.raises(ValueError):
        dec.apply(dec.init(jax.random.key(0), x, mask), x, None)


def test_cls_model_with_l_output_and_onehot_encoder():
    """The adapters compose into the classifier by config alone."""
    from dna_tpu.config.core import ModelConfig

    cfg = ModelConfig(name="hyena_cls", vocab_size=12, d_model=32, n_layers=1,
                      d_ff=64, max_len=16, n_classes=3, dtype="float32",
                      l_output=0, pool="pool", encoder="onehot",
                      hyena_filter_emb_dim=5, hyena_filter_order=16)
    model = registry.model["hyena_cls"](cfg)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 12, (2, 16)),
                      jnp.int32)
    params = model.init(jax.random.key(0), ids, None, deterministic=True)
    out = model.apply(params, ids, None, deterministic=True)
    assert out.shape == (2, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_scheduler_registry_dispatch():
    from dna_tpu.config.core import SchedulerConfig
    from dna_tpu.train.optim import make_schedule

    for name in ("cosine_warmup", "linear_warmup", "invsqrt", "constant"):
        sched = make_schedule(SchedulerConfig(name=name, warmup_steps=10,
                                              total_steps=100), 1e-3)
        v = float(sched(50))
        assert 0.0 <= v <= 1e-3, name
