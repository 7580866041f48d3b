"""O(1) recurrent stepping for mamba-mixer LMs (reference `Mamba.step` /
`selective_state_update`, `pyramid.py:236-277`; `SequenceModel.step`
contract, `model.py:124-134`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dna_tpu.config.core import ModelConfig
from dna_tpu.inference import generate, generate_recurrent
from dna_tpu.models.lm import LMHeadModel


@pytest.fixture(scope="module")
def mamba_lm():
    cfg = ModelConfig(vocab_size=16, d_model=32, n_layers=2, d_ff=64,
                      mixer="mamba", dtype="float32")
    m = LMHeadModel(cfg, l_max=64, causal=True)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 16, (2, 20)))
    params = m.init(jax.random.key(0), ids, None, deterministic=True)["params"]
    return m, params, ids


def test_step_matches_full_forward(mamba_lm):
    m, params, ids = mamba_lm
    full = m.apply({"params": params}, ids, None, deterministic=True)
    logits_p, states = m.apply({"params": params}, ids[:, :10],
                               method="prefill")
    np.testing.assert_allclose(np.asarray(logits_p),
                               np.asarray(full[:, :10]), atol=1e-4)
    outs = []
    for t in range(10, 20):
        lg, states = m.apply({"params": params}, ids[:, t], states,
                             method="step")
        outs.append(lg)
    np.testing.assert_allclose(np.asarray(jnp.stack(outs, 1)),
                               np.asarray(full[:, 10:20]), atol=1e-4)


def test_recurrent_generation_matches_full_recompute(mamba_lm):
    m, params, ids = mamba_lm
    a = generate(m, params, ids[:, :8], jax.random.key(1), num_tokens=6,
                 greedy=True)
    b = generate_recurrent(m, params, ids[:, :8], jax.random.key(1),
                           num_tokens=6, greedy=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_step_raises_for_hyena():
    cfg = ModelConfig(vocab_size=16, d_model=32, n_layers=1, d_ff=64,
                      mixer="hyena", dtype="float32",
                      hyena_filter_emb_dim=5)
    m = LMHeadModel(cfg, l_max=16, causal=True)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = m.init(jax.random.key(0), ids, None, deterministic=True)["params"]
    # prefill succeeds (states are None for non-recurrent mixers) but step
    # must raise, like the reference's Hyena recurrence (`hyena.py:432-434`)
    _, states = m.apply({"params": params}, ids[:, :4], method="prefill")
    with pytest.raises(Exception, match="recurrent step unsupported"):
        m.apply({"params": params}, ids[:, 0], states, method="step")


# ---------------------------------------------------------------------------
# KV-cache stepping for the attention (transformer_lm) family (VERDICT r3
# #8): prefill + step must agree with the full-refeed oracle exactly, and
# generate_recurrent becomes O(L)-per-token instead of O(steps · L²).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def attn_lm():
    cfg = ModelConfig(vocab_size=16, d_model=32, n_layers=2, n_heads=4,
                      d_ff=64, dtype="float32", use_flash=False)
    m = LMHeadModel(cfg, attn_layer_idx=(0, 1), l_max=64, causal=True)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 16, (2, 20)))
    params = m.init(jax.random.key(0), ids, None, deterministic=True)["params"]
    return m, params, ids


def test_kv_cache_step_matches_full_forward(attn_lm):
    m, params, ids = attn_lm
    full = m.apply({"params": params}, ids, None, deterministic=True)
    logits_p, states = m.apply({"params": params}, ids[:, :10],
                               method="prefill")
    np.testing.assert_allclose(np.asarray(logits_p),
                               np.asarray(full[:, :10]), atol=1e-4)
    outs = []
    for t in range(10, 20):
        lg, states = m.apply({"params": params}, ids[:, t], states,
                             method="step")
        outs.append(lg)
    np.testing.assert_allclose(np.asarray(jnp.stack(outs, 1)),
                               np.asarray(full[:, 10:20]), atol=1e-4)


def test_kv_cache_generation_matches_full_recompute(attn_lm):
    m, params, ids = attn_lm
    a = generate(m, params, ids[:, :8], jax.random.key(1), num_tokens=6,
                 greedy=True)
    b = generate_recurrent(m, params, ids[:, :8], jax.random.key(1),
                           num_tokens=6, greedy=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kv_cache_ring_wraparound_is_sliding_window():
    """Past l_max the ring overwrites the oldest keys; with no positional
    encoding inside attention this equals sliding-window attention over the
    last l_max tokens."""
    cfg = ModelConfig(vocab_size=16, d_model=32, n_layers=1, n_heads=4,
                      d_ff=64, dtype="float32", use_flash=False)
    L = 8
    m = LMHeadModel(cfg, attn_layer_idx=(0,), l_max=L, causal=True)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 16, (1, L + 4)))
    params = m.init(jax.random.key(0), ids[:, :L], None,
                    deterministic=True)["params"]
    _, states = m.apply({"params": params}, ids[:, :L], method="prefill")
    lg = None
    for t in range(L, L + 4):
        lg, states = m.apply({"params": params}, ids[:, t], states,
                             method="step")
    # oracle: full forward over the last L tokens (window ending at t)
    want = m.apply({"params": params}, ids[:, 4:L + 4], None,
                   deterministic=True)[:, -1]
    np.testing.assert_allclose(np.asarray(lg), np.asarray(want), atol=1e-4)
