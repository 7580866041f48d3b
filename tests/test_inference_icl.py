"""Inference (generation, embeddings) and ICL episode tests."""

import jax
import jax.numpy as jnp
import numpy as np

from dna_tpu.config.core import ModelConfig
from dna_tpu.data.icl import ICLEpisodeDataset, icl_accuracy
from dna_tpu.data.synthetic import SyntheticClassificationDataset
from dna_tpu.inference import extract_embedding, generate
from dna_tpu.models.lm import LMHeadModel


def _tiny_lm():
    cfg = ModelConfig(name="hyena_lm", vocab_size=16, d_model=32, n_layers=1,
                      d_ff=64, hyena_filter_order=16, hyena_filter_emb_dim=5,
                      dtype="float32")
    model = LMHeadModel(cfg, l_max=64, causal=True)
    ids = jnp.zeros((1, 16), jnp.int32)
    params = model.init(jax.random.key(0), ids, deterministic=True)["params"]
    return model, params


def test_generate_shapes_and_determinism():
    model, params = _tiny_lm()
    prompt = jnp.asarray([[7, 8, 9, 10]], jnp.int32)
    out = generate(model, params, prompt, jax.random.key(1), num_tokens=8,
                   greedy=True)
    assert out.shape == (1, 12)
    np.testing.assert_array_equal(np.asarray(out[:, :4]), np.asarray(prompt))
    out2 = generate(model, params, prompt, jax.random.key(2), num_tokens=8,
                    greedy=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))  # greedy


def test_generate_sampling_varies():
    model, params = _tiny_lm()
    prompt = jnp.asarray([[7, 8, 9, 10]], jnp.int32)
    a = generate(model, params, prompt, jax.random.key(1), num_tokens=16,
                 temperature=2.0)
    b = generate(model, params, prompt, jax.random.key(3), num_tokens=16,
                 temperature=2.0)
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_extract_embedding_backbone():
    model, params = _tiny_lm()
    ids = jnp.asarray(np.random.default_rng(0).integers(7, 11, (2, 16)),
                      jnp.int32)
    emb = extract_embedding(model, params, ids)
    assert emb.shape == (2, 32)
    assert np.isfinite(np.asarray(emb)).all()


def test_extract_embedding_bert():
    from dna_tpu.models.bert import BertForMLM

    cfg = ModelConfig(vocab_size=32, d_model=16, n_layers=1, n_heads=2,
                      d_ff=32, use_flash=False, dtype="float32")
    model = BertForMLM(cfg)
    ids = jnp.zeros((2, 8), jnp.int32)
    params = model.init(jax.random.key(0), ids, None,
                        deterministic=True)["params"]
    emb = extract_embedding(model, params, ids)
    assert emb.shape == (2, 16)


def test_icl_episode_structure():
    base = SyntheticClassificationDataset(max_length=20, num_samples=32)
    ds = ICLEpisodeDataset(base, shots=2, n_classes=2, max_length=128)
    ex = ds[5]
    assert ex["input_ids"].shape == (128,)
    assert int(ex["labels"]) in ds.label_token_ids
    # supports + query: last 20 tokens are the query sequence
    q = np.asarray(base[5]["input_ids"])
    np.testing.assert_array_equal(ex["input_ids"][-20:], q)


def test_icl_accuracy_readout():
    logits = np.zeros((4, 12))
    label_ids = [7, 11]
    logits[0, 7] = 5.0
    logits[1, 11] = 5.0
    logits[2, 7] = 5.0
    logits[3, 11] = 5.0
    labels = np.array([7, 11, 11, 11])
    assert icl_accuracy(logits, labels, label_ids) == 0.75
