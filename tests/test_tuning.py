"""Soft-prompt tuning harness (reference protocol:
`configs/evals/soft_prompting_genomics.yaml`)."""

import jax
import jax.numpy as jnp
import numpy as np

from dna_tpu.config.core import ModelConfig
from dna_tpu.data.icl import ICLEpisodeDataset
from dna_tpu.data.synthetic import SyntheticClassificationDataset
from dna_tpu.models.lm import LMHeadModel
from dna_tpu.tuning import soft_prompt_eval, soft_prompt_tune


def _lm_and_episodes():
    cfg = ModelConfig(name="hyena_lm", vocab_size=16, d_model=32, n_layers=2,
                      d_ff=64, hyena_filter_order=16, hyena_filter_emb_dim=5,
                      dtype="float32")
    model = LMHeadModel(cfg, l_max=256, causal=True)
    ids = jnp.zeros((1, 16), jnp.int32)
    params = model.init(jax.random.key(0), ids, deterministic=True)["params"]
    base = SyntheticClassificationDataset(max_length=24, num_samples=64)
    episodes = ICLEpisodeDataset(base, shots=1, n_classes=2)
    return model, params, episodes


def test_soft_prefix_changes_logits_only_via_prefix():
    model, params, _ = _lm_and_episodes()
    ids = jnp.asarray(np.random.default_rng(0).integers(7, 11, (2, 12)))
    plain = model.apply({"params": params}, ids, None, deterministic=True)
    soft = jax.random.normal(jax.random.key(5), (4, 32)) * 0.5
    with_soft = model.apply({"params": params}, ids, None,
                            deterministic=True, soft_prefix=soft)
    # same [B, S, V] shape — prefix positions are sliced off
    assert with_soft.shape == plain.shape
    # a causal hyena conv sees the prefix, so logits differ
    assert not np.allclose(np.asarray(with_soft), np.asarray(plain))


class _ConstantLabel:
    """Wrap a dataset forcing every label to class 0 — the optimal policy is
    then expressible by the soft prefix alone (CE can approach 0), giving the
    tuning loop a clean learnable signal."""

    def __init__(self, base):
        self.base = base

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i):
        item = dict(self.base[i])
        item["labels"] = np.int64(0)
        return item


def test_soft_prompt_tuning_reduces_loss():
    from dna_tpu.config.core import ModelConfig

    cfg = ModelConfig(vocab_size=16, d_model=32, n_layers=2, n_heads=4,
                      d_ff=64, dtype="float32", use_flash=False)
    model = LMHeadModel(cfg, attn_layer_idx=(0, 1), l_max=256, causal=True)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16), jnp.int32),
                        deterministic=True)["params"]
    base = _ConstantLabel(
        SyntheticClassificationDataset(max_length=24, num_samples=64))
    episodes = ICLEpisodeDataset(base, shots=1, n_classes=2)
    tuned = soft_prompt_tune(
        model, params, episodes,
        label_token_ids=episodes.label_token_ids, n_soft=8, steps=200,
        batch_size=16, lr=1e-1)
    losses = [h["loss"] for h in tuned["history"]]
    assert all(np.isfinite(losses))

    # clean signal: fixed-batch loss with an untuned vs the tuned prefix
    # (per-batch training losses are too noisy at this scale)
    import optax
    from dna_tpu.tuning import _episode_batches

    ids, labels = next(_episode_batches(episodes, 32, 1, seed=99))
    label_ids = jnp.asarray(episodes.label_token_ids)
    y = jnp.argmax(labels[:, None] == label_ids[None, :], axis=1)

    def fixed_loss(soft):
        logits = model.apply({"params": params}, ids, None,
                             deterministic=True, soft_prefix=soft)
        return float(optax.softmax_cross_entropy_with_integer_labels(
            logits[:, -1, label_ids], y).mean())

    untuned = jax.random.normal(jax.random.key(0), (8, 32)) * 0.02
    assert fixed_loss(tuned["soft_prefix"]) < fixed_loss(untuned) - 0.02
    # frozen backbone: only the prefix was trained
    assert tuned["soft_prefix"].shape == (8, 32)


def test_soft_prompt_eval_protocol():
    model, params, episodes = _lm_and_episodes()
    res = soft_prompt_eval(
        model, params, episodes, episodes,
        label_token_ids=episodes.label_token_ids,
        soft_tokens=(0, 4), steps=10, batch_size=8)
    assert set(res) == {0, 4}
    assert all(0.0 <= v <= 1.0 for v in res.values())
