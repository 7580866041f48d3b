"""NT-v1 specifics (reference `src/models/sequence/nt.py:598-670`):
learned positional embeddings + TokensDropout in the ESM family."""

import jax
import jax.numpy as jnp
import numpy as np

from dna_tpu.config.core import ModelConfig
from dna_tpu.models.esm import (EsmForMaskedLM, LearnedPositionalEmbeddings,
                                tokens_dropout)

PAD, MASK = 1, 2


def test_tokens_dropout_zeroes_and_rescales():
    B, S, D = 2, 8, 4
    ids = np.full((B, S), 5, np.int32)
    ids[0, :2] = MASK           # row 0: 2/8 masked
    ids[1, -3:] = PAD           # row 1: 5 real tokens, none masked
    x = jnp.ones((B, S, D), jnp.float32)
    out = tokens_dropout(x, jnp.asarray(ids), pad_token_id=PAD,
                         mask_token_id=MASK)
    # masked positions zeroed
    assert np.abs(np.asarray(out[0, :2])).max() == 0.0
    # row 0 scale = (1 - 0.12) / (1 - 2/8)
    np.testing.assert_allclose(np.asarray(out[0, 3, 0]),
                               (1 - 0.15 * 0.8) / (1 - 2 / 8), rtol=1e-6)
    # row 1: no masks observed → scale (1 - 0.12)
    np.testing.assert_allclose(np.asarray(out[1, 0, 0]), 1 - 0.12, rtol=1e-6)


def test_learned_positions_are_pad_aware():
    mod = LearnedPositionalEmbeddings(max_len=16, d_model=8, padding_idx=PAD)
    ids_left_pad = jnp.asarray([[PAD, PAD, 5, 6, 7]], jnp.int32)
    ids_no_pad = jnp.asarray([[5, 6, 7, PAD, PAD]], jnp.int32)
    params = mod.init(jax.random.key(0), ids_left_pad)
    a = mod.apply(params, ids_left_pad)
    b = mod.apply(params, ids_no_pad)
    # real tokens get the same positions regardless of pad placement
    np.testing.assert_allclose(np.asarray(a[0, 2:5]), np.asarray(b[0, 0:3]))
    # pad rows all hit the shared padding_idx slot
    np.testing.assert_allclose(np.asarray(a[0, 0]), np.asarray(b[0, 4]))


def test_nt_v1_forward_runs_and_differs_from_rotary():
    base = ModelConfig(name="ntv2", vocab_size=64, d_model=32, n_layers=1,
                       n_heads=2, d_ff=64, max_len=16, dtype="float32",
                       rotary=False, alibi=False, pad_token_id=PAD,
                       mask_token_id=MASK)
    import dataclasses

    v1 = dataclasses.replace(base, learned_pos_emb=True, token_dropout=True)
    ids = jnp.asarray(np.random.default_rng(0).integers(5, 64, (2, 16)),
                      jnp.int32)
    m1 = EsmForMaskedLM(v1)
    p1 = m1.init(jax.random.key(0), ids, None, deterministic=True)
    out = m1.apply(p1, ids, None, deterministic=True)
    assert out.shape == (2, 16, 64)
    assert np.isfinite(np.asarray(out)).all()
    # pos-emb params exist under the encoder
    flat = jax.tree_util.tree_flatten_with_path(p1)[0]
    names = ["/".join(str(getattr(k, "key", k)) for k in path)
             for path, _ in flat]
    assert any("pos_embed" in n for n in names)
