"""BERT-style MLM masking as pure functions.

Reference semantics (`src/dataloaders/datasets/hg38_dataset.py:238-286`
`bert_mask`): choose ~15% of non-pad positions; of those, 80% become [MASK],
10% a random non-special token, 10% unchanged. Labels carry the original ids
on chosen positions and -100 elsewhere.

Two implementations:
  * `bert_mask_numpy` — host-side, for CPU data pipelines (np.random.Generator)
  * `bert_mask_jax`   — jit-compatible, keyed by `jax.random`; lets masking run
    on-device fused into the input pipeline (no host round trip per batch)
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IGNORE_INDEX = -100


def bert_mask_numpy(
    seq: np.ndarray,
    rng: np.random.Generator,
    *,
    mask_token_id: int,
    pad_token_id: int,
    vocab_size: int,
    special_token_ids: Sequence[int],
    mask_prob: float = 0.15,
    random_token_prob: float = 0.1,
    unchanged_token_prob: float = 0.1,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (masked_seq, mask, labels) with the reference contract."""
    seq = np.asarray(seq)
    mask = (seq != pad_token_id) & (rng.random(seq.shape) < mask_prob)
    labels = np.where(mask, seq, IGNORE_INDEX).astype(np.int64)

    rand = rng.random(seq.shape)
    p_mask = 1.0 - random_token_prob - unchanged_token_prob
    masked_seq = seq.copy()
    masked_seq[mask & (rand < p_mask)] = mask_token_id

    random_sel = mask & (rand >= p_mask) & (rand < 1.0 - unchanged_token_prob)
    # Sample uniformly from non-special ids by index remapping (rejection-free,
    # unlike the reference's resample-until-clean loop).
    allowed = np.setdiff1d(np.arange(vocab_size), np.asarray(special_token_ids))
    random_tokens = allowed[rng.integers(0, len(allowed), seq.shape)]
    masked_seq = np.where(random_sel, random_tokens, masked_seq)
    return masked_seq, mask, labels


@partial(jax.jit, static_argnames=("mask_token_id", "pad_token_id", "vocab_size",
                                   "special_token_ids", "mask_prob",
                                   "random_token_prob", "unchanged_token_prob"))
def bert_mask_jax(
    seq: jax.Array,
    key: jax.Array,
    *,
    mask_token_id: int,
    pad_token_id: int,
    vocab_size: int,
    special_token_ids: Tuple[int, ...],
    mask_prob: float = 0.15,
    random_token_prob: float = 0.1,
    unchanged_token_prob: float = 0.1,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """On-device masking. Same contract as `bert_mask_numpy` but traced; all
    shapes static, suitable for fusing into the first step of train_step."""
    k_sel, k_kind, k_rand = jax.random.split(key, 3)
    mask = (seq != pad_token_id) & (jax.random.uniform(k_sel, seq.shape) < mask_prob)
    labels = jnp.where(mask, seq, IGNORE_INDEX).astype(jnp.int32)

    rand = jax.random.uniform(k_kind, seq.shape)
    p_mask = 1.0 - random_token_prob - unchanged_token_prob

    allowed = np.setdiff1d(np.arange(vocab_size), np.asarray(special_token_ids))
    ridx = jax.random.randint(k_rand, seq.shape, 0, len(allowed))
    random_tokens = jnp.asarray(allowed, dtype=seq.dtype)[ridx]

    masked_seq = jnp.where(mask & (rand < p_mask), mask_token_id, seq)
    random_sel = mask & (rand >= p_mask) & (rand < 1.0 - unchanged_token_prob)
    masked_seq = jnp.where(random_sel, random_tokens, masked_seq)
    return masked_seq, mask, labels


def random_mask_numpy(seq: np.ndarray, rng: np.random.Generator, *,
                      mask_token_id: int, mask_prob: float = 0.15):
    """Plain random masking (reference `random_mask`, hg38_dataset.py:228)."""
    mask = rng.random(seq.shape) < mask_prob
    return np.where(mask, mask_token_id, seq), mask
