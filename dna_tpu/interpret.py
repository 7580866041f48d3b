"""Attribution / visualization utilities.

Replaces the reference's `visualize/gradcam.py` + visualizer model
(`src/models/sequence/visualizer.py`, SURVEY §2.5d) with the genomics-native
attribution methods, model-agnostic over token inputs:

  * occlusion — Δtarget when a position is replaced by a baseline token
  * ISM (in-silico mutagenesis) — Δtarget for every alternative base at
    every position (the standard genomics attribution / dependency map,
    reference `compute_and_visualize_dep_maps.ipynb`)

Both batch all perturbed variants through one jitted forward, so cost is
L (occlusion) or L×|alphabet| (ISM) extra rows, not Python loops.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def _target(model, params, ids_batch: jax.Array, target_fn) -> jax.Array:
    logits = model.apply({"params": params}, ids_batch, None,
                         deterministic=True)
    return target_fn(logits)


def occlusion(model, params, input_ids: jax.Array, *,
              target_fn: Optional[Callable] = None, baseline_id: int = 11,
              chunk: int = 128) -> jax.Array:
    """[L] per-position saliency for a single sequence [1, L] (or [L]):
    |target(x) − target(x with position i occluded)|."""
    if input_ids.ndim == 2:
        input_ids = input_ids[0]
    L = input_ids.shape[0]
    if target_fn is None:
        target_fn = lambda logits: jnp.max(logits, axis=-1).sum(-1) \
            if logits.ndim > 2 else jnp.max(logits, axis=-1)

    base = _target(model, params, input_ids[None], target_fn)

    def occluded_scores(start):
        rows = jnp.arange(chunk) + start
        variants = jnp.tile(input_ids[None], (chunk, 1))
        variants = variants.at[jnp.arange(chunk), jnp.clip(rows, 0, L - 1)
                               ].set(baseline_id)
        return _target(model, params, variants, target_fn)

    occluded_scores = jax.jit(occluded_scores)
    outs = []
    for start in range(0, L, chunk):
        outs.append(occluded_scores(jnp.int32(start)))
    scores = jnp.concatenate(outs)[:L]
    return jnp.abs(base - scores)


def ism(model, params, input_ids: jax.Array, *,
        target_fn: Optional[Callable] = None,
        alphabet_ids: Sequence[int] = (7, 8, 9, 10), chunk: int = 128
        ) -> jax.Array:
    """In-silico mutagenesis map [L, |alphabet|]: Δtarget for substituting
    each base at each position (0 where the base equals the original)."""
    if input_ids.ndim == 2:
        input_ids = input_ids[0]
    L = input_ids.shape[0]
    A = len(alphabet_ids)
    if target_fn is None:
        target_fn = lambda logits: jnp.max(logits, axis=-1).sum(-1) \
            if logits.ndim > 2 else jnp.max(logits, axis=-1)

    base = _target(model, params, input_ids[None], target_fn)
    alphabet = jnp.asarray(alphabet_ids, input_ids.dtype)

    def mutate_chunk(start):
        # chunk positions × A substitutions
        pos = (jnp.arange(chunk) + start)[:, None]          # [c, 1]
        pos = jnp.clip(pos, 0, L - 1)
        variants = jnp.tile(input_ids[None, None], (chunk, A, 1))
        rows = jnp.broadcast_to(jnp.arange(chunk)[:, None], (chunk, A))
        cols = jnp.broadcast_to(pos, (chunk, A))
        subs = jnp.broadcast_to(alphabet[None, :], (chunk, A))
        variants = variants.reshape(chunk * A, L).at[
            jnp.arange(chunk * A),
            cols.reshape(-1)].set(subs.reshape(-1))
        return _target(model, params, variants, target_fn).reshape(chunk, A)

    mutate_chunk = jax.jit(mutate_chunk)
    outs = []
    for start in range(0, L, chunk):
        outs.append(mutate_chunk(jnp.int32(start)))
    scores = jnp.concatenate(outs)[:L]                      # [L, A]
    delta = scores - base
    # zero out the reference base's own column
    same = input_ids[:, None] == alphabet[None, :]
    return jnp.where(same, 0.0, delta)


def saliency(model, params, input_ids: jax.Array, *,
             target_fn: Optional[Callable] = None,
             baseline_id: int = 11) -> jax.Array:
    """Per-position importance = max |ISM delta| over substitutions (falls
    back to occlusion semantics at positions outside the alphabet)."""
    m = ism(model, params, input_ids, target_fn=target_fn)
    return jnp.max(jnp.abs(m), axis=-1)
