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


def _find_intermediate(tree, layer: str, prefix=()):
    """Depth-first search for a captured intermediate whose module path ends
    with `layer`; returns the sown value (first output of `__call__`)."""
    if isinstance(tree, dict):
        for key, sub in tree.items():
            if key == "__call__" and (prefix and prefix[-1] == layer
                                      or "/".join(prefix).endswith(layer)):
                val = sub[0] if isinstance(sub, (tuple, list)) else sub
                return val
            found = _find_intermediate(sub, layer, prefix + (key,))
            if found is not None:
                return found
    return None


def gradcam(model, params, input_ids: jax.Array, *, layer: str,
            target_fn: Optional[Callable] = None,
            out_len: Optional[int] = None) -> jax.Array:
    """Grad-CAM++-style conv-feature attribution for one sequence.

    TPU-native counterpart of the reference `visualize/gradcam.py:161`
    (`GradCAM.get_cam_weights`, which implements the Grad-CAM++ weighting
    aij = g²/(2g² + Σa·g³), w = Σ relu(g)·aij, cam = Σ_c w_c·A_c, followed
    by interpolation + min-max normalization at `gradcam.py:150-158`).

    `layer` names a conv feature submodule (e.g. "conv_3" on DenoiseCNN, or
    any suffix of a module path). Activations are captured with flax
    intermediates; the gradient w.r.t. the feature map comes from an
    additive zero probe injected at the layer output via method
    interception — no model changes needed.

    Returns a [out_len or L'] heatmap in [0, 1].
    """
    import numpy as np

    if input_ids.ndim == 1:
        input_ids = input_ids[None]
    if target_fn is None:
        target_fn = lambda logits: jnp.max(logits, axis=-1).sum()

    import flax.linen as nn

    _, inter = model.apply(
        {"params": params}, input_ids, None, deterministic=True,
        capture_intermediates=True, mutable=["intermediates"])
    acts = _find_intermediate(inter["intermediates"], layer)
    if acts is None:
        raise ValueError(f"no captured intermediate matches layer={layer!r}")

    def f(probe):
        def interceptor(next_fn, args, kwargs, context):
            out = next_fn(*args, **kwargs)
            path = "/".join(context.module.path)
            if (context.method_name == "__call__"
                    and (path.endswith(layer))
                    and getattr(out, "shape", None) == probe.shape):
                out = out + probe.astype(out.dtype)
            return out

        with nn.intercept_methods(interceptor):
            logits = model.apply({"params": params}, input_ids, None,
                                 deterministic=True)
        return jnp.sum(target_fn(logits))

    grads = jax.grad(f)(jnp.zeros_like(acts, jnp.float32))

    a = acts[0].astype(jnp.float32)     # [L', C] (channel-last on TPU)
    g = grads[0]
    g2 = g * g
    g3 = g2 * g
    sum_a = a.sum(axis=0)               # per-channel Σ activations
    aij = g2 / (2.0 * g2 + sum_a[None, :] * g3 + 1e-6)
    aij = jnp.where(g != 0, aij, 0.0)
    w = (jnp.maximum(g, 0.0) * aij).sum(axis=0)   # [C]
    cam = a @ w                          # [L']
    cam = np.asarray(cam)
    if out_len is not None and out_len != cam.shape[0]:
        cam = np.interp(np.linspace(0, cam.shape[0], out_len),
                        np.linspace(0, cam.shape[0], cam.shape[0]), cam)
    heat = (cam - cam.min()) / (cam.max() - cam.min() + 1e-10)
    return jnp.asarray(heat)


def saliency(model, params, input_ids: jax.Array, *,
             target_fn: Optional[Callable] = None,
             baseline_id: int = 11) -> jax.Array:
    """Per-position importance = max |ISM delta| over substitutions (falls
    back to occlusion semantics at positions outside the alphabet)."""
    m = ism(model, params, input_ids, target_fn=target_fn)
    return jnp.max(jnp.abs(m), axis=-1)
