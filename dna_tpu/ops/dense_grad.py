"""Gathers with matmul (one-hot) backward passes.

XLA lowers the VJP of `jnp.take` / `take_along_axis` to `scatter(-add)`,
which the TPU backend emits as a *serialized* loop over update rows — at the
DNABERT-2 bench point the compiled train step carried a 16384-row f32
scatter-add for the embedding gradient and a 6144-row scatter for the
masked-position gather (found via the optimized-HLO dump; invisible to
byte-ranked traffic probes because scatters are slow, not large).

A one-hot `dot_general` computes the identical sum-of-duplicates gradient on
the MXU instead: the one-hot operand is exact (0/1), accumulation is fp32,
and the whole thing costs ~0.1 GFLOP-scale matmuls plus one pass of HBM
traffic for the one-hot operand.

These replace the gradient path of the same ops the reference gets from
torch's fused CUDA embedding/index kernels (`nn.Embedding`,
`torch.gather` in `src/models/DNABERT2/bert_layers.py:817-833`) — the
TPU-native answer is "turn the scatter into a matmul", not a custom kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _zero_ct(x):
    if x is None:
        return None
    from jax.custom_derivatives import zero_from_primal

    return zero_from_primal(x)


# --------------------------------------------------------------------------
# Embedding lookup: rows of a [V, D] table by flat integer ids.
# --------------------------------------------------------------------------


@jax.custom_vjp
def take_rows(table: jax.Array, ids: jax.Array) -> jax.Array:
    """`jnp.take(table, ids, axis=0)` with a matmul backward.

    table: [V, D] (any float dtype), ids: int array of any shape.
    Gradient: dtable = onehot(ids)ᵀ @ g  — exact sum over duplicate ids,
    fp32 accumulation on the MXU.
    """
    return jnp.take(table, ids, axis=0)


def _take_rows_fwd(table, ids):
    # residuals must be JAX types; only table's shape/dtype are used in bwd,
    # so XLA dead-code-eliminates the value itself
    return jnp.take(table, ids, axis=0), (table, ids)


def _take_rows_bwd(res, g):
    table, ids = res
    (V, D), dt = table.shape, table.dtype
    flat_ids = ids.reshape(-1)
    gf = g.reshape(-1, D)
    # bf16 one-hot is exact; bf16 g loses nothing when the activations the
    # cotangent flowed through were bf16 already (the flagship case). Keep
    # fp32 operands when the table is fp32-critical and g is genuinely fp32.
    op_dt = jnp.bfloat16 if gf.dtype == jnp.bfloat16 else jnp.float32
    onehot = (flat_ids[:, None] == jnp.arange(V)[None, :]).astype(op_dt)
    dtable = jax.lax.dot_general(
        onehot, gf.astype(op_dt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return dtable.astype(dt), _zero_ct(ids)


take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


# --------------------------------------------------------------------------
# Per-row position gather: h[b, positions[b, k], :] for [B, S, D] activations.
# --------------------------------------------------------------------------


@jax.custom_vjp
def take_positions(h: jax.Array, positions: jax.Array) -> jax.Array:
    """`jnp.take_along_axis(h, positions[..., None], axis=1)` with a matmul
    backward. h: [B, S, D], positions: [B, K] int → [B, K, D]."""
    return jnp.take_along_axis(h, positions[..., None], axis=1)


def _take_positions_fwd(h, positions):
    return (jnp.take_along_axis(h, positions[..., None], axis=1),
            (h, positions))


def _take_positions_bwd(res, g):
    h, positions = res
    (B, S, D), dt = h.shape, h.dtype
    onehot = (positions[..., None] == jnp.arange(S)[None, None, :])
    onehot = onehot.astype(g.dtype)  # [B, K, S]
    dh = jax.lax.dot_general(
        onehot, g, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [B, S, D]
    return dh.astype(dt), _zero_ct(positions)


take_positions.defvjp(_take_positions_fwd, _take_positions_bwd)
