"""Pipeline parallelism: GPipe executor over the `pp` mesh axis.

The reference has no pipeline parallelism (SURVEY §2.6: PP absent); this is
a new capability for models too deep for one chip's HBM. Design:

  * stages are homogeneous: `stage_fn(stage_params, x) -> y` (e.g. a slice
    of stacked transformer layers); `stage_params` carries a leading stage
    dim sharded over "pp"
  * `shard_map` over the pp axis; inside, a `lax.scan` over
    T = n_microbatches + pp − 1 ticks implements the GPipe schedule: at tick
    t, stage r computes microbatch t−r; activations move to the next stage
    via `lax.ppermute` each tick
  * every rank executes identical code every tick (SPMD; bubble ticks
    compute on garbage and are masked when injecting/collecting)
  * backward: jax reverse-differentiates the scan + ppermute, yielding the
    reverse pipeline schedule automatically (GPipe-style, activations of
    all live microbatches saved; combine with jax.checkpoint on stage_fn
    for 1F1B-like memory)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def gpipe(
    stage_fn: Callable,      # (stage_params, x_mb[, aux_mb]) -> y_mb
    stage_params,            # pytree, leading dim = pp (sharded over "pp")
    x: jax.Array,            # [n_micro, mb, ...] microbatched input
    *,
    mesh: Mesh,
    axis: str = "pp",
    aux: jax.Array = None,   # optional [n_micro, ...] replicated side input
) -> jax.Array:
    """Run x through pp sequential stages; returns [n_micro, mb, ...].

    `aux` carries per-microbatch side inputs every stage needs (e.g. the
    attention mask): replicated on all ranks; at tick t, rank r works on
    microbatch t−r, so it indexes aux[t−r] locally — no extra comms."""
    pp = mesh.shape[axis]
    n_micro = x.shape[0]
    T = n_micro + pp - 1

    # one spec entry per pytree leaf: params sharded on leading stage dim
    param_specs = jax.tree_util.tree_map(lambda _: P(axis), stage_params)

    def worker(params_local, x_local, aux_local):
        r = jax.lax.axis_index(axis)
        params_stage = jax.tree_util.tree_map(lambda p: p[0], params_local)
        mb_shape = x_local.shape[1:]

        def tick(carry, t):
            act, outputs = carry
            inject = jax.lax.dynamic_index_in_dim(
                x_local, jnp.clip(t, 0, n_micro - 1), axis=0, keepdims=False)
            my_in = jnp.where(r == 0, inject, act)
            if aux_local is not None:
                a = jax.lax.dynamic_index_in_dim(
                    aux_local, jnp.clip(t - r, 0, n_micro - 1), axis=0,
                    keepdims=False)
                out = stage_fn(params_stage, my_in, a)
            else:
                out = stage_fn(params_stage, my_in)
            m = t - (pp - 1)
            is_last = r == pp - 1
            store_idx = jnp.clip(m, 0, n_micro - 1)
            mask = (is_last & (m >= 0) & (m < n_micro)).astype(out.dtype)
            cur = jax.lax.dynamic_index_in_dim(outputs, store_idx, axis=0,
                                               keepdims=False)
            new = cur * (1 - mask) + out.astype(outputs.dtype) * mask
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, new, store_idx, axis=0)
            perm = [(i, (i + 1) % pp) for i in range(pp)]
            act = jax.lax.ppermute(out, axis, perm)
            return (act, outputs), None

        act0 = jnp.zeros(mb_shape, x_local.dtype)
        outputs0 = jnp.zeros((n_micro, *mb_shape), x_local.dtype)
        (_, outputs), _ = jax.lax.scan(tick, (act0, outputs0), jnp.arange(T))
        # replicate the last stage's buffer to every rank
        mask = (r == pp - 1).astype(outputs.dtype)
        outputs = jax.lax.psum(outputs * mask, axis)
        return outputs

    aux_spec = (None if aux is None else P(*([None] * aux.ndim)))
    in_specs = (param_specs, P(*([None] * x.ndim)), aux_spec)
    out_specs = P(*([None] * x.ndim))
    # Manual ONLY over the pp axis: every other mesh axis (dp/fsdp/tp/...)
    # stays compiler-managed ("auto"), so GSPMD keeps batch sharding and
    # tensor-parallel param sharding alive INSIDE the pipeline region —
    # tp×pp composes without hand-written Megatron collectives, and dp
    # batches are not replicated across ranks.
    fn = shard_map(worker, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False,
                   axis_names=frozenset({axis}))
    return fn(stage_params, x, aux)


def microbatch(x: jax.Array, n_micro: int) -> jax.Array:
    """[B, ...] → [n_micro, B/n_micro, ...]."""
    B = x.shape[0]
    assert B % n_micro == 0, (B, n_micro)
    return x.reshape(n_micro, B // n_micro, *x.shape[1:])


def unmicrobatch(x: jax.Array) -> jax.Array:
    return x.reshape(x.shape[0] * x.shape[1], *x.shape[2:])
