"""Train state and sharded initialization.

The whole optimizer/param state is one pytree whose parameter leaves stay
*boxed* in flax `Partitioned` metadata; optax transforms recurse through the
boxes, so the optimizer state (mu/nu) inherits the same logical axes and is
sharded identically to its parameter — which is exactly ZeRO/FSDP when the
"embed" logical axis maps to the fsdp mesh axis.

Replaces the reference's PL `configure_optimizers` + DDP wrapping
(`train.py:462-542`, `train.py:630-639`): there is no wrapper object, just
`jit(train_step, in_shardings=state_shardings, donate_argnums=0)`.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any  # boxed (nn.Partitioned leaves)
    opt_state: Any
    rng: jax.Array
    ema_params: Optional[Any] = None


def state_shardings(abs_state: TrainState, mesh: Mesh, rules) -> TrainState:
    """Map the logical-axis metadata in an eval_shape'd TrainState to
    NamedShardings; unannotated leaves are replicated."""
    specs = nn.get_partition_spec(abs_state)

    def to_sharding(leaf):
        if isinstance(leaf, P):
            return NamedSharding(mesh, nn.logical_to_mesh_axes(leaf, rules=rules))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(
        to_sharding, specs, is_leaf=lambda x: isinstance(x, P) or x is None)


def create_train_state(
    init_params_fn: Callable[[jax.Array], Any],
    tx: optax.GradientTransformation,
    mesh: Mesh,
    rules,
    rng: jax.Array,
    *,
    ema: float = 0.0,
) -> Tuple[TrainState, TrainState]:
    """Build a sharded TrainState. Returns (state, shardings).

    `init_params_fn(rng) -> boxed params` is typically
    `lambda r: model.init(r, dummy_ids, dummy_mask)["params"]`.
    """

    def _init(r) -> TrainState:
        params = init_params_fn(r)
        opt_state = tx.init(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            rng=jax.random.fold_in(r, 1),
            ema_params=params if ema > 0.0 else None,
        )

    with mesh, nn.logical_axis_rules(rules):
        abs_state = jax.eval_shape(_init, rng)
        shardings = state_shardings(abs_state, mesh, rules)
        state = jax.jit(_init, out_shardings=shardings)(rng)
    return state, shardings


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(nn.meta.unbox(params)))
