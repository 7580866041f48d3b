"""Jit-compiled train/eval steps.

One SPMD program replaces the reference's PL `training_step` + DDP allreduce
(`train.py:339-379` + NCCL): the batch arrives sharded over the (dp, fsdp)
mesh axes, the loss is a mean over the global batch, and XLA inserts the
gradient psum/reduce-scatter collectives implied by the sharding annotations.
Metrics come back as replicated scalars — already globally reduced, which is
what the reference needs `sync_dist=True` for.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dna_tpu.parallel.mesh import data_pspec
from dna_tpu.train.state import TrainState

Batch = Dict[str, jax.Array]


def mlm_budget(seq_len: int, mlm_gather: float,
               mlm_probability: Optional[float] = None) -> int:
    """Static per-row MLM gather budget.

    The configured `mlm_gather` fraction is a floor; when the masking
    probability is known the budget is also at least mean + 6σ of the
    per-row Binomial(S, p) masked count, so overflow (silently dropped
    positions) stays ~1e-9/row for ANY p — the bare 0.375 default was
    sized for p=0.15 only and would silently truncate at p=0.4.
    """
    import math

    budget = int(seq_len * mlm_gather)
    if mlm_probability is not None and mlm_probability > 0.0:
        mean = seq_len * mlm_probability
        sd = math.sqrt(seq_len * mlm_probability * (1.0 - mlm_probability))
        budget = max(budget, int(math.ceil(mean + 6.0 * sd)))
    return max(min(budget, seq_len), 8)


def gather_mlm_positions(labels: jax.Array, budget: int):
    """Per-row indices of masked positions, padded to `budget`; gathered
    labels are -100 past each row's true count (jit-safe static shapes).

    Implemented as a batched stable argsort (masked positions first, in
    index order) instead of `jnp.nonzero(size=...)`: nonzero lowers to a
    cumsum + row scatter that the TPU backend serializes, while a batched
    sort over the row axis is a vectorized bitonic network."""
    import jax.numpy as jnp

    mask = labels != -100
    # stable ascending sort of (not mask): True-mask rows sort first, ties
    # keep index order — exactly nonzero's output order, padded with the
    # first unmasked indices which `valid` then zeroes out.
    order = jnp.argsort(jnp.logical_not(mask), axis=-1, stable=True)
    idx = order[:, :budget]
    valid = jnp.arange(budget)[None, :] < mask.sum(axis=-1, keepdims=True)
    idx = jnp.where(valid, idx, 0)
    glabels = jnp.take_along_axis(labels, idx, axis=-1)
    return idx, jnp.where(valid, glabels, -100)


def make_forward_fn(model: nn.Module, task_fn,
                    mlm_gather: float = 0.0,
                    mlm_probability: Optional[float] = None,
                    track_act_norms: bool = False) -> Callable:
    """loss_fn(params, batch, rng, deterministic) -> (loss, metrics)."""

    def forward(params, batch: Batch, rng, deterministic: bool):
        import jax.numpy as jnp

        attention_mask = batch.get("attention_mask")
        kwargs = {}
        labels = batch.get("labels")
        dropped = None
        if (mlm_gather > 0.0 and labels is not None and labels.ndim == 2):
            budget = mlm_budget(labels.shape[1], mlm_gather, mlm_probability)
            positions, glabels = gather_mlm_positions(labels, budget)
            kwargs["positions"] = positions
            batch = dict(batch)
            batch["labels"] = glabels
            # overflow sentinel: positions silently dropped by the static
            # budget (should be ~0; loop's debug mode raises on it)
            n_masked = (labels != -100).sum(axis=-1)
            dropped = jnp.maximum(n_masked - budget, 0).sum()
        # "losses" is mutable so modules can sow auxiliary losses (MoE
        # load-balancing); the collection is empty for every dense model
        mutable = ["losses", "act_norms"] if track_act_norms else ["losses"]
        logits, variables = model.apply(
            {"params": params}, batch["input_ids"], attention_mask,
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": rng},
            mutable=mutable,
            **kwargs)
        loss, metrics = task_fn(logits, batch)
        if track_act_norms:
            # per-layer activation-norm plane (reference `model.py:86-102`
            # track_norms → metrics `norm/i`)
            metrics = dict(metrics)
            flat = jax.tree_util.tree_flatten_with_path(
                variables.get("act_norms", {}))[0]
            for path, leaf in flat:
                name = "/".join(
                    getattr(p, "key", getattr(p, "name", str(p)))
                    for p in path if getattr(p, "key", None) != "__call__")
                metrics[f"act_{name}"] = leaf
        aux_leaves = jax.tree_util.tree_leaves(variables.get("losses", {}))
        if aux_leaves:
            import jax.numpy as _jnp

            aux = sum(_jnp.asarray(a, _jnp.float32).sum() for a in aux_leaves)
            loss = loss + aux
            metrics = dict(metrics)
            metrics["aux_loss"] = aux
        if dropped is not None:
            metrics = dict(metrics)
            metrics["mlm_dropped_positions"] = dropped
        return loss, metrics

    return forward


def make_train_step(
    model: nn.Module,
    task_fn,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    rules,
    state_shardings: TrainState,
    *,
    ema: float = 0.0,
    deterministic: Optional[bool] = None,
    mlm_gather: float = 0.0,
    mlm_probability: Optional[float] = None,
    track_param_norms: bool = False,
    track_act_norms: bool = False,
    watch: bool = False,
) -> Callable[[TrainState, Batch], Tuple[TrainState, Dict[str, jax.Array]]]:
    forward = make_forward_fn(model, task_fn, mlm_gather, mlm_probability,
                              track_act_norms)
    det = bool(deterministic) if deterministic is not None else True

    def train_step(state: TrainState, batch: Batch):
        step_rng = jax.random.fold_in(state.rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: forward(p, batch, step_rng, det), has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if ema > 0.0 and new_ema is not None:
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * ema + p * (1.0 - ema), new_ema, new_params)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        if track_param_norms:
            # per-parameter grad norms (reference TrackNorms
            # `callbacks/norms.py:27-39` logs grad_2.0_norm/<name>)
            flat = jax.tree_util.tree_flatten_with_path(grads)[0]
            import jax.numpy as jnp
            for path, leaf in flat:
                name = "/".join(
                    getattr(p, "key", getattr(p, "name", str(p)))
                    for p in path)
                metrics[f"grad_norm/{name}"] = jnp.sqrt(
                    (leaf.astype(jnp.float32) ** 2).sum())
        if watch:
            # wandb.watch equivalent (reference `callbacks/wandb.py` watch
            # half): per-leaf strided samples of gradients and parameters
            # ride back in metrics under a "_watch/" prefix; the loop turns
            # them into wandb.Histogram at `wandb_watch_freq` and strips
            # them from the JSONL stream.
            import jax.numpy as jnp

            def _sample(leaf, n=1024):
                flat = leaf.astype(jnp.float32).ravel()
                stride = max(1, flat.size // n)
                return flat[::stride][:n]

            for kind, tree in (("gradients", grads),
                               ("parameters", state.params)):
                flat = jax.tree_util.tree_flatten_with_path(tree)[0]
                for path, leaf in flat:
                    name = "/".join(
                        getattr(p, "key", getattr(p, "name", str(p)))
                        for p in path)
                    metrics[f"_watch/{kind}/{name}"] = _sample(leaf)
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt,
            ema_params=new_ema)
        return new_state, metrics

    batch_sharding = NamedSharding(mesh, data_pspec())
    replicated = NamedSharding(mesh, P())
    jitted = jax.jit(
        train_step,
        in_shardings=(state_shardings, None),
        out_shardings=(state_shardings, replicated),
        donate_argnums=(0,),
    )

    def run(state, batch):
        with mesh, nn.logical_axis_rules(rules):
            return jitted(state, batch)

    run.jitted = jitted
    run.batch_sharding = batch_sharding
    return run


def make_eval_step(model: nn.Module, task_fn, mesh: Mesh, rules,
                   state_shardings: TrainState, *, use_ema: bool = True):
    """use_ema=False forces raw params even when EMA is tracked, so the loop
    can log raw and `/ema` duplicates (reference `train.py:442-455`)."""
    forward = make_forward_fn(model, task_fn)

    def eval_step(state: TrainState, batch: Batch):
        params = (state.ema_params
                  if use_ema and state.ema_params is not None
                  else state.params)
        loss, metrics = forward(params, batch, state.rng, True)
        return metrics

    replicated = NamedSharding(mesh, P())
    jitted = jax.jit(eval_step, in_shardings=(state_shardings, None),
                     out_shardings=replicated)

    def run(state, batch):
        with mesh, nn.logical_axis_rules(rules):
            return jitted(state, batch)

    return run


def make_predict_step(model: nn.Module, mesh: Mesh, rules, state_shardings):
    """Returns logits for host-side metric computation (MCC/F1/AUROC)."""

    def predict(state: TrainState, batch: Batch):
        params = state.ema_params if state.ema_params is not None else state.params
        return model.apply({"params": params}, batch["input_ids"],
                           batch.get("attention_mask"), deterministic=True)

    jitted = jax.jit(predict, in_shardings=(state_shardings, None))

    def run(state, batch):
        with mesh, nn.logical_axis_rules(rules):
            return jitted(state, batch)

    return run
