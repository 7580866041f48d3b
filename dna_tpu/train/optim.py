"""Optimizers, schedules, and parameter grouping.

Reproduces the reference's optimizer semantics with optax:
  * no weight decay for bias / norm / embedding params
    (`src/utils/optim_groups.py:14-144` `add_optimizer_hooks`)
  * per-parameter hyperparameter overrides — the reference attaches `_optim`
    dicts to tensors (Hyena filter params carry `{'lr': 1e-3, 'wd': 0}`,
    `hyena.py:228-231`); here modules mark such params by *name convention*
    (`"hyena_filter"` path substring table below) and we build an
    `optax.multi_transform` over the groups
  * per-layer LR decay (`train.py:489-523`)
  * schedules: cosine/linear warmup, inv-sqrt, constant
    (`src/utils/optim/schedulers.py`)
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from dna_tpu import registry
from dna_tpu.config.core import OptimizerConfig, SchedulerConfig

# Parameter-path regexes that get special (lr_scale, wd) treatment, the
# equivalent of the reference's per-tensor `_optim` attributes.
SPECIAL_PARAM_GROUPS: Tuple[Tuple[str, Dict[str, float]], ...] = (
    (r"hyena.*filter.*(freq|decay|bias|pos)", {"wd": 0.0}),
    (r"(A_log|dt_bias|ssm_D)", {"wd": 0.0}),  # mamba state params
)

NO_DECAY_PATTERNS = re.compile(
    r"(bias|_ln|layernorm|layer_norm|norm|embedding|decoder_bias|scale)", re.I)


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def make_schedule(cfg: SchedulerConfig, base_lr: float) -> optax.Schedule:
    if cfg.name == "cosine_warmup":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=base_lr, warmup_steps=max(cfg.warmup_steps, 1),
            decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
            end_value=base_lr * cfg.min_lr_ratio)
    if cfg.name == "linear_warmup":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, max(cfg.warmup_steps, 1)),
             optax.linear_schedule(base_lr, base_lr * cfg.min_lr_ratio,
                                   max(cfg.total_steps - cfg.warmup_steps, 1))],
            [cfg.warmup_steps])
    if cfg.name == "invsqrt":
        def sched(step):
            step = jnp.maximum(step, 1)
            warm = jnp.minimum(step / max(cfg.warmup_steps, 1), 1.0)
            return base_lr * warm * jnp.sqrt(max(cfg.warmup_steps, 1) / jnp.maximum(step, cfg.warmup_steps))
        return sched
    if cfg.name == "constant":
        return optax.constant_schedule(base_lr)
    raise ValueError(f"unknown scheduler {cfg.name!r}")


def _decay_mask(params) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not NO_DECAY_PATTERNS.search(_path_str(path)), params)


def _layer_decay_scales(params, decay: float) -> Any:
    """LR scale = decay^(n_layers - layer_idx); embeddings get the deepest
    decay (reference `train.py:489-523`)."""
    layer_re = re.compile(r"layer[s_]*(\d+)")

    paths = []
    jax.tree_util.tree_map_with_path(lambda p, _: paths.append(_path_str(p)), params)
    max_layer = 0
    for p in paths:
        m = layer_re.search(p)
        if m:
            max_layer = max(max_layer, int(m.group(1)))
    n = max_layer + 2  # +1 for the head above the last layer

    def scale_for(path, _):
        s = _path_str(path)
        m = layer_re.search(s)
        if m:
            return decay ** (n - (int(m.group(1)) + 1))
        if "embed" in s:
            return decay ** n
        return 1.0  # head / final norm

    return jax.tree_util.tree_map_with_path(scale_for, params)


@registry.optimizer.register("adamw")
def _adamw(lr, cfg: OptimizerConfig):
    return optax.adamw(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
                       weight_decay=cfg.weight_decay, mask=_decay_mask)


@registry.optimizer.register("adam")
def _adam(lr, cfg: OptimizerConfig):
    return optax.adam(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps)


@registry.optimizer.register("sgd")
def _sgd(lr, cfg: OptimizerConfig):
    return optax.sgd(lr, momentum=0.9)


@registry.optimizer.register("lamb")
def _lamb(lr, cfg: OptimizerConfig):
    # reference `src/utils/optim/lamb.py`
    return optax.lamb(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
                      weight_decay=cfg.weight_decay, mask=_decay_mask)


def build_optimizer(ocfg: OptimizerConfig, scfg: SchedulerConfig,
                    params_shape: Optional[Any] = None) -> optax.GradientTransformation:
    schedule = make_schedule(scfg, ocfg.lr)
    tx = registry.optimizer[ocfg.name](schedule, ocfg)

    chains = [tx]
    if ocfg.grad_clip:
        chains.insert(0, optax.clip_by_global_norm(ocfg.grad_clip))

    if ocfg.layer_decay and params_shape is not None:
        scales = _layer_decay_scales(params_shape, ocfg.layer_decay)

        def scale_update(updates, state, params=None):
            del params
            return jax.tree_util.tree_map(lambda u, s: u * s, updates, scales), state

        chains.append(optax.GradientTransformation(
            lambda params: optax.EmptyState(), scale_update))

    tx = optax.chain(*chains)
    if ocfg.accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=ocfg.accumulate_steps)
    return tx, schedule
