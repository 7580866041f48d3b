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

# Parameter-path regexes that get special per-parameter treatment, the
# equivalent of the reference's per-tensor `_optim` attributes
# (`src/models/sequence/hyena.py:228-231` attaches {'lr', 'wd'} to every
# implicit-filter tensor; `pyramid.py:142-146` marks A_log/D no-decay;
# `optim_groups.py:100-141` splits them into optimizer param groups).
# Groups are matched in order; the first match wins. Each group always has
# weight decay 0 and optionally an absolute lr from OptimizerConfig
# (`filter_lr` for the filter group, `lr_pos_emb` for the pos-emb group —
# reference `configs/experiment/hg38/hg38_hyena.yaml:27-30`).
SPECIAL_PARAM_GROUPS: Tuple[Tuple[str, str], ...] = (
    ("pos_emb", r"(pos_z|pos_t)"),
    ("filter", r"(hyena_filter/|sin_freq_|mod_deltas|filt_bias)"),
    ("ssm", r"(A_log|dt_bias|ssm_D)"),  # mamba state params (no lr override)
)

NO_DECAY_PATTERNS = re.compile(
    r"(bias|_ln|layernorm|layer_norm|norm|embedding|decoder_bias|scale)", re.I)


def _group_mask_fn(group: str):
    """Returns a callable(params) -> bool pytree selecting the group's params
    (first-match-wins over SPECIAL_PARAM_GROUPS order)."""
    order = [(name, re.compile(pat)) for name, pat in SPECIAL_PARAM_GROUPS]

    def in_group(path) -> bool:
        s = _path_str(path)
        for name, pat in order:
            if pat.search(s):
                return name == group
        return False

    def mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: in_group(p), params)

    return mask


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


@registry.scheduler.register("cosine_warmup")
def _cosine_warmup(cfg: SchedulerConfig, base_lr: float) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=base_lr, warmup_steps=max(cfg.warmup_steps, 1),
        decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
        end_value=base_lr * cfg.min_lr_ratio)


@registry.scheduler.register("linear_warmup")
def _linear_warmup(cfg: SchedulerConfig, base_lr: float) -> optax.Schedule:
    return optax.join_schedules(
        [optax.linear_schedule(0.0, base_lr, max(cfg.warmup_steps, 1)),
         optax.linear_schedule(base_lr, base_lr * cfg.min_lr_ratio,
                               max(cfg.total_steps - cfg.warmup_steps, 1))],
        [cfg.warmup_steps])


@registry.scheduler.register("invsqrt")
def _invsqrt(cfg: SchedulerConfig, base_lr: float) -> optax.Schedule:
    def sched(step):
        step = jnp.maximum(step, 1)
        warm = jnp.minimum(step / max(cfg.warmup_steps, 1), 1.0)
        return base_lr * warm * jnp.sqrt(
            max(cfg.warmup_steps, 1) / jnp.maximum(step, cfg.warmup_steps))

    return sched


@registry.scheduler.register("constant")
def _constant(cfg: SchedulerConfig, base_lr: float) -> optax.Schedule:
    return optax.constant_schedule(base_lr)


def make_schedule(cfg: SchedulerConfig, base_lr: float) -> optax.Schedule:
    """Dispatch through the scheduler registry (reference
    `src/utils/registry.py` scheduler table)."""
    return registry.scheduler[cfg.name](cfg, base_lr)


def _decay_mask(params) -> Any:
    """True = apply weight decay. Excludes bias/norm/embedding paths
    (reference `add_optimizer_hooks`, `optim_groups.py:14-38`) and every
    SPECIAL_PARAM_GROUPS member (all reference `_optim` groups carry wd=0)."""
    special = re.compile("|".join(p for _, p in SPECIAL_PARAM_GROUPS))

    def decays(path, _):
        s = _path_str(path)
        return not (NO_DECAY_PATTERNS.search(s) or special.search(s))

    return jax.tree_util.tree_map_with_path(decays, params)


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


def _scale_by_adam_cast(b1, b2, eps, mu_dtype, nu_dtype):
    """`optax.scale_by_adam` with independently castable moment dtypes —
    optax exposes `mu_dtype` only, but the second moment is the same size
    of pure HBM traffic (the flagship optimizer update runs at fp32-traffic
    speed-of-light, CLAUDE.md r4 trace). Math identical: moments upcast to
    the gradient dtype for the update, cast back for storage."""
    import jax.numpy as jnp

    mu_d = jnp.dtype(mu_dtype) if mu_dtype else None
    nu_d = jnp.dtype(nu_dtype) if nu_dtype else None

    def init_fn(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mu_d or p.dtype), params)
        nu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=nu_d or p.dtype), params)
        return optax.ScaleByAdamState(count=jnp.zeros([], jnp.int32),
                                      mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree_util.tree_map(
            lambda g, m: b1 * m.astype(g.dtype) + (1 - b1) * g,
            updates, state.mu)
        nu = jax.tree_util.tree_map(
            lambda g, v: b2 * v.astype(g.dtype) + (1 - b2) * (g * g),
            updates, state.nu)
        count = state.count + 1
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)
        out = jax.tree_util.tree_map(
            lambda m, v: (m / c1) / (jnp.sqrt(v / c2) + eps), mu, nu)
        mu = jax.tree_util.tree_map(
            lambda m: m.astype(mu_d) if mu_d else m, mu)
        nu = jax.tree_util.tree_map(
            lambda v: v.astype(nu_d) if nu_d else v, nu)
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


@registry.optimizer.register("adamw")
def _adamw(lr, cfg: OptimizerConfig):
    if cfg.nu_dtype:
        return optax.chain(
            _scale_by_adam_cast(cfg.betas[0], cfg.betas[1], cfg.eps,
                                cfg.mu_dtype, cfg.nu_dtype),
            optax.add_decayed_weights(cfg.weight_decay, mask=_decay_mask),
            optax.scale_by_learning_rate(lr),
        )
    return optax.adamw(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
                       weight_decay=cfg.weight_decay, mask=_decay_mask,
                       mu_dtype=cfg.mu_dtype)


@registry.optimizer.register("adam")
def _adam(lr, cfg: OptimizerConfig):
    return optax.adam(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
                      mu_dtype=cfg.mu_dtype)


@registry.optimizer.register("sgd")
def _sgd(lr, cfg: OptimizerConfig):
    return optax.sgd(lr, momentum=0.9)


@registry.optimizer.register("lamb")
def _lamb(lr, cfg: OptimizerConfig):
    # reference `src/utils/optim/lamb.py`
    return optax.lamb(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
                      weight_decay=cfg.weight_decay, mask=_decay_mask)


def make_accum_schedule(stages) -> Optional[Any]:
    """Per-stage gradient-accumulation schedule for seqlen warmup (reference
    couples `accumulate_grad_batches` to the seqlen stage, `train.py:644-661`).
    Stages are (seq_len, batch, micro_steps[, accum]); returns a traceable
    fn(gradient_step) -> accum, or None when every stage uses accum=1."""
    stages = [tuple(s) for s in stages]
    accums = [int(s[3]) if len(s) > 3 else 1 for s in stages]
    if not stages or all(a == 1 for a in accums):
        return None
    # stage boundaries in *optimizer* steps (micro steps / accum)
    bounds, g = [], 0
    for s, a in zip(stages, accums):
        g += max(int(s[2]) // a, 1)
        bounds.append(g)
    ends = jnp.asarray(bounds[:-1])
    accums_arr = jnp.asarray(accums)

    def schedule(gradient_step):
        idx = jnp.sum(ends <= gradient_step)  # completed stages so far
        return accums_arr[idx]

    return schedule


def build_optimizer(ocfg: OptimizerConfig, scfg: SchedulerConfig,
                    params_shape: Optional[Any] = None,
                    accum_stages=()) -> optax.GradientTransformation:
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

    # Per-parameter absolute-lr overrides (reference `_optim={'lr': ...}`,
    # `hyena.py:228-231` + `lr_pos_emb`, `hg38_hyena.yaml:27-30`): a masked
    # post-scale by (override / base_lr) keeps the Adam moments shared while
    # changing the effective step size; 0.0 freezes the group.
    for group, lr in (("filter", ocfg.filter_lr),
                      ("pos_emb", ocfg.lr_pos_emb)):
        if lr is not None and ocfg.lr > 0:
            chains.append(optax.masked(optax.scale(lr / ocfg.lr),
                                       _group_mask_fn(group)))

    tx = optax.chain(*chains)
    accum_schedule = make_accum_schedule(accum_stages)
    if accum_schedule is not None:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_schedule)
    elif ocfg.accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=ocfg.accumulate_steps)
    return tx, schedule
