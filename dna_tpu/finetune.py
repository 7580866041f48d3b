"""Finetune harness + seed-sweep driver.

Replaces the reference's bash seed-sweep drivers (`py_train.sh:18-40`,
`experiment_caduceus.sh`, aggregator `py_cal_mean.py:16-46`) — the de-facto
regression suite (SURVEY §4.1): run a finetune config over N seeds, track the
best validation metric per seed, aggregate mean/min/max.

Usage:
    from dna_tpu.finetune import finetune, seed_sweep
    result = seed_sweep(cfg, seeds=[2222, 42, 43], monitor="val/mcc")
"""

from __future__ import annotations

import dataclasses
from dataclasses import replace
from typing import Any, Dict, List, Sequence

import numpy as np

from dna_tpu.config.core import ExperimentConfig
from dna_tpu.experiments import Experiment, build
from dna_tpu.train.loop import TrainLoop


def finetune(cfg: ExperimentConfig, *, eval_dataset=None, train_dataset=None,
             monitor: str = "val/acc", monitor_mode: str = "max",
             host_metrics: Sequence[str] = ("mcc", "f1"),
             pretrained_params=None, mesh=None,
             verbose: bool = False) -> Dict[str, Any]:
    """One finetune run; returns history + best monitor value."""
    exp = build(cfg, mesh=mesh)
    if train_dataset is not None:
        exp = dataclasses.replace(exp, dataset=train_dataset)
    loop = TrainLoop(exp, eval_dataset=eval_dataset, monitor=monitor,
                     monitor_mode=monitor_mode, host_metrics=host_metrics,
                     verbose=verbose)
    if pretrained_params is not None:
        from dna_tpu.train.checkpoint import load_backbone
        import flax.linen as nn
        import jax

        params = nn.meta.unbox(loop.state.params)
        merged = load_backbone(params, nn.meta.unbox(pretrained_params),
                               strict=False)
        # re-box: replace each array leaf, keeping metadata boxes from state
        boxed = jax.tree_util.tree_map(
            lambda box, new: box.replace_boxed(new) if hasattr(box, "replace_boxed") else new,
            loop.state.params, merged,
            is_leaf=lambda x: hasattr(x, "unbox"))
        loop.state = loop.state.replace(params=boxed)
    res = loop.run()
    if res.best_metric is None and eval_dataset is not None:
        ev = loop.evaluate()
        res = dataclasses.replace(res, best_metric=ev.get(monitor),
                                  history=res.history + [ev])
    return {"best": res.best_metric, "final": res.final_metrics,
            "history": res.history}


def seed_sweep(cfg: ExperimentConfig, *, seeds: Sequence[int] = (2222, 42, 43),
               monitor: str = "val/mcc", monitor_mode: str = "max",
               host_metrics: Sequence[str] = ("mcc", "f1"),
               eval_dataset=None, train_dataset=None, mesh=None,
               pretrained_params=None,
               verbose: bool = False, output_dir=None) -> Dict[str, Any]:
    """Reference seed-sweep protocol: per-seed best-val metric, then
    mean/min/max across seeds (`py_cal_mean.py:16-46`).

    With `output_dir`, also writes the reference's result artifacts
    (`pybash/result_*.txt` + `mean_and_range_diff.csv`): one
    `result_<task>_<experiment>.txt` with a `seed value` line per seed, and
    an appended CSV row `name, Mean, Range Difference, <per-seed values>`
    (failed/missing seeds recorded as -1.0, like the reference)."""
    per_seed: List[float] = []
    by_seed: Dict[int, float] = {}
    for seed in seeds:
        run_cfg = replace(cfg, train=replace(cfg.train, seed=seed),
                          data=replace(cfg.data, seed=seed))
        out = finetune(run_cfg, eval_dataset=eval_dataset,
                       train_dataset=train_dataset, monitor=monitor,
                       monitor_mode=monitor_mode, host_metrics=host_metrics,
                       pretrained_params=pretrained_params,
                       mesh=mesh, verbose=verbose)
        if out["best"] is not None:
            per_seed.append(float(out["best"]))
            by_seed[seed] = float(out["best"])
    agg = {
        "seeds": list(seeds),
        "per_seed": per_seed,
        "mean": float(np.mean(per_seed)) if per_seed else None,
        "min": float(np.min(per_seed)) if per_seed else None,
        "max": float(np.max(per_seed)) if per_seed else None,
        "monitor": monitor,
    }
    if output_dir:
        _write_sweep_artifacts(output_dir, cfg, seeds, by_seed, agg)
    return agg


def _write_sweep_artifacts(output_dir, cfg: ExperimentConfig,
                           seeds: Sequence[int], by_seed: Dict[int, float],
                           agg: Dict[str, Any]) -> None:
    import os

    os.makedirs(output_dir, exist_ok=True)
    task = cfg.data.dataset_name or cfg.data.dataset
    name = f"result_{task}_{cfg.name}.txt"
    with open(os.path.join(output_dir, name), "w") as f:
        for seed in seeds:
            f.write(f"{seed} {by_seed.get(seed, -1.0)}\n")
    regenerate_sweep_csv(output_dir)


def regenerate_sweep_csv(output_dir) -> None:
    """Rebuild `mean_and_range_diff.csv` from every `result_*.txt` in the
    directory — one row per result file, always current (the reference's
    `py_cal_mean.py:16-46` aggregation; regenerating rather than appending
    keeps re-run sweeps from leaving stale duplicate rows)."""
    import csv
    import glob
    import os

    rows = []
    all_seeds: List[int] = []
    for path in sorted(glob.glob(os.path.join(output_dir, "result_*.txt"))):
        by_seed = {}
        with open(path) as f:
            for line in f:
                parts = line.split()
                if len(parts) == 2:
                    by_seed[int(parts[0])] = float(parts[1])
        if not by_seed:
            continue
        for s in by_seed:
            if s not in all_seeds:
                all_seeds.append(s)
        rows.append((os.path.basename(path), by_seed))
    csv_path = os.path.join(output_dir, "mean_and_range_diff.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([""] + ["Mean", "Range Difference"] + all_seeds)
        for name, by_seed in rows:
            vals = [by_seed.get(s, -1.0) for s in all_seeds if s in by_seed]
            rng_diff = (max(vals) - min(vals)) if vals else 0.0
            w.writerow([name, np.mean(vals) if vals else -1.0, rng_diff]
                       + [by_seed.get(s, "") for s in all_seeds])
