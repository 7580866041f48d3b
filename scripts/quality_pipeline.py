"""End-to-end quality pipeline on the committed fixtures (VERDICT r2 #3).

CLI-style experiment composition → finetune → seed_sweep (5 seeds) →
mean/range CSV artifacts, mirroring the reference's de-facto regression
suite: bash seed loops + `py_cal_mean.py:16-46` aggregation into
`pybash/result_*.txt` / `mean_and_range_diff.csv`.

Runs 3 fixture tasks — NT (H4), GenomicBenchmarks (demo_promoters), and
DeepSTARR regression — writing artifacts to results/fixture_sweeps/.
These are PIPELINE-correctness artifacts on tiny fixture data (the env has
no real corpora); with real data at the REAL_DATA.md dest_paths the exact
same invocations produce the BASELINE.md tables.

    python scripts/quality_pipeline.py [output_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")
OUT = sys.argv[1] if len(sys.argv) > 1 else "results/fixture_sweeps"

TINY = [
    "model.d_model=32", "model.n_layers=1", "model.n_heads=2",
    "model.d_ff=64", "model.dtype=float32",
    "data.batch_size=8", "train.steps=30", "train.eval_every=15",
    "train.eval_steps=4", "train.log_every=0",
    "scheduler.warmup_steps=2", "scheduler.total_steps=30",
]

# (experiment, overrides, monitor, host_metrics)
SWEEPS = [
    ("nt_hyena",
     [f"data.dest_path={FIX}/nt", "data.dataset_name=H4",
      "data.max_length=120", "model.max_len=128",
      "model.hyena_filter_emb_dim=5", "model.hyena_filter_order=16"],
     "val/mcc", ("mcc", "f1")),
    ("genomic_benchmark",
     [f"data.dest_path={FIX}/gb", "data.dataset_name=demo_promoters",
      "data.max_length=100"],
     "val/mcc", ("mcc", "acc")),
    ("deepstarr_denoise",
     [f"data.dest_path={FIX}/deepstarr", "data.max_length=249"],
     "val/pearsonr_mean", ("pearsonr_mean", "pearsonr_dev", "pearsonr_hk")),
]

SEEDS = [2222, 42, 43, 44, 45]


def main():
    from dna_tpu.experiments import get_experiment
    from dna_tpu.finetune import seed_sweep

    os.makedirs(OUT, exist_ok=True)
    for exp_name, extra, monitor, host_metrics in SWEEPS:
        cfg = get_experiment(exp_name, TINY + extra)
        agg = seed_sweep(cfg, seeds=SEEDS, monitor=monitor,
                         host_metrics=host_metrics, output_dir=OUT)
        assert len(agg["per_seed"]) == len(SEEDS), (
            f"{exp_name}: only {len(agg['per_seed'])}/{len(SEEDS)} seeds "
            f"produced the monitor metric {monitor}")
        print(f"{exp_name}: monitor={monitor} mean={agg['mean']:.4f} "
              f"range=[{agg['min']:.4f}, {agg['max']:.4f}] "
              f"({len(agg['per_seed'])}/{len(SEEDS)} seeds)", flush=True)
    print(f"artifacts in {OUT}/")


if __name__ == "__main__":
    main()
