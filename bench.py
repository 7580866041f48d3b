#!/usr/bin/env python
"""Headline benchmark: DNABERT-2-117M MLM pretrain tokens/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's committed artifact implies ~66k tok/s per A100-80GB
(4×A100 DDP at 1.55 s/it with the 800×128-token medium config;
BASELINE.md "Throughput"). vs_baseline = our tokens/sec/chip ÷ 66_000.
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import jax.numpy as jnp
import numpy as np

REF_TOKENS_PER_SEC_PER_GPU = 66_000.0


def main():
    from dna_tpu.config.core import MeshConfig
    from dna_tpu.data.loader import ShardedLoader
    from dna_tpu.experiments import build, get_experiment
    from dna_tpu.parallel.mesh import build_mesh
    from dna_tpu.train.state import create_train_state, param_count
    from dna_tpu.train.step import make_train_step

    n_dev = jax.device_count()
    # Per-chip batch sized for v5e HBM (16 GB): 117M params (opt state f32)
    # leaves room for ~512 × 128-token sequences of bf16 activations.
    per_chip_batch = int(os.environ.get("BENCH_PER_CHIP_BATCH", "256"))
    seq_len = int(os.environ.get("BENCH_SEQ_LEN", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))
    remat = os.environ.get("BENCH_REMAT", "1") == "1"

    cfg = get_experiment("dnabert2_pretrain", [
        f"data.batch_size={per_chip_batch * n_dev}",
        f"data.max_length={seq_len}",
        f"data.num_samples={per_chip_batch * n_dev * 4}",
        f"model.remat={str(remat).lower()}",
    ])
    mesh = build_mesh(MeshConfig(dp=n_dev, fsdp=1, tp=1, pp=1, sp=1))
    exp = build(cfg, mesh=mesh)

    dummy = jnp.zeros((2, seq_len), jnp.int32)

    def init_params(rng):
        return exp.model.init(rng, dummy, None, deterministic=True)["params"]

    state, shardings = create_train_state(
        init_params, exp.tx, mesh, exp.rules, jax.random.key(0))
    train_step = make_train_step(exp.model, exp.task_fn, exp.tx, mesh,
                                 exp.rules, shardings)

    n_params = param_count(state.params)
    print(f"# model params: {n_params/1e6:.1f}M, devices: {n_dev}, "
          f"batch/chip: {per_chip_batch}, seq: {seq_len}", file=sys.stderr)

    loader = ShardedLoader(exp.dataset, cfg.data.batch_size, seed=0)
    batches = [b for _, b in zip(range(4), loader)]

    for i in range(warmup):
        state, metrics = train_step(state, batches[i % len(batches)])
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = train_step(state, batches[i % len(batches)])
    # device_get a value that depends on the whole step chain — guards
    # against backends where block_until_ready returns early
    final_loss = float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0

    tokens_per_step = per_chip_batch * n_dev * seq_len
    tok_per_sec_chip = tokens_per_step * steps / dt / n_dev
    print(f"# {steps} steps in {dt:.2f}s  ({dt/steps*1000:.1f} ms/step), "
          f"loss={float(metrics['loss']):.3f}", file=sys.stderr)

    print(json.dumps({
        "metric": "dnabert2_117m_mlm_tokens_per_sec_per_chip",
        "value": round(tok_per_sec_chip, 1),
        "unit": "tokens/sec/chip",
        "vs_baseline": round(tok_per_sec_chip / REF_TOKENS_PER_SEC_PER_GPU, 3),
    }))


if __name__ == "__main__":
    main()
