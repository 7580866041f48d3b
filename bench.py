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

import jax
import jax.numpy as jnp
import numpy as np

REF_TOKENS_PER_SEC_PER_GPU = 66_000.0

# v5e per-chip peaks (for MFU / speed-of-light context in the bench artifact)
V5E_BF16_FLOPS = 197e12
V5E_HBM_BPS = 819e9


def _bench_hyena_64k(steps: int = 3, trials: int = 2):
    """Secondary metric: hg38_hyena full train step at L=65536, B=1
    (long-context regression guard — CLAUDE.md r2: 332 ms/step, 197k tok/s)."""
    from dna_tpu.config.core import MeshConfig
    from dna_tpu.data.loader import ShardedLoader
    from dna_tpu.experiments import build, get_experiment
    from dna_tpu.parallel.mesh import build_mesh
    from dna_tpu.train.state import create_train_state
    from dna_tpu.train.step import make_train_step

    L = 65536
    cfg = get_experiment("hg38_hyena", [
        "data.batch_size=1", f"data.max_length={L}", "data.num_samples=4",
        f"model.max_len={L}",
    ])
    mesh = build_mesh(MeshConfig(dp=1))
    exp = build(cfg, mesh=mesh)
    dummy = jnp.zeros((1, 128), jnp.int32)
    init = lambda r: exp.model.init(r, dummy, None, deterministic=True)["params"]
    state, sh = create_train_state(init, exp.tx, mesh, exp.rules,
                                   jax.random.key(0))
    step = make_train_step(exp.model, exp.task_fn, exp.tx, mesh, exp.rules, sh)
    batch = next(iter(ShardedLoader(exp.dataset, 1, seed=0)))
    state, m = step(state, batch)  # compile
    jax.device_get(m["loss"])
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = step(state, batch)
        jax.device_get(m["loss"])
        dt = (time.perf_counter() - t0) / steps
        best = dt if best is None else min(best, dt)
    return round(L / best, 1)


def _bench_flash_4096(iters: int = 10, trials: int = 2):
    """Secondary metric: flash-attention kernel fwd+bwd at S=4096
    (B=4, H=12, D=64 bf16) — kernel regression guard."""
    from dna_tpu.ops.flash_attention import flash_attention

    B, S, H, D = 4, 4096, 12, 64
    key = jax.random.key(0)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, S, H, D),
                                 jnp.bfloat16) for i in range(3))

    @jax.jit
    def fwd_bwd(q, k, v):
        def loss(q, k, v):
            return flash_attention(q, k, v, causal=False).astype(
                jnp.float32).sum()

        return jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)

    out = fwd_bwd(q, k, v)  # compile
    jax.device_get(out[0])
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd_bwd(q, k, v)
        jax.device_get(out[0])
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return round(B * S / best, 1)


def main():
    t_begin = time.perf_counter()
    # Persistent compile cache, default ON when the repo-local cache dir
    # exists: remote compiles through a degraded tunnel have been measured at
    # 200-500s each (CLAUDE.md incident log), and the round-end driver run
    # must not spend its whole budget recompiling programs this session
    # already built. DNA_TPU_COMPILE_CACHE=  (empty) disables.
    default_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
    cache = os.environ.get(
        "DNA_TPU_COMPILE_CACHE",
        default_cache if os.path.isdir(default_cache) else "")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from dna_tpu.config.core import MeshConfig
    from dna_tpu.data.loader import ShardedLoader
    from dna_tpu.experiments import build, get_experiment
    from dna_tpu.parallel.mesh import build_mesh
    from dna_tpu.train.state import create_train_state, param_count
    from dna_tpu.train.step import make_train_step

    backend = jax.default_backend()
    if backend not in ("tpu",):
        # the axon plugin registers jax_platforms="axon,cpu"; a transient
        # tunnel failure silently drops to CPU — make that loud and retry once
        print(f"# WARNING: backend is {backend!r}, not tpu — retrying init",
              file=sys.stderr)
        import time as _t

        _t.sleep(10)
        jax.clear_caches()
        try:
            jax.config.update("jax_platforms", "axon,cpu")
        except Exception:
            pass
        backend = jax.default_backend()
        print(f"# backend after retry: {backend!r}", file=sys.stderr)

    n_dev = jax.device_count()
    print(f"# platform: {jax.default_backend()}, devices: {jax.devices()}",
          file=sys.stderr)
    # Measured on v5e (16 GB HBM): batch 128 without remat is the per-token
    # optimum (134k tok/s vs 124k at 256+remat; larger batches hit bandwidth
    # pressure). Batch 512 needs remat=1.
    # 192: the B∈{128..256} sweep with bf16-mu plateaus at ~200k tok/s for
    # 160-224 and drops at 256 (191.6k) / 128 (196.0k) — r4 curve in
    # CLAUDE.md
    per_chip_batch = int(os.environ.get("BENCH_PER_CHIP_BATCH", "192"))
    seq_len = int(os.environ.get("BENCH_SEQ_LEN", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))
    remat = os.environ.get("BENCH_REMAT", "0") == "1"

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
                                 exp.rules, shardings,
                                 mlm_gather=exp.cfg.model.mlm_gather)

    n_params = param_count(state.params)
    print(f"# model params: {n_params/1e6:.1f}M, devices: {n_dev}, "
          f"batch/chip: {per_chip_batch}, seq: {seq_len}", file=sys.stderr)

    loader = ShardedLoader(exp.dataset, cfg.data.batch_size, seed=0)
    # device_put once: numpy batches would re-cross the host↔device tunnel
    # every step (measured ~1.4 ms dispatch overhead per call on axon)
    batches = [jax.device_put(b) for _, b in zip(range(4), loader)]

    for i in range(warmup):
        state, metrics = train_step(state, batches[i % len(batches)])
    jax.block_until_ready(state.params)

    # The remote-TPU backend's first timed window can absorb multi-second
    # warmup/transfer costs even after warmup steps; take the best of
    # several trials (measured: trial0 can be 10s/step, trial1 121ms/step).
    trials = int(os.environ.get("BENCH_TRIALS", "3"))
    best_dt = None
    for t in range(trials):
        t0 = time.perf_counter()
        for i in range(steps):
            state, metrics = train_step(state, batches[i % len(batches)])
        # device_get a value that depends on the whole step chain — guards
        # against backends where block_until_ready returns early
        final_loss = float(jax.device_get(metrics["loss"]))
        dt_t = time.perf_counter() - t0
        print(f"# trial {t}: {dt_t/steps*1e3:.1f} ms/step", file=sys.stderr)
        best_dt = dt_t if best_dt is None else min(best_dt, dt_t)
    dt = best_dt

    tokens_per_step = per_chip_batch * n_dev * seq_len
    tok_per_sec_chip = tokens_per_step * steps / dt / n_dev
    ms_per_step = dt / steps * 1000
    print(f"# {steps} steps in {dt:.2f}s  ({ms_per_step:.1f} ms/step), "
          f"loss={float(metrics['loss']):.3f}", file=sys.stderr)

    record = {
        "metric": "dnabert2_117m_mlm_tokens_per_sec_per_chip",
        "value": round(tok_per_sec_chip, 1),
        "unit": "tokens/sec/chip",
        "vs_baseline": round(tok_per_sec_chip / REF_TOKENS_PER_SEC_PER_GPU, 3),
        "ms_per_step": round(ms_per_step, 1),
    }

    # XLA cost analysis → MFU + HBM traffic (VERDICT r2 #8: make
    # regressions attributable to traffic vs compute from the artifact alone)
    try:
        ca = train_step.jitted.lower(state, batches[0]).compile(
        ).cost_analysis()
        flops = float(ca.get("flops", 0.0))
        bytes_acc = float(ca.get("bytes accessed", 0.0))
        if flops:
            record["mfu"] = round(flops / (dt / steps) / V5E_BF16_FLOPS, 4)
        if bytes_acc:
            record["hbm_gb_per_step"] = round(bytes_acc / 1e9, 2)
            record["mem_sol_ms"] = round(bytes_acc / V5E_HBM_BPS * 1e3, 1)
        if flops:
            record["compute_sol_ms"] = round(flops / V5E_BF16_FLOPS * 1e3, 1)
    except Exception as e:  # pragma: no cover — backend-dependent
        print(f"# cost analysis unavailable: {e}", file=sys.stderr)

    # Secondary regression guards (long-context + kernel) — each is gated on
    # remaining time budget so a degraded tunnel can never starve the
    # headline JSON line.
    budget = float(os.environ.get("BENCH_TIME_BUDGET", "560"))
    secondary = {}
    if os.environ.get("BENCH_SECONDARY", "1") == "1":
        if time.perf_counter() - t_begin < budget * 0.5:
            try:
                secondary["hyena_64k_tokens_per_sec"] = _bench_hyena_64k()
            except Exception as e:
                print(f"# hyena_64k secondary failed: {e}", file=sys.stderr)
        if time.perf_counter() - t_begin < budget * 0.8:
            try:
                secondary["flash_s4096_tokens_per_sec"] = _bench_flash_4096()
            except Exception as e:
                print(f"# flash_s4096 secondary failed: {e}", file=sys.stderr)
    if secondary:
        record["secondary"] = secondary

    print(json.dumps(record))


if __name__ == "__main__":
    main()
