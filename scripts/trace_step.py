"""Trace N train steps of ANY experiment on the real TPU, then aggregate.

Usage:
    timeout 560 python scripts/trace_step.py <experiment> [key=value ...]
    python scripts/trace_agg.py            # per-op table

Env: TRACE_BATCH (default experiment's), TRACE_STEPS (default 5),
TRACE_DIR (default /tmp/jaxtrace). Generalizes probe_trace.py (which is
pinned to the DNABERT-2 flagship point) for #6-style passes over
ntv2_pretrain_500m / hg38_hyena.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dna_tpu.config.core import MeshConfig
from dna_tpu.data.loader import ShardedLoader
from dna_tpu.experiments import build, get_experiment
from dna_tpu.parallel.mesh import build_mesh
from dna_tpu.train.state import create_train_state
from dna_tpu.train.step import make_train_step


def main():
    name = sys.argv[1]
    overrides = sys.argv[2:]
    cfg = get_experiment(name, overrides)
    B = int(os.environ.get("TRACE_BATCH", cfg.data.batch_size))
    S = cfg.data.max_length
    n_steps = int(os.environ.get("TRACE_STEPS", "5"))
    cfg = get_experiment(name, [f"data.batch_size={B}",
                                f"data.num_samples={B * 4}"] + overrides)
    mesh = build_mesh(MeshConfig(dp=1))
    exp = build(cfg, mesh=mesh)
    dummy = jnp.zeros((2, S), jnp.int32)
    init = lambda r: exp.model.init(r, dummy, None, deterministic=True)["params"]
    state, sh = create_train_state(init, exp.tx, mesh, exp.rules,
                                   jax.random.key(0))
    kw = {}
    if getattr(exp.cfg.model, "mlm_gather", None):
        kw["mlm_gather"] = exp.cfg.model.mlm_gather
    step = make_train_step(exp.model, exp.task_fn, exp.tx, mesh, exp.rules,
                           sh, **kw)
    batch = jax.device_put(next(iter(ShardedLoader(exp.dataset, B, seed=0))))
    import time

    t0 = time.time()
    for _ in range(3):
        state, m = step(state, batch)
    print(f"warm loss {float(jax.device_get(m['loss'])):.4f} "
          f"(compile+3 steps: {time.time() - t0:.1f}s)", flush=True)
    t0 = time.time()
    for _ in range(10):
        state, m = step(state, batch)
    jax.device_get(m["loss"])
    dt = (time.time() - t0) / 10
    print(f"{name} B={B} S={S}: {dt * 1e3:.1f} ms/step "
          f"({B * S / dt:.0f} tok/s)", flush=True)
    trace_dir = os.environ.get("TRACE_DIR", "/tmp/jaxtrace")
    jax.profiler.start_trace(trace_dir)
    for _ in range(n_steps):
        state, m = step(state, batch)
    print("traced", float(jax.device_get(m["loss"])), flush=True)
    jax.profiler.stop_trace()
    print(f"trace in {trace_dir}; aggregate with scripts/trace_agg.py",
          flush=True)


if __name__ == "__main__":
    main()
