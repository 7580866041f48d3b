"""Probe: hg38_hyena full train step at long L — compile + step time,
XLA monolithic FFT vs blocked Cooley-Tukey (DNA_TPU_FFT_IMPL).

Usage: probe_hyena_longL.py [L] [B] [xla|blocked]
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

impl = sys.argv[3] if len(sys.argv) > 3 else "auto"
os.environ["DNA_TPU_FFT_IMPL"] = impl

import jax, jax.numpy as jnp

from dna_tpu.config.core import MeshConfig
from dna_tpu.data.loader import ShardedLoader
from dna_tpu.experiments import build, get_experiment
from dna_tpu.parallel.mesh import build_mesh
from dna_tpu.train.state import create_train_state
from dna_tpu.train.step import make_train_step

L = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1

cfg = get_experiment("hg38_hyena", [
    f"data.batch_size={B}", f"data.max_length={L}",
    f"data.num_samples={B*4}", f"model.max_len={L}", "model.remat=true",
])
mesh = build_mesh(MeshConfig(dp=1))
exp = build(cfg, mesh=mesh)
dummy = jnp.zeros((1, L), jnp.int32)
init = lambda r: exp.model.init(r, dummy, None, deterministic=True)["params"]
state, sh = create_train_state(init, exp.tx, mesh, exp.rules, jax.random.key(0))
step = make_train_step(exp.model, exp.task_fn, exp.tx, mesh, exp.rules, sh)
loader = ShardedLoader(exp.dataset, B, seed=0)
batch = next(iter(loader))

t0 = time.time()
compiled = step.jitted.lower(state, batch).compile()
print(f"impl={impl} L={L} B={B} compile: {time.time()-t0:.1f}s", flush=True)
state, m = step(state, batch)
jax.device_get(m["loss"])
best = None
for t in range(3):
    t0 = time.perf_counter()
    for _ in range(3):
        state, m = step(state, batch)
    jax.device_get(m["loss"])
    dt = (time.perf_counter() - t0) / 3
    best = dt if best is None else min(best, dt)
print(f"step: {best*1e3:.1f} ms → {B*L/best:.0f} tok/s, loss={float(m['loss']):.3f}")
