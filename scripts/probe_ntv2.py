"""Probe: NTv2 pretrain step on TPU (compile + ms/step + tok/s).

Usage: probe_ntv2.py [SIZE] [BATCH] [SEQ]
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp

from dna_tpu.config.core import MeshConfig
from dna_tpu.data.loader import ShardedLoader
from dna_tpu.experiments import build, get_experiment
from dna_tpu.parallel.mesh import build_mesh
from dna_tpu.train.state import create_train_state, param_count
from dna_tpu.train.step import make_train_step

size = sys.argv[1] if len(sys.argv) > 1 else "500m"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
S = int(sys.argv[3]) if len(sys.argv) > 3 else 128
extra = sys.argv[4:]  # e.g. optimizer.nu_dtype=bfloat16

cfg = get_experiment(f"ntv2_pretrain_{size}", [
    f"data.batch_size={B}", f"data.max_length={S}",
    f"data.num_samples={B*4}",
] + extra)
mesh = build_mesh(MeshConfig(dp=1))
exp = build(cfg, mesh=mesh)
dummy = jnp.zeros((2, S), jnp.int32)
init = lambda r: exp.model.init(r, dummy, None, deterministic=True)["params"]
state, sh = create_train_state(init, exp.tx, mesh, exp.rules, jax.random.key(0))
step = make_train_step(exp.model, exp.task_fn, exp.tx, mesh, exp.rules, sh,
                       mlm_gather=exp.cfg.model.mlm_gather)
print(f"{size}: {param_count(state.params)/1e6:.0f}M params", flush=True)
loader = ShardedLoader(exp.dataset, B, seed=0)
batch = next(iter(loader))
t0 = time.time()
compiled = step.jitted.lower(state, batch).compile()
print(f"compile: {time.time()-t0:.1f}s", flush=True)
state, m = step(state, batch)
jax.device_get(m["loss"])
best = None
for t in range(3):
    t0 = time.perf_counter()
    for _ in range(5):
        state, m = step(state, batch)
    jax.device_get(m["loss"])
    dt = (time.perf_counter() - t0) / 5
    best = dt if best is None else min(best, dt)
print(f"step: {best*1e3:.1f} ms → {B*S/best:.0f} tok/s, loss={float(m['loss']):.3f}")
