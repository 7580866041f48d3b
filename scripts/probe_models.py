"""Training-throughput probe for any registered experiment on the live chip.

Usage: python scripts/probe_models.py <experiment> [overrides...]
Prints ms/step and tokens/sec (best of 2 trials).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from dna_tpu.config.core import MeshConfig
from dna_tpu.data.loader import ShardedLoader
from dna_tpu.experiments import build, get_experiment
from dna_tpu.parallel.mesh import build_mesh
from dna_tpu.train.state import create_train_state, param_count
from dna_tpu.train.step import make_train_step

name = sys.argv[1]
cfg = get_experiment(name, sys.argv[2:])
mesh = build_mesh(MeshConfig(dp=1, fsdp=1, tp=1, pp=1, sp=1))
exp = build(cfg, mesh=mesh)
B, L = cfg.data.batch_size, cfg.data.max_length
dummy = jnp.zeros((2, L), jnp.int32)
init = lambda r: exp.model.init(r, dummy, None, deterministic=True)["params"]
state, sh = create_train_state(init, exp.tx, mesh, exp.rules, jax.random.key(0))
step = make_train_step(exp.model, exp.task_fn, exp.tx, mesh, exp.rules, sh,
                       mlm_gather=exp.cfg.model.mlm_gather)
print(f"# {name}: params {param_count(state.params)/1e6:.1f}M, B={B} L={L}")
loader = ShardedLoader(exp.dataset, B, seed=0)
batches = [b for _, b in zip(range(2), loader)]
for i in range(3):
    state, m = step(state, batches[i % 2])
print("# warm loss", float(jax.device_get(m["loss"])))
best = None
for trial in range(2):
    t0 = time.perf_counter()
    for i in range(10):
        state, m = step(state, batches[i % 2])
    _ = float(jax.device_get(m["loss"]))
    dt = (time.perf_counter() - t0) / 10
    best = dt if best is None else min(best, dt)
print(f"{name}: {best*1e3:.1f} ms/step, {B*L/best:.0f} tok/s")
