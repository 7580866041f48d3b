"""Compile the bench train step and print XLA cost analysis vs measured time.

Usage: probe_cost.py [BATCH] [REMAT] [SEQ]
Prints flops, bytes accessed, speed-of-light step time on v5e
(197 TFLOP/s bf16, 819 GB/s HBM) and the measured ms/step.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys, time
import jax, jax.numpy as jnp

from dna_tpu.config.core import MeshConfig
from dna_tpu.data.loader import ShardedLoader
from dna_tpu.experiments import build, get_experiment
from dna_tpu.parallel.mesh import build_mesh
from dna_tpu.train.state import create_train_state
from dna_tpu.train.step import make_train_step

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
remat = (sys.argv[2] if len(sys.argv) > 2 else "0") == "1"
S = int(sys.argv[3]) if len(sys.argv) > 3 else 128

cfg = get_experiment("dnabert2_pretrain", [
    f"data.batch_size={B}", f"data.max_length={S}",
    f"data.num_samples={B*4}", f"model.remat={str(remat).lower()}",
] + sys.argv[4:])
mesh = build_mesh(MeshConfig(dp=1))
exp = build(cfg, mesh=mesh)
dummy = jnp.zeros((2, S), jnp.int32)
init = lambda r: exp.model.init(r, dummy, None, deterministic=True)["params"]
state, sh = create_train_state(init, exp.tx, mesh, exp.rules, jax.random.key(0))
step = make_train_step(exp.model, exp.task_fn, exp.tx, mesh, exp.rules, sh,
                       mlm_gather=exp.cfg.model.mlm_gather)
loader = ShardedLoader(exp.dataset, B, seed=0)
batches = [b for _, b in zip(range(2), loader)]

ca = step.jitted.lower(state, batches[0]).compile().cost_analysis()
flops = ca.get("flops", 0.0)
bytes_acc = ca.get("bytes accessed", 0.0)
print(f"B={B} S={S} remat={remat}")
print(f"flops/step: {flops/1e12:.2f} TF  bytes: {bytes_acc/1e9:.2f} GB")
print(f"SoL: compute {flops/197e12*1e3:.1f} ms, memory {bytes_acc/819e9*1e3:.1f} ms")

for i in range(3):
    state, m = step(state, batches[i % 2])
jax.device_get(m["loss"])
best = None
for t in range(3):
    t0 = time.perf_counter()
    for i in range(10):
        state, m = step(state, batches[i % 2])
    jax.device_get(m["loss"])
    dt = (time.perf_counter() - t0) / 10
    best = dt if best is None else min(best, dt)
print(f"measured: {best*1e3:.1f} ms/step → {B*S/best:.0f} tok/s")
