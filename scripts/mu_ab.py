"""1000-step flagship A/B: optimizer.mu_dtype bfloat16 (default) vs float32.

Backs the PARITY.md "known numerics deviation" entry with flagship-scale
evidence (the r4 evidence was a 300-step tiny-model A/B). Same data order,
same init; records the loss trajectory every 50 steps and writes
results/mu_ab/summary.json.

    timeout 2700 python scripts/mu_ab.py [STEPS=1000] [B=192]
"""
import json
import os
import sys
import time

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

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 192
S = 128

ARMS = [
    ("mu_bf16", ["optimizer.mu_dtype=bfloat16"]),          # current default
    ("fp32", ["optimizer.mu_dtype=float32"]),              # exact reference
    ("mu_nu_bf16", ["optimizer.mu_dtype=bfloat16",
                    "optimizer.nu_dtype=bfloat16"]),       # candidate
]

out = {}
for mu, extra in ARMS:
    cfg = get_experiment("dnabert2_pretrain", [
        f"data.batch_size={B}", f"data.max_length={S}",
        f"data.num_samples={B*64}",
    ] + extra)
    mesh = build_mesh(MeshConfig(dp=1))
    exp = build(cfg, mesh=mesh)
    dummy = jnp.zeros((2, S), jnp.int32)
    init = lambda r: exp.model.init(r, dummy, None, deterministic=True)["params"]
    state, sh = create_train_state(init, exp.tx, mesh, exp.rules,
                                   jax.random.key(0))
    step = make_train_step(exp.model, exp.task_fn, exp.tx, mesh, exp.rules,
                           sh, mlm_gather=exp.cfg.model.mlm_gather)
    loader = ShardedLoader(exp.dataset, B, seed=0)
    traj = []
    t0 = time.time()
    it = iter(loader)
    for i in range(STEPS):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        state, m = step(state, batch)
        if i % 50 == 0 or i == STEPS - 1:
            loss = float(jax.device_get(m["loss"]))
            traj.append([i, loss])
            print(f"mu={mu} step {i}: {loss:.5f}", flush=True)
    out[mu] = dict(traj=traj, final=traj[-1][1], wall_s=time.time() - t0)

d = os.path.join("results", "mu_ab")
os.makedirs(d, exist_ok=True)
out["meta"] = dict(steps=STEPS, batch=B, seq=S, exp="dnabert2_pretrain",
                   note="same init/data order; only optimizer moment "
                        "dtypes differ")
out["mu_final_diff"] = abs(out["mu_bf16"]["final"] - out["fp32"]["final"])
out["nu_final_diff"] = abs(out["mu_nu_bf16"]["final"] - out["fp32"]["final"])
with open(os.path.join(d, "summary.json"), "w") as f:
    json.dump(out, f, indent=1)
print(f"final: mu_bf16 {out['mu_bf16']['final']:.5f}  fp32 "
      f"{out['fp32']['final']:.5f}  mu_nu_bf16 "
      f"{out['mu_nu_bf16']['final']:.5f}")
print(f"wrote {d}/summary.json")
