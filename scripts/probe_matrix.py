"""Controlled ablation matrix on the DNABERT-2 bench point (one process).

Configs: {small attention on/off} x {LN output dtype fp32/bf16}.
Each config rebuilds the jitted step (env knobs are read at trace time).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from dna_tpu.config.core import MeshConfig
from dna_tpu.data.loader import ShardedLoader
from dna_tpu.experiments import build, get_experiment
from dna_tpu.parallel.mesh import build_mesh
from dna_tpu.train.state import create_train_state
from dna_tpu.train.step import make_train_step

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
S = int(sys.argv[2]) if len(sys.argv) > 2 else 128

import json
CONFIGS = json.loads(os.environ.get("PROBE_CONFIGS", """[
    ["ref", {"DNA_TPU_SMALL_ATTN": "0"}],
    ["tile", {"DNA_TPU_SMALL_ATTN": "1"}],
    ["slice", {"DNA_TPU_SMALL_ATTN": "1", "DNA_TPU_SMALL_ATTN_IMPL": "slice"}]
]"""))

cfg = get_experiment("dnabert2_pretrain", [
    f"data.batch_size={B}", f"data.max_length={S}",
    f"data.num_samples={B*4}", "model.remat=false",
])
mesh = build_mesh(MeshConfig(dp=1))
exp = build(cfg, mesh=mesh)
dummy = jnp.zeros((2, S), jnp.int32)
init = lambda r: exp.model.init(r, dummy, None, deterministic=True)["params"]
loader = ShardedLoader(exp.dataset, B, seed=0)
batches = [b for _, b in zip(range(2), loader)]

for name, env in CONFIGS:
    for k in ("DNA_TPU_SMALL_ATTN", "DNA_TPU_LN_DTYPE",
              "DNA_TPU_SMALL_ATTN_IMPL", "DNA_TPU_SMALL_ATTN_G"):
        os.environ.pop(k, None)
    os.environ.update(env)
    state, sh = create_train_state(init, exp.tx, mesh, exp.rules,
                                   jax.random.key(0))
    step = make_train_step(exp.model, exp.task_fn, exp.tx, mesh, exp.rules,
                           sh, mlm_gather=exp.cfg.model.mlm_gather)
    t0 = time.perf_counter()
    ca = step.jitted.lower(state, batches[0]).compile().cost_analysis()
    compile_s = time.perf_counter() - t0
    flops, by = ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)
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
    print(f"{name}: {flops/1e12:.2f} TF {by/1e9:.2f} GB | "
          f"SoL c{flops/197e12*1e3:.0f} m{by/819e9*1e3:.0f} ms | "
          f"measured {best*1e3:.1f} ms/step → {B*S/best:.0f} tok/s "
          f"(compile {compile_s:.0f}s)", flush=True)
    del state, step
