"""End-to-end attention-LM step probe (mid-kernel vs flash vs ref).

Usage: probe_e2e_attn.py [EXP=hg38_transformer] [B=2] [S=8192]
Env: DNA_TPU_MID_ATTN_HDT=0 / DNA_TPU_MID_ATTN=0 to A/B kernel paths.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from dna_tpu.config.core import MeshConfig
from dna_tpu.data.loader import ShardedLoader
from dna_tpu.experiments import build, get_experiment
from dna_tpu.parallel.mesh import build_mesh
from dna_tpu.train.state import create_train_state
from dna_tpu.train.step import make_train_step
EXP = sys.argv[1] if len(sys.argv) > 1 else "hg38_transformer"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 2
S = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
cfg = get_experiment(EXP, [
    f"data.batch_size={B}", f"data.max_length={S}", f"data.num_samples={B*4}",
    f"model.max_len={S}"])
mesh = build_mesh(MeshConfig(dp=1)); exp = build(cfg, mesh=mesh)
dummy = jnp.zeros((2, S), jnp.int32)
init = lambda r: exp.model.init(r, dummy, None, deterministic=True)["params"]
state, sh = create_train_state(init, exp.tx, mesh, exp.rules, jax.random.key(0))
step = make_train_step(exp.model, exp.task_fn, exp.tx, mesh, exp.rules, sh)
batch = next(iter(ShardedLoader(exp.dataset, B, seed=0)))
t0=time.time(); state, m = step(state, batch); jax.device_get(m["loss"])
print(f"compile+1: {time.time()-t0:.1f}s")
best=None
for _ in range(3):
    t0=time.perf_counter()
    for _ in range(5): state, m = step(state, batch)
    jax.device_get(m["loss"]); dt=(time.perf_counter()-t0)/5
    best = dt if best is None else min(best, dt)
print(f"{EXP} B={B} S={S} hdt={os.environ.get('DNA_TPU_MID_ATTN_HDT','1')}: {best*1e3:.1f} ms/step, {B*S/best:.0f} tok/s, loss={float(m['loss']):.3f}")
