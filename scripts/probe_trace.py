import sys, os, time
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

# probe_trace.py [EXP=dnabert2_pretrain] [B=128] [S=128] [k=v ...]
EXP = sys.argv[1] if len(sys.argv) > 1 else "dnabert2_pretrain"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
S = int(sys.argv[3]) if len(sys.argv) > 3 else 128
extra = sys.argv[4:]
cfg = get_experiment(EXP, [
    f"data.batch_size={B}", f"data.max_length={S}",
    f"data.num_samples={B*4}", "model.remat=false"] + extra)
mesh = build_mesh(MeshConfig(dp=1))
exp = build(cfg, mesh=mesh)
dummy = jnp.zeros((2, S), jnp.int32)
init = lambda r: exp.model.init(r, dummy, None, deterministic=True)["params"]
state, sh = create_train_state(init, exp.tx, mesh, exp.rules, jax.random.key(0))
step = make_train_step(exp.model, exp.task_fn, exp.tx, mesh, exp.rules, sh,
                       mlm_gather=exp.cfg.model.mlm_gather)
batch = next(iter(ShardedLoader(exp.dataset, B, seed=0)))
batch = jax.device_put(batch)
for _ in range(3):
    state, m = step(state, batch)
print("warm", float(jax.device_get(m["loss"])))
jax.profiler.start_trace("/tmp/jaxtrace")
for _ in range(5):
    state, m = step(state, batch)
print("traced", float(jax.device_get(m["loss"])))
jax.profiler.stop_trace()
print("trace done")
