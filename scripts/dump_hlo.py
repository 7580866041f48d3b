"""Dump the compiled train-step HLO text to a file for offline analysis.
Usage: dump_hlo.py [OUT] [BATCH] [SEQ]"""
import os, sys
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

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_hlo.txt"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
S = int(sys.argv[3]) if len(sys.argv) > 3 else 128
cfg = get_experiment("dnabert2_pretrain", [
    f"data.batch_size={B}", f"data.max_length={S}",
    f"data.num_samples={B*4}", "model.remat=false",
])
mesh = build_mesh(MeshConfig(dp=1))
exp = build(cfg, mesh=mesh)
dummy = jnp.zeros((2, S), jnp.int32)
init = lambda r: exp.model.init(r, dummy, None, deterministic=True)["params"]
state, sh = create_train_state(init, exp.tx, mesh, exp.rules, jax.random.key(0))
step = make_train_step(exp.model, exp.task_fn, exp.tx, mesh, exp.rules, sh,
                       mlm_gather=exp.cfg.model.mlm_gather)
batch = next(iter(ShardedLoader(exp.dataset, B, seed=0)))
txt = step.jitted.lower(state, batch).compile().as_text()
with open(out, "w") as f:
    f.write(txt)
print("wrote", out, len(txt), "chars")
