import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from dna_tpu.config.core import MeshConfig
from dna_tpu.data.loader import ShardedLoader
from dna_tpu.experiments import build, get_experiment
from dna_tpu.parallel.mesh import build_mesh
from dna_tpu.train.state import create_train_state
from dna_tpu.train.step import make_train_step

batch, remat, flash = int(sys.argv[1]), sys.argv[2]=='1', sys.argv[3]=='1'
policy = sys.argv[4] if len(sys.argv) > 4 else "full"
seq = int(sys.argv[5]) if len(sys.argv) > 5 else 128
extra = sys.argv[6:]  # e.g. optimizer.mu_dtype=bfloat16
cfg = get_experiment("dnabert2_pretrain", [
    f"data.batch_size={batch}", f"data.max_length={seq}",
    f"data.num_samples={batch*4}", f"model.remat={str(remat).lower()}",
    f"model.use_flash={str(flash).lower()}", f"model.remat_policy={policy}",
] + extra)
mesh = build_mesh(MeshConfig(dp=1, fsdp=1, tp=1, pp=1, sp=1))
exp = build(cfg, mesh=mesh)
dummy = jnp.zeros((2, seq), jnp.int32)
def init_params(rng):
    return exp.model.init(rng, dummy, None, deterministic=True)["params"]
state, sh = create_train_state(init_params, exp.tx, mesh, exp.rules, jax.random.key(0))
step = make_train_step(exp.model, exp.task_fn, exp.tx, mesh, exp.rules, sh,
                       mlm_gather=exp.cfg.model.mlm_gather)
loader = ShardedLoader(exp.dataset, batch, seed=0)
batches = [b for _, b in zip(range(2), loader)]
for i in range(3):
    state, m = step(state, batches[i % 2])
print("warm loss", float(jax.device_get(m["loss"])))
N = 20
t0 = time.perf_counter()
for i in range(N):
    state, m = step(state, batches[i % 2])
_ = float(jax.device_get(m["loss"]))
dt = (time.perf_counter() - t0) / N
print(f"batch={batch} seq={seq} remat={remat} policy={policy} flash={flash}: {dt*1e3:.1f} ms/step, {batch*seq/dt:.0f} tok/s")
