"""One full train step of the 500M NTv2 config on an fsdp=8 virtual mesh.

Scale-up dryrun (VERDICT r2 #10): proves the 500M parameter/optimizer
shardings compile and execute without 8 real chips. Run on CPU:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/dryrun_500m.py

Uses tiny batch/sequence so host RAM holds the fp32 params + adam moments
(~6 GB); the sharding layout is the real one.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dna_tpu.config.core import MeshConfig
from dna_tpu.data.loader import ShardedLoader
from dna_tpu.experiments import build, get_experiment
from dna_tpu.parallel.mesh import build_mesh
from dna_tpu.train.state import create_train_state
from dna_tpu.train.step import make_train_step

B = int(os.environ.get("DRYRUN_BATCH", 8))
S = int(os.environ.get("DRYRUN_SEQ", 128))

cfg = get_experiment("ntv2_pretrain_500m", [
    f"data.batch_size={B}", f"data.max_length={S}",
    f"data.num_samples={B * 2}",
    # remat trades compile time for memory — pointless on the CPU dryrun
    f"model.remat={os.environ.get('DRYRUN_REMAT', 'false')}",
])
mesh = build_mesh(MeshConfig(dp=1, fsdp=8, tp=1))
exp = build(cfg, mesh=mesh)
dummy = jnp.zeros((2, S), jnp.int32)
init = lambda r: exp.model.init(r, dummy, None, deterministic=True)["params"]
t0 = time.time()
state, sh = create_train_state(init, exp.tx, mesh, exp.rules,
                               jax.random.key(0))
n_params = sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(state.params))
print(f"params: {n_params / 1e6:.1f}M, init {time.time() - t0:.1f}s",
      flush=True)
# every param leaf must actually be fsdp-sharded (not replicated 8x)
sharded = sum(1 for x in jax.tree_util.tree_leaves(state.params)
              if "fsdp" in str(getattr(x, "sharding", "")))
print(f"param leaves on an fsdp-sharded layout: {sharded}", flush=True)
step = make_train_step(exp.model, exp.task_fn, exp.tx, mesh, exp.rules, sh,
                       mlm_gather=exp.cfg.model.mlm_gather)
loader = ShardedLoader(exp.dataset, B, seed=0)
batch = next(iter(loader))
t0 = time.time()
state, metrics = step(state, batch)
loss = float(metrics["loss"])
print(f"500M NTv2 fsdp=8 one step: loss={loss:.4f} "
      f"({time.time() - t0:.1f}s incl. compile)", flush=True)
assert np.isfinite(loss)
print("OK")
