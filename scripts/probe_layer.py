"""Layer-level probe: N stacked BertLayers fwd+bwd at the bench point,
small-attention kernel vs XLA ref — includes the qkv/out-proj fusion
boundaries that attention-only micro-benches miss."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import flax.linen as nn

from dna_tpu.config.core import ModelConfig
from dna_tpu.models.bert import BertLayer

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
S = int(sys.argv[2]) if len(sys.argv) > 2 else 128
N = int(sys.argv[3]) if len(sys.argv) > 3 else 2


class Stack(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x):
        for i in range(N):
            x = BertLayer(self.cfg, name=f"l{i}")(x, None)
        return x


def run(tag):
    cfg = ModelConfig(name="dnabert2", d_model=768, n_heads=12, d_ff=3072,
                      alibi=True)
    model = Stack(cfg)
    x = jax.random.normal(jax.random.key(0), (B, S, 768), jnp.bfloat16)
    params = model.init(jax.random.key(1), x)["params"]

    def loss(p, x):
        return jnp.sum(model.apply({"params": p}, x).astype(jnp.float32))

    g = jax.jit(jax.grad(loss))
    out = g(params, x)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = g(params, x)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        dt = (time.perf_counter() - t0) / 10
        best = dt if best is None else min(best, dt)
    print(f"{tag}: {best*1e3:.2f} ms for {N} layers fwd+bwd "
          f"({best/N*1e3:.2f} ms/layer)", flush=True)


for tag, env in [("ref", {"DNA_TPU_SMALL_ATTN": "0"}),
                 ("small-slice", {"DNA_TPU_SMALL_ATTN": "1",
                                  "DNA_TPU_SMALL_ATTN_IMPL": "slice"}),
                 ("small-tile", {"DNA_TPU_SMALL_ATTN": "1",
                                 "DNA_TPU_SMALL_ATTN_IMPL": "tile"})]:
    for k in ("DNA_TPU_SMALL_ATTN", "DNA_TPU_SMALL_ATTN_IMPL"):
        os.environ.pop(k, None)
    os.environ.update(env)
    run(tag)
