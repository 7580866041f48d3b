"""Slope-method cost of the fused small-S attention kernel at the flagship
point (B=128, S=128, H=12, D=64, packed QKV): chained applications so nothing
is elided; reports per-application fwd and fwd+bwd ms."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from dna_tpu.ops.attention_small import fused_small_attention_qkv

B, S, H, D = 128, 128, 12, 64
HD = H * D
key = jax.random.key(0)
qkv = jax.random.normal(key, (B, S, 3 * HD), jnp.bfloat16)
mask = jnp.ones((B, S), jnp.int32)

def chain(n):
    @jax.jit
    def f(qkv):
        x = qkv
        for i in range(n):
            o = fused_small_attention_qkv(x, H, attention_mask=mask, alibi=True)
            x = jnp.concatenate([o, x[..., HD:]], axis=-1)
        return x
    return f

def chain_grad(n):
    @jax.jit
    def f(qkv):
        def loss(qkv):
            x = qkv
            for i in range(n):
                o = fused_small_attention_qkv(x, H, attention_mask=mask,
                                              alibi=True)
                x = jnp.concatenate([o, x[..., HD:]], axis=-1)
            return x.astype(jnp.float32).sum()
        return jax.grad(loss)(qkv)
    return f

for label, mk in (("fwd", chain), ("fwd+bwd", chain_grad)):
    times = {}
    for n in (2, 12):
        f = mk(n)
        out = f(qkv); jax.device_get(jnp.ravel(out)[0])
        best = None
        for _ in range(4):
            t0 = time.perf_counter()
            jax.device_get(jnp.ravel(f(qkv))[0])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[n] = best
    per = (times[12] - times[2]) / 10
    print(f"{label:8s} per-layer: {per*1e3:7.3f} ms   "
          f"(12 layers: {per*12*1e3:6.1f} ms)  [t2={times[2]*1e3:.1f} t12={times[12]*1e3:.1f}]")
