"""Bare-matmul speed-of-light probe. Chains y=x@W1; x=y@W2 pairs (no fp32
accumulator pollution) and reports achieved TFLOP/s vs the 197 bf16 peak."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

M = int(os.environ.get("PROBE_M", "16384"))
PAIRS = [
    ("768<->2304", 768, 2304),
    ("768<->768", 768, 768),
    ("768<->6144", 768, 6144),
    ("1024<->4096", 1024, 4096),
    ("2048<->8192", 2048, 8192),
]
key = jax.random.key(0)
reps = 10
for name, k, n in PAIRS:
    x = jax.random.normal(key, (M, k), jnp.bfloat16)
    w1 = jax.random.normal(key, (k, n), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(key, (n, k), jnp.bfloat16) * 0.02

    @jax.jit
    def f(x, w1, w2):
        for _ in range(reps):
            y = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())))
            x = jax.lax.dot_general(y, w2, (((1,), (0,)), ((), ())))
        return x
    out = f(x, w1, w2); jax.device_get(out[0, 0])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(x, w1, w2)
        jax.device_get(out[0, 0])
        dt = (time.perf_counter() - t0) / (2 * reps)
        best = dt if best is None else min(best, dt)
    fl = 2 * M * k * n
    print(f"{name:12s} M={M}  {best*1e6:8.1f} us/matmul  "
          f"{fl/best/1e12:6.1f} TF/s  ({fl/best/197e12*100:4.1f}% of peak)")
