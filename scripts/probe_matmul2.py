"""Slope-method matmul probe: per-matmul time = (t(R2)-t(R1))/(R2-R1),
cancelling dispatch/readback overhead. Distinct weights per step like a
real layer stack."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

M = int(os.environ.get("PROBE_M", "16384"))
PAIRS = [("768<->768", 768, 768), ("768<->2304", 768, 2304),
         ("768<->6144", 768, 6144)]
key = jax.random.key(0)

def make(k, n, reps):
    ws = [(jax.random.normal(jax.random.fold_in(key, 2*i), (k, n), jnp.bfloat16),
           jax.random.normal(jax.random.fold_in(key, 2*i+1), (n, k), jnp.bfloat16))
          for i in range(reps)]
    @jax.jit
    def f(x, ws):
        for w1, w2 in ws:
            y = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())))
            x = jax.lax.dot_general(y, w2, (((1,), (0,)), ((), ())))
        # keep magnitudes sane
        x = x / jnp.maximum(jnp.max(jnp.abs(x)), 1e-6).astype(x.dtype)
        return x
    return f, ws

for name, k, n in PAIRS:
    x = jax.random.normal(key, (M, k), jnp.bfloat16)
    times = {}
    for reps in (5, 20):
        f, ws = make(k, n, reps)
        out = f(x, ws); jax.device_get(out[0, 0])
        best = None
        for _ in range(4):
            t0 = time.perf_counter()
            jax.device_get(f(x, ws)[0, 0])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[reps] = best
    per = (times[20] - times[5]) / (2 * (20 - 5))
    fl = 2 * M * k * n
    print(f"{name:12s} M={M}  {per*1e6:8.1f} us/matmul  "
          f"{fl/per/1e12:6.1f} TF/s  ({fl/per/197e12*100:4.1f}% of peak)  "
          f"[t5={times[5]*1e3:.1f}ms t20={times[20]*1e3:.1f}ms]")
