"""Probe: XLA FFT compile+run time on TPU at Hyena long-L sizes."""
import sys, time
import jax, jax.numpy as jnp
import numpy as np

L = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
D = int(sys.argv[2]) if len(sys.argv) > 2 else 256
x = jnp.asarray(np.random.randn(1, L, D), jnp.float32)
k = jnp.asarray(np.random.randn(L, D), jnp.float32)

def conv(u, k):
    n = 2 * L
    uf = jnp.fft.rfft(u, n=n, axis=-2)
    kf = jnp.fft.rfft(k, n=n, axis=-2)
    return jnp.fft.irfft(uf * kf, n=n, axis=-2)[..., :L, :]

f = jax.jit(conv)
t0 = time.time()
lowered = f.lower(x, k)
c = lowered.compile()
print(f"L={L} D={D} compile: {time.time()-t0:.1f}s", flush=True)
y = c(x, k); jax.device_get(y[0,0,0])
t0 = time.time()
for _ in range(5):
    y = c(x, k)
jax.device_get(y[0,0,0])
print(f"run: {(time.time()-t0)/5*1e3:.1f} ms/iter", flush=True)
