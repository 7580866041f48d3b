"""TPU check: K/V-streaming flash kernels compile, match the resident
kernels, and report long-L timings. Usage: check_stream_tpu.py [S] [B]"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

S = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
H, D = 4, 64

ks = jax.random.split(jax.random.key(0), 3)
q, k, v = (jax.random.normal(kk, (B, S, H, D), jnp.bfloat16) * 0.5
           for kk in ks)
mask = jnp.ones((B, S), jnp.int32).at[:, -256:].set(0)


def run(tag, thresh):
    os.environ["DNA_TPU_ATTN_STREAM_S"] = str(thresh)
    from dna_tpu.ops.flash_attention import flash_attention

    f = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, attention_mask=mask, alibi=True, causal=False))
    g = jax.jit(jax.grad(lambda q, k, v: jnp.sum(flash_attention(
        q, k, v, attention_mask=mask, alibi=True).astype(jnp.float32)),
        argnums=(0, 1, 2)))
    o = f(q, k, v); jax.device_get(jnp.sum(o))
    go = g(q, k, v); jax.device_get(jnp.sum(go[0]))
    t0 = time.perf_counter()
    for _ in range(5):
        o = f(q, k, v)
    jax.device_get(jnp.sum(o))
    tf = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for _ in range(5):
        go = g(q, k, v)
    jax.device_get(jnp.sum(go[0]))
    tg = (time.perf_counter() - t0) / 5
    print(f"{tag}: fwd {tf*1e3:.2f} ms, bwd {tg*1e3:.2f} ms", flush=True)
    return np.asarray(o, np.float32), [np.asarray(x, np.float32) for x in go]


o_s, g_s = run("streamed", 1024)
o_r, g_r = run("resident", 10 ** 9)
np.testing.assert_allclose(o_s[:, :-256], o_r[:, :-256], atol=2e-2, rtol=2e-2)
for a, b, n in zip(g_s, g_r, "qkv"):
    np.testing.assert_allclose(a, b, atol=5e-2, rtol=5e-2, err_msg=n)
print("streamed == resident OK")
