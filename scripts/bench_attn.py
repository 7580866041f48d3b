"""Compare flash vs XLA-ref attention at various S on the real TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from dna_tpu.ops.flash_attention import flash_attention
from dna_tpu.ops.attention_ref import attention_ref, alibi_bias, padding_bias

def timed(f, *args, iters=10):
    out = f(*args); jax.device_get(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / iters

for S, B in [(512, 32), (1024, 16), (4096, 4)]:
    H, D = 12, 64
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (jax.random.normal(kk, (B, S, H, D), jnp.bfloat16) for kk in ks)
    mask = jnp.ones((B, S), jnp.int32)

    f_flash = jax.jit(lambda q,k,v: flash_attention(q,k,v,alibi=True))
    f_ref = jax.jit(lambda q,k,v: attention_ref(q,k,v, alibi_bias(H,S)))
    g_flash = jax.jit(jax.grad(lambda q,k,v: jnp.sum(flash_attention(q,k,v,alibi=True).astype(jnp.float32)), argnums=(0,1,2)))
    g_ref = jax.jit(jax.grad(lambda q,k,v: jnp.sum(attention_ref(q,k,v, alibi_bias(H,S)).astype(jnp.float32)), argnums=(0,1,2)))

    tf = timed(f_flash, q,k,v); tr = timed(f_ref, q,k,v)
    tgf = timed(g_flash, q,k,v); tgr = timed(g_ref, q,k,v)
    print(f"S={S} B={B}: fwd flash {tf*1e3:.2f}ms ref {tr*1e3:.2f}ms | bwd flash {tgf*1e3:.2f}ms ref {tgr*1e3:.2f}ms")
