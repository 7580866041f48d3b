"""Micro-bench: fused all-heads small-S kernel vs XLA-ref attention on TPU.

Measures fwd and fwd+bwd at DNABERT-2-like points (H=12, D=64)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from dna_tpu.ops.attention_small import fused_small_attention
from dna_tpu.ops.attention_ref import attention_ref, alibi_bias, padding_bias


def timed(f, *args, iters=20):
    out = f(*args)
    jax.device_get(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / iters


from dna_tpu.ops.attention_small import supports

for S, B in [(128, 128), (128, 256), (256, 64), (256, 128)]:
    if not supports(S, 12, 64):
        print(f"S={S}: unsupported, skipped", flush=True)
        continue
    H, D = 12, 64
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (jax.random.normal(kk, (B, S, H, D), jnp.bfloat16) for kk in ks)
    mask = jnp.ones((B, S), jnp.int32)

    f_small = jax.jit(lambda q, k, v: fused_small_attention(
        q, k, v, attention_mask=mask, alibi=True))

    def ref(q, k, v):
        bias = alibi_bias(H, S) + padding_bias(mask)

        @jax.checkpoint
        def _attn(q, k, v, bias):
            return attention_ref(q, k, v, bias)
        return _attn(q, k, v, bias)

    f_ref = jax.jit(ref)
    g_small = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(fused_small_attention(
            q, k, v, attention_mask=mask, alibi=True).astype(jnp.float32)),
        argnums=(0, 1, 2)))
    g_ref = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(ref(q, k, v).astype(jnp.float32)),
        argnums=(0, 1, 2)))

    ts = timed(f_small, q, k, v); tr = timed(f_ref, q, k, v)
    tgs = timed(g_small, q, k, v); tgr = timed(g_ref, q, k, v)
    print(f"S={S} B={B}: fwd small {ts*1e3:.3f}ms ref {tr*1e3:.3f}ms | "
          f"bwd small {tgs*1e3:.3f}ms ref {tgr*1e3:.3f}ms", flush=True)
