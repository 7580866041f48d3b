"""Validate + micro-bench the mid-S kernel on REAL TPU (VERDICT r3 #3).

Numerics vs attention_ref (fwd + all grads) and timing vs the flash kernel
at S in {1024, 2048, 4096}. Run: timeout 580 python scripts/bench_attn_mid.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from dna_tpu.ops.flash_attention import flash_attention
from dna_tpu.ops.attention_ref import attention_ref as _xla_ref, alibi_bias
from dna_tpu.ops.attention_mid import mid_attention, supports


def timed(f, *args, iters=10):
    out = f(*args)
    jax.device_get(jax.tree_util.tree_map(jnp.sum, jax.tree_util.tree_leaves(out))[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(jax.tree_util.tree_map(jnp.sum, jax.tree_util.tree_leaves(out))[0])
    return (time.perf_counter() - t0) / iters


print("backend:", jax.default_backend(), jax.devices(), flush=True)
H, D = 12, 64
CASES = {1024: 16, 2048: 8, 4096: 4, 8192: 2, 16384: 1}
ss = [int(s) for s in os.environ.get("BENCH_MID_S", "1024,2048,4096").split(",")]
for S, B in [(s, CASES[s]) for s in ss]:
    assert supports(S, H, D), (S, H, D)
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (jax.random.normal(kk, (B, S, H, D), jnp.bfloat16) for kk in ks)
    # [B, H, S, S] fp32 ref scores don't fit HBM past S=4096 — validate the
    # HD-tiled kernel against the (interpret-oracle-tested, hw-run) flash
    # kernel there instead, bf16 tolerance
    if S > 4096:
        attention_ref = lambda q, k, v, bias: flash_attention(
            q, k, v, alibi=True)
    else:
        attention_ref = lambda q, k, v, bias: _xla_ref(q, k, v, bias)

    def loss_mid(q, k, v):
        return jnp.sum(mid_attention(q, k, v, alibi=True).astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_ref(q, k, v, alibi_bias(H, S)).astype(jnp.float32) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, alibi=True).astype(jnp.float32) ** 2)

    which = os.environ.get("BENCH_MID_WHICH", "numerics,mid,flash").split(",")
    if "numerics" in which:
        f_mid = jax.jit(lambda q, k, v: mid_attention(q, k, v, alibi=True))
        f_ref = jax.jit(lambda q, k, v: attention_ref(q, k, v, alibi_bias(H, S)))
        o_mid = np.asarray(f_mid(q, k, v), np.float32)
        o_ref = np.asarray(f_ref(q, k, v), np.float32)
        err_f = np.max(np.abs(o_mid - o_ref))
        g_mid = jax.jit(jax.grad(loss_mid, argnums=(0, 1, 2)))(q, k, v)
        g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
        errs_g = [float(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))))
                  for a, b in zip(g_mid, g_ref)]
        scale_g = [float(np.max(np.abs(np.asarray(b, np.float32)))) for b in g_ref]
        print(f"S={S}: fwd max-abs-err {err_f:.4g}; "
              f"grad errs q/k/v {errs_g} (ref scales {scale_g})", flush=True)

    if "mid" in which:
        f_mid = jax.jit(lambda q, k, v: mid_attention(q, k, v, alibi=True))
        t_mid_f = timed(f_mid, q, k, v)
        t_mid_b = timed(jax.jit(jax.grad(loss_mid, argnums=(0, 1, 2))), q, k, v)
        print(f"S={S} B={B}: mid fwd {t_mid_f*1e3:.2f}ms "
              f"fwd+bwd {t_mid_b*1e3:.2f}ms", flush=True)
    if "flash" in which:
        t_flash_f = timed(jax.jit(lambda q, k, v: flash_attention(q, k, v, alibi=True)), q, k, v)
        t_flash_b = timed(jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2))), q, k, v)
        print(f"S={S} B={B}: flash fwd {t_flash_f*1e3:.2f}ms "
              f"fwd+bwd {t_flash_b*1e3:.2f}ms", flush=True)
