"""Real-TPU compile + numerics check for the in-kernel attention-prob
dropout path of the packed-QKV small-S kernel (4-D drop BlockSpecs — the
class of layout Mosaic rejects that interpret mode cannot catch, see
CLAUDE.md r2b #4).

Compares kernel output/grads against the XLA ref path fed the SAME
bernoulli draw. Run: timeout 580 python scripts/check_drop_tpu.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from dna_tpu.ops.attention_small import fused_small_attention_qkv
from dna_tpu.ops.attention_ref import attention_ref, alibi_bias, padding_bias

B, S, H, D = 8, 128, 12, 64
P = 0.1
rng = jax.random.key(3)
qkv = jax.random.normal(jax.random.key(0), (B, S, 3, H, D), jnp.float32)
mask = jnp.ones((B, S), jnp.int32)
keep = jax.random.bernoulli(rng, 1.0 - P, (B, H, S, S))
dm = keep.astype(jnp.float32) / (1.0 - P)

def kernel_out(qkv):
    return fused_small_attention_qkv(qkv, H, attention_mask=mask, alibi=True,
                                     dropout_mask=dm)

def ref_out(qkv):
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    bias = alibi_bias(H, S) + padding_bias(mask)
    o = attention_ref(q, k, v, bias, dropout_rate=P, dropout_rng=rng)
    return o.reshape(B, S, H * D)

ok = np.asarray(jax.jit(kernel_out)(qkv))
orf = np.asarray(jax.jit(ref_out)(qkv))
err = np.max(np.abs(ok - orf))
print(f"fwd max-abs-err kernel-vs-ref (same draw): {err:.3e}", flush=True)
assert err < 5e-5, err

gk = jax.jit(jax.grad(lambda x: jnp.sum(kernel_out(x) ** 2)))(qkv)
gr = jax.jit(jax.grad(lambda x: jnp.sum(ref_out(x) ** 2)))(qkv)
gerr = np.max(np.abs(np.asarray(gk) - np.asarray(gr)))
gscale = np.max(np.abs(np.asarray(gr)))
print(f"grad max-abs-err {gerr:.3e} (ref scale {gscale:.3f})", flush=True)
assert gerr < 1e-3 * max(gscale, 1.0), (gerr, gscale)
print("in-kernel dropout OK on", jax.default_backend(), flush=True)
