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
# bf16 inputs: on TPU the XLA ref path's fp32 dots run at DEFAULT precision
# (single-pass bf16) anyway, so an fp32 comparison just measures that
# truncation (~1e-2), not kernel correctness — exact fp32 kernel-vs-ref
# parity is covered on CPU by tests/test_attn_dropout.py. Here we check the
# 4-D drop BlockSpecs COMPILE on real Mosaic and agree at bf16 tolerance.
rng = jax.random.key(3)
qkv = jax.random.normal(jax.random.key(0), (B, S, 3, H, D), jnp.bfloat16)
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

ok = np.asarray(jax.jit(kernel_out)(qkv), np.float32)
orf = np.asarray(jax.jit(ref_out)(qkv), np.float32)
err = np.max(np.abs(ok - orf))
print(f"fwd max-abs-err kernel-vs-ref (same draw, bf16): {err:.3e}",
      flush=True)
assert err < 0.05, err

def loss(f):
    return lambda x: jnp.sum(f(x).astype(jnp.float32) ** 2)

gk = np.asarray(jax.jit(jax.grad(loss(kernel_out)))(qkv), np.float32)
gr = np.asarray(jax.jit(jax.grad(loss(ref_out)))(qkv), np.float32)
gerr = np.max(np.abs(gk - gr))
gscale = np.max(np.abs(gr))
print(f"grad max-abs-err {gerr:.3e} (ref scale {gscale:.3f})", flush=True)
assert gerr < 0.05 * max(gscale, 1.0), (gerr, gscale)
print("in-kernel dropout OK on", jax.default_backend(), flush=True)
