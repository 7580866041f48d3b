"""Attention-probability dropout parity (VERDICT r3 #7).

The reference applies nn.Dropout to the post-softmax probabilities on its
torch fallback path (`/root/reference/src/models/DNABERT2/bert_layers.py:
166-197`, ESM `modeling_esm.py:391-467`); its Triton kernel can't do p>0.
dna_tpu mirrors the same structure: p>0 routes to the materialized-probs
`attention_ref` path with bernoulli keep/scale applied to probs.

Oracle strategy: torch's RNG and jax's threefry can't produce identical
masks, so the torch comparison feeds the SAME keep-mask (extracted from the
jax key) into an explicit torch implementation of dropout's keep/scale
algebra — validating the semantics, not the bit-generator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dna_tpu.ops.attention_ref import attention_ref, attention_ref as _ref


def _rand_qkv(B=2, S=16, H=4, D=8, dtype=jnp.float32):
    ks = jax.random.split(jax.random.key(0), 3)
    return tuple(jax.random.normal(k, (B, S, H, D), dtype) for k in ks)


def test_dropout_matches_torch_algebra_same_mask():
    import torch

    q, k, v = _rand_qkv()
    p = 0.3
    rng = jax.random.key(7)
    out = attention_ref(q, k, v, dropout_rate=p, dropout_rng=rng)

    # recompute the keep mask exactly as attention_ref draws it
    B, S, H, D = q.shape
    keep = np.asarray(jax.random.bernoulli(rng, 1.0 - p, (B, H, S, S)))

    qt, kt, vt = (torch.tensor(np.asarray(t)).permute(0, 2, 1, 3)
                  for t in (q, k, v))  # [B, H, S, D]
    scores = (qt @ kt.transpose(-1, -2)) / (D ** 0.5)
    probs = torch.softmax(scores, dim=-1)
    # torch nn.Dropout(p) == mask * probs / (1-p) for the same mask
    probs = probs * torch.tensor(keep, dtype=probs.dtype) / (1.0 - p)
    want = (probs @ vt).permute(0, 2, 1, 3)  # [B, S, H, D]
    np.testing.assert_allclose(np.asarray(out), want.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_dropout_zero_rate_is_identity():
    q, k, v = _rand_qkv()
    base = attention_ref(q, k, v)
    out = attention_ref(q, k, v, dropout_rate=0.0,
                        dropout_rng=jax.random.key(1))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out))


def test_dropout_mean_approximates_identity():
    """E[dropout(probs)] = probs ⇒ averaging outputs over many keys should
    approach the p=0 output."""
    q, k, v = _rand_qkv(B=1, S=8, H=2, D=4)
    base = np.asarray(attention_ref(q, k, v))
    outs = [np.asarray(attention_ref(q, k, v, dropout_rate=0.2,
                                     dropout_rng=jax.random.key(i)))
            for i in range(200)]
    # MC error at 200 draws ~ sigma/sqrt(200); 0.08 gives ~4-sigma headroom
    np.testing.assert_allclose(np.mean(outs, axis=0), base, atol=0.08)


def test_dispatch_routes_dropout_to_ref():
    """multihead_attention with p>0 must equal attention_ref with the same
    key (i.e., no kernel path is taken), and grads must flow."""
    from dna_tpu.ops.attention import multihead_attention
    from dna_tpu.ops.attention_ref import alibi_bias

    q, k, v = _rand_qkv(B=2, S=128, H=4, D=8)  # shapes the small kernel takes
    rng = jax.random.key(3)
    out = multihead_attention(q, k, v, alibi=True, dropout_rate=0.1,
                              dropout_rng=rng)
    want = attention_ref(q, k, v, alibi_bias(4, 128), dropout_rate=0.1,
                         dropout_rng=rng)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-6, rtol=1e-6)

    g = jax.grad(lambda q: jnp.sum(multihead_attention(
        q, k, v, dropout_rate=0.1, dropout_rng=rng) ** 2))(q)
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("model_kind", ["bert", "esm", "esm_cope"])
def test_models_train_with_attn_dropout(model_kind):
    """One train-mode forward with attn_dropout>0: stochastic across rng
    keys, deterministic=True ignores it."""
    from dna_tpu.config.core import ModelConfig

    if model_kind == "bert":
        from dna_tpu.models.bert import BertEncoder as M
        cfg = ModelConfig(vocab_size=64, d_model=32, n_layers=1, n_heads=4,
                          d_ff=64, max_len=32, attn_dropout=0.25,
                          dtype="float32")
    else:
        from dna_tpu.models.esm import EsmEncoder as M
        cfg = ModelConfig(vocab_size=64, d_model=32, n_layers=1, n_heads=4,
                          d_ff=64, max_len=32, attn_dropout=0.25,
                          dtype="float32", rotary=(model_kind == "esm"),
                          cope=(model_kind == "esm_cope"))
    m = M(cfg)
    ids = jax.random.randint(jax.random.key(0), (2, 16), 0, 64)
    mask = jnp.ones((2, 16), jnp.int32)
    params = m.init(jax.random.key(1), ids, mask, deterministic=True)
    det = m.apply(params, ids, mask, deterministic=True)
    det2 = m.apply(params, ids, mask, deterministic=True)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det2))
    tr1 = m.apply(params, ids, mask, deterministic=False,
                  rngs={"dropout": jax.random.key(2)})
    tr2 = m.apply(params, ids, mask, deterministic=False,
                  rngs={"dropout": jax.random.key(3)})
    assert not np.allclose(np.asarray(tr1), np.asarray(tr2))


def test_small_kernel_in_kernel_dropout_matches_ref():
    """The packed-QKV kernel's ride-along dropout must agree EXACTLY with
    the XLA ref path (same rng → same bernoulli draw), fwd and grads."""
    from dna_tpu.ops import attention_small
    from dna_tpu.ops.attention import multihead_attention_qkv
    from dna_tpu.ops.attention_ref import alibi_bias

    B, S, H, D = 4, 128, 4, 64
    assert attention_small.supports_qkv(S, H, D)
    qkv = jax.random.normal(jax.random.key(0), (B, S, 3, H, D), jnp.float32)
    amask = jnp.ones((B, S), jnp.int32).at[:, -7:].set(0)
    rng = jax.random.key(9)
    p = 0.2

    def kernel_path(qkv):
        return multihead_attention_qkv(
            qkv, attention_mask=amask, alibi=True, impl="auto",
            dropout_rate=p, dropout_rng=rng)

    def ref_path(qkv):
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        from dna_tpu.ops.attention_ref import attention_ref, padding_bias

        bias = alibi_bias(H, S) + padding_bias(amask)
        out = attention_ref(q, k, v, bias, dropout_rate=p, dropout_rng=rng)
        return out.reshape(B, S, H * D)

    out_k = kernel_path(qkv)
    out_r = ref_path(qkv)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=2e-5, rtol=2e-5)

    gk = jax.grad(lambda x: jnp.sum(kernel_path(x) ** 2))(qkv)
    gr = jax.grad(lambda x: jnp.sum(ref_path(x) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               atol=3e-4, rtol=3e-4)
