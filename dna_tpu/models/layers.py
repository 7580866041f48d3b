"""Shared flax modules: partitioned dense layers, GLU MLP, embeddings, pooling.

All parameters carry *logical* axis names (mapped to mesh axes by
`dna_tpu.parallel.mesh.DEFAULT_RULES`), so tensor/fsdp parallelism is pure
annotation — XLA inserts the collectives.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

default_kernel_init = nn.initializers.normal(stddev=0.02)

# torch kaiming_normal_ (fan_in, relu gain): std = sqrt(2 / fan_in). The
# reference's GPT-2 init scheme applies this to out_proj/fc2/Wqkv weights of
# the LM-backbone families (`long_conv_lm.py:270-318`, rescale_prenorm
# branch); everything else stays normal(0.02).
kaiming_init = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def dense(features: int, axes: Tuple[str, str], *, use_bias: bool = True,
          dtype=jnp.bfloat16, name: Optional[str] = None,
          kernel_init: Callable = default_kernel_init) -> nn.Dense:
    """nn.Dense with logical partitioning on kernel/bias."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.with_logical_partitioning(kernel_init, axes),
        bias_init=nn.with_logical_partitioning(nn.initializers.zeros, (axes[1],)),
        name=name,
    )


def layer_norm(*, eps: float = 1e-12, dtype=jnp.float32, name=None) -> nn.LayerNorm:
    # Statistics are always fp32 (flax upcasts stats internally); `dtype`
    # only sets the output dtype. DNA_TPU_LN_DTYPE=bfloat16 emits bf16
    # activations directly, removing a [B,S,D] fp32 fusion boundary per norm
    # (the callers' astype becomes a no-op).
    import os as _os

    env = _os.environ.get("DNA_TPU_LN_DTYPE")
    if env:
        dtype = jnp.dtype(env)
    return nn.LayerNorm(
        epsilon=eps, dtype=dtype, param_dtype=jnp.float32,
        scale_init=nn.with_logical_partitioning(nn.initializers.ones, ("act_embed",)),
        bias_init=nn.with_logical_partitioning(nn.initializers.zeros, ("act_embed",)),
        name=name)


def rms_norm(*, eps: float = 1e-5, dtype=jnp.float32, name=None) -> nn.RMSNorm:
    return nn.RMSNorm(
        epsilon=eps, dtype=dtype, param_dtype=jnp.float32,
        scale_init=nn.with_logical_partitioning(nn.initializers.ones, ("act_embed",)),
        name=name)


class TokenEmbed(nn.Module):
    """Token embedding with vocab-sharded table; returns [B, S, D]."""

    vocab_size: int
    d_model: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        table = self.param(
            "embedding",
            nn.with_logical_partitioning(default_kernel_init, ("vocab", "embed")),
            (self.vocab_size, self.d_model), jnp.float32)
        from dna_tpu.ops.dense_grad import take_rows

        # matmul-backward lookup: the plain take's VJP is a serialized
        # per-row scatter-add on TPU (~16k sequential updates at the
        # flagship bench point)
        out = take_rows(table, ids).astype(self.dtype)
        return nn.with_logical_constraint(out, ("batch", "seq", "act_embed"))

    def attend(self, x: jax.Array) -> jax.Array:
        """Tied-decoder logits: x @ embeddingᵀ. bf16 operands on the MXU,
        fp32 accumulation/output (4× the fp32 matmul rate; CE stays fp32)."""
        table = self.get_variable("params", "embedding")
        if hasattr(table, "unbox"):
            table = table.unbox()
        return jnp.einsum("...d,vd->...v", x.astype(self.dtype),
                          table.astype(self.dtype),
                          preferred_element_type=jnp.float32)


class GLUMlp(nn.Module):
    """Gated-linear-unit MLP (MosaicBERT's `BertGatedLinearUnitMLP`,
    reference `bert_layers.py:256-303`): one fused [D → 2F] projection split
    into gate/value, gelu(gate)*value, project back. Residual+post-LN are
    handled by the caller."""

    d_ff: int
    d_model: int
    dtype: Dtype = jnp.bfloat16
    dropout: float = 0.0
    # tanh-form GELU (see ModelConfig.gelu_approx); False = torch-exact erf
    approximate: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        gated = dense(2 * self.d_ff, ("embed", "mlp"), use_bias=False,
                      dtype=self.dtype, name="wi")(x)
        gate, value = jnp.split(gated, 2, axis=-1)
        h = nn.gelu(gate, approximate=self.approximate) * value
        h = nn.with_logical_constraint(h, ("batch", "seq", "mlp"))
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        out = dense(self.d_model, ("mlp", "embed"), dtype=self.dtype, name="wo")(h)
        return nn.with_logical_constraint(out, ("batch", "seq", "act_embed"))


class Mlp(nn.Module):
    """Plain transformer MLP (gelu), for GPT-style backbones.

    `out_init` overrides the second projection's kernel init (the reference
    GPT-2 scheme kaiming-inits `fc2.weight`, `long_conv_lm.py:294-299`)."""

    d_ff: int
    d_model: int
    dtype: Dtype = jnp.bfloat16
    dropout: float = 0.0
    out_init: Optional[Callable] = None
    # the reference's Mlp uses F.gelu's erf form (`standalone_hyenadna.py:433`)
    # — set approximate=False for checkpoint parity (ModelConfig.gelu_approx)
    approximate: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        h = dense(self.d_ff, ("embed", "mlp"), dtype=self.dtype, name="wi")(x)
        h = nn.gelu(h, approximate=self.approximate)
        h = nn.with_logical_constraint(h, ("batch", "seq", "mlp"))
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        out = dense(self.d_model, ("mlp", "embed"), dtype=self.dtype, name="wo",
                    kernel_init=self.out_init or default_kernel_init)(h)
        return nn.with_logical_constraint(out, ("batch", "seq", "act_embed"))


class SequencePool(nn.Module):
    """Sequence → vector readout (reference `SequenceDecoder` modes
    `src/tasks/decoders.py:50-105`): mean (mask-aware), last, first, sum."""

    mode: str = "mean"

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        if self.mode == "mean":
            if mask is not None:
                m = mask.astype(x.dtype)[..., None]
                return (x * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
            return x.mean(axis=1)
        if self.mode == "sum":
            if mask is not None:
                return (x * mask.astype(x.dtype)[..., None]).sum(axis=1)
            return x.sum(axis=1)
        if self.mode == "last":
            return x[:, -1]
        if self.mode == "first":
            return x[:, 0]
        raise ValueError(f"unknown pool mode {self.mode!r}")


def sow_act_norm(module: nn.Module, i: int, x: jax.Array) -> None:
    """Per-block output-norm plane (reference `model.py:86-102` track_norms
    publishes `norm/i` per layer). Sown into the "act_norms" collection from
    the backbone loop (outside any remat wrapper); when the train step
    doesn't mark the collection mutable the value is discarded and XLA DCEs
    the norm — zero cost unless `train.track_act_norms` is on."""
    module.sow("act_norms", f"norm/{i}",
               jnp.linalg.norm(x.astype(jnp.float32)),
               reduce_fn=lambda _, v: v, init_fn=lambda: jnp.float32(0))


def _remat_policy(name: str):
    """Map a config string to a jax.checkpoint policy (None = save nothing,
    i.e. full recompute)."""
    if name in ("full", "", "none", None):
        return None
    if name == "dots":
        return jax.checkpoint_policies.checkpoint_dots
    if name == "dots_no_batch":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(f"unknown remat policy {name!r}")


def causal_depthwise_conv(x: jax.Array, w: jax.Array,
                          b: Optional[jax.Array] = None) -> jax.Array:
    """Depthwise causal 1-D conv as K shifted multiply-adds.

    `x` [B, L, C], `w` [C, K], optional `b` [C]; output [B, L, C] equals
    `lax.conv_general_dilated(x, w[:, None, :], padding=(K-1, 0),
    feature_group_count=C)` exactly (same tap summation order).

    Why not the conv op: XLA's grouped-convolution WEIGHT-GRAD emitter is
    pathological on TPU for K≪L depthwise shapes — the r5 hyena L=65536
    trace showed the [C, 1, K] dW fusions running at 12.7% of HBM
    speed-of-light (~1.9 ms each per layer). Expressed as shifts, the
    forward fuses into neighboring elementwise work and each tap's dW is
    a clean full-bandwidth multiply-reduce; the tap loop is unrolled
    (K is 3-4 for every genomics config: hyena short filter, mamba
    causal_conv1d — reference `src/models/sequence/hyena.py:27-40`,
    `mamba_ssm/ops/selective_scan_interface.py` causal_conv1d)."""
    K = w.shape[-1]
    L = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (K - 1, 0), (0, 0)))
    out = None
    for k in range(K):
        term = xp[:, k:k + L, :] * w[:, k][None, None, :]
        out = term if out is None else out + term
    if b is not None:
        out = out + b
    return out
