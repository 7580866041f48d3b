"""CNN model families: RC-gated denoise CNN, ConvNeXt-1D, DeepSTARR.

Re-design of the reference's lab-specific CNNs:

  * `DenoiseCNN` — the reverse-complement-gated dilated CNN
    (`src/models/sequence/denoise.py:273-530`): one-hot both strands
    (rc = 3-seq, N fixed at 4, `denoise.py:449-453`), parallel conv stacks
    where the RC branch produces a sigmoid *forget gate* multiplying the
    forward branch with residuals `feat = h∘g + feat`, `rc_feat = g + rc_feat`
    (`denoise.py:468-487`); modes `dilation` (k=9 convs at dilation
    1,1,3,9,27) and `pure_gate`; optional deep MLP block and final 1×1 convs.
  * `ConvNeXtBlock1D` — depthwise k=7 conv → LN → 4× pointwise MLP → layer
    scale (`denoise.py:103-137` xBlock; `convNext.py` family).
  * `DeepSTARRCNN` — conv(+BN+ReLU+maxpool)×n then dense stack, 2-output
    regression head (`src/models/sequence/deepstarr_cnn.py:108-147`).

All convolutions run channel-last ([B, L, C] / NLC) — the TPU-friendly
layout; the reference permutes around every torch Conv1d.

BatchNorm deviation: DeepSTARR's BN layers are implemented as
batch-statistics normalization in both train and eval (no running stats), so
the training step stays purely functional. With DeepSTARR's batch sizes the
estimator difference is negligible.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dna_tpu import registry
from dna_tpu.config.core import ModelConfig
from dna_tpu.models.layers import dense, layer_norm


def rc_ids(seq: jax.Array) -> jax.Array:
    """Complement on the 0..4 ACGTN alphabet; N (4) fixed
    (`denoise.py:449-453`)."""
    return jnp.where(seq == 4, 4, 3 - seq)


def to_acgtn(seq: jax.Array) -> jax.Array:
    """Accept either the 0..4 alphabet or char-tokenizer ids (bases at 7..11)
    and normalize to 0..4 (the reference's `use_tokenizer=False` convention,
    `genomic_bench_dataset.py:205-208`)."""
    remapped = jnp.where((seq >= 7) & (seq <= 11), seq - 7, 4)
    return jnp.where(seq <= 4, seq, remapped)


def conv1d_same(features: int, kernel: int, dilation: int = 1, *,
                stride: int = 1, name=None, dtype=jnp.float32) -> nn.Conv:
    pad = (kernel - 1) // 2 * dilation
    return nn.Conv(
        features, (kernel,), strides=(stride,), padding=[(pad, pad)],
        kernel_dilation=(dilation,), dtype=dtype, param_dtype=jnp.float32,
        kernel_init=nn.with_logical_partitioning(
            nn.initializers.lecun_normal(), (None, None, "conv_ch")),
        bias_init=nn.with_logical_partitioning(nn.initializers.zeros,
                                               ("conv_ch",)),
        name=name)


class DenoiseCNN(nn.Module):
    """RC-forget-gated dilated CNN over 0..4 token ids.

    Heads: `head='cls'` mean-pool + 2-layer MLP classifier
    (`denoise.py:435-438` cls_head); `head='regression'` same but linear to
    n_out; `head='pretrain'` per-position logits over the alphabet.
    """

    hidden_dim: int = 128
    num_conv1d: int = 5
    num_stacks: int = 1
    kernel_size: int = 9
    dilation: int = 3
    alphabet_size: int = 5
    mode: str = "dilation"  # dilation | pure_gate | up_down | convnext
    use_comp: bool = True
    forget: bool = True
    use_mlp: bool = True
    d_inner: int = 2
    use_final_conv: bool = False
    dropout: float = 0.0
    n_out: int = 2
    head: str = "cls"  # cls | regression | pretrain
    dtype: jnp.dtype = jnp.float32

    def _dilations(self) -> Sequence[int]:
        base = [1, 1, self.dilation, self.dilation ** 2, self.dilation ** 3]
        return [d for d in base[: self.num_conv1d]
                for _ in range(self.num_stacks)]

    def _updown_widths(self) -> Sequence[int]:
        """Channel schedule of the U-Net encoder (`denoise.py:287-291`):
        H → H/1.8 → H/1.4 → H/1.2 → H → H, truncated to num_conv1d stages."""
        H = self.hidden_dim
        return [int(H / 1.8), int(H / 1.4), int(H / 1.2), H, H][: self.num_conv1d]

    def _up_down(self, feat, rc_feat, drop, deterministic):
        """U-Net mode (`denoise.py:286-312` layers, `:588-622` forward):
        strided down-convs with RC sigmoid gates (no residual — resolution
        changes every stage), then stride-2 transpose convs whose outputs are
        gated and added to the saved same-resolution encoder skip."""
        down_widths = self._updown_widths()
        skips, rc_skips = [], []
        for i, w in enumerate(down_widths):
            h = drop(feat, deterministic=deterministic)
            rc_h = drop(rc_feat, deterministic=deterministic)
            skips.append(h)
            rc_skips.append(rc_h)
            h = layer_norm(name=f"down_norm_{i}")(h).astype(self.dtype)
            rc_h = layer_norm(name=f"rc_down_norm_{i}")(rc_h).astype(self.dtype)
            g_pre = conv1d_same(w, self.kernel_size, stride=2,
                                name=f"down_gate_{i}", dtype=self.dtype)(rc_h)
            g = jax.nn.sigmoid(g_pre) if self.forget else nn.gelu(g_pre)
            h = nn.gelu(conv1d_same(w, self.kernel_size, stride=2,
                                    name=f"down_conv_{i}", dtype=self.dtype)(h))
            feat = h * g if self.forget else h + g
            rc_feat = g
        # decoder: widths retrace the encoder inputs in reverse
        up_widths = [skips[-i - 1].shape[-1] for i in range(len(down_widths))]
        for i, w in enumerate(up_widths):
            h = drop(feat, deterministic=deterministic)
            rc_h = drop(rc_feat, deterministic=deterministic)
            h = layer_norm(name=f"up_norm_{i}")(h).astype(self.dtype)
            rc_h = layer_norm(name=f"rc_up_norm_{i}")(rc_h).astype(self.dtype)
            g_pre = nn.ConvTranspose(
                w, (self.kernel_size,), strides=(2,), padding="SAME",
                dtype=self.dtype, param_dtype=jnp.float32,
                name=f"up_gate_{i}")(rc_h)
            g = jax.nn.sigmoid(g_pre) if self.forget else nn.gelu(g_pre)
            h = nn.gelu(nn.ConvTranspose(
                w, (self.kernel_size,), strides=(2,), padding="SAME",
                dtype=self.dtype, param_dtype=jnp.float32,
                name=f"up_conv_{i}")(h))
            skip, rc_skip = skips[-i - 1], rc_skips[-i - 1]
            feat = h * g + skip if self.forget else h + g
            rc_feat = g + rc_skip
        return feat, rc_feat

    def _gated_convnext(self, feat, rc_feat, deterministic):
        """RC-gated ConvNeXt mode (`denoise.py:412-421`, `:623-645`): per
        stage, a k=2 downsample conv + LN on both strands, ConvNeXt blocks on
        each, then the RC branch's sigmoid output gates the forward branch
        with a residual. Final linear back to hidden_dim (`denoise.py:386`)."""
        dims = (64, 72, 108, 132)
        depths = (1, 1, 4, 2)
        for si, (dim, depth) in enumerate(zip(dims, depths)):
            feat = conv1d_same(dim, 2, name=f"cx_down_{si}",
                               dtype=self.dtype)(feat)
            feat = layer_norm(eps=1e-6, name=f"cx_down_ln_{si}")(
                feat).astype(self.dtype)
            rc_feat = conv1d_same(dim, 2, name=f"cx_rc_down_{si}",
                                  dtype=self.dtype)(rc_feat)
            rc_feat = layer_norm(eps=1e-6, name=f"cx_rc_down_ln_{si}")(
                rc_feat).astype(self.dtype)
            h, rc_h = feat, rc_feat
            for bi in range(depth):
                h = ConvNeXtBlock1D(dim, dtype=self.dtype,
                                    name=f"cx_block_{si}_{bi}")(h)
                rc_h = ConvNeXtBlock1D(dim, dtype=self.dtype,
                                       name=f"cx_rc_block_{si}_{bi}")(rc_h)
            h = nn.gelu(h)
            g = jax.nn.sigmoid(rc_h) if self.forget else nn.gelu(rc_h)
            feat = h * g + feat if self.forget else h + g + feat
            rc_feat = g + rc_feat
        # final linear back to hidden_dim on the forward branch only
        # (`denoise.py:645` applies self.ll to feat; rc_feat is not consumed
        # downstream in this mode)
        feat = dense(self.hidden_dim, ("embed", "conv_ch"), dtype=self.dtype,
                     name="cx_ll")(feat)
        return feat, rc_feat

    @nn.compact
    def __call__(self, seq: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        if self.mode not in ("dilation", "pure_gate", "up_down", "convnext"):
            raise ValueError(f"unknown mode {self.mode!r}")
        H = self.hidden_dim
        drop = nn.Dropout(self.dropout)

        seq = to_acgtn(seq)
        rc = rc_ids(seq) if self.use_comp else seq
        x = jax.nn.one_hot(seq, self.alphabet_size, dtype=self.dtype)
        feat = nn.gelu(dense(H, ("embed", "conv_ch"), dtype=self.dtype,
                             name="in_linear")(x))
        if self.mode != "pure_gate":
            rc_x = jax.nn.one_hot(rc, self.alphabet_size, dtype=self.dtype)
            rc_feat = nn.gelu(dense(H, ("embed", "conv_ch"), dtype=self.dtype,
                                    name="rc_in_linear")(rc_x))

        if self.mode == "up_down":
            feat, rc_feat = self._up_down(feat, rc_feat, drop, deterministic)
        elif self.mode == "convnext":
            feat, rc_feat = self._gated_convnext(feat, rc_feat, deterministic)
        for i, dil in enumerate(
                self._dilations() if self.mode in ("dilation", "pure_gate")
                else ()):
            if self.mode == "dilation":
                h = drop(feat, deterministic=deterministic)
                rc_h = drop(rc_feat, deterministic=deterministic)
                h = layer_norm(name=f"norm_{i}")(h).astype(self.dtype)
                rc_h = layer_norm(name=f"rc_norm_{i}")(rc_h).astype(self.dtype)
                g_pre = conv1d_same(H, self.kernel_size, dil,
                                    name=f"gate_{i}", dtype=self.dtype)(rc_h)
                g = jax.nn.sigmoid(g_pre) if self.forget else nn.gelu(g_pre)
                h = nn.gelu(conv1d_same(H, self.kernel_size, dil,
                                        name=f"conv_{i}", dtype=self.dtype)(h))
                feat = h * g + feat if self.forget else h + g + feat
                rc_feat = g + rc_feat
            elif self.mode == "pure_gate":
                h = drop(feat, deterministic=deterministic)
                h = layer_norm(name=f"norm_{i}")(h).astype(self.dtype)
                h = conv1d_same(H, self.kernel_size, dil, name=f"conv_{i}",
                                dtype=self.dtype)(h)
                g = jax.nn.sigmoid(h) if self.forget else nn.gelu(h)
                feat = nn.gelu(h) * g + feat if self.forget \
                    else nn.gelu(h) + g + feat
            else:
                raise ValueError(f"unknown mode {self.mode!r}")

        if self.use_mlp:
            m = dense(H * self.d_inner, ("conv_ch", "mlp"), dtype=self.dtype,
                      name="mi_0")(feat)
            m = nn.gelu(m)
            m = dense(H * self.d_inner, ("mlp", "mlp2"), dtype=self.dtype,
                      name="mi_1")(m)
            m = layer_norm(name="mi_ln1")(m).astype(self.dtype)
            m = dense(H * self.d_inner, ("mlp2", "mlp"), dtype=self.dtype,
                      name="mi_2")(m)
            m = nn.gelu(m)
            m = dense(H, ("mlp", "conv_ch"), dtype=self.dtype, name="mi_3")(m)
            m = layer_norm(name="mi_ln2")(m).astype(self.dtype)
            feat = m + feat

        if self.use_final_conv:
            f = conv1d_same(H, 1, name="final_conv_0", dtype=self.dtype)(feat)
            f = nn.gelu(f)
            feat = conv1d_same(H, 1, name="final_conv_1", dtype=self.dtype)(f)

        if self.head == "pretrain":
            return dense(self.alphabet_size, ("conv_ch", "vocab"),
                         dtype=jnp.float32, name="out_linear")(
                             feat.astype(jnp.float32))
        pooled = feat.mean(axis=1).astype(jnp.float32)
        if self.head == "regression":
            return dense(self.n_out, ("conv_ch", "vocab"), dtype=jnp.float32,
                         name="out")(pooled)
        h = dense(self.hidden_dim, ("conv_ch", "mlp"), dtype=jnp.float32,
                  name="cls_0")(pooled)
        h = nn.relu(h)
        return dense(self.n_out, ("mlp", "vocab"), dtype=jnp.float32,
                     name="cls_1")(h)


class ConvNeXtBlock1D(nn.Module):
    """xBlock: depthwise k=7 → LN → pw 4× MLP → layer scale
    (`denoise.py:103-137`)."""

    dim: int
    layer_scale_init: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Conv(self.dim, (7,), padding=[(3, 3)],
                    feature_group_count=self.dim, dtype=self.dtype,
                    param_dtype=jnp.float32, name="dwconv")(x)
        h = layer_norm(eps=1e-6, name="norm")(h).astype(self.dtype)
        h = dense(4 * self.dim, ("conv_ch", "mlp"), dtype=self.dtype,
                  name="pw1")(h)
        h = nn.gelu(h)
        h = dense(self.dim, ("mlp", "conv_ch"), dtype=self.dtype,
                  name="pw2")(h)
        if self.layer_scale_init > 0:
            gamma = self.param(
                "gamma",
                nn.with_logical_partitioning(
                    nn.initializers.constant(self.layer_scale_init),
                    ("conv_ch",)),
                (self.dim,), jnp.float32)
            h = h * gamma.astype(self.dtype)
        return x + h


class ConvNeXt1D(nn.Module):
    """1-D ConvNeXt encoder (`convNext.py:58-223` structure: stem + stages of
    downsample-conv + xBlocks), classification/regression readout."""

    dims: Tuple[int, ...] = (64, 72, 108, 132)
    depths: Tuple[int, ...] = (1, 1, 4, 2)
    in_vocab: int = 5
    n_out: int = 2
    head: str = "cls"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, seq: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        x = jax.nn.one_hot(to_acgtn(seq), self.in_vocab, dtype=self.dtype)
        for si, (dim, depth) in enumerate(zip(self.dims, self.depths)):
            x = nn.Conv(dim, (2,), dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"down_{si}")(x)
            x = layer_norm(eps=1e-6, name=f"down_ln_{si}")(x).astype(self.dtype)
            for bi in range(depth):
                x = ConvNeXtBlock1D(dim, dtype=self.dtype,
                                    name=f"block_{si}_{bi}")(x)
        pooled = x.mean(axis=1).astype(jnp.float32)
        return dense(self.n_out, ("conv_ch", "vocab"), dtype=jnp.float32,
                     name="head")(pooled)


class _BatchStatNorm(nn.Module):
    """Per-batch normalization (BN without running stats; see module
    docstring for the deviation rationale)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        axes = tuple(range(x.ndim - 1))
        mean = x.mean(axis=axes, keepdims=True)
        var = x.var(axis=axes, keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


class DeepSTARRCNN(nn.Module):
    """DeepSTARR reference CNN (`deepstarr_cnn.py:108-147`): n conv stages of
    conv→BN→ReLU→maxpool(2)→dropout, flatten, dense stack, 2-output head."""

    num_filters: Tuple[int, ...] = (256, 60, 60, 120)
    kernel_sizes: Tuple[int, ...] = (7, 3, 5, 3)
    dense_neurons: Tuple[int, ...] = (256, 256)
    n_out: int = 2
    alphabet_size: int = 5
    dropout: float = 0.4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, seq: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        x = jax.nn.one_hot(to_acgtn(seq), self.alphabet_size, dtype=self.dtype)
        for i, (nf, ks) in enumerate(zip(self.num_filters, self.kernel_sizes)):
            x = nn.Conv(nf, (ks,), padding="SAME", dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv_{i}")(x)
            x = _BatchStatNorm(name=f"bn_{i}")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2,), strides=(2,))
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = x.reshape(x.shape[0], -1)
        for j, dn in enumerate(self.dense_neurons):
            x = nn.Dense(dn, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"dense_{j}")(x)
            x = _BatchStatNorm(name=f"dense_bn_{j}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.n_out, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="out")(x)


@registry.model.register("denoise_cnn")
def _denoise_cnn(cfg: ModelConfig):
    return DenoiseCNN(hidden_dim=cfg.d_model, dropout=cfg.dropout,
                      n_out=cfg.n_classes, head="cls", mode=cfg.cnn_mode,
                      dtype=jnp.dtype(cfg.dtype))


@registry.model.register("denoise_cnn_regression")
def _denoise_cnn_reg(cfg: ModelConfig):
    return DenoiseCNN(hidden_dim=cfg.d_model, dropout=cfg.dropout,
                      n_out=cfg.n_classes, head="regression",
                      mode=cfg.cnn_mode, dtype=jnp.dtype(cfg.dtype))


@registry.model.register("convnext")
def _convnext(cfg: ModelConfig):
    return ConvNeXt1D(n_out=cfg.n_classes, dtype=jnp.dtype(cfg.dtype))


@registry.model.register("deepstarr_cnn")
def _deepstarr(cfg: ModelConfig):
    return DeepSTARRCNN(n_out=cfg.n_classes, dropout=cfg.dropout,
                        dtype=jnp.dtype(cfg.dtype))
