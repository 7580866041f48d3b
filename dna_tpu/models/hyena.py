"""Hyena operator: order-N implicit long-convolution sequence mixer.

TPU-native re-design of the reference `src/models/sequence/hyena.py:311-513`
(HyenaOperator) and its implicit filter (`HyenaFilter`, `hyena.py:163-253`):

  * in_proj d → (order+1)·d, depthwise short conv (kernel 3, causal)
  * implicit filter: Sin-activated MLP over complex-exponential positional
    embeddings (`PositionalEmbedding`, `hyena.py:113-135`) with exponential
    decay modulation (`ExponentialModulation`, `hyena.py:138-159`)
  * recurrence: v ← (v ∘ x_i) ⊛ k_o + bias_o·v for each order, final gate
    with x_0, out_proj (`hyena.py:475-505`)

The FFT conv runs through `dna_tpu.ops.fftconv` (XLA FFT, custom_vjp)
along the sequence axis of the channel-last [B, L, D] layout (no transposes). The filter MLP is
evaluated once per forward for all channels at once — it is tiny
(emb_dim→order→order→d) and XLA hoists it out of the batch dimension
entirely since it has no batch dependence.

Per-parameter optimizer hyperparams: the reference registers filter params
with `_optim={'lr': 1e-3, 'wd': 0}` and pos-emb with lr 1e-5
(`hyena.py:228-231`, SURVEY §7.3); here the same effect comes from the
parameter-path groups in `dna_tpu.train.optim` (paths contain
`hyena_filter`).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dna_tpu import registry
from dna_tpu.config.core import ModelConfig
from dna_tpu.models.layers import dense, kaiming_init
from dna_tpu.ops.fftconv import fftconv


def positional_embedding(emb_dim: int, seq_len: int) -> np.ndarray:
    """[L, emb_dim] = [t, Re(z_f), Im(z_f)] complex-exponential features
    (reference `hyena.py:118-131`)."""
    t = np.linspace(0, 1, seq_len)[:, None]  # [L, 1]
    bands = (emb_dim - 1) // 2
    t_rescaled = np.linspace(0, seq_len - 1, seq_len)[:, None]
    w = 2 * math.pi * t_rescaled / seq_len
    f = np.linspace(1e-4, bands - 1, bands)[None, :]
    z = np.exp(-1j * f * w)  # [L, bands]
    return np.concatenate([t, z.real, z.imag], axis=-1).astype(np.float32)


class HyenaFilter(nn.Module):
    """Implicit filter MLP producing k: [L, d_filter]."""

    d_filter: int              # = head_dim * (order - 1)
    emb_dim: int = 33
    filter_order: int = 64     # MLP width
    seq_len: int = 1024
    num_inner_mlps: int = 2
    w: float = 1.0             # sine frequency init
    fast_decay_pct: float = 0.3
    slow_decay_pct: float = 1.5
    target: float = 1e-2
    shift: float = 0.0
    modulate: bool = True
    normalized: bool = False

    @nn.compact
    def __call__(self, L: int) -> jax.Array:
        # trainable positional embedding table (reference lr_pos_emb=1e-5)
        z_init = positional_embedding(self.emb_dim, self.seq_len)
        z = self.param("pos_z", lambda key: jnp.asarray(z_init))
        t = jnp.linspace(0, 1, self.seq_len)[:, None]
        z, t = z[:L], t[:L]

        h = z
        freqs = []
        h = nn.Dense(self.filter_order, param_dtype=jnp.float32,
                     name="mlp_in")(h)
        freq0 = self.param("sin_freq_0", nn.initializers.constant(self.w),
                           (1, self.filter_order), jnp.float32)
        h = jnp.sin(freq0 * h)
        for i in range(self.num_inner_mlps):
            h = nn.Dense(self.filter_order, param_dtype=jnp.float32,
                         name=f"mlp_{i}")(h)
            fr = self.param(f"sin_freq_{i+1}", nn.initializers.constant(self.w),
                            (1, self.filter_order), jnp.float32)
            h = jnp.sin(fr * h)
        h = nn.Dense(self.d_filter, use_bias=False, param_dtype=jnp.float32,
                     name="mlp_out")(h)  # [L, d_filter]

        if self.modulate:
            max_decay = math.log(self.target) / self.fast_decay_pct
            min_decay = math.log(self.target) / self.slow_decay_pct
            deltas_init = np.linspace(min_decay, max_decay,
                                      self.d_filter).astype(np.float32)
            deltas = self.param("mod_deltas", lambda key: jnp.asarray(deltas_init))
            decay = jnp.exp(-t * jnp.abs(deltas)[None, :])
            h = h * (decay + self.shift)
        if self.normalized:
            h = h / jnp.linalg.norm(h, ord=1, axis=-1, keepdims=True)
        return h


class HyenaOperator(nn.Module):
    """Drop-in sequence mixer: [B, L, D] → [B, L, D]."""

    d_model: int
    l_max: int
    order: int = 2
    filter_order: int = 64
    filter_emb_dim: int = 33
    short_filter_order: int = 3
    num_blocks: int = 1
    dropout: float = 0.0
    bidirectional: bool = False
    # modulation shift: in-repo reference defaults 0.0 (`hyena.py:145`),
    # standalone/HF HyenaDNA uses 0.05 (`standalone_hyenadna.py:126`)
    filter_shift: float = 0.0
    # GPT-2 scheme kaiming init for out_proj (`long_conv_lm.py:292-299`
    # matches `out_proj.weight` on every submodule, incl. Hyena's)
    out_proj_init: object = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, u: jax.Array, *, deterministic: bool = True) -> jax.Array:
        cfg = self
        d = cfg.d_model
        B, L, _ = u.shape
        l_filter = min(L, cfg.l_max)
        total = (cfg.order + 1) * d

        x = dense(total, ("embed", "heads"), dtype=cfg.dtype, name="in_proj")(u)

        # depthwise causal short conv over L (torch Conv1d(groups=total,
        # padding=k-1) + truncate == left-pad k-1)
        w_short = self.param(
            "short_filter",
            nn.with_logical_partitioning(
                nn.initializers.normal(1.0 / math.sqrt(cfg.short_filter_order)),
                ("heads", None)),
            (total, cfg.short_filter_order), jnp.float32)
        b_short = self.param(
            "short_filter_bias",
            nn.with_logical_partitioning(nn.initializers.zeros, ("heads",)),
            (total,), jnp.float32)
        from dna_tpu.models.layers import causal_depthwise_conv

        # K shifted multiply-adds, NOT lax.conv: the grouped-conv dW
        # emitter runs at ~13% of HBM SoL on TPU (r5 L=65536 trace)
        xc = causal_depthwise_conv(
            x.astype(cfg.dtype), w_short.astype(cfg.dtype),
            b_short.astype(cfg.dtype))
        xc = xc[:, :l_filter]

        # split into order gates + value, each [B, L, d]
        splits = jnp.split(xc, cfg.order + 1, axis=-1)
        *gates, v = splits

        # num_blocks > 1: the long conv becomes block-local — L is split into
        # z independent chunks and each is convolved with the filter truncated
        # to the chunk length (reference `hyena.py:358-360,448-453`: the
        # `(z l)` rearrange before the recurrence). The short conv above still
        # crosses block boundaries, exactly as in the reference (it runs
        # before the rearrange). Since the filter MLP is a pointwise function
        # of position, filter(L/z) == filter(L)[: L/z].
        z = cfg.num_blocks
        if z > 1:
            if l_filter % z:
                raise ValueError(
                    f"sequence length {l_filter} not divisible by "
                    f"num_blocks={z}")
            l_block = l_filter // z
            v = v.reshape(B * z, l_block, d)
            gates = [g.reshape(B * z, l_block, d) for g in gates]
        else:
            l_block = l_filter

        k = HyenaFilter(
            d_filter=d * (cfg.order - 1), emb_dim=cfg.filter_emb_dim,
            filter_order=cfg.filter_order, seq_len=cfg.l_max,
            shift=cfg.filter_shift,
            name="hyena_filter")(l_block)  # [L, d*(order-1)]
        k = k.reshape(l_block, cfg.order - 1, d)  # order-major split
        filt_bias = self.param(
            "hyena_filter_bias",
            nn.with_logical_partitioning(nn.initializers.normal(1.0), (None,)),
            (cfg.order - 1, d), jnp.float32)

        # recurrence over orders (reference iterates reversed(x[1:]) with
        # k[o] indexed forward — o-th conv uses filter column o)
        dropout = nn.Dropout(cfg.dropout)
        for o, gate in enumerate(reversed(gates[1:])):
            v = v * gate
            if cfg.dropout > 0.0:
                v = dropout(v, deterministic=deterministic)
            # fftconv along the sequence axis, channel-last (no transposes)
            v = fftconv(v, k[:, o, :], D=filt_bias[o][None, :],
                        bidirectional=cfg.bidirectional).astype(cfg.dtype)

        y = v * gates[0]
        if z > 1:
            y = y.reshape(B, l_filter, d)
        y = nn.with_logical_constraint(y, ("batch", "seq", "act_embed"))
        from dna_tpu.models.layers import default_kernel_init

        return dense(d, ("heads", "embed"), dtype=cfg.dtype, name="out_proj",
                     kernel_init=cfg.out_proj_init or default_kernel_init)(y)


@registry.layer.register("hyena")
def _hyena(cfg: ModelConfig, l_max: int, causal: bool = True):
    """LMBlock mixer factory (the reference's `layer: {_name_: hyena}`
    registry entry, consumed by `create_mixer_cls`)."""
    return HyenaOperator(
        d_model=cfg.d_model, l_max=l_max, order=cfg.hyena_order,
        filter_order=cfg.hyena_filter_order,
        filter_emb_dim=cfg.hyena_filter_emb_dim,
        short_filter_order=cfg.short_filter_len, dropout=cfg.dropout,
        num_blocks=cfg.hyena_num_blocks,
        bidirectional=not causal,
        filter_shift=cfg.hyena_filter_shift,
        out_proj_init=kaiming_init if cfg.gpt2_init else None,
        dtype=jnp.dtype(cfg.dtype))
