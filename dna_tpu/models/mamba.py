"""Mamba and Caduceus (bidirectional Mamba ± RCPS) — TPU-native.

Re-design of the reference's Mamba layer (`src/models/sequence/pyramid.py:60-332`,
backed by the `mamba_ssm` CUDA kernels) and the Caduceus MLM family
(`src/models/caduceus/modeling_caduceus.py`, `modeling_rcps.py`):

  * `Mamba`: in_proj → depthwise causal conv + silu → (dt, B, C) projections →
    selective scan (`dna_tpu.ops.scan`) → gate with silu(z) → out_proj.
    Initializations match the CUDA reference: dt_proj weight ±dt_rank^-0.5,
    dt bias = softplus⁻¹(U[log dt_min, log dt_max]), A_log = log(1..N), D=1
    (`pyramid.py:117-148`).
  * `BiMambaWrapper`: fwd pass + flipped pass, merged by add/ew_multiply;
    weight tying shares in_proj/out_proj between directions
    (`modeling_caduceus.py:68-123,96-99`).
  * Caduceus blocks use the Mamba residual pattern — Add → Norm → Mixer with
    the residual kept in fp32 (`modeling_caduceus.py:165-170` commentary);
    the reference needs fused Triton add-norm kernels for this, XLA fuses it
    for free.
  * RCPS (reverse-complement parameter sharing): channels are a (fwd, rc)
    pair; shared-parameter submodules run on the fwd half and on the
    RC-transformed (flip L, flip channels) rc half
    (`modeling_rcps.py:69-100`); the RCPS LM head adds complement-permuted
    logits (`modeling_rcps.py:206-243`).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dna_tpu import registry
from dna_tpu.config.core import ModelConfig
from dna_tpu.models.layers import (SequencePool, dense, rms_norm,
                                    sow_act_norm)
from dna_tpu.ops.scan import selective_scan_auto

# Char-tokenizer complement map (A=7<->T=10, C=8<->G=9; specials/N to self),
# reference `tokenization_caduceus.py` complement semantics.
def char_complement_map(vocab_size: int) -> np.ndarray:
    comp = np.arange(vocab_size)
    pairs = [(7, 10), (8, 9)]
    for a, b in pairs:
        if b < vocab_size:
            comp[a], comp[b] = b, a
    return comp


def _dt_init(rng, dt_rank, d_inner, dt_min=0.001, dt_max=0.1,
             dt_init_floor=1e-4):
    """dt_proj kernel + bias init (reference `pyramid.py:115-131`)."""
    k_w, k_b = jax.random.split(rng)
    std = dt_rank ** -0.5
    kernel = jax.random.uniform(k_w, (dt_rank, d_inner), minval=-std, maxval=std)
    dt = jnp.exp(jax.random.uniform(k_b, (d_inner,)) *
                 (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
    dt = jnp.maximum(dt, dt_init_floor)
    inv_dt = dt + jnp.log(-jnp.expm1(-dt))  # softplus inverse
    return kernel, inv_dt


class MambaCore(nn.Module):
    """Everything between in_proj and out_proj: conv, scan, gate.
    Input (x, z) each [B, L, d_inner] → y [B, L, d_inner].

    `return_state=True` additionally returns the recurrent state
    (conv window [B, d_conv, d_inner], ssm state [B, d_inner, N]) for O(1)
    per-token stepping via `step` (reference `Mamba.step` backed by the
    CUDA `selective_state_update`, `pyramid.py:236-277`)."""

    d_inner: int
    d_state: int = 16
    d_conv: int = 4
    dt_rank: int = 8
    scan_chunk: int = 128
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        di, N = self.d_inner, self.d_state
        self.conv_w = self.param(
            "conv_w",
            nn.with_logical_partitioning(
                nn.initializers.lecun_normal(), ("heads", None)),
            (di, self.d_conv), jnp.float32)
        self.conv_b = self.param(
            "conv_b", nn.with_logical_partitioning(nn.initializers.zeros,
                                                   ("heads",)),
            (di,), jnp.float32)
        self.dt_kernel = self.param(
            "dt_kernel",
            nn.with_logical_partitioning(
                lambda r: _dt_init(r, self.dt_rank, di)[0], (None, "heads")),
            )
        self.dt_bias = self.param(
            "dt_bias",
            nn.with_logical_partitioning(
                lambda r: _dt_init(r, self.dt_rank, di)[1], ("heads",)),
            )
        self.A_log = self.param(
            "A_log",
            nn.with_logical_partitioning(
                lambda r: jnp.tile(jnp.log(jnp.arange(1, N + 1, dtype=jnp.float32)),
                                   (di, 1)), ("heads", "state")),
            )
        self.ssm_D = self.param(
            "ssm_D", nn.with_logical_partitioning(nn.initializers.ones,
                                                  ("heads",)),
            (di,), jnp.float32)
        self.x_proj = dense(self.dt_rank + 2 * N, ("heads", "state"),
                            use_bias=False, dtype=self.dtype, name="x_proj")

    def __call__(self, x: jax.Array, z: jax.Array,
                 return_state: bool = False):
        di, N = self.d_inner, self.d_state
        conv_w, conv_b, dt_kernel, dt_bias, A_log, ssm_D = (
            self.conv_w, self.conv_b, self.dt_kernel, self.dt_bias,
            self.A_log, self.ssm_D)

        x_pre = x  # pre-conv activations (the conv window state)
        from dna_tpu.models.layers import causal_depthwise_conv

        # K shifted multiply-adds, NOT lax.conv — see causal_depthwise_conv
        x = causal_depthwise_conv(
            x.astype(self.dtype), conv_w.astype(self.dtype),
            conv_b.astype(self.dtype))
        x = jax.nn.silu(x)

        x_dbl = self.x_proj(x)
        dt, B, C = jnp.split(x_dbl, [self.dt_rank, self.dt_rank + N], axis=-1)
        dt = dt.astype(jnp.float32) @ dt_kernel  # [B, L, d_inner]

        A = -jnp.exp(A_log)
        y = selective_scan_auto(
            x, dt, A, B, C, D=ssm_D, z=z, delta_bias=dt_bias,
            delta_softplus=True, chunk=self.scan_chunk,
            return_last_state=return_state)
        if return_state:
            y, ssm_state = y
            L = x_pre.shape[1]
            pad = max(self.d_conv - L, 0)
            window = x_pre[:, max(L - self.d_conv, 0):].astype(jnp.float32)
            if pad:
                window = jnp.pad(window, ((0, 0), (pad, 0), (0, 0)))
            return y.astype(self.dtype), (window, ssm_state)
        return y.astype(self.dtype)

    def step(self, x_t: jax.Array, z_t: jax.Array, state):
        """One recurrence step. x_t/z_t [B, d_inner]; state =
        (conv_window [B, d_conv, d_inner], ssm_state [B, d_inner, N])."""
        di, N = self.d_inner, self.d_state
        conv_w, conv_b, dt_kernel, dt_bias, A_log, ssm_D = (
            self.conv_w, self.conv_b, self.dt_kernel, self.dt_bias,
            self.A_log, self.ssm_D)
        window, ssm_state = state

        window = jnp.concatenate(
            [window[:, 1:], x_t.astype(jnp.float32)[:, None]], axis=1)
        x = jnp.einsum("bkd,dk->bd", window, conv_w) + conv_b
        x = jax.nn.silu(x).astype(self.dtype)

        x_dbl = self.x_proj(x)
        dt, B, C = jnp.split(x_dbl, [self.dt_rank, self.dt_rank + N], axis=-1)
        dt = jax.nn.softplus(dt.astype(jnp.float32) @ dt_kernel + dt_bias)

        A = -jnp.exp(A_log)                                   # [di, N]
        dA = jnp.exp(dt[:, :, None] * A[None])                # [B, di, N]
        dBx = (dt * x.astype(jnp.float32))[:, :, None] * \
            B.astype(jnp.float32)[:, None, :]
        ssm_state = ssm_state * dA + dBx
        y = jnp.einsum("bdn,bn->bd", ssm_state, C.astype(jnp.float32))
        y = y + x.astype(jnp.float32) * ssm_D
        y = y * jax.nn.silu(z_t.astype(jnp.float32))
        return y.astype(self.dtype), (window, ssm_state)


class Mamba(nn.Module):
    """Full Mamba layer [B, L, D] → [B, L, D]. `step` runs one token in O(1)
    given the (conv window, ssm) state (reference `Mamba.step`,
    `pyramid.py:236-277`)."""

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    scan_chunk: int = 128
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        di = self.expand * self.d_model
        dt_rank = math.ceil(self.d_model / 16)
        self.in_proj = dense(2 * di, ("embed", "heads"), use_bias=False,
                             dtype=self.dtype, name="in_proj")
        self.core = MambaCore(di, self.d_state, self.d_conv, dt_rank,
                              self.scan_chunk, self.dtype, name="core")
        self.out_proj = dense(self.d_model, ("heads", "embed"),
                              use_bias=False, dtype=self.dtype,
                              name="out_proj")

    def __call__(self, u: jax.Array, return_state: bool = False):
        xz = self.in_proj(u)
        x, z = jnp.split(xz, 2, axis=-1)
        y = self.core(x, z, return_state=return_state)
        if return_state:
            y, state = y
            return self.out_proj(y), state
        return self.out_proj(y)

    def step(self, u_t: jax.Array, state):
        """u_t [B, D] → (y_t [B, D], new state)."""
        xz = self.in_proj(u_t)
        x, z = jnp.split(xz, 2, axis=-1)
        y, state = self.core.step(x, z, state)
        return self.out_proj(y), state


class BiMambaWrapper(nn.Module):
    """Bidirectional Mamba: fwd + seq-flipped passes merged by add/multiply;
    in/out projections shared between directions when `weight_tie`."""

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    bidirectional: bool = True
    strategy: str = "add"  # add | ew_multiply
    weight_tie: bool = True
    scan_chunk: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, u: jax.Array) -> jax.Array:
        di = self.expand * self.d_model
        dt_rank = math.ceil(self.d_model / 16)
        core_kw = dict(d_inner=di, d_state=self.d_state, d_conv=self.d_conv,
                       dt_rank=dt_rank, scan_chunk=self.scan_chunk,
                       dtype=self.dtype)

        if not self.bidirectional:
            return Mamba(self.d_model, self.d_state, self.d_conv, self.expand,
                         self.scan_chunk, self.dtype, name="mamba_fwd")(u)

        if self.weight_tie:
            in_proj = dense(2 * di, ("embed", "heads"), use_bias=False,
                            dtype=self.dtype, name="in_proj")
            out_proj = dense(self.d_model, ("heads", "embed"), use_bias=False,
                             dtype=self.dtype, name="out_proj")
            xz = in_proj(u)
            x, z = jnp.split(xz, 2, axis=-1)
            y_f = MambaCore(**core_kw, name="core_fwd")(x, z)
            y_r = MambaCore(**core_kw, name="core_rev")(
                jnp.flip(x, axis=1), jnp.flip(z, axis=1))
            y_r = jnp.flip(y_r, axis=1)
            out_f = out_proj(y_f)
            out_r = out_proj(y_r)
        else:
            out_f = Mamba(self.d_model, self.d_state, self.d_conv, self.expand,
                          self.scan_chunk, self.dtype, name="mamba_fwd")(u)
            out_r = jnp.flip(
                Mamba(self.d_model, self.d_state, self.d_conv, self.expand,
                      self.scan_chunk, self.dtype, name="mamba_rev")(
                    jnp.flip(u, axis=1)), axis=1)
        if self.strategy == "add":
            return out_f + out_r
        if self.strategy == "ew_multiply":
            return out_f * out_r
        raise ValueError(f"unknown bidirectional strategy {self.strategy!r}")


def _rc(x: jax.Array) -> jax.Array:
    """Reverse-complement a hidden tensor: flip length and channel dims
    (reference `modeling_rcps.py:80-83`)."""
    return jnp.flip(x, axis=(-2, -1))


class CaduceusBackbone(nn.Module):
    """Embeddings + n Mamba blocks with the Add→Norm→Mixer residual pattern;
    supports RCPS channel-pairing."""

    cfg: ModelConfig
    complement_map: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(self, input_ids: jax.Array, *, deterministic: bool = True
                 ) -> jax.Array:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        d = cfg.d_model
        rcps = cfg.rcps

        embed_table = self.param(
            "embedding",
            nn.with_logical_partitioning(nn.initializers.normal(0.02),
                                         ("vocab", "embed")),
            (cfg.vocab_size, d), jnp.float32)

        if rcps:
            comp = jnp.asarray(self.complement_map
                               if self.complement_map is not None
                               else char_complement_map(cfg.vocab_size))
            rc_ids = comp[jnp.flip(input_ids, axis=-1)]
            from dna_tpu.ops.dense_grad import take_rows

            fwd = take_rows(embed_table, input_ids)
            rc = _rc(take_rows(embed_table, rc_ids))
            h = jnp.concatenate([fwd, rc], axis=-1).astype(dtype)  # [B,L,2d]
        else:
            from dna_tpu.ops.dense_grad import take_rows

            h = take_rows(embed_table, input_ids).astype(dtype)

        mixer_kw = dict(d_model=d, d_state=cfg.d_state, d_conv=cfg.d_conv,
                        expand=cfg.expand, bidirectional=cfg.bidirectional,
                        strategy=cfg.bidirectional_strategy, dtype=dtype)

        def block(name):
            return BiMambaWrapper(**mixer_kw, name=name)

        residual = None
        for i in range(cfg.n_layers):
            # Add → Norm → Mixer, residual in fp32 (mamba block order)
            residual = h.astype(jnp.float32) if residual is None \
                else residual + h.astype(jnp.float32)
            norm = rms_norm(eps=1e-5, name=f"norm_{i}")
            if rcps:
                half = residual.shape[-1] // 2
                nf = norm(residual[..., :half]).astype(dtype)
                nr = _rc(norm(_rc(residual[..., half:]))).astype(dtype)
                mixer = block(f"mixer_{i}")
                h = jnp.concatenate(
                    [mixer(nf), _rc(mixer(_rc(nr)))], axis=-1)
            else:
                h = block(f"mixer_{i}")(norm(residual).astype(dtype))
            sow_act_norm(self, i, h)

        residual = h.astype(jnp.float32) if residual is None \
            else residual + h.astype(jnp.float32)
        norm_f = rms_norm(eps=1e-5, name="norm_f")
        if rcps:
            half = residual.shape[-1] // 2
            out = jnp.concatenate(
                [norm_f(residual[..., :half]),
                 _rc(norm_f(_rc(residual[..., half:])))], axis=-1)
        else:
            out = norm_f(residual)
        return out.astype(dtype)


class CaduceusForMaskedLM(nn.Module):
    """Caduceus MLM (reference `CaduceusForMaskedLM`,
    `modeling_caduceus.py:373-474`). Returns [B, S, V] fp32 logits."""

    cfg: ModelConfig
    complement_map: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        h = CaduceusBackbone(cfg, self.complement_map, name="backbone")(
            input_ids, deterministic=deterministic)
        head = dense(cfg.vocab_size, ("embed", "vocab"), use_bias=False,
                     dtype=jnp.float32, name="lm_head")
        if cfg.rcps:
            comp = jnp.asarray(self.complement_map
                               if self.complement_map is not None
                               else char_complement_map(cfg.vocab_size))
            half = h.shape[-1] // 2
            fwd_logits = head(h[..., :half].astype(jnp.float32))
            # complement-permuted weights on the channel-flipped rc half
            rc_in = jnp.flip(h[..., half:], axis=-1).astype(jnp.float32)
            rc_logits = head(rc_in)[..., :]  # same kernel
            rc_logits = jnp.take(rc_logits, comp, axis=-1)
            logits = fwd_logits + rc_logits
        else:
            logits = head(h.astype(jnp.float32))
        return nn.with_logical_constraint(logits, ("batch", "seq", "vocab"))


class CaduceusForSequenceClassification(nn.Module):
    """Mean-pool + linear head (reference `CaduceusForSequenceClassification`
    `modeling_caduceus.py:476+` and the HF-hub wrapper
    `src/models/sequence/caduceus.py:36-95`; `ps` conjoining of fwd/rc
    channel halves per `caduceus.py:55-73`)."""

    cfg: ModelConfig
    complement_map: Optional[Sequence[int]] = None
    conjoin_rc: bool = True

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        h = CaduceusBackbone(cfg, self.complement_map, name="backbone")(
            input_ids, deterministic=deterministic)
        score = dense(cfg.n_classes, ("embed", "vocab"), dtype=jnp.float32,
                      name="score")
        pool = SequencePool(cfg.pool)
        if cfg.rcps and self.conjoin_rc:
            half = h.shape[-1] // 2
            logits_f = score(pool(h[..., :half], attention_mask)
                             .astype(jnp.float32))
            logits_r = score(pool(jnp.flip(h[..., half:], axis=-1),
                                  attention_mask).astype(jnp.float32))
            return (logits_f + logits_r) / 2.0
        return score(pool(h, attention_mask).astype(jnp.float32))


@registry.model.register("caduceus")
def _caduceus(cfg: ModelConfig):
    return CaduceusForMaskedLM(cfg)


@registry.model.register("caduceus_cls")
def _caduceus_cls(cfg: ModelConfig):
    return CaduceusForSequenceClassification(cfg)


@registry.layer.register("mamba")
def _mamba_layer(cfg: ModelConfig, l_max: int = 0, causal: bool = True):
    """LMBlock mixer factory; non-causal requests get the bidirectional
    wrapper (Caduceus-style add/multiply merge)."""
    del l_max
    if causal:
        return Mamba(cfg.d_model, cfg.d_state, cfg.d_conv, cfg.expand,
                     dtype=jnp.dtype(cfg.dtype))
    return BiMambaWrapper(cfg.d_model, cfg.d_state, cfg.d_conv, cfg.expand,
                          strategy=cfg.bidirectional_strategy,
                          dtype=jnp.dtype(cfg.dtype))
