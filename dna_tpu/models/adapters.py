"""Input encoders and output decoders — the reference's adapter registries.

The reference composes `encoder → backbone → decoder` from config
(`src/tasks/encoders.py:295-331` registry + dataset/model attr tables;
`src/tasks/decoders.py:50-140` SequenceDecoder). Here each adapter is a flax
module registered under `registry.encoder` / `registry.decoder`; models pick
them up from `ModelConfig.encoder` / the decode fields (`pool`, `l_output`).

Encoders (ids/continuous [B, L(, d_input)] → [B, L, d_model]):
  * embedding — token embedding (default for every LM family)
  * onehot    — one-hot to d_model channels (`encoders.py:242-249`)
  * linear    — dense projection of continuous features
  * position  — embedding + fixed sinusoidal additive positions
                (`encoders.py:160-188` PositionalEncoder)
  * conv1d    — k-wide conv over the one-hot sequence (`encoders.py` Conv1D)

Decoder: `SequenceDecoder` with the reference's `l_output` restriction
semantics (None = full length; 0 = length-1 squeezed) and modes
last / first / pool / sum / ragged (`decoders.py:50-105`).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dna_tpu import registry
from dna_tpu.models.layers import TokenEmbed, dense


class OneHotEncoder(nn.Module):
    """ids → one-hot over d_model channels (requires n_tokens <= d_model,
    reference `encoders.py:242-249`)."""

    d_model: int

    def __call__(self, ids: jax.Array) -> jax.Array:
        return jax.nn.one_hot(ids, self.d_model, dtype=jnp.float32)


class LinearEncoder(nn.Module):
    d_model: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return dense(self.d_model, ("embed", "embed_out"),
                     name="proj")(x.astype(jnp.float32))


def sinusoidal_table(max_len: int, d_model: int) -> jnp.ndarray:
    pos = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                  * (-jnp.log(10000.0) / d_model))
    tab = jnp.zeros((max_len, d_model), jnp.float32)
    tab = tab.at[:, 0::2].set(jnp.sin(pos * div))
    tab = tab.at[:, 1::2].set(jnp.cos(pos * div[: (d_model + 1) // 2]))
    return tab


class PositionalEncoder(nn.Module):
    """Token embedding + fixed sinusoidal positions (reference
    `PositionalEncoder`, `encoders.py:160-188`)."""

    n_tokens: int
    d_model: int
    max_len: int = 16384
    dropout: float = 0.0

    @nn.compact
    def __call__(self, ids: jax.Array, *, deterministic: bool = True
                 ) -> jax.Array:
        x = TokenEmbed(self.n_tokens, self.d_model)(ids)
        x = x * jnp.sqrt(jnp.float32(self.d_model)).astype(x.dtype)
        pe = sinusoidal_table(self.max_len, self.d_model)[: ids.shape[1]]
        x = x + pe[None].astype(x.dtype)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class Conv1DEncoder(nn.Module):
    """k-wide conv over one-hot ids (reference Conv1DEncoder)."""

    n_tokens: int
    d_model: int
    kernel: int = 9

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        x = jax.nn.one_hot(ids, self.n_tokens, dtype=jnp.float32)
        pad = (self.kernel - 1) // 2
        return nn.Conv(self.d_model, (self.kernel,),
                       padding=[(pad, pad)], name="conv")(x)


class SequenceDecoder(nn.Module):
    """[B, L, D] → [B, l_output, d_output] (or [B, d_output] when squeezed).

    Reference semantics (`decoders.py:50-105`):
      * l_output None → keep full length; 0 → length 1, squeezed
      * last/first — slice the ends
      * sum — suffix running sums (cumsum restricted to the last l positions)
      * pool — running mean; with a padding mask, each row's mean over its
        own valid length (gathered at the row's last valid position)
      * ragged — mask-aware mean over valid positions only (requires mask)
    """

    d_output: Optional[int] = None
    l_output: Optional[int] = None
    mode: str = "pool"

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None
                 ) -> jax.Array:
        l_out = self.l_output
        squeeze = l_out == 0
        if squeeze:
            l_out = 1
        if l_out is None:
            l_out = x.shape[1]

        if self.mode == "last":
            out = x[:, -l_out:]
        elif self.mode == "first":
            out = x[:, :l_out]
        elif self.mode == "sum":
            out = jnp.cumsum(x, axis=1)[:, -l_out:]
        elif self.mode == "pool":
            denom = jnp.arange(1, x.shape[1] + 1, dtype=x.dtype)[:, None]
            running = jnp.cumsum(x, axis=1) / denom
            if mask is not None:
                # gather each row's mean-at-its-own-length
                lengths = jnp.maximum(mask.sum(-1).astype(jnp.int32), 1)
                rows = jnp.arange(x.shape[0])
                out = running[rows, lengths - 1][:, None]
                out = jnp.broadcast_to(out, (x.shape[0], l_out, x.shape[2]))
            else:
                out = running[:, -l_out:]
        elif self.mode == "ragged":
            if mask is None:
                raise ValueError("ragged mode needs an attention mask")
            m = mask.astype(x.dtype)[..., None]
            pooled = (x * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
            out = pooled[:, None]
        else:
            raise ValueError(f"unknown decoder mode {self.mode!r}")

        if self.d_output is not None:
            out = dense(self.d_output, ("embed", "vocab"), dtype=jnp.float32,
                        name="output_transform")(out.astype(jnp.float32))
        if squeeze or self.mode == "ragged":
            out = out[:, 0]
        return out


# ---- registries ------------------------------------------------------------

@registry.encoder.register("embedding")
def _embedding(n_tokens: int, d_model: int, **kw):
    return TokenEmbed(n_tokens, d_model, **kw)


@registry.encoder.register("onehot")
def _onehot(n_tokens: int, d_model: int, **kw):
    assert n_tokens <= d_model, "one-hot needs n_tokens <= d_model"
    return OneHotEncoder(d_model)


@registry.encoder.register("linear")
def _linear(n_tokens: int, d_model: int, **kw):
    del n_tokens
    return LinearEncoder(d_model)


@registry.encoder.register("position")
def _position(n_tokens: int, d_model: int, max_len: int = 16384, **kw):
    return PositionalEncoder(n_tokens, d_model, max_len=max_len)


@registry.encoder.register("conv1d")
def _conv1d(n_tokens: int, d_model: int, **kw):
    return Conv1DEncoder(n_tokens, d_model)


@registry.decoder.register("sequence")
def _sequence_decoder(d_output=None, l_output=None, mode="pool"):
    return SequenceDecoder(d_output=d_output, l_output=l_output, mode=mode)


@registry.decoder.register("id")
def _id_decoder(**kw):
    return lambda x, mask=None: x
