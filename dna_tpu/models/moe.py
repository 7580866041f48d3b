"""Mixture-of-Experts MLP — token-choice top-k routing with static capacity.

This capability EXCEEDS the reference (`open-genome/dna` has no MoE anywhere;
PARITY §2.6 listed EP as "reserved"). The design is TPU-native throughout:

  * static shapes end to end — tokens are ranked per expert with a cumsum
    over a [N·K, E] one-hot and dropped past a fixed capacity
    C = ceil(K·N/E · capacity_factor), so XLA sees a fixed [E, C, D]
    expert batch every step (no data-dependent shapes, no host sync);
  * the expert FFN is two batched einsums over [E, C, D] with weights
    carrying the `expert` logical axis — sharding over the `ep` mesh axis
    is pure annotation, XLA inserts the all-to-all-style collectives;
  * dispatch/combine are a gather and a scatter-add over a flat [E·C] slot
    table (no [N, E, C] one-hot dispatch tensors — those are O(N²) at
    genomics batch sizes);
  * the Switch-style load-balancing auxiliary loss is sown into the
    "losses" collection only when the caller makes it mutable (the train
    step does; eval/inference paths are untouched).

Router numerics follow the standard Switch/Mixtral recipe: fp32 router,
softmax over experts, top-k gates renormalized to sum 1.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from dna_tpu.models.layers import default_kernel_init


class MoEMlp(nn.Module):
    """Drop-in replacement for `Mlp`: [B, S, D] → [B, S, D]."""

    d_ff: int
    d_model: int
    n_experts: int = 8
    top_k: int = 2
    capacity_factor: float = 1.25
    aux_weight: float = 0.01
    approximate: bool = True  # tanh GELU (ModelConfig.gelu_approx)
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        squeeze = x.ndim == 2  # recurrent step path: [B, D] == 1-token rows
        if squeeze:
            x = x[:, None]
        B, S, D = x.shape
        N = B * S
        E, K = self.n_experts, self.top_k
        C = max(1, math.ceil(K * N / E * self.capacity_factor))

        xf = x.reshape(N, D)

        # --- router (fp32) -------------------------------------------------
        wr = self.param(
            "router",
            nn.with_logical_partitioning(default_kernel_init,
                                         ("embed", "expert")),
            (D, E), jnp.float32)
        logits = xf.astype(jnp.float32) @ wr                  # [N, E]
        probs = jax.nn.softmax(logits, axis=-1)
        gate, expert_idx = jax.lax.top_k(probs, K)            # [N, K]
        gate = gate / jnp.maximum(gate.sum(-1, keepdims=True), 1e-9)

        # --- static-capacity dispatch --------------------------------------
        # pairs are (token, k) in token order; rank within an expert via
        # cumsum of the one-hot assignment
        e_flat = expert_idx.reshape(-1)                       # [N·K]
        onehot = jax.nn.one_hot(e_flat, E, dtype=jnp.int32)   # [N·K, E]
        rank = (jnp.cumsum(onehot, axis=0) - onehot)          # rank before me
        rank = jnp.take_along_axis(rank, e_flat[:, None], axis=1)[:, 0]
        keep = rank < C
        # kept pairs get a unique slot e·C + rank; dropped pairs all collide
        # on the sentinel slot E·C, which is sliced off below
        dest = jnp.where(keep, e_flat * C + rank, E * C)      # [N·K]
        token_of_pair = jnp.repeat(jnp.arange(N, dtype=jnp.int32), K)
        slot_token = jnp.zeros(E * C + 1, jnp.int32).at[dest].set(
            token_of_pair, mode="drop")
        slot_gate = jnp.zeros(E * C + 1, jnp.float32).at[dest].set(
            jnp.where(keep, gate.reshape(-1), 0.0), mode="drop")
        slot_token = slot_token[: E * C]
        slot_gate = slot_gate[: E * C]

        # --- expert FFN on the [E, C, D] batch ------------------------------
        xe = xf[slot_token].reshape(E, C, D)
        xe = nn.with_logical_constraint(xe, ("expert", None, "act_embed"))
        w1 = self.param(
            "w1",
            nn.with_logical_partitioning(default_kernel_init,
                                         ("expert", "embed", "mlp")),
            (E, D, self.d_ff), jnp.float32)
        w2 = self.param(
            "w2",
            nn.with_logical_partitioning(default_kernel_init,
                                         ("expert", "mlp", "embed")),
            (E, self.d_ff, D), jnp.float32)
        h = jnp.einsum("ecd,edf->ecf", xe.astype(self.dtype),
                       w1.astype(self.dtype),
                       preferred_element_type=jnp.float32)
        h = nn.gelu(h, approximate=self.approximate)
        h = nn.with_logical_constraint(h, ("expert", None, "mlp"))
        oe = jnp.einsum("ecf,efd->ecd", h.astype(self.dtype),
                        w2.astype(self.dtype),
                        preferred_element_type=jnp.float32)  # [E, C, D] fp32

        # --- combine (scatter-add weighted expert outputs) ------------------
        contrib = oe.reshape(E * C, D) * slot_gate[:, None]
        out = jnp.zeros((N, D), jnp.float32).at[slot_token].add(contrib)

        # --- Switch load-balancing aux loss (only when requested) -----------
        if self.is_mutable_collection("losses"):
            # fraction of pair-assignments per expert × mean router prob
            f = onehot.astype(jnp.float32).mean(axis=0) * K
            p_mean = probs.mean(axis=0)
            aux = E * jnp.sum(f / K * p_mean)
            self.sow("losses", "moe_aux", self.aux_weight * aux,
                     reduce_fn=lambda a, b: a + b, init_fn=lambda: 0.0)

        out = out.astype(x.dtype).reshape(B, S, D)
        return out[:, 0] if squeeze else out
