"""Pipeline-parallel model variant: DNABERT-2 encoder over the pp axis.

Layers are initialized stacked ([n_layers, ...] per leaf, logical axis
"layers" → mesh axis "pp") and executed by the GPipe scheduler
(`dna_tpu.parallel.pipeline.gpipe`): each pp rank holds n_layers/pp layers;
microbatched activations flow through stages via ppermute. Embeddings and
the LM head run replicated outside the pipeline region.

This complements dp/fsdp/tp/sp for models whose layer stack exceeds one
chip's HBM — a capability the reference lacks entirely (SURVEY §2.6).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dna_tpu import registry
from dna_tpu.config.core import ModelConfig
from dna_tpu.models.bert import BertLayer
from dna_tpu.models.layers import TokenEmbed, dense, layer_norm
from dna_tpu.parallel.pipeline import gpipe, microbatch, unmicrobatch


class PipelinedBertForMLM(nn.Module):
    """BertForMLM with the layer stack executed as a pp-stage pipeline."""

    cfg: ModelConfig
    pp: int = 1
    n_microbatches: int = 4
    mesh: Optional[object] = None  # jax Mesh (static for a built model)

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        assert cfg.n_layers % max(self.pp, 1) == 0, \
            f"{cfg.n_layers} layers not divisible by pp={self.pp}"
        dtype = jnp.dtype(cfg.dtype)

        embed = TokenEmbed(cfg.vocab_size, cfg.d_model, dtype=dtype,
                           name="embed")
        x = embed(input_ids)
        x = layer_norm(eps=cfg.norm_eps, name="embed_ln")(x).astype(dtype)

        layer = BertLayer(cfg)
        dummy = x[:1]

        def init_stacked(rng):
            keys = jax.random.split(rng, cfg.n_layers)
            # template init keeps the per-leaf logical names (heads/mlp/...)
            # so stacked params shard over BOTH pp (layers dim) and tp
            boxed_tpl = layer.init(keys[0], dummy, None,
                                   deterministic=True)["params"]

            def one(k):
                return nn.meta.unbox(
                    layer.init(k, dummy, None, deterministic=True)["params"])

            stacked = jax.vmap(one)(keys)

            def rebox(a, tpl):
                inner = (tuple(tpl.names) if isinstance(tpl, nn.Partitioned)
                         else (None,) * (a.ndim - 1))
                return nn.Partitioned(a, names=("layers",) + inner)

            return jax.tree_util.tree_map(
                rebox, stacked, boxed_tpl,
                is_leaf=lambda x: isinstance(x, nn.Partitioned))

        stacked_params = nn.meta.unbox(self.param("layers", init_stacked))

        # dropout rng threaded through the scan/pipeline explicitly (flax
        # rng plumbing can't cross shard_map); folded per layer for
        # decorrelation
        needs_rng = cfg.dropout > 0.0 and not deterministic
        drop_key = self.make_rng("dropout") if needs_rng else None

        def apply_layer(lp, h, mask, layer_idx):
            rngs = None
            if needs_rng:
                rngs = {"dropout": jax.random.fold_in(drop_key, layer_idx)}
            return layer.apply({"params": lp}, h, mask,
                               deterministic=deterministic, rngs=rngs)

        if self.pp > 1 and self.mesh is not None:
            per_stage = cfg.n_layers // self.pp
            stage_tree = jax.tree_util.tree_map(
                lambda a: a.reshape(self.pp, per_stage, *a.shape[1:]),
                stacked_params)

            def stage_fn(stage_params, h, mask_mb=None):
                # global layer index = stage_rank * per_stage + local index
                base = jax.lax.axis_index("pp") * per_stage

                def body(h, xs):
                    lp, i = xs
                    return apply_layer(lp, h, mask_mb, base + i), None

                h, _ = jax.lax.scan(
                    body, h, (stage_params, jnp.arange(per_stage)))
                return h

            xm = microbatch(x, self.n_microbatches)
            aux = (None if attention_mask is None
                   else microbatch(attention_mask, self.n_microbatches))
            xm = gpipe(stage_fn, stage_tree, xm, mesh=self.mesh, aux=aux)
            x = unmicrobatch(xm)
        else:
            def body(h, xs):
                lp, i = xs
                return apply_layer(lp, h, attention_mask, i), None

            x, _ = jax.lax.scan(
                body, x, (stacked_params, jnp.arange(cfg.n_layers)))

        h = dense(cfg.d_model, ("embed", "embed_out"), dtype=dtype,
                  name="transform")(x)
        h = nn.gelu(h, approximate=False)
        h = layer_norm(eps=cfg.norm_eps, name="transform_ln")(h)
        logits = embed.attend(h)
        bias = self.param(
            "decoder_bias",
            nn.with_logical_partitioning(nn.initializers.zeros, ("vocab",)),
            (cfg.vocab_size,), jnp.float32)
        return nn.with_logical_constraint(logits + bias,
                                          ("batch", "seq", "vocab"))


@registry.model.register("dnabert2_pp")
def _dnabert2_pp(cfg: ModelConfig, pp: int = 1, n_microbatches: int = 4,
                 mesh=None):
    return PipelinedBertForMLM(cfg, pp=pp, n_microbatches=n_microbatches,
                               mesh=mesh)
