"""Inference-latency sweep: ms vs sequence length for CNN / Caduceus / Hyena.

Replicates the reference's `time.py:37-80` benchmark (B=1, L up to 100k,
log-scale latency per model family; produced `runtime_vs_seqlen.png`).
Prints a JSON line per (model, L).

Run on TPU: timeout 580 python scripts/runtime_vs_seqlen.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dna_tpu.config.core import ModelConfig
from dna_tpu.models.cnn import DenoiseCNN
from dna_tpu.models.lm import LMHeadModel
from dna_tpu.models.mamba import CaduceusForMaskedLM


def timed(f, x, iters=5):
    out = f(x)
    jax.device_get(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x)
    jax.device_get(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    lengths = [int(x) for x in os.environ.get(
        "SWEEP_LENGTHS", "1024,4096,16384,65536").split(",")]

    def make_models(L):
        hyena_cfg = ModelConfig(name="hyena_lm", vocab_size=16, d_model=256,
                                n_layers=8, d_ff=1024, max_len=L)
        caduceus_cfg = ModelConfig(name="caduceus", vocab_size=16, d_model=256,
                                   n_layers=8, d_state=16)
        return {
            "hyena": LMHeadModel(hyena_cfg, l_max=L, causal=True),
            "caduceus": CaduceusForMaskedLM(caduceus_cfg),
            "denoise_cnn": DenoiseCNN(hidden_dim=128, num_conv1d=5,
                                      head="pretrain", dtype=jnp.bfloat16),
        }

    for L in lengths:
        ids = jax.random.randint(jax.random.key(0), (1, L), 7, 11)
        for name, model in make_models(L).items():
            try:
                params = model.init(jax.random.key(1), ids, None,
                                    deterministic=True)["params"]
                f = jax.jit(lambda x: model.apply({"params": params}, x, None,
                                                  deterministic=True))
                ms = timed(f, ids) * 1e3
                print(json.dumps({"model": name, "seq_len": L,
                                  "latency_ms": round(ms, 2)}), flush=True)
            except Exception as e:
                print(json.dumps({"model": name, "seq_len": L,
                                  "error": str(e)[:120]}), flush=True)

    if os.environ.get("SWEEP_GENERATION", "1") != "0":
        generation_rows()


def generation_rows():
    """KV-cache vs full-refeed generation latency (transformer family,
    VERDICT r3 #8): ms/token at a fixed prompt, O(L) vs O(L²·depth)."""
    from dna_tpu.inference import generate, generate_recurrent

    P, N = 512, 32
    cfg = ModelConfig(name="transformer_lm", vocab_size=16, d_model=256,
                      n_layers=8, n_heads=8, d_ff=1024, max_len=P + N)
    m = LMHeadModel(cfg, attn_layer_idx=tuple(range(8)), l_max=P + N,
                    causal=True)
    ids = jax.random.randint(jax.random.key(0), (1, P), 7, 11)
    params = m.init(jax.random.key(1), ids, None, deterministic=True)["params"]
    for name, fn in (("generate_refeed", generate),
                     ("generate_kv_cache", generate_recurrent)):
        try:
            out = fn(m, params, ids, jax.random.key(2), num_tokens=N,
                     greedy=True)
            jax.device_get(out)  # compile
            t0 = time.perf_counter()
            out = fn(m, params, ids, jax.random.key(3), num_tokens=N,
                     greedy=True)
            jax.device_get(out)
            ms_tok = (time.perf_counter() - t0) / N * 1e3
            print(json.dumps({"model": "transformer_lm", "mode": name,
                              "prompt": P, "new_tokens": N,
                              "ms_per_token": round(ms_tok, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"mode": name, "error": str(e)[:120]}),
                  flush=True)


if __name__ == "__main__":
    main()
