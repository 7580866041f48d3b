from dna_tpu.ops.attention import multihead_attention
from dna_tpu.ops.attention_ref import alibi_bias, alibi_slopes, attention_ref, padding_bias

__all__ = [
    "alibi_bias",
    "alibi_slopes",
    "attention_ref",
    "multihead_attention",
    "padding_bias",
]
