from dna_tpu.data import genomics, synthetic, tokenshard  # noqa: F401  (registers datasets)
from dna_tpu.data.loader import LoaderState, ShardedLoader
from dna_tpu.data.masking import bert_mask_jax, bert_mask_numpy
from dna_tpu.data.tokenizers import (
    BPETokenizer,
    CharTokenizer,
    KmerTokenizer,
    get_tokenizer,
)

__all__ = [
    "BPETokenizer",
    "CharTokenizer",
    "KmerTokenizer",
    "LoaderState",
    "ShardedLoader",
    "bert_mask_jax",
    "bert_mask_numpy",
    "get_tokenizer",
]
