"""2-bit packed DNA corpus codec.

Wire-format-compatible with the reference's DNABERT-2 binary corpus
(`src/dataloaders/datasets/dnabert2.py:166-192`): per text row, bases map
A=00 T=01 C=10 G=11 (unknown → 00/A), bits packed big-endian and
zero-padded to a byte boundary; a `<name>_padding_info.json` sidecar maps
1-based row number → [row_bytes, pad_bits].

The reference en/decodes via Python string bit-twiddling per row; here both
directions are vectorized numpy (packbits/unpackbits) — orders of magnitude
faster on the data-loading hosts.
"""

from __future__ import annotations

import json
import math
import os
from typing import List, Tuple

import numpy as np

_BASE_TO_CODE = np.zeros(256, dtype=np.uint8)  # default 00 = A
_BASE_TO_CODE[ord("A")] = 0
_BASE_TO_CODE[ord("T")] = 1
_BASE_TO_CODE[ord("C")] = 2
_BASE_TO_CODE[ord("G")] = 3
_CODE_TO_BASE = np.frombuffer(b"ATCG", dtype=np.uint8)


def encode_row(seq: str) -> Tuple[bytes, int, int]:
    """Returns (packed_bytes, row_bytes_reference_convention, pad_bits)."""
    codes = _BASE_TO_CODE[np.frombuffer(seq.encode("ascii"), dtype=np.uint8)]
    bits = ((codes[:, None] >> np.array([1, 0], dtype=np.uint8)) & 1
            ).reshape(-1).astype(np.uint8)
    pad = (-len(bits)) % 8
    packed = np.packbits(bits)  # big-endian bit order, zero pads
    # reference stores ceil(len/4) as the row byte count
    return packed.tobytes(), math.ceil(len(seq) / 4), pad


def decode_row(data: bytes, pad_bits: int) -> str:
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    if pad_bits:
        bits = bits[:-pad_bits]
    codes = (bits[0::2] << 1) | bits[1::2]
    return _CODE_TO_BASE[codes].tobytes().decode("ascii")


def convert_text_to_bin(text_path: str, bin_path: str) -> str:
    """`train.txt` → `train.bin` + `train_padding_info.json` (reference
    `convert_dna_to_binary`, `dnabert2.py:177-192`). Returns sidecar path."""
    padding_info = {}
    with open(text_path) as fin, open(bin_path, "wb") as fout:
        for line_number, line in enumerate(fin, 1):
            seq = line.strip()
            packed, row_bytes, pad = encode_row(seq)
            padding_info[str(line_number)] = [row_bytes, pad]
            fout.write(packed)
    sidecar = text_path[:-4] + "_padding_info.json" if text_path.endswith(".txt") \
        else text_path + "_padding_info.json"
    with open(sidecar, "w") as f:
        json.dump(padding_info, f)
    return sidecar


class TwoBitCorpus:
    """Loads a .bin + padding_info.json pair; row access returns the DNA
    string (reference `read_binary_to_list_with_markers` + `__getitem__`,
    `dnabert2.py:148-206`)."""

    def __init__(self, bin_path: str, sidecar_path: str):
        with open(bin_path, "rb") as f:
            self._data = f.read()
        with open(sidecar_path) as f:
            self.padding_info = json.load(f)
        self._offsets: List[Tuple[int, int, int]] = []
        marker = 0
        for i in range(len(self.padding_info)):
            row_bytes, pad = self.padding_info[str(i + 1)]
            self._offsets.append((marker, row_bytes, pad))
            marker += row_bytes

    def __len__(self):
        return len(self._offsets)

    def __getitem__(self, idx: int) -> str:
        off, nbytes, pad = self._offsets[idx]
        return decode_row(self._data[off:off + nbytes], pad)


class DNABert2PretrainDataset:
    """MLM pretraining over a 2-bit corpus with BPE tokenization (reference
    `DNABERT2Dataset`, `dnabert2.py:137-245`): decode row → tokenize →
    truncate/left-pad → bert_mask."""

    def __init__(self, corpus: TwoBitCorpus, tokenizer, *,
                 max_length: int = 128, mlm_probability: float = 0.15,
                 seed: int = 0):
        self.corpus = corpus
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.mlm_probability = mlm_probability
        self.seed = seed

    def __len__(self):
        return len(self.corpus)

    def __getitem__(self, idx: int):
        from dna_tpu.data import masking

        seq = self.corpus[idx]
        ids = self.tokenizer.encode(seq, add_special_tokens=True)
        ids = self.tokenizer.pad(ids[: self.max_length], self.max_length)
        rng = np.random.default_rng((self.seed, idx))
        masked, mask, labels = masking.bert_mask_numpy(
            ids, rng,
            mask_token_id=self.tokenizer.mask_token_id,
            pad_token_id=self.tokenizer.pad_token_id,
            vocab_size=self.tokenizer.vocab_size,
            special_token_ids=self.tokenizer.special_token_ids,
            mask_prob=self.mlm_probability)
        return {"input_ids": masked.astype(np.int32),
                "mask": mask,
                "labels": labels.astype(np.int32),
                "attention_mask": (ids != self.tokenizer.pad_token_id
                                   ).astype(np.int32)}
