"""DNA tokenizers.

Three tokenizer families, matching the reference's selection logic
(`src/dataloaders/genomics.py:105-117`):

  * char  — single-nucleotide vocabulary with the exact special-token id
            layout of the reference CharacterTokenizer
            (`src/dataloaders/datasets/hg38_char_tokenizer.py:20-70`):
            CLS=0 SEP=1 BOS=2 MASK=3 PAD=4 RESERVED=5 UNK=6, bases from 7.
  * bpe   — DNABERT-2's byte-pair tokenizer (vocab 4096), loaded from a
            `tokenizer.json` artifact via the `tokenizers` library.
  * kmer  — NTv2's 6-mer tokenizer (vocab 4107), loaded from `vocab.txt`.

All tokenizers are plain Python/NumPy (host side); the hot path uses
pre-tokenized fixed-shape int32 arrays. Batch encoding is vectorized over
NumPy where possible since Python-per-base loops are the reference's data
bottleneck (SURVEY §7.3).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

# --------------------------------------------------------------------------
# Character tokenizer
# --------------------------------------------------------------------------

CHAR_SPECIALS = ("[CLS]", "[SEP]", "[BOS]", "[MASK]", "[PAD]", "[RESERVED]", "[UNK]")


class CharTokenizer:
    """Single-character tokenizer with the reference id layout."""

    def __init__(self, characters: Sequence[str] = ("A", "C", "G", "T", "N"),
                 model_max_length: int = 1 << 30, padding_side: str = "left"):
        self.characters = tuple(characters)
        self.model_max_length = model_max_length
        self.padding_side = padding_side
        self._str_to_id: Dict[str, int] = {s: i for i, s in enumerate(CHAR_SPECIALS)}
        for i, ch in enumerate(self.characters):
            self._str_to_id[ch] = 7 + i
        self._id_to_str = {v: k for k, v in self._str_to_id.items()}
        # Vectorized lookup table over the byte range.
        self._lut = np.full(256, self.unk_token_id, dtype=np.int32)
        for ch in self.characters:
            self._lut[ord(ch)] = self._str_to_id[ch]
            self._lut[ord(ch.lower())] = self._str_to_id[ch]

    cls_token_id = 0
    sep_token_id = 1
    bos_token_id = 2
    mask_token_id = 3
    pad_token_id = 4
    unk_token_id = 6

    @property
    def vocab_size(self) -> int:
        return 7 + len(self.characters)

    @property
    def special_token_ids(self) -> List[int]:
        return list(range(7))

    def encode(self, text: str, add_special_tokens: bool = False) -> np.ndarray:
        ids = self._lut[np.frombuffer(text.encode("ascii"), dtype=np.uint8)]
        if add_special_tokens:
            ids = np.concatenate(([self.cls_token_id], ids, [self.sep_token_id]))
        return ids.astype(np.int32)

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        out = []
        for i in ids:
            tok = self._id_to_str.get(int(i), "[UNK]")
            if skip_special_tokens and len(tok) > 1:
                continue
            out.append(tok)
        return "".join(out)

    def pad(self, ids: np.ndarray, length: int) -> np.ndarray:
        """Pad/truncate a 1-D id array to `length` (reference pads on the
        configured side; default left, matching hg38_char_tokenizer)."""
        n = ids.shape[0]
        if n >= length:
            return ids[:length]
        pad = np.full(length - n, self.pad_token_id, dtype=ids.dtype)
        if self.padding_side == "left":
            return np.concatenate([pad, ids])
        return np.concatenate([ids, pad])


# Char-id remap convention for CNN models (`genomic_bench_dataset.py:205-208`):
# every classification dataset supports use_tokenizer=False → ids-7 clamped to
# [0,4], producing a 0..4 ACGTN alphabet.
def char_ids_to_acgtn(ids: np.ndarray) -> np.ndarray:
    out = ids.astype(np.int32) - 7
    return np.where((out < 0) | (out > 4), 4, out)


def complement_acgtn(ids: np.ndarray) -> np.ndarray:
    """A<->T, C<->G on the 0..4 alphabet; N (4) stays (reference
    `denoise.py:449-453`: rc = 3 - seq, N stays 4)."""
    return np.where(ids == 4, 4, 3 - ids)


# --------------------------------------------------------------------------
# BPE tokenizer (DNABERT-2 artifact)
# --------------------------------------------------------------------------


class BPETokenizer:
    """Wrapper over a HuggingFace `tokenizer.json` (DNABERT-2's 4096-entry
    byte-pair vocabulary). The artifact is loaded from disk; we never retrain
    it (SURVEY §7.3 tokenizer fidelity)."""

    def __init__(self, path: str):
        from tokenizers import Tokenizer  # rust-backed, baked into the image

        if os.path.isdir(path):
            path = os.path.join(path, "tokenizer.json")
        self._tok = Tokenizer.from_file(path)
        vocab = self._tok.get_vocab()
        self.cls_token_id = vocab.get("[CLS]", 1)
        self.sep_token_id = vocab.get("[SEP]", 2)
        self.pad_token_id = vocab.get("[PAD]", 3)
        self.mask_token_id = vocab.get("[MASK]", 4)
        self.unk_token_id = vocab.get("[UNK]", 0)
        self.padding_side = "left"

    @property
    def vocab_size(self) -> int:
        return self._tok.get_vocab_size()

    @property
    def special_token_ids(self) -> List[int]:
        return [self.cls_token_id, self.sep_token_id, self.pad_token_id,
                self.mask_token_id, self.unk_token_id]

    def encode(self, text: str, add_special_tokens: bool = True) -> np.ndarray:
        enc = self._tok.encode(text)
        ids = np.asarray(enc.ids, dtype=np.int32)
        if not add_special_tokens:
            keep = ~np.isin(ids, [self.cls_token_id, self.sep_token_id])
            ids = ids[keep]
        return ids

    def encode_batch(self, texts: List[str]) -> List[np.ndarray]:
        encs = self._tok.encode_batch(texts)
        return [np.asarray(e.ids, dtype=np.int32) for e in encs]

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        return self._tok.decode(list(int(i) for i in ids),
                                skip_special_tokens=skip_special_tokens)

    def pad(self, ids: np.ndarray, length: int) -> np.ndarray:
        n = ids.shape[0]
        if n >= length:
            return ids[:length]
        pad = np.full(length - n, self.pad_token_id, dtype=ids.dtype)
        if self.padding_side == "left":
            return np.concatenate([pad, ids])
        return np.concatenate([ids, pad])


# --------------------------------------------------------------------------
# k-mer tokenizer (NTv2 artifact)
# --------------------------------------------------------------------------


class KmerTokenizer:
    """NTv2-style non-overlapping 6-mer tokenizer built from a `vocab.txt`
    wordpiece list (vocab 4107). Sequence is chunked into k-mers left to
    right; any chunk containing a non-ACGT character maps to the single-base
    fallback tokens / UNK, matching the EsmTokenizer behavior."""

    def __init__(self, path: str, k: int = 6):
        if os.path.isdir(path):
            path = os.path.join(path, "vocab.txt")
        with open(path) as f:
            words = [w.strip() for w in f if w.strip()]
        self.k = k
        self._vocab: Dict[str, int] = {w: i for i, w in enumerate(words)}
        self.cls_token_id = self._vocab.get("<cls>", 0)
        self.pad_token_id = self._vocab.get("<pad>", 1)
        self.mask_token_id = self._vocab.get("<mask>", 2)
        self.eos_token_id = self._vocab.get("<eos>", 3)
        self.unk_token_id = self._vocab.get("<unk>", 4)
        self.sep_token_id = self.eos_token_id
        self.padding_side = "left"

    @property
    def vocab_size(self) -> int:
        return len(self._vocab)

    @property
    def special_token_ids(self) -> List[int]:
        return [self.cls_token_id, self.pad_token_id, self.mask_token_id,
                self.eos_token_id, self.unk_token_id]

    def encode(self, text: str, add_special_tokens: bool = True) -> np.ndarray:
        text = text.upper()
        ids: List[int] = []
        i = 0
        n = len(text)
        while i < n:
            chunk = text[i:i + self.k]
            if len(chunk) == self.k and chunk in self._vocab:
                ids.append(self._vocab[chunk])
                i += self.k
            else:
                ids.append(self._vocab.get(text[i], self.unk_token_id))
                i += 1
        if add_special_tokens:
            ids = [self.cls_token_id] + ids
        return np.asarray(ids, dtype=np.int32)

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        inv = {v: k for k, v in self._vocab.items()}
        out = []
        for i in ids:
            tok = inv.get(int(i), "<unk>")
            if skip_special_tokens and tok.startswith("<"):
                continue
            out.append(tok)
        return "".join(out)

    def pad(self, ids: np.ndarray, length: int) -> np.ndarray:
        n = ids.shape[0]
        if n >= length:
            return ids[:length]
        pad = np.full(length - n, self.pad_token_id, dtype=ids.dtype)
        if self.padding_side == "left":
            return np.concatenate([pad, ids])
        return np.concatenate([ids, pad])


# --------------------------------------------------------------------------
# Factory
# --------------------------------------------------------------------------

_DEFAULT_BPE = "/root/reference/DNABERT-2-117M"
_DEFAULT_KMER = "/root/reference/nucleotide-transformer-v2-500m-multi-species"


def get_tokenizer(name: str, path: Optional[str] = None, **kw):
    if name == "char":
        return CharTokenizer(**kw)
    if name == "bpe":
        return BPETokenizer(path or _DEFAULT_BPE)
    if name == "kmer":
        return KmerTokenizer(path or _DEFAULT_KMER, **kw)
    raise ValueError(f"unknown tokenizer {name!r}")
