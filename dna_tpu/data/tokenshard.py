"""Offline-pretokenized token shards: the TPU-host input format for scale.

The reference's input pipeline tokenizes per sample in Python DataLoader
workers (pyfaidx + BPE at 12 workers, its own CPU bottleneck —
`configs/experiment/hg38/hg38_hyena.yaml:82`, SURVEY §7.3). TPU hosts want
the opposite: tokenize ONCE offline (`scripts/pretokenize.py`), store
fixed-length uint16 token rows in `.npy` shards, and memory-map them at
train time — __getitem__ is then a pure numpy row view + (for MLM) the
seeded mask, with zero tokenizer work on the hot path.

Layout under `data.dest_path`:
    meta.json                {"tokenizer": ..., "max_length": L,
                              "vocab_size": V, "splits": {"train": n, ...}}
    <split>-<k>.npy          uint16 [rows, L] (pad-filled)

Registry name: `token_shards`; `data.dataset_name` picks the objective
("mlm" default, or "lm" for causal pairs).
"""

from __future__ import annotations

import json
import os
from bisect import bisect_right
from pathlib import Path
from typing import List

import numpy as np

from dna_tpu import registry


class TokenShardDataset:
    def __init__(self, shard_dir: str, tokenizer, *, split: str = "train",
                 objective: str = "mlm", max_length: int = 128,
                 mlm_probability: float = 0.15, seed: int = 0):
        base = Path(shard_dir)
        meta_path = base / "meta.json"
        if not meta_path.exists():
            raise FileNotFoundError(meta_path)
        self.meta = json.loads(meta_path.read_text())
        if split in ("val", "test") and split not in self.meta["splits"]:
            # pretrain corpora ship train+dev (reference dnabert2 layout)
            split = "dev" if "dev" in self.meta["splits"] else split
        paths = sorted(base.glob(f"{split}-*.npy"))
        if not paths:
            raise FileNotFoundError(f"no {split}-*.npy under {base}")
        # mmap: rows are touched lazily, shards can exceed host RAM
        self.shards: List[np.ndarray] = [np.load(p, mmap_mode="r")
                                         for p in paths]
        self.offsets = np.cumsum([0] + [s.shape[0] for s in self.shards])
        stored_len = self.shards[0].shape[1]
        if max_length > stored_len:
            raise ValueError(f"max_length {max_length} exceeds stored row "
                             f"length {stored_len}")
        self.max_length = max_length
        self.tokenizer = tokenizer
        self.objective = objective
        self.mlm_probability = mlm_probability
        self.seed = seed

    def __len__(self):
        return int(self.offsets[-1])

    def _row(self, idx: int) -> np.ndarray:
        s = bisect_right(self.offsets, idx) - 1
        return np.asarray(self.shards[s][idx - self.offsets[s],
                                         : self.max_length], np.int32)

    def __getitem__(self, idx: int):
        ids = self._row(idx)
        if self.objective == "lm":
            return {"input_ids": ids[:-1], "labels": ids[1:]}
        from dna_tpu.data import masking

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


def write_shards(rows_iter, out_dir: str, *, split: str, max_length: int,
                 tokenizer_name: str, vocab_size: int, pad_id: int = 0,
                 pad_left: bool = True, rows_per_shard: int = 1 << 20) -> int:
    """Pack an iterator of token-id lists into `<split>-<k>.npy` shards +
    update meta.json. Returns total rows written."""
    os.makedirs(out_dir, exist_ok=True)
    assert vocab_size <= np.iinfo(np.uint16).max + 1
    buf: List[np.ndarray] = []
    total = 0
    shard_i = 0

    def flush():
        nonlocal buf, shard_i
        if not buf:
            return
        arr = np.stack(buf)
        np.save(os.path.join(out_dir, f"{split}-{shard_i:05d}.npy"), arr)
        shard_i += 1
        buf = []

    for ids in rows_iter:
        # left-pad by default: matches the reference DNABERT-2 dataset
        # (`dnabert2.py:238-245`) and this repo's tokenizer.pad()
        row = np.full(max_length, pad_id, np.uint16)
        ids = np.asarray(ids[:max_length], np.uint16)
        if pad_left:
            row[max_length - len(ids):] = ids
        else:
            row[: len(ids)] = ids
        buf.append(row)
        total += 1
        if len(buf) >= rows_per_shard:
            flush()
    flush()

    meta_path = os.path.join(out_dir, "meta.json")
    meta = {"tokenizer": tokenizer_name, "max_length": max_length,
            "vocab_size": vocab_size, "splits": {}}
    if os.path.exists(meta_path):
        meta = json.loads(open(meta_path).read())
    meta["splits"][split] = total
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return total


@registry.dataset.register("token_shards")
def _token_shards(tokenizer, cfg):
    from dna_tpu.data.genomics import _real_or_synth

    objective = cfg.dataset_name or "mlm"
    synth = "synthetic_lm" if objective == "lm" else "synthetic_mlm"

    def build():
        return TokenShardDataset(
            cfg.dest_path, tokenizer, split=cfg.split, objective=objective,
            max_length=cfg.max_length, mlm_probability=cfg.mlm_probability,
            seed=cfg.seed)

    return _real_or_synth(tokenizer, cfg, ("dest_path",), synth, build)
