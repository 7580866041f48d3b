"""FASTA + BED interval reading and the hg38 pretraining datasets.

Replaces pyfaidx + `HG38Dataset`/`FastaInterval`
(`src/dataloaders/datasets/hg38_dataset.py:41-225`) and the bed-driven
datamodules (`src/dataloaders/genomics.py:36-226`, `1059-1254`).

`FastaFile` memory-maps the FASTA and serves random access through a
.fai-style index (built on first use if absent — same layout as samtools
faidx: name, length, offset, linebases, linewidth).

Interval semantics match the reference exactly
(`hg38_dataset.py:72-124`): intervals shorter than max_length are expanded
symmetrically, clamped to chromosome bounds, optionally '.'-padded to fixed
length; longer intervals are truncated; optional reverse-complement
augmentation by coin flip; optional random shift augmentation.
"""

from __future__ import annotations

import mmap
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

_COMP = bytes.maketrans(b"ACGTacgtNn.", b"TGCAtgcaNn.")


def reverse_complement(seq: str) -> str:
    return seq.translate(_COMP)[::-1]


class FastaFile:
    """Random access over a FASTA file via mmap + .fai index."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        fai = path + ".fai"
        if os.path.exists(fai):
            self.index = self._read_fai(fai)
        else:
            self.index = self._build_index()
            try:
                self._write_fai(fai)
            except OSError:
                pass  # read-only location

    @staticmethod
    def _read_fai(path: str) -> Dict[str, Tuple[int, int, int, int]]:
        idx = {}
        with open(path) as f:
            for line in f:
                name, length, offset, linebases, linewidth = \
                    line.strip().split("\t")[:5]
                idx[name] = (int(length), int(offset), int(linebases),
                             int(linewidth))
        return idx

    def _write_fai(self, path: str):
        with open(path, "w") as f:
            for name, (length, offset, lb, lw) in self.index.items():
                f.write(f"{name}\t{length}\t{offset}\t{lb}\t{lw}\n")

    def _build_index(self) -> Dict[str, Tuple[int, int, int, int]]:
        idx: Dict[str, Tuple[int, int, int, int]] = {}
        mm = self._mm
        pos = 0
        size = len(mm)
        while pos < size:
            if mm[pos:pos + 1] != b">":
                raise ValueError(f"malformed FASTA at byte {pos}")
            eol = mm.find(b"\n", pos)
            header = mm[pos + 1:eol].split()[0].decode()
            seq_start = eol + 1
            # scan lines until next header or EOF
            line_end = mm.find(b"\n", seq_start)
            if line_end == -1:
                line_end = size
            linebases = line_end - seq_start
            linewidth = linebases + 1
            total = 0
            p = seq_start
            while p < size and mm[p:p + 1] != b">":
                le = mm.find(b"\n", p)
                if le == -1:
                    le = size
                total += le - p
                p = le + 1
            idx[header] = (total, seq_start, max(linebases, 1),
                           max(linewidth, 2))
            pos = p
        return idx

    @property
    def names(self) -> List[str]:
        return list(self.index)

    def length(self, name: str) -> int:
        return self.index[name][0]

    def fetch(self, name: str, start: int, end: int) -> str:
        """0-based half-open; bounds must be pre-clamped."""
        length, offset, lb, lw = self.index[name]
        start = max(0, start)
        end = min(length, end)
        if end <= start:
            return ""
        byte_start = offset + (start // lb) * lw + start % lb
        byte_end = offset + ((end - 1) // lb) * lw + (end - 1) % lb + 1
        raw = self._mm[byte_start:byte_end]
        return raw.replace(b"\n", b"").replace(b"\r", b"").decode("ascii")

    def close(self):
        self._mm.close()
        self._f.close()


@dataclass
class BedRecord:
    chrom: str
    start: int
    end: int
    split: Optional[str] = None


def read_bed(path: str, split: Optional[str] = None) -> List[BedRecord]:
    """Read a bed file; if a 4th column exists it is the split name
    (reference `human-sequences.bed` layout used at `hg38_dataset.py:141-152`)."""
    out = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split("\t")
            if len(parts) < 3 or line.startswith(("#", "track")):
                continue
            rec = BedRecord(parts[0], int(parts[1]), int(parts[2]),
                            parts[3] if len(parts) > 3 else None)
            if split is None or rec.split == split:
                out.append(rec)
    return out


class FastaInterval:
    """Interval query with the reference's expansion/clamping/rc-aug
    semantics (`hg38_dataset.py:72-124`)."""

    def __init__(self, fasta: FastaFile, *, rc_aug: bool = False,
                 pad_interval: bool = False,
                 shift_augs: Optional[Tuple[int, int]] = None):
        self.fasta = fasta
        self.rc_aug = rc_aug
        self.pad_interval = pad_interval
        self.shift_augs = shift_augs

    def __call__(self, chrom: str, start: int, end: int, max_length: int,
                 rng: Optional[np.random.Generator] = None) -> str:
        rng = rng or np.random.default_rng()
        chrom_len = self.fasta.length(chrom)
        interval_length = end - start

        if self.shift_augs is not None:
            min_shift, max_shift = self.shift_augs
            min_shift = max(start + min_shift, 0) - start
            max_shift = min(end + max_shift + 1, chrom_len) - end
            if max_shift > min_shift:
                shift = int(rng.integers(min_shift, max_shift))
                start += shift
                end += shift

        left_padding = right_padding = 0
        if interval_length < max_length:
            extra = max_length - interval_length
            start -= extra // 2
            end += extra - extra // 2
        if start < 0:
            left_padding = -start
            start = 0
        if end > chrom_len:
            right_padding = end - chrom_len
            end = chrom_len
        if interval_length > max_length:
            end = start + max_length

        seq = self.fasta.fetch(chrom, start, end)
        if self.rc_aug and rng.random() < 0.5:
            seq = reverse_complement(seq)
        if self.pad_interval:
            seq = "." * left_padding + seq + "." * right_padding
        return seq


class HG38Dataset:
    """Causal-LM pretraining over (bed, fasta): tokenize the window, emit
    `(seq[:-1], seq[1:])` (reference `hg38_dataset.py:222-224`)."""

    def __init__(self, bed_path: str, fasta_path: str, tokenizer, *,
                 split: str = "train", max_length: int = 1024,
                 rc_aug: bool = False, pad_max_length: Optional[int] = None,
                 seed: int = 0):
        self.records = read_bed(bed_path, split=split)
        if not self.records:
            raise ValueError(f"no intervals for split {split!r} in {bed_path}")
        self.fasta = FastaFile(fasta_path)
        self.interval = FastaInterval(self.fasta, rc_aug=rc_aug)
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.pad_max_length = pad_max_length or max_length
        self.seed = seed

    def __len__(self):
        return len(self.records)

    def _window(self, idx: int) -> np.ndarray:
        rec = self.records[idx]
        rng = np.random.default_rng((self.seed, idx))
        # +1 base so the causal shift keeps max_length tokens
        seq = self.interval(rec.chrom, rec.start, rec.end,
                            self.max_length + 1, rng)
        ids = self.tokenizer.encode(seq.upper().replace(".", "N"),
                                    add_special_tokens=False)
        return self.tokenizer.pad(ids, self.pad_max_length + 1)

    def __getitem__(self, idx: int):
        ids = self._window(idx)
        return {"input_ids": ids[:-1].astype(np.int32),
                "labels": ids[1:].astype(np.int32)}


class BertHG38Dataset(HG38Dataset):
    """MLM variant (reference `BertHG38Dataset`, `hg38_dataset.py:288-399`):
    emits the `(masked, mask, labels)` contract."""

    def __init__(self, *args, mlm_probability: float = 0.15,
                 random_token_prob: float = 0.1,
                 unchanged_token_prob: float = 0.1, **kw):
        super().__init__(*args, **kw)
        self.mlm_probability = mlm_probability
        self.random_token_prob = random_token_prob
        self.unchanged_token_prob = unchanged_token_prob

    def __getitem__(self, idx: int):
        from dna_tpu.data import masking

        ids = self._window(idx)[:-1]
        rng = np.random.default_rng((self.seed, idx, 1))
        masked, mask, labels = masking.bert_mask_numpy(
            ids, rng,
            mask_token_id=self.tokenizer.mask_token_id,
            pad_token_id=self.tokenizer.pad_token_id,
            vocab_size=self.tokenizer.vocab_size,
            special_token_ids=self.tokenizer.special_token_ids,
            mask_prob=self.mlm_probability,
            random_token_prob=self.random_token_prob,
            unchanged_token_prob=self.unchanged_token_prob)
        return {"input_ids": masked.astype(np.int32),
                "mask": mask,
                "labels": labels.astype(np.int32),
                "attention_mask": (ids != self.tokenizer.pad_token_id
                                   ).astype(np.int32)}
