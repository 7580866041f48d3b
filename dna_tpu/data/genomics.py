"""Downstream genomics task datasets.

Re-designs of the reference's finetune datamodules (SURVEY §2.4), reading
the same on-disk formats:

  * `NucleotideTransformerDataset` — one FASTA per split, label = last char
    of the record name (`nucleotide_transformer_dataset.py:66-113`); 18 task
    cards in `configs/dataset/nucleotide_transformer.yaml:15-105`
  * `GenomicBenchmarkDataset` — per-class directories of .txt sequence files
    (`genomic_bench_dataset.py`); 8 task cards
  * `GUEDataset` — csv with sequence,label columns (`gue.py:80-110`)
  * `DeepSEADataset` — .npz with sequences (N,L,4 one-hot or ids) + 919-dim
    targets (`deepsea.py:168-199`)
  * `DeepSTARRDataset` — FASTA + tab table with Dev/Hk log2 activities
    (`deepstarr.py:196-225`)
  * `SpeciesDataset` — random (species, chromosome, offset) windows with
    species-id labels (`species_dataset.py:28-300`)

All emit the classification/regression batch contract
{"input_ids": [L] int32, "labels": scalar or vector} (+ attention_mask when
padding) — SURVEY Appendix A.
"""

from __future__ import annotations

import csv
import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from dna_tpu import registry
from dna_tpu.data.fasta import FastaFile, reverse_complement

# Task cards (train_len, n_classes, seq_len, metric) from
# `configs/dataset/nucleotide_transformer.yaml:15-105`.
NT_TASKS: Dict[str, Tuple[int, int, int, str]] = {
    "enhancers": (14968, 2, 200, "mcc"),
    "enhancers_types": (14968, 3, 200, "mcc"),
    "H3": (13468, 2, 500, "mcc"),
    "H3K4me1": (28509, 2, 500, "mcc"),
    "H3K4me2": (27614, 2, 500, "mcc"),
    "H3K4me3": (33119, 2, 500, "mcc"),
    "H3K9ac": (25003, 2, 500, "mcc"),
    "H3K14ac": (29743, 2, 500, "mcc"),
    "H3K36me3": (31392, 2, 500, "mcc"),
    "H3K79me3": (25953, 2, 500, "mcc"),
    "H4": (13140, 2, 500, "mcc"),
    "H4ac": (30685, 2, 500, "mcc"),
    "promoter_all": (53276, 2, 300, "f1"),
    "promoter_no_tata": (47759, 2, 300, "f1"),
    "promoter_tata": (5517, 2, 300, "f1"),
    "splice_sites_acceptors": (19961, 2, 600, "f1"),
    "splice_sites_donors": (19775, 2, 600, "f1"),
    "splice_sites_all": (27000, 3, 600, "f1"),
}

# `configs/dataset/genomic_benchmark.yaml:14-40`.
GB_TASKS: Dict[str, Tuple[int, int, int]] = {
    "dummy_mouse_enhancers_ensembl": (1210, 2, 4707),
    "demo_coding_vs_intergenomic_seqs": (100_000, 2, 200),
    "demo_human_or_worm": (100_000, 2, 200),
    "human_enhancers_cohn": (27791, 2, 500),
    "human_enhancers_ensembl": (154842, 2, 573),
    "human_ensembl_regulatory": (289061, 3, 802),
    "human_nontata_promoters": (36131, 2, 251),
    "human_ocr_ensembl": (174756, 2, 593),
}


def _tokenize_fixed(tokenizer, seq: str, max_length: int,
                    use_padding: bool = True) -> np.ndarray:
    ids = tokenizer.encode(seq, add_special_tokens=False)
    ids = ids[:max_length]
    if use_padding:
        ids = tokenizer.pad(ids, max_length)
    return ids.astype(np.int32)


class _ClassificationBase:
    tokenizer = None
    max_length = 0
    rc_aug = False
    seed = 0

    def _encode(self, idx: int, seq: str, label) -> Dict[str, np.ndarray]:
        if self.rc_aug:
            rng = np.random.default_rng((self.seed, idx))
            if rng.random() < 0.5:
                seq = reverse_complement(seq)
        ids = _tokenize_fixed(self.tokenizer, seq.upper(), self.max_length)
        return {"input_ids": ids,
                "labels": np.asarray(label),
                "attention_mask": (ids != self.tokenizer.pad_token_id
                                   ).astype(np.int32)}


class NucleotideTransformerDataset(_ClassificationBase):
    def __init__(self, dest_path: str, dataset_name: str, tokenizer, *,
                 split: str = "train", max_length: Optional[int] = None,
                 rc_aug: bool = False, seed: int = 0):
        if split == "val":  # reference: no val split, use test
            split = "test"
        base = Path(dest_path) / dataset_name
        fasta_path = None
        for f in base.iterdir():
            if f.suffix == ".fasta" and split in f.name:
                fasta_path = str(f)
        if fasta_path is None:
            raise FileNotFoundError(f"no {split} fasta under {base}")
        self.fasta = FastaFile(fasta_path)
        self.names = self.fasta.names
        self.labels = [int(n.rstrip()[-1]) for n in self.names]
        self.tokenizer = tokenizer
        self.max_length = max_length or NT_TASKS.get(dataset_name,
                                                     (0, 2, 500, "mcc"))[2]
        self.rc_aug = rc_aug
        self.seed = seed

    def __len__(self):
        return len(self.names)

    def __getitem__(self, idx):
        name = self.names[idx]
        seq = self.fasta.fetch(name, 0, self.fasta.length(name))
        return self._encode(idx, seq, np.int32(self.labels[idx]))


class GenomicBenchmarkDataset(_ClassificationBase):
    """Reads the `genomic_benchmarks` on-disk layout: dest_path/name/split/
    <class_name>/*.txt, one sequence per file
    (`genomic_bench_dataset.py:120-216`)."""

    def __init__(self, dest_path: str, dataset_name: str, tokenizer, *,
                 split: str = "train", max_length: Optional[int] = None,
                 rc_aug: bool = False, seed: int = 0):
        base = Path(dest_path) / dataset_name / split
        if not base.exists():
            raise FileNotFoundError(base)
        self.paths: List[Tuple[Path, int]] = []
        for ci, cls_dir in enumerate(sorted(p for p in base.iterdir()
                                            if p.is_dir())):
            for f in sorted(cls_dir.glob("*.txt")):
                self.paths.append((f, ci))
        self.tokenizer = tokenizer
        self.max_length = max_length or GB_TASKS.get(dataset_name,
                                                     (0, 2, 512))[2]
        self.rc_aug = rc_aug
        self.seed = seed

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx):
        path, label = self.paths[idx]
        seq = path.read_text().strip()
        return self._encode(idx, seq, np.int32(label))


class GUEDataset(_ClassificationBase):
    """DNABERT-2's GUE suite: csv with `sequence,label` header
    (`gue.py:80-110`)."""

    def __init__(self, dest_path: str, dataset_name: str, tokenizer, *,
                 split: str = "train", max_length: int = 128,
                 rc_aug: bool = False, seed: int = 0):
        if split == "val":
            split = "dev"
        path = Path(dest_path) / dataset_name / f"{split}.csv"
        self.rows: List[Tuple[str, int]] = []
        with open(path) as f:
            for row in csv.DictReader(f):
                self.rows.append((row["sequence"], int(row["label"])))
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.rc_aug = rc_aug
        self.seed = seed

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, idx):
        seq, label = self.rows[idx]
        return self._encode(idx, seq, np.int32(label))


class DeepSEADataset(_ClassificationBase):
    """919-label chromatin profile; npz with `sequences` (ids or one-hot)
    and `targets` [N, 919] (`deepsea.py`)."""

    def __init__(self, npz_path: str, tokenizer=None, *, split: str = "train",
                 max_length: int = 1000, seed: int = 0):
        data = np.load(npz_path)
        self.seqs = data[f"{split}_seqs"] if f"{split}_seqs" in data \
            else data["seqs"]
        self.targets = data[f"{split}_targets"] if f"{split}_targets" in data \
            else data["targets"]
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.seed = seed

    def __len__(self):
        return len(self.seqs)

    def __getitem__(self, idx):
        seq = self.seqs[idx]
        if seq.ndim == 2:  # one-hot [L, 4] → ids with N for all-zero rows
            ids = np.where(seq.sum(-1) == 0, 4, seq.argmax(-1)).astype(np.int32)
        else:
            ids = seq.astype(np.int32)
        return {"input_ids": ids[: self.max_length],
                "labels": self.targets[idx].astype(np.float32)}


class DeepSTARRDataset(_ClassificationBase):
    """Enhancer-activity regression: FASTA + tab-separated activity table
    with Dev/Hk columns (`deepstarr.py:196-225`)."""

    def __init__(self, dest_path: str, tokenizer, *, split: str = "train",
                 max_length: int = 249, seed: int = 0):
        split_name = {"train": "Train", "val": "Val", "test": "Test"}[split]
        base = Path(dest_path)
        self.fasta = FastaFile(str(base / f"Sequences_{split_name}.fa"))
        self.names = self.fasta.names
        acts = {}
        with open(base / f"Sequences_activity_{split_name}.txt") as f:
            reader = csv.DictReader(f, delimiter="\t")
            for i, row in enumerate(reader):
                acts[i] = (float(row["Dev_log2_enrichment"]),
                           float(row["Hk_log2_enrichment"]))
        self.acts = acts
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.seed = seed

    def __len__(self):
        return len(self.names)

    def __getitem__(self, idx):
        name = self.names[idx]
        seq = self.fasta.fetch(name, 0, self.fasta.length(name))
        ids = _tokenize_fixed(self.tokenizer, seq.upper(), self.max_length)
        return {"input_ids": ids,
                "labels": np.asarray(self.acts[idx], dtype=np.float32)}


class SpeciesDataset(_ClassificationBase):
    """Species classification: sample a random window from a random
    chromosome of the labeled species (`species_dataset.py:28-300`).
    `fastas` maps species name → FASTA path; chromosome train/val/test
    splits by name."""

    CHR_SPLITS = {
        "train": None,  # all but val/test chromosomes
        "val": {"chr21", "21"},
        "test": {"chr22", "22"},
    }

    def __init__(self, fastas: Dict[str, str], tokenizer, *,
                 split: str = "train", max_length: int = 1024,
                 total_size: int = 10_000, rc_aug: bool = False,
                 seed: int = 0):
        self.species = sorted(fastas)
        self.files = {s: FastaFile(p) for s, p in fastas.items()}
        holdout = (self.CHR_SPLITS["val"] | self.CHR_SPLITS["test"])
        self.chroms: Dict[str, List[str]] = {}
        for s, f in self.files.items():
            names = f.names
            if split == "train":
                use = [n for n in names if n not in holdout] or names
            else:
                want = self.CHR_SPLITS[split]
                use = [n for n in names if n in want] or names
            self.chroms[s] = use
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.total_size = total_size
        self.rc_aug = rc_aug
        self.seed = seed

    def __len__(self):
        return self.total_size

    def __getitem__(self, idx):
        rng = np.random.default_rng((self.seed, idx))
        label = int(rng.integers(0, len(self.species)))
        s = self.species[label]
        f = self.files[s]
        chrom = self.chroms[s][int(rng.integers(0, len(self.chroms[s])))]
        clen = f.length(chrom)
        start = int(rng.integers(0, max(clen - self.max_length, 1)))
        seq = f.fetch(chrom, start, start + self.max_length)
        return self._encode(idx, seq, np.int32(label))


# ---- registry entries keyed like the reference datamodules ----
#
# Every file-backed factory degrades to the matching synthetic stand-in when
# its required paths are unset (this environment ships no genome assets), so
# the full experiment catalog is runnable by config either way — set
# `data.dest_path`/`data.fasta_path` to train on real data (reference
# datamodule auto-registration, `src/dataloaders/base.py:181-183`).

import warnings


def _real_or_synth(tokenizer, cfg, required: Sequence[str], synth: str,
                   build_real):
    missing = [f for f in required if getattr(cfg, f) in (None, "")]
    if missing:
        warnings.warn(
            f"dataset {cfg.dataset!r}: data.{'/'.join(missing)} not set — "
            f"falling back to synthetic stand-in {synth!r}", stacklevel=3)
        return registry.dataset[synth](tokenizer, cfg)
    return build_real()


@registry.dataset.register("nucleotide_transformer")
def _nt(tokenizer, cfg):
    return _real_or_synth(
        tokenizer, cfg, ("dest_path",), "synthetic_cls",
        lambda: NucleotideTransformerDataset(
            cfg.dest_path, cfg.dataset_name or "H4", tokenizer,
            split=cfg.split, max_length=cfg.max_length, rc_aug=cfg.rc_aug,
            seed=cfg.seed))


@registry.dataset.register("genomic_benchmark")
def _gb(tokenizer, cfg):
    return _real_or_synth(
        tokenizer, cfg, ("dest_path",), "synthetic_cls",
        lambda: GenomicBenchmarkDataset(
            cfg.dest_path, cfg.dataset_name or "human_nontata_promoters",
            tokenizer, split=cfg.split, max_length=cfg.max_length,
            rc_aug=cfg.rc_aug, seed=cfg.seed))


@registry.dataset.register("gue")
def _gue(tokenizer, cfg):
    """GUE suite: `dest_path/<dataset_name>/{train,dev,test}.csv`."""
    return _real_or_synth(
        tokenizer, cfg, ("dest_path",), "synthetic_cls",
        lambda: GUEDataset(
            cfg.dest_path, cfg.dataset_name or "prom/prom_300_all", tokenizer,
            split=cfg.split, max_length=cfg.max_length, rc_aug=cfg.rc_aug,
            seed=cfg.seed))


@registry.dataset.register("deepsea")
def _deepsea(tokenizer, cfg):
    """`dest_path` = .npz with `{split}_seqs`/`{split}_targets` (or plain
    `seqs`/`targets`) arrays."""
    return _real_or_synth(
        tokenizer, cfg, ("dest_path",), "synthetic_multilabel",
        lambda: DeepSEADataset(cfg.dest_path, tokenizer, split=cfg.split,
                               max_length=cfg.max_length, seed=cfg.seed))


@registry.dataset.register("deepstarr")
def _deepstarr(tokenizer, cfg):
    """`dest_path` = dir with `Sequences_{Train,Val,Test}.fa` +
    `Sequences_activity_*.txt` (reference `deepstarr.py:196-225`)."""
    return _real_or_synth(
        tokenizer, cfg, ("dest_path",), "synthetic_reg",
        lambda: DeepSTARRDataset(cfg.dest_path, tokenizer, split=cfg.split,
                                 max_length=cfg.max_length, seed=cfg.seed))


@registry.dataset.register("species")
def _species(tokenizer, cfg):
    """`dest_path` = dir of per-species FASTA files; the species label is the
    file stem (reference `species_dataset.py:28-300` species list)."""

    def build():
        base = Path(cfg.dest_path)
        fastas = {p.stem: str(p) for p in sorted(base.iterdir())
                  if p.suffix in (".fa", ".fasta", ".fna")}
        if not fastas:
            raise FileNotFoundError(f"no FASTA files under {base}")
        return SpeciesDataset(fastas, tokenizer, split=cfg.split,
                              max_length=cfg.max_length,
                              total_size=cfg.num_samples, rc_aug=cfg.rc_aug,
                              seed=cfg.seed)

    return _real_or_synth(tokenizer, cfg, ("dest_path",), "synthetic_cls",
                          build)


@registry.dataset.register("chromatin_profile")
def _chromatin_profile(tokenizer, cfg):
    """`dest_path` = coordinate/target CSV (per split via `{split}` substring
    or a single file), `fasta_path` = reference genome."""

    def build():
        path = Path(cfg.dest_path)
        if path.is_dir():
            matches = sorted(path.glob(f"*{cfg.split}*.csv")) or \
                sorted(path.glob("*.csv"))
            if not matches:
                raise FileNotFoundError(f"no csv under {path}")
            path = matches[0]
        return ChromatinProfileDataset(str(path), cfg.fasta_path, tokenizer,
                                       max_length=cfg.max_length,
                                       seed=cfg.seed)

    return _real_or_synth(tokenizer, cfg, ("dest_path", "fasta_path"),
                          "synthetic_multilabel", build)


@registry.dataset.register("dnaberts")
def _dnaberts(tokenizer, cfg):
    """DNABERT-S pair corpus: `dest_path` = csv with seq_a/seq_b columns;
    `dataset_name` picks the column (default seq_a)."""
    return _real_or_synth(
        tokenizer, cfg, ("dest_path",), "synthetic_mlm",
        lambda: DNABertSPairDataset(
            cfg.dest_path, tokenizer,
            seq_name=cfg.dataset_name or "seq_a", max_length=cfg.max_length,
            mlm_probability=cfg.mlm_probability, seed=cfg.seed))


@registry.dataset.register("hg38_fixed")
def _hg38_fixed(tokenizer, cfg):
    """Deterministic eval windows; `dataset_name` = comma-separated
    chromosome list (default chr14, Enformer-style)."""
    return _real_or_synth(
        tokenizer, cfg, ("fasta_path",), "synthetic_lm",
        lambda: HG38FixedDataset(
            cfg.fasta_path, tokenizer,
            chromosomes=tuple((cfg.dataset_name or "chr14").split(",")),
            max_length=cfg.max_length,
            mlm_probability=cfg.mlm_probability, seed=cfg.seed))


@registry.dataset.register("hg38")
def _hg38(tokenizer, cfg):
    from dna_tpu.data.fasta import HG38Dataset

    split = {"val": "valid"}.get(cfg.split, cfg.split)  # bed naming
    return _real_or_synth(
        tokenizer, cfg, ("bed_path", "fasta_path"), "synthetic_lm",
        lambda: HG38Dataset(cfg.bed_path, cfg.fasta_path, tokenizer,
                            split=split, max_length=cfg.max_length,
                            rc_aug=cfg.rc_aug, seed=cfg.seed))


@registry.dataset.register("bert_hg38")
def _bert_hg38(tokenizer, cfg):
    from dna_tpu.data.fasta import BertHG38Dataset

    split = {"val": "valid"}.get(cfg.split, cfg.split)
    return _real_or_synth(
        tokenizer, cfg, ("bed_path", "fasta_path"), "synthetic_mlm",
        lambda: BertHG38Dataset(cfg.bed_path, cfg.fasta_path, tokenizer,
                                split=split, max_length=cfg.max_length,
                                rc_aug=cfg.rc_aug,
                                mlm_probability=cfg.mlm_probability,
                                seed=cfg.seed))


@registry.dataset.register("dnabert2")
def _dnabert2(tokenizer, cfg):
    """Flagship pretrain corpus: `dest_path` = dir with `{split}.bin` +
    `{split}_padding_info.json` (2-bit packed rows, reference
    `dnabert2.py:137-245`; val/test map to `dev` like the reference)."""
    from dna_tpu.data.twobit import DNABert2PretrainDataset, TwoBitCorpus

    def build():
        split = cfg.split if cfg.split not in ("val", "test") else "dev"
        base = Path(cfg.dest_path)
        bin_path = base / f"{split}.bin"
        sidecar = base / f"{split}_padding_info.json"
        if not bin_path.exists():
            raise FileNotFoundError(bin_path)
        corpus = TwoBitCorpus(str(bin_path), str(sidecar))
        return DNABert2PretrainDataset(
            corpus, tokenizer, max_length=cfg.max_length,
            mlm_probability=cfg.mlm_probability, seed=cfg.seed)

    return _real_or_synth(tokenizer, cfg, ("dest_path",), "synthetic_mlm",
                          build)


class DNABertSPairDataset(_ClassificationBase):
    """DNABERT-S pair corpus: CSV with `seq_a`,`seq_b` columns; one column
    selected per instance for MLM pretraining (reference `DNABERTSDataset`,
    `datasets/dnaberts.py:105-180`)."""

    def __init__(self, csv_path: str, tokenizer, *, seq_name: str = "seq_a",
                 max_length: int = 128, mlm_probability: float = 0.15,
                 seed: int = 0):
        assert seq_name in ("seq_a", "seq_b")
        self.rows: List[str] = []
        with open(csv_path) as f:
            for row in csv.DictReader(f):
                self.rows.append(row[seq_name])
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.mlm_probability = mlm_probability
        self.seed = seed

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, idx):
        from dna_tpu.data import masking

        ids = _tokenize_fixed(self.tokenizer, self.rows[idx].upper(),
                              self.max_length)
        rng = np.random.default_rng((self.seed, idx))
        masked, mask, labels = masking.bert_mask_numpy(
            ids, rng,
            mask_token_id=self.tokenizer.mask_token_id,
            pad_token_id=self.tokenizer.pad_token_id,
            vocab_size=self.tokenizer.vocab_size,
            special_token_ids=self.tokenizer.special_token_ids,
            mask_prob=self.mlm_probability)
        return {"input_ids": masked.astype(np.int32), "mask": mask,
                "labels": labels.astype(np.int32),
                "attention_mask": (ids != self.tokenizer.pad_token_id
                                   ).astype(np.int32)}


class ChromatinProfileDataset(_ClassificationBase):
    """hg19/hg38 coordinate CSV + per-row binary target vector columns
    (DeepSEA-style; reference `chromatin_profile_dataset.py`). CSV columns:
    Chr_No (or chrom), Start, plus y_* target columns."""

    def __init__(self, csv_path: str, fasta_path: str, tokenizer, *,
                 max_length: int = 1000, seed: int = 0):
        self.fasta = FastaFile(fasta_path)
        self.coords: List[Tuple[str, int]] = []
        targets: List[List[float]] = []
        with open(csv_path) as f:
            reader = csv.DictReader(f)
            ycols = [c for c in reader.fieldnames if c.startswith("y")]
            for row in reader:
                chrom = row.get("Chr_No") or row.get("chrom") or row.get("Chr")
                self.coords.append((chrom, int(row.get("Start")
                                               or row.get("start"))))
                targets.append([float(row[c]) for c in ycols])
        self.targets = np.asarray(targets, dtype=np.float32)
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.seed = seed

    def __len__(self):
        return len(self.coords)

    def __getitem__(self, idx):
        chrom, start = self.coords[idx]
        seq = self.fasta.fetch(chrom, start, start + self.max_length)
        ids = _tokenize_fixed(self.tokenizer, seq.upper(), self.max_length)
        return {"input_ids": ids, "labels": self.targets[idx]}


class HG38FixedDataset:
    """Deterministic non-overlapping fixed-length windows over given
    chromosomes, for apples-to-apples eval (reference `HG38FixedDataset`,
    `genomics.py:700-763`, Enformer-style chr14/chrX ranges)."""

    def __init__(self, fasta_path: str, tokenizer, *,
                 chromosomes: Sequence[str] = ("chr14",),
                 max_length: int = 1024, mlm: bool = False,
                 mlm_probability: float = 0.15, seed: int = 0):
        self.fasta = FastaFile(fasta_path)
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.mlm = mlm
        self.mlm_probability = mlm_probability
        self.seed = seed
        self.windows: List[Tuple[str, int]] = []
        for c in chromosomes:
            clen = self.fasta.length(c)
            for s in range(0, clen - max_length - 1, max_length):
                self.windows.append((c, s))

    def __len__(self):
        return len(self.windows)

    def __getitem__(self, idx):
        chrom, start = self.windows[idx]
        seq = self.fasta.fetch(chrom, start, start + self.max_length + 1)
        ids = self.tokenizer.encode(seq.upper(), add_special_tokens=False)
        ids = self.tokenizer.pad(ids, self.max_length + 1).astype(np.int32)
        if not self.mlm:
            return {"input_ids": ids[:-1], "labels": ids[1:]}
        from dna_tpu.data import masking

        rng = np.random.default_rng((self.seed, idx))
        masked, mask, labels = masking.bert_mask_numpy(
            ids[:-1], rng,
            mask_token_id=self.tokenizer.mask_token_id,
            pad_token_id=self.tokenizer.pad_token_id,
            vocab_size=self.tokenizer.vocab_size,
            special_token_ids=self.tokenizer.special_token_ids,
            mask_prob=self.mlm_probability)
        return {"input_ids": masked.astype(np.int32), "mask": mask,
                "labels": labels.astype(np.int32)}
