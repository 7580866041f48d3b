"""Generate the tiny committed data fixtures under tests/fixtures/.

One directory per dataset family, in the exact on-disk format the real
datamodule reads (reference format citations in `dna_tpu/data/genomics.py`
and `dna_tpu/data/twobit.py`). Deterministic (seed 0); re-run this script to
regenerate. Everything is intentionally tiny (tens of examples, ~100 bp) so
the CLI integration tests stay fast.

    python tests/fixtures/make_fixtures.py
"""

from __future__ import annotations

import csv
import os
import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent.parent))

from dna_tpu.data.twobit import convert_text_to_bin  # noqa: E402

RNG = np.random.default_rng(0)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def dna(n: int) -> str:
    return BASES[RNG.integers(0, 4, n)].tobytes().decode()


def write_fasta(path: Path, records):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for name, seq in records:
            f.write(f">{name}\n")
            for i in range(0, len(seq), 60):
                f.write(seq[i:i + 60] + "\n")


def main():
    # --- dnabert2: 2-bit .bin corpus + sidecar (train + dev) -------------
    d = HERE / "dnabert2"
    d.mkdir(parents=True, exist_ok=True)
    for split, rows in (("train", 48), ("dev", 16)):
        txt = d / f"{split}.txt"
        with open(txt, "w") as f:
            for _ in range(rows):
                f.write(dna(int(RNG.integers(80, 200))) + "\n")
        convert_text_to_bin(str(txt), str(d / f"{split}.bin"))
        txt.unlink()  # the training path reads only .bin + sidecar

    # --- gue: csv suite ---------------------------------------------------
    d = HERE / "gue" / "prom_demo"
    d.mkdir(parents=True, exist_ok=True)
    for split, rows in (("train", 48), ("dev", 16), ("test", 16)):
        with open(d / f"{split}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["sequence", "label"])
            for _ in range(rows):
                w.writerow([dna(100), int(RNG.integers(0, 2))])

    # --- nucleotide_transformer: per-task fasta, label = last name char ---
    d = HERE / "nt" / "H4"
    for split, rows in (("train", 48), ("test", 16)):
        recs = [(f"seq{i}|lab{int(RNG.integers(0, 2))}", dna(120))
                for i in range(rows)]
        write_fasta(d / f"{split}.fasta", recs)

    # --- genomic_benchmark: per-class dirs of .txt files -------------------
    d = HERE / "gb" / "demo_promoters"
    for split, rows in (("train", 24), ("test", 8)):
        for cls in ("negative", "positive"):
            cd = d / split / cls
            cd.mkdir(parents=True, exist_ok=True)
            for i in range(rows):
                (cd / f"{i}.txt").write_text(dna(100) + "\n")

    # --- deepsea: npz with one-hot seqs + targets --------------------------
    d = HERE / "deepsea"
    d.mkdir(parents=True, exist_ok=True)
    n_targets = 16
    arrs = {}
    for split, rows in (("train", 48), ("val", 16)):
        onehot = np.eye(4, dtype=np.int8)[RNG.integers(0, 4, (rows, 100))]
        arrs[f"{split}_seqs"] = onehot
        arrs[f"{split}_targets"] = (RNG.random((rows, n_targets)) < 0.1
                                    ).astype(np.int8)
    np.savez_compressed(d / "deepsea.npz", **arrs)

    # --- deepstarr: fasta + tab activity tables ----------------------------
    d = HERE / "deepstarr"
    for split, rows in (("Train", 48), ("Val", 16), ("Test", 16)):
        recs = [(f"enh{i}", dna(249)) for i in range(rows)]
        write_fasta(d / f"Sequences_{split}.fa", recs)
        with open(d / f"Sequences_activity_{split}.txt", "w") as f:
            f.write("Dev_log2_enrichment\tHk_log2_enrichment\n")
            for _ in range(rows):
                f.write(f"{RNG.normal():.4f}\t{RNG.normal():.4f}\n")

    # --- species: one fasta per species, with holdout chromosomes ----------
    d = HERE / "species"
    for sp in ("human_demo", "mouse_demo"):
        write_fasta(d / f"{sp}.fa", [("chr1", dna(3000)),
                                     ("chr21", dna(1500)),
                                     ("chr22", dna(1500))])

    # --- chromatin_profile: coord csv + genome fasta ------------------------
    d = HERE / "chromatin"
    write_fasta(d / "genome.fa", [("chr1", dna(4000))])
    ycols = [f"y_{i}" for i in range(16)]
    for split, rows in (("train", 48), ("val", 16)):
        with open(d / f"{split}_coords.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["Chr_No", "Start"] + ycols)
            for _ in range(rows):
                w.writerow(["chr1", int(RNG.integers(0, 3800))]
                           + list((RNG.random(16) < 0.1).astype(int)))

    # --- hg38: genome fasta + bed with split column ------------------------
    d = HERE / "hg38"
    write_fasta(d / "genome.fa", [("chr1", dna(8000)), ("chr2", dna(4000))])
    with open(d / "seqs.bed", "w") as f:
        for i in range(48):
            s = int(RNG.integers(0, 7000))
            f.write(f"chr1\t{s}\t{s + 600}\ttrain\n")
        for i in range(16):
            s = int(RNG.integers(0, 3000))
            f.write(f"chr2\t{s}\t{s + 600}\tvalid\n")

    # --- dnaberts: seq_a/seq_b pair csv ------------------------------------
    d = HERE / "dnaberts"
    d.mkdir(parents=True, exist_ok=True)
    with open(d / "pairs.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["seq_a", "seq_b"])
        for _ in range(48):
            w.writerow([dna(100), dna(100)])

    # drop stray .fai index files so the fixture set is purely source data
    for fai in HERE.rglob("*.fai"):
        fai.unlink()

    print("fixtures written under", HERE)


if __name__ == "__main__":
    main()
