"""FASTA/bed/2-bit codec/dataset-format tests on synthetic fixtures."""

import json
import os

import numpy as np
import pytest

from dna_tpu.data.fasta import (
    BertHG38Dataset,
    FastaFile,
    FastaInterval,
    HG38Dataset,
    read_bed,
    reverse_complement,
)
from dna_tpu.data.tokenizers import CharTokenizer
from dna_tpu.data.twobit import (
    DNABert2PretrainDataset,
    TwoBitCorpus,
    convert_text_to_bin,
    decode_row,
    encode_row,
)


@pytest.fixture
def fasta_file(tmp_path):
    rng = np.random.default_rng(0)
    seqs = {}
    path = tmp_path / "genome.fa"
    with open(path, "w") as f:
        for name, length in [("chr1", 500), ("chr2", 321)]:
            seq = "".join(rng.choice(list("ACGT"), length))
            seqs[name] = seq
            f.write(f">{name} extra desc\n")
            for i in range(0, length, 60):
                f.write(seq[i:i + 60] + "\n")
    return str(path), seqs


def test_fasta_roundtrip(fasta_file):
    path, seqs = fasta_file
    fa = FastaFile(path)
    assert fa.names == ["chr1", "chr2"]
    assert fa.length("chr1") == 500
    assert fa.fetch("chr1", 0, 500) == seqs["chr1"]
    assert fa.fetch("chr1", 73, 211) == seqs["chr1"][73:211]
    assert fa.fetch("chr2", 300, 400) == seqs["chr2"][300:321]
    # .fai reused on second open
    fa2 = FastaFile(path)
    assert fa2.fetch("chr2", 5, 10) == seqs["chr2"][5:10]


def test_reverse_complement():
    assert reverse_complement("ACGTN") == "NACGT"
    assert reverse_complement("AATTCCGG") == "CCGGAATT"


def test_interval_expansion_and_padding(fasta_file):
    path, seqs = fasta_file
    fa = FastaFile(path)
    iv = FastaInterval(fa, pad_interval=True)
    # interval shorter than max_length expands symmetrically
    s = iv("chr1", 100, 110, 50)
    assert len(s) == 50
    assert s == seqs["chr1"][80:130]
    # clamped at chromosome start → left padding
    s = iv("chr1", 0, 10, 50, np.random.default_rng(0))
    assert len(s) == 50
    assert s.startswith("." * 20)


def test_hg38_datasets(fasta_file, tmp_path):
    path, seqs = fasta_file
    bed = tmp_path / "seqs.bed"
    with open(bed, "w") as f:
        for i in range(8):
            f.write(f"chr1\t{i*50}\t{i*50+40}\ttrain\n")
        f.write("chr2\t0\t100\tvalid\n")
    recs = read_bed(str(bed), split="train")
    assert len(recs) == 8

    tok = CharTokenizer()
    ds = HG38Dataset(str(bed), path, tok, split="train", max_length=32)
    ex = ds[0]
    assert ex["input_ids"].shape == (32,)
    assert ex["labels"].shape == (32,)
    # causal pair: labels shifted by one
    np.testing.assert_array_equal(ex["input_ids"][1:], ex["labels"][:-1])

    mds = BertHG38Dataset(str(bed), path, tok, split="train", max_length=32)
    ex = mds[0]
    assert set(ex) == {"input_ids", "mask", "labels", "attention_mask"}
    on_mask = ex["mask"]
    assert (ex["labels"][~on_mask] == -100).all()
    assert (ex["labels"][on_mask] >= 0).all()


def test_twobit_roundtrip():
    for seq in ["ACGT", "A", "GATTACA", "ACGT" * 33 + "GG"]:
        packed, row_bytes, pad = encode_row(seq)
        assert decode_row(packed, pad) == seq


def test_twobit_corpus_and_pretrain(tmp_path):
    rng = np.random.default_rng(1)
    lines = ["".join(rng.choice(list("ACGT"), int(rng.integers(20, 60))))
             for _ in range(10)]
    txt = tmp_path / "train.txt"
    txt.write_text("\n".join(lines) + "\n")
    binp = tmp_path / "train.bin"
    sidecar = convert_text_to_bin(str(txt), str(binp))
    corpus = TwoBitCorpus(str(binp), sidecar)
    assert len(corpus) == 10
    for i, line in enumerate(lines):
        assert corpus[i] == line

    tok = CharTokenizer()
    ds = DNABert2PretrainDataset(corpus, tok, max_length=32)
    ex = ds[3]
    assert ex["input_ids"].shape == (32,)
    assert (ex["labels"][~ex["mask"]] == -100).all()


def test_nt_and_gb_and_gue_formats(tmp_path):
    from dna_tpu.data.genomics import (
        GUEDataset,
        GenomicBenchmarkDataset,
        NucleotideTransformerDataset,
    )

    rng = np.random.default_rng(2)
    tok = CharTokenizer()

    # NT: fasta per split, label = last char of record name
    nt_dir = tmp_path / "nt" / "H4"
    nt_dir.mkdir(parents=True)
    with open(nt_dir / "H4_train.fasta", "w") as f:
        for i in range(6):
            label = i % 2
            seq = "".join(rng.choice(list("ACGT"), 40))
            f.write(f">seq{i}|x|{label}\n{seq}\n")
    ds = NucleotideTransformerDataset(str(tmp_path / "nt"), "H4", tok,
                                      split="train", max_length=50)
    assert len(ds) == 6
    ex = ds[1]
    assert ex["labels"] == 1
    assert ex["input_ids"].shape == (50,)

    # GenomicBenchmark: class dirs of txt files
    for ci, cname in enumerate(["negative", "positive"]):
        d = tmp_path / "gb" / "human_nontata_promoters" / "train" / cname
        d.mkdir(parents=True)
        for j in range(3):
            (d / f"{j}.txt").write_text(
                "".join(rng.choice(list("ACGT"), 30)))
    gb = GenomicBenchmarkDataset(str(tmp_path / "gb"),
                                 "human_nontata_promoters", tok,
                                 split="train", max_length=40)
    assert len(gb) == 6
    assert int(gb[5]["labels"]) == 1

    # GUE csv
    gdir = tmp_path / "gue" / "emp_H3"
    gdir.mkdir(parents=True)
    with open(gdir / "train.csv", "w") as f:
        f.write("sequence,label\n")
        for i in range(4):
            f.write("".join(rng.choice(list("ACGT"), 25)) + f",{i % 2}\n")
    gue = GUEDataset(str(tmp_path / "gue"), "emp_H3", tok, split="train",
                     max_length=30)
    assert len(gue) == 4
    assert int(gue[1]["labels"]) == 1


def test_deepstarr_format(tmp_path):
    from dna_tpu.data.genomics import DeepSTARRDataset

    rng = np.random.default_rng(3)
    tok = CharTokenizer()
    with open(tmp_path / "Sequences_Train.fa", "w") as fa, \
            open(tmp_path / "Sequences_activity_Train.txt", "w") as act:
        act.write("Dev_log2_enrichment\tHk_log2_enrichment\n")
        for i in range(5):
            fa.write(f">s{i}\n" + "".join(rng.choice(list("ACGT"), 249)) + "\n")
            act.write(f"{rng.normal():.4f}\t{rng.normal():.4f}\n")
    ds = DeepSTARRDataset(str(tmp_path), tok, split="train")
    ex = ds[2]
    assert ex["input_ids"].shape == (249,)
    assert ex["labels"].shape == (2,)


def test_kmer_tokenizer_artifact():
    """NTv2 6-mer tokenizer loads the exact in-repo artifact (vocab 4107)."""
    import os
    import pytest
    from dna_tpu.data.tokenizers import KmerTokenizer

    path = "/root/reference/nucleotide-transformer-v2-500m-multi-species"
    if not os.path.exists(path):
        pytest.skip("reference tokenizer artifact not available")
    tok = KmerTokenizer(path)
    assert tok.vocab_size == 4107
    ids = tok.encode("ACGTACACGTAC", add_special_tokens=True)
    assert ids[0] == tok.cls_token_id
    assert len(ids) == 3  # cls + two 6-mers
    # non-ACGT chunk falls back to per-base tokens
    ids2 = tok.encode("ACGTAN", add_special_tokens=False)
    assert len(ids2) > 1


def test_bpe_tokenizer_artifact():
    import os
    import pytest
    from dna_tpu.data.tokenizers import BPETokenizer

    path = "/root/reference/DNABERT-2-117M"
    if not os.path.exists(path):
        pytest.skip("reference tokenizer artifact not available")
    tok = BPETokenizer(path)
    assert tok.vocab_size == 4096
    ids = tok.encode("ACGTACGTACGT")
    assert ids.dtype == np.int32 and len(ids) > 0
    pad = tok.pad(ids, 16)
    assert pad.shape == (16,)
    assert pad[0] == tok.pad_token_id  # left padding


def test_loader_multihost_partition():
    """Across H hosts, every global batch is partitioned exactly (disjoint,
    complete) — the fault-tolerant-sampler guarantee, host-count free."""
    from dna_tpu.data.loader import ShardedLoader
    from dna_tpu.data.synthetic import SyntheticLMDataset

    ds = SyntheticLMDataset(max_length=8, num_samples=64)
    global_batch, hosts = 16, 4
    per_host_rows = []
    for h in range(hosts):
        loader = ShardedLoader(ds, global_batch, host_id=h, host_count=hosts,
                               seed=3)
        batch = next(iter(loader))
        per_host_rows.append(batch["input_ids"])
    stacked = np.concatenate(per_host_rows)
    assert stacked.shape[0] == global_batch
    # compare against the single-host view of the same step
    full = next(iter(ShardedLoader(ds, global_batch, seed=3)))["input_ids"]
    np.testing.assert_array_equal(np.sort(stacked, axis=0),
                                  np.sort(full, axis=0))


def test_loader_resume_continues_stream():
    from dna_tpu.data.loader import LoaderState, ShardedLoader
    from dna_tpu.data.synthetic import SyntheticLMDataset

    ds = SyntheticLMDataset(max_length=8, num_samples=64)
    loader = ShardedLoader(ds, 8, seed=5)
    it = iter(loader)
    batches = [next(it) for _ in range(3)]
    state_after_2 = LoaderState(epoch=0, step=2)

    resumed = ShardedLoader(ds, 8, seed=5, state=state_after_2)
    b = next(iter(resumed))
    np.testing.assert_array_equal(b["input_ids"], batches[2]["input_ids"])
