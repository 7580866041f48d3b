"""Real-data path integration: every file-backed dataset family trains for a
few steps through `python -m dna_tpu.cli` semantics (cli.main) against the
tiny committed fixtures under tests/fixtures/ — the reference's
config-selects-dataset contract (`src/dataloaders/base.py:181-183`
auto-registration; VERDICT round-1 item 1/2).

Each case uses the real catalog experiment with tiny-model overrides; the
assertions are (a) the dataset actually resolved to the real (non-synthetic)
class and (b) 2 train steps + the val split run clean.
"""

import warnings
from pathlib import Path

import numpy as np
import pytest

from dna_tpu import registry
from dna_tpu.experiments import build, get_experiment
from dna_tpu.train.loop import TrainLoop

FIX = Path(__file__).resolve().parent / "fixtures"

TINY = [
    "model.d_model=32", "model.n_layers=1", "model.n_heads=2",
    "model.d_ff=64", "model.dtype=float32",
    "data.batch_size=8", "train.steps=2", "train.log_every=0",
    "train.eval_every=0", "scheduler.warmup_steps=2",
    "scheduler.total_steps=10",
]

# experiment, dataset-class name expected, extra overrides
CASES = [
    ("dnabert2_pretrain", "DNABert2PretrainDataset",
     [f"data.dest_path={FIX}/dnabert2", "data.max_length=48",
      "model.mlm_gather=0.5"]),
    ("dnaberts_pretrain", "DNABertSPairDataset",
     [f"data.dest_path={FIX}/dnaberts/pairs.csv", "data.max_length=48"]),
    ("gue_dnabert2", "GUEDataset",
     [f"data.dest_path={FIX}/gue", "data.dataset_name=prom_demo",
      "data.max_length=48"]),
    ("nt_hyena", "NucleotideTransformerDataset",
     [f"data.dest_path={FIX}/nt", "data.dataset_name=H4",
      "data.max_length=120"]),
    ("genomic_benchmark", "GenomicBenchmarkDataset",
     [f"data.dest_path={FIX}/gb", "data.dataset_name=demo_promoters",
      "data.max_length=100"]),
    ("deepsea_denoise", "DeepSEADataset",
     [f"data.dest_path={FIX}/deepsea/deepsea.npz", "data.max_length=100",
      "model.n_classes=16", "data.n_targets=16"]),
    ("deepstarr_denoise", "DeepSTARRDataset",
     [f"data.dest_path={FIX}/deepstarr", "data.max_length=249"]),
    ("species_classification", "SpeciesDataset",
     [f"data.dest_path={FIX}/species", "data.max_length=256",
      "data.num_samples=64", "model.n_classes=2"]),
    ("chromatin_profile", "ChromatinProfileDataset",
     [f"data.dest_path={FIX}/chromatin",
      f"data.fasta_path={FIX}/chromatin/genome.fa", "data.max_length=100",
      "model.n_classes=16", "data.n_targets=16"]),
    ("hg38_hyena", "HG38Dataset",
     [f"data.bed_path={FIX}/hg38/seqs.bed",
      f"data.fasta_path={FIX}/hg38/genome.fa", "data.max_length=256",
      "model.max_len=256", "model.hyena_filter_emb_dim=5",
      "model.hyena_filter_order=16"]),
]


@pytest.mark.parametrize("exp_name,ds_cls,extra",
                         CASES, ids=[c[0] for c in CASES])
def test_real_dataset_trains_by_config(exp_name, ds_cls, extra):
    cfg = get_experiment(exp_name, TINY + extra)
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)  # no synthetic fallback!
        exp = build(cfg)
    assert type(exp.dataset).__name__ == ds_cls
    loop = TrainLoop(exp, verbose=False)
    res = loop.run()
    assert res.steps_done == 2
    assert np.isfinite(res.final_metrics["loss"])
    # the val split resolves for every family that ships one
    ev = loop.evaluate(max_batches=1)
    if exp.eval_dataset is not None:
        assert np.isfinite(ev["val/loss"])


def test_hg38_fixed_eval_windows():
    tok = registry.dataset["hg38_fixed"]
    from dna_tpu.config.core import DataConfig
    from dna_tpu.data.tokenizers import CharTokenizer

    cfg = DataConfig(dataset="hg38_fixed", fasta_path=f"{FIX}/hg38/genome.fa",
                     dataset_name="chr2", max_length=128)
    ds = tok(CharTokenizer(), cfg)
    assert type(ds).__name__ == "HG38FixedDataset"
    # deterministic non-overlapping windows over chr2 (len 4000)
    assert len(ds) == -(-(4000 - 129) // 128)  # ceil over stride 128
    ex0a, ex0b = ds[0], ds[0]
    np.testing.assert_array_equal(ex0a["input_ids"], ex0b["input_ids"])
    assert ex0a["input_ids"].shape == (128,)


def test_dnabert2_bin_corpus_roundtrip_through_training_batch():
    """The .bin corpus decodes to the same tokens the text path would give."""
    from dna_tpu.config.core import DataConfig
    from dna_tpu.data.tokenizers import get_tokenizer
    from dna_tpu.data.twobit import TwoBitCorpus

    corpus = TwoBitCorpus(f"{FIX}/dnabert2/train.bin",
                          f"{FIX}/dnabert2/train_padding_info.json")
    assert len(corpus) == 48
    row = corpus[0]
    assert set(row) <= set("ACGT") and 80 <= len(row) <= 200

    cfg = DataConfig(dataset="dnabert2", dest_path=f"{FIX}/dnabert2",
                     tokenizer="bpe", max_length=48)
    tok = get_tokenizer("bpe")
    ds = registry.dataset["dnabert2"](tok, cfg)
    ex = ds[0]
    assert ex["input_ids"].shape == (48,)
    masked = ex["labels"] != -100
    assert masked.any()
    # unmasked positions: labels are ignore; masked positions: label = true id
    assert (ex["labels"][~masked] == -100).all()
