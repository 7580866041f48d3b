"""Offline pre-tokenization + memory-mapped token-shard dataset."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np

from dna_tpu.data.tokenizers import CharTokenizer
from dna_tpu.data.tokenshard import TokenShardDataset, write_shards

REPO = Path(__file__).resolve().parent.parent


def _write_corpus(path: Path, n=32, L=40, seed=0):
    rng = np.random.default_rng(seed)
    seqs = ["".join(rng.choice(list("ACGT"), L)) for _ in range(n)]
    path.write_text("\n".join(seqs) + "\n")
    return seqs


def test_pretokenize_roundtrip(tmp_path):
    """pretokenize.py output rows must equal tokenizing each line directly."""
    corpus = tmp_path / "train.txt"
    seqs = _write_corpus(corpus)
    out = tmp_path / "shards"
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "pretokenize.py"),
         str(corpus), str(out), "--tokenizer", "char",
         "--max-length", "48", "--rows-per-shard", "10"],
        capture_output=True, text=True, cwd=str(REPO), timeout=300)
    assert r.returncode == 0, r.stderr[-1500:]
    meta = json.loads((out / "meta.json").read_text())
    assert meta["splits"]["train"] == 32
    assert len(list(out.glob("train-*.npy"))) == 4  # 32 rows / 10 per shard

    tok = CharTokenizer()
    ds = TokenShardDataset(str(out), tok, objective="mlm", max_length=48)
    assert len(ds) == 32
    for i in (0, 9, 10, 31):  # spans shard boundaries
        want = np.asarray(tok.pad(
            tok.encode(seqs[i], add_special_tokens=True)[:48], 48))
        row = ds._row(i)
        np.testing.assert_array_equal(row, want)
    ex = ds[5]
    assert ex["input_ids"].shape == (48,)
    assert (ex["labels"] != -100).sum() > 0


def test_token_shards_trains_by_config(tmp_path):
    """data.dataset=token_shards + dest_path trains end-to-end (no synthetic
    fallback), both MLM and causal objectives."""
    import warnings

    from dna_tpu.data.tokenshard import write_shards as ws
    from dna_tpu.experiments import build, get_experiment
    from dna_tpu.train.loop import TrainLoop

    tok = CharTokenizer()
    rng = np.random.default_rng(1)
    rows = [tok.encode("".join(rng.choice(list("ACGT"), 40)),
                       add_special_tokens=True) for _ in range(64)]
    ws(iter(rows), str(tmp_path), split="train", max_length=48,
       tokenizer_name="char", vocab_size=tok.vocab_size,
       pad_id=tok.pad_token_id)
    ws(iter(rows[:16]), str(tmp_path), split="dev", max_length=48,
       tokenizer_name="char", vocab_size=tok.vocab_size,
       pad_id=tok.pad_token_id)

    cfg = get_experiment("dnabert2_pretrain", [
        "model.d_model=32", "model.n_layers=1", "model.n_heads=2",
        "model.d_ff=64", "model.dtype=float32", "model.vocab_size=16",
        "model.mlm_gather=0", "data.dataset=token_shards",
        f"data.dest_path={tmp_path}", "data.tokenizer=char",
        "data.max_length=48", "data.batch_size=8", "train.steps=2",
        "train.log_every=0", "scheduler.warmup_steps=1",
        "scheduler.total_steps=4",
    ])
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)  # no synthetic fallback
        exp = build(cfg)
    assert type(exp.dataset).__name__ == "TokenShardDataset"
    assert exp.eval_dataset is not None  # dev split resolved as val
    loop = TrainLoop(exp, verbose=False)
    res = loop.run()
    assert res.steps_done == 2
    assert np.isfinite(res.final_metrics["loss"])
