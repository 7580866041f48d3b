"""Offline pre-tokenization: corpus text → fixed-length uint16 token shards.

The TPU-host answer to the reference's per-sample Python tokenization
bottleneck (SURVEY §7.3): tokenize once here, then train with the
memory-mapped `token_shards` dataset (`dna_tpu/data/tokenshard.py`) —
`data.dataset=token_shards data.dest_path=<out_dir>`.

Usage:
    python scripts/pretokenize.py IN OUT --tokenizer bpe --max-length 128 \
        [--split train] [--fasta]

IN is a text corpus (one DNA sequence per line, the reference's
`train.txt`/`dev.txt` format) or a FASTA file with --fasta.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def seq_iter(path: str, fasta: bool):
    if not fasta:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    yield line
        return
    cur = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                if cur:
                    yield "".join(cur)
                    cur = []
            elif line:
                cur.append(line)
    if cur:
        yield "".join(cur)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("inp")
    ap.add_argument("out_dir")
    ap.add_argument("--tokenizer", default="bpe")
    ap.add_argument("--tokenizer-path", default=None)
    ap.add_argument("--max-length", type=int, default=128)
    ap.add_argument("--split", default="train")
    ap.add_argument("--fasta", action="store_true")
    ap.add_argument("--rows-per-shard", type=int, default=1 << 20)
    args = ap.parse_args()

    from dna_tpu.data.tokenizers import get_tokenizer
    from dna_tpu.data.tokenshard import write_shards

    tok = get_tokenizer(args.tokenizer, path=args.tokenizer_path)

    def rows():
        for seq in seq_iter(args.inp, args.fasta):
            yield tok.encode(seq.upper(), add_special_tokens=True)

    n = write_shards(rows(), args.out_dir, split=args.split,
                     max_length=args.max_length,
                     tokenizer_name=args.tokenizer,
                     vocab_size=tok.vocab_size,
                     pad_id=tok.pad_token_id,
                     rows_per_shard=args.rows_per_shard)
    print(f"wrote {n} rows to {args.out_dir} (split={args.split})")


if __name__ == "__main__":
    main()
