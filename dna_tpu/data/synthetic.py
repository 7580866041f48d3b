"""Synthetic genomic datasets for tests and benchmarks.

No genome assets ship with this environment, so tests/benches run on
synthetic DNA with the same tokenizer contracts and batch pytrees as the real
datasets (Appendix A of SURVEY.md). Sequences are deterministic functions of
(seed, index) so distributed loaders can be validated for exact coverage.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from dna_tpu import registry
from dna_tpu.data import masking
from dna_tpu.data.tokenizers import CharTokenizer

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_dna(rng: np.random.Generator, length: int) -> str:
    return _BASES[rng.integers(0, 4, length)].tobytes().decode("ascii")


class SyntheticMLMDataset:
    """Pre-tokenized fixed-length MLM examples.

    Emits the MLM batch contract: input_ids (masked), mask, labels
    (reference `((masked, mask, labels), target)`, SURVEY Appendix A).
    """

    def __init__(self, tokenizer, max_length: int = 128, num_samples: int = 1 << 16,
                 mlm_probability: float = 0.15, random_token_prob: float = 0.1,
                 unchanged_token_prob: float = 0.1, seed: int = 0):
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.num_samples = num_samples
        self.mlm_probability = mlm_probability
        self.random_token_prob = random_token_prob
        self.unchanged_token_prob = unchanged_token_prob
        self.seed = seed

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng((self.seed, idx))
        # Sample raw ids uniformly over the non-special vocab: cheaper than
        # string round-trips and exercises the same shapes.
        specials = np.asarray(self.tokenizer.special_token_ids)
        allowed = np.setdiff1d(np.arange(self.tokenizer.vocab_size), specials)
        seq = allowed[rng.integers(0, len(allowed), self.max_length)].astype(np.int32)
        masked, mask, labels = masking.bert_mask_numpy(
            seq, rng,
            mask_token_id=self.tokenizer.mask_token_id,
            pad_token_id=self.tokenizer.pad_token_id,
            vocab_size=self.tokenizer.vocab_size,
            special_token_ids=list(specials),
            mask_prob=self.mlm_probability,
            random_token_prob=self.random_token_prob,
            unchanged_token_prob=self.unchanged_token_prob,
        )
        return {
            "input_ids": masked.astype(np.int32),
            "mask": mask,
            "labels": labels.astype(np.int32),
        }


class SyntheticLMDataset:
    """Causal-LM pairs `(seq[:-1], seq[1:])` over the char vocabulary
    (reference `hg38_dataset.py:222-224`)."""

    def __init__(self, tokenizer: Optional[CharTokenizer] = None, max_length: int = 1024,
                 num_samples: int = 1 << 16, seed: int = 0):
        self.tokenizer = tokenizer or CharTokenizer()
        self.max_length = max_length
        self.num_samples = num_samples
        self.seed = seed

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng((self.seed, idx))
        seq = self.tokenizer.encode(random_dna(rng, self.max_length + 1))
        return {"input_ids": seq[:-1], "labels": seq[1:].astype(np.int32)}


class SyntheticClassificationDataset:
    """Fixed-length classification examples with a learnable planted signal:
    the label is a parity of motif occurrences, so models can actually fit it
    in correctness tests."""

    def __init__(self, tokenizer: Optional[CharTokenizer] = None, max_length: int = 200,
                 n_classes: int = 2, num_samples: int = 4096, seed: int = 0,
                 motif: str = "ACGTAC"):
        self.tokenizer = tokenizer or CharTokenizer()
        self.max_length = max_length
        self.n_classes = n_classes
        self.num_samples = num_samples
        self.seed = seed
        self.motif = motif

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng((self.seed, idx))
        label = int(rng.integers(0, self.n_classes))
        seq = random_dna(rng, self.max_length)
        if label == 1 and self.n_classes == 2:
            # plant several copies of the motif so the signal is learnable
            # from stochastic minibatches
            for _ in range(3):
                pos = int(rng.integers(0, self.max_length - len(self.motif)))
                seq = seq[:pos] + self.motif + seq[pos + len(self.motif):]
        ids = self.tokenizer.encode(seq)
        return {"input_ids": ids.astype(np.int32),
                "labels": np.asarray(label, dtype=np.int32)}


class SyntheticRegressionDataset:
    """DeepSTARR-style 2-output regression: targets are GC-fraction derived."""

    def __init__(self, tokenizer: Optional[CharTokenizer] = None, max_length: int = 249,
                 n_outputs: int = 2, num_samples: int = 4096, seed: int = 0):
        self.tokenizer = tokenizer or CharTokenizer()
        self.max_length = max_length
        self.n_outputs = n_outputs
        self.num_samples = num_samples
        self.seed = seed

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng((self.seed, idx))
        seq = random_dna(rng, self.max_length)
        ids = self.tokenizer.encode(seq)
        gc = (np.isin(ids, [self.tokenizer.encode("C")[0], self.tokenizer.encode("G")[0]])
              .mean())
        target = np.asarray([gc, 1.0 - gc][: self.n_outputs], dtype=np.float32)
        return {"input_ids": ids.astype(np.int32), "labels": target}


class SyntheticMultilabelDataset:
    """DeepSEA-style multilabel examples: `n_targets` independent binary
    targets derived from motif presence so they are learnable."""

    def __init__(self, tokenizer: Optional[CharTokenizer] = None,
                 max_length: int = 1000, n_targets: int = 919,
                 num_samples: int = 4096, seed: int = 0):
        self.tokenizer = tokenizer or CharTokenizer()
        self.max_length = max_length
        self.n_targets = n_targets
        self.num_samples = num_samples
        self.seed = seed

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng((self.seed, idx))
        seq = random_dna(rng, self.max_length)
        ids = self.tokenizer.encode(seq)
        targets = (rng.random(self.n_targets) < 0.1).astype(np.float32)
        return {"input_ids": ids.astype(np.int32), "labels": targets}


@registry.dataset.register("synthetic_mlm")
def _synthetic_mlm(tokenizer, cfg):
    return SyntheticMLMDataset(
        tokenizer, max_length=cfg.max_length, num_samples=cfg.num_samples,
        mlm_probability=cfg.mlm_probability, random_token_prob=cfg.random_token_prob,
        unchanged_token_prob=cfg.unchanged_token_prob, seed=cfg.seed)


@registry.dataset.register("synthetic_lm")
def _synthetic_lm(tokenizer, cfg):
    return SyntheticLMDataset(tokenizer, max_length=cfg.max_length,
                              num_samples=cfg.num_samples, seed=cfg.seed)


@registry.dataset.register("synthetic_cls")
def _synthetic_cls(tokenizer, cfg):
    return SyntheticClassificationDataset(
        tokenizer, max_length=cfg.max_length, num_samples=cfg.num_samples, seed=cfg.seed)


@registry.dataset.register("synthetic_reg")
def _synthetic_reg(tokenizer, cfg):
    return SyntheticRegressionDataset(
        tokenizer, max_length=cfg.max_length,
        n_outputs=cfg.n_targets or 2, num_samples=cfg.num_samples,
        seed=cfg.seed)


@registry.dataset.register("synthetic_multilabel")
def _synthetic_multilabel(tokenizer, cfg):
    return SyntheticMultilabelDataset(
        tokenizer, max_length=cfg.max_length,
        n_targets=cfg.n_targets or 919, num_samples=cfg.num_samples,
        seed=cfg.seed)
