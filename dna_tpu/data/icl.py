"""In-context-learning (few-shot) episode datasets.

Reference semantics (`src/dataloaders/datasets/icl_genomics_dataset.py:153-176`):
per query example, sample `shots` support examples per class (excluding the
query), append each support sequence's label as a vocabulary token
(default map {0:'A', 1:'N'} → char ids, `icl_genomics_dataset.py:69`),
shuffle the supports, concatenate [support_0 … support_k, query_seq]; the
target is the query's label token, predicted causally at the final position.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from dna_tpu.data.tokenizers import CharTokenizer


class ICLEpisodeDataset:
    """Wraps any classification dataset (items with input_ids/labels) into
    k-shot episodes."""

    def __init__(self, base, tokenizer: Optional[CharTokenizer] = None, *,
                 shots: int = 2, n_classes: int = 2,
                 label_tokens: Sequence[str] = ("A", "N"),
                 max_length: Optional[int] = None, seed: int = 0):
        self.base = base
        self.tokenizer = tokenizer or CharTokenizer()
        self.shots = shots
        self.n_classes = n_classes
        self.label_token_ids = [
            int(self.tokenizer.encode(t)[0]) for t in label_tokens]
        self.max_length = max_length
        self.seed = seed
        # index examples by class for support sampling
        self._by_class: List[List[int]] = [[] for _ in range(n_classes)]
        for i in range(len(base)):
            y = int(np.asarray(base[i]["labels"]))
            if y < n_classes:
                self._by_class[y].append(i)

    def __len__(self):
        return len(self.base)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng((self.seed, idx))
        query = self.base[idx]
        q_ids = np.asarray(query["input_ids"])
        q_label = int(np.asarray(query["labels"]))

        supports = []
        for cls in range(self.n_classes):
            pool = [i for i in self._by_class[cls] if i != idx]
            take = rng.choice(len(pool), size=min(self.shots, len(pool)),
                              replace=False)
            for j in take:
                ex = self.base[pool[int(j)]]
                ids = np.asarray(ex["input_ids"])
                supports.append(np.concatenate(
                    [ids, [self.label_token_ids[cls]]]))
        rng.shuffle(supports)

        seq = np.concatenate(supports + [q_ids]).astype(np.int32)
        if self.max_length is not None:
            seq = seq[-self.max_length:]
            if seq.shape[0] < self.max_length:
                pad = np.full(self.max_length - seq.shape[0],
                              self.tokenizer.pad_token_id, np.int32)
                seq = np.concatenate([pad, seq])
        target = np.int32(self.label_token_ids[q_label])
        return {"input_ids": seq, "labels": np.asarray(target)}


def icl_accuracy(logits_last: np.ndarray, labels: np.ndarray,
                 label_token_ids: Sequence[int]) -> float:
    """Few-shot eval: restrict the final-position logits to the label tokens
    (reference evaluates CE over the whole vocab; restricting is the
    standard readout)."""
    sub = logits_last[:, list(label_token_ids)]
    pred = np.asarray(label_token_ids)[sub.argmax(-1)]
    return float((pred == labels).mean())
