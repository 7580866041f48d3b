"""Deterministic sharded batch loader with step-indexed resume.

Replaces the reference's fault-tolerant samplers
(`src/dataloaders/fault_tolerant_sampler.py`): instead of serializing
torch-generator state and fast-forwarding, the permutation for epoch E is a
pure function of (seed, E), and resume state is just `(epoch, step)` — the
same counters, but recoverable on any host count because every host computes
the full permutation and takes its own stride slice.

Host placement: host h of H takes global batch rows
[h*B/H, (h+1)*B/H); with a single process this is the whole batch. The
returned arrays are stacked numpy (ready for `jax.device_put` with a
`NamedSharding` over the data axes).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from queue import Queue
from typing import Dict, Iterator, Optional

import numpy as np


@dataclass
class LoaderState:
    epoch: int = 0
    step: int = 0  # batches already emitted within the epoch

    def to_dict(self):
        return {"epoch": self.epoch, "step": self.step}

    @classmethod
    def from_dict(cls, d):
        return cls(epoch=int(d["epoch"]), step=int(d["step"]))


class ShardedLoader:
    """Iterates dicts of stacked numpy arrays, deterministically.

    Args:
      dataset: indexable with `__len__` and `__getitem__(i) -> dict[str, np]`.
      global_batch: total batch size across all hosts.
      host_id / host_count: this process's slice of each global batch.
      shuffle: per-epoch deterministic permutation of example indices.
      drop_last: always True (static shapes on TPU).
    """

    def __init__(self, dataset, global_batch: int, *, host_id: int = 0,
                 host_count: int = 1, seed: int = 0, shuffle: bool = True,
                 state: Optional[LoaderState] = None, prefetch: int = 2,
                 num_threads: int = 8):
        if global_batch % host_count:
            raise ValueError("global_batch must divide evenly across hosts")
        self.dataset = dataset
        self.global_batch = global_batch
        self.local_batch = global_batch // host_count
        self.host_id = host_id
        self.host_count = host_count
        self.seed = seed
        self.shuffle = shuffle
        self.state = state or LoaderState()
        self.prefetch = prefetch
        self.num_threads = num_threads
        self.steps_per_epoch = len(dataset) // global_batch
        if self.steps_per_epoch == 0:
            raise ValueError(
                f"dataset of {len(dataset)} examples < global batch {global_batch}")

    def _epoch_perm(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        if not self.shuffle:
            return np.arange(n)
        return np.random.default_rng((self.seed, epoch)).permutation(n)

    def _fetch_batch(self, perm: np.ndarray, step: int) -> Dict[str, np.ndarray]:
        start = step * self.global_batch + self.host_id * self.local_batch
        idxs = perm[start:start + self.local_batch]
        examples = [self.dataset[int(i)] for i in idxs]
        return {k: np.stack([ex[k] for ex in examples]) for k in examples[0]}

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """Endless iteration from the current resume state.

        The producer thread runs `prefetch` batches ahead on its own local
        cursor; `self.state` advances only when a batch is *consumed*, so a
        checkpoint taken after step N resumes at exactly batch N+1 — the
        reference's fast-forward guarantee (`fault_tolerant_sampler.py:111-115`)
        without the skew a produced-side counter would introduce."""
        q: Queue = Queue(maxsize=self.prefetch)
        stop = threading.Event()
        start = LoaderState(self.state.epoch, self.state.step)

        def producer():
            epoch, step = start.epoch, start.step
            try:
                while not stop.is_set():
                    perm = self._epoch_perm(epoch)
                    while step < self.steps_per_epoch:
                        if stop.is_set():
                            return
                        batch = self._fetch_batch(perm, step)
                        q.put((batch, LoaderState(epoch, step + 1)))
                        step += 1
                    epoch, step = epoch + 1, 0
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                batch, next_state = item
                self.state = next_state
                yield batch
        finally:
            stop.set()

    def take(self, n: int):
        it = iter(self)
        for _ in range(n):
            yield next(it)
