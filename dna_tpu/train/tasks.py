"""Task layer: losses and on-device metrics.

Mirrors the reference's task registry (`src/tasks/tasks.py:392-398`) and
functional metric library (`src/tasks/metrics.py`). Each task is a pure
function `loss_fn(logits, batch) -> (loss, metrics_dict)`; metrics are scalar
jnp values (summed numerator/denominator where streaming semantics matter,
so they aggregate correctly under psum — reference torchmetrics semantics,
`src/tasks/torchmetrics.py:92-98`).

Host-side evaluation metrics (MCC, F1, AUROC, Pearson) live in
`dna_tpu.train.metrics_host` and run on gathered predictions, matching the
reference's sklearn-on-CPU approach (`metrics.py:83-87`).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from dna_tpu import registry

IGNORE_INDEX = -100

Batch = Dict[str, jax.Array]
LossOut = Tuple[jax.Array, Dict[str, jax.Array]]


def _cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-position CE in fp32; labels may contain IGNORE_INDEX (zeroed)."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    safe = jnp.maximum(labels, 0)
    # one-hot multiply-reduce, NOT take_along_axis: the gather's VJP is a
    # single-element scatter per position, which the TPU backend serializes
    # (one loop iteration per update). The masked reduce fuses into the same
    # pass XLA already makes over the logits, and its VJP is a fused
    # broadcast-multiply.
    onehot = (safe[..., None] == jnp.arange(logits.shape[-1])).astype(
        logits.dtype)
    gold = jnp.sum(logits * onehot, axis=-1)
    return logz - gold


@registry.task.register("mlm")
def mlm_loss(logits: jax.Array, batch: Batch) -> LossOut:
    """Masked-LM CE over masked positions only (reference
    `bert_cross_entropy`, `metrics.py:268-273`: logits tuple + bool mask →
    mean CE over `mask`)."""
    labels = batch["labels"]
    mask = (labels != IGNORE_INDEX).astype(jnp.float32)
    ce = _cross_entropy(logits, labels) * mask
    n = jnp.maximum(mask.sum(), 1.0)
    loss = ce.sum() / n
    preds = jnp.argmax(logits, axis=-1)
    correct = ((preds == labels) * mask).sum()
    return loss, {
        "loss": loss,
        "ppl": jnp.exp(loss),
        "acc": correct / n,
        "num_tokens": mask.sum(),
    }


@registry.task.register("lm")
def lm_loss(logits: jax.Array, batch: Batch) -> LossOut:
    """Causal-LM CE; the shift happens in the dataset (`hg38_dataset.py:222-224`),
    so logits[i] predicts labels[i] directly."""
    labels = batch["labels"]
    ce = _cross_entropy(logits, labels)
    loss = ce.mean()
    preds = jnp.argmax(logits, axis=-1)
    return loss, {
        "loss": loss,
        "ppl": jnp.exp(loss),
        "bpb": loss / jnp.log(2.0),
        "acc": (preds == labels).mean(),
        "num_tokens": jnp.float32(labels.size),
    }


@registry.task.register("hg38")
def hg38_loss(logits: jax.Array, batch: Batch) -> LossOut:
    """LM task + the reference HG38Task extras (`tasks.py:254-339`):
    `last_k_ppl` (perplexity over the final k positions, k=512 or L/4) and
    mean per-token CE."""
    loss, metrics = lm_loss(logits, batch)
    labels = batch["labels"]
    ce = _cross_entropy(logits, labels)
    k = min(512, max(labels.shape[-1] // 4, 1))
    last_k = ce[..., -k:]
    metrics = dict(metrics)
    metrics["last_k_ppl"] = jnp.exp(last_k.mean())
    metrics["per_token_ce"] = ce.mean()
    return loss, metrics


@registry.task.register("multiclass")
def multiclass_loss(logits: jax.Array, batch: Batch) -> LossOut:
    labels = batch["labels"].reshape(-1)
    logits = logits.reshape(labels.shape[0], -1)
    loss = _cross_entropy(logits, labels).mean()
    preds = jnp.argmax(logits, axis=-1)
    return loss, {
        "loss": loss,
        "acc": (preds == labels).mean(),
        "num_examples": jnp.float32(labels.size),
    }


@registry.task.register("multilabel")
def multilabel_loss(logits: jax.Array, batch: Batch) -> LossOut:
    """BCE-with-logits over independent labels (DeepSEA 919-dim targets,
    reference `deepsea_loss` `metrics.py:276-285`)."""
    targets = batch["labels"].astype(jnp.float32)
    logits = logits.astype(jnp.float32)
    bce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = bce.mean()
    preds = (logits > 0).astype(jnp.float32)
    return loss, {
        "loss": loss,
        "acc": (preds == targets).mean(),
    }


@registry.task.register("regression")
def regression_loss(logits: jax.Array, batch: Batch) -> LossOut:
    """Per-channel MSE summed over channels (DeepSTARR `customMSE`,
    reference `metrics.py:354-356`)."""
    targets = batch["labels"].astype(jnp.float32)
    logits = logits.astype(jnp.float32).reshape(targets.shape)
    per_channel = jnp.mean((logits - targets) ** 2, axis=0)
    loss = per_channel.sum()
    return loss, {
        "loss": loss,
        "mse": jnp.mean((logits - targets) ** 2),
    }


def get_task(name: str) -> Callable[[jax.Array, Batch], LossOut]:
    return registry.task[name]
