"""Parameter-efficient tuning harnesses: soft prompting and few-sample
instruction tuning.

The reference declares these eval protocols in
`configs/evals/soft_prompting_genomics.yaml` (sweep over soft_tokens
{0, 2, 32, …, 32768} with a frozen pretrained backbone) and
`configs/evals/instruction_tuned_genomics.yaml` (full finetune on
tuning_samples {2, 16, 64, 256}); no in-tree driver consumes them —
the harness here implements the protocol the configs describe.

Soft prompting: `n_soft` trainable continuous embeddings prepended to the
frozen LM's embedded input; only the prefix is optimized. The task is the
ICL episode format (`data/icl.py`): classify by the label-token logit at the
final position.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _episode_arrays(dataset):
    """Materialize an episode dataset as (ids [N, L] left-padded, labels)."""
    n = len(dataset)
    items = [dataset[i] for i in range(n)]
    L = max(len(np.asarray(it["input_ids"])) for it in items)
    ids = np.zeros((n, L), np.int32)
    for i, it in enumerate(items):
        row = np.asarray(it["input_ids"])
        ids[i, -len(row):] = row  # left-pad: final position stays the query
    labels = np.asarray([int(np.asarray(it["labels"])) for it in items],
                        np.int32)
    return ids, labels


def _episode_batches(dataset, batch_size: int, steps: int, seed: int = 0):
    """Cycle a (small) episode dataset into fixed-size random batches
    (training sampler)."""
    rng = np.random.default_rng(seed)
    ids, labels = _episode_arrays(dataset)
    n = len(labels)
    for _ in range(steps):
        take = rng.choice(n, size=min(batch_size, n), replace=n < batch_size)
        yield jnp.asarray(ids[take]), jnp.asarray(labels[take])


def soft_prompt_tune(
    model,
    params,
    dataset,
    *,
    label_token_ids: Sequence[int],
    n_soft: int = 16,
    steps: int = 100,
    batch_size: int = 8,
    lr: float = 1e-3,
    weight_decay: float = 0.0,
    grad_clip: float = 1.0,
    seed: int = 0,
    init_scale: float = 0.02,
) -> Dict:
    """Tune `n_soft` soft tokens on ICL episodes with a frozen backbone.

    Returns {"soft_prefix", "history", "predict"} where predict(ids) gives
    class predictions using the tuned prefix.
    """
    d_model = model.cfg.d_model
    key = jax.random.key(seed)
    soft = jax.random.normal(key, (n_soft, d_model), jnp.float32) * init_scale
    label_ids = jnp.asarray(list(label_token_ids), jnp.int32)

    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(lr, weight_decay=weight_decay))
    opt_state = tx.init(soft)

    def to_class(labels):
        # episode labels are label-TOKEN ids (`data/icl.py`); map to class idx
        return jnp.argmax(labels[:, None] == label_ids[None, :], axis=1)

    def loss_fn(soft, ids, labels):
        logits = model.apply({"params": params}, ids, None,
                             deterministic=True, soft_prefix=soft)
        cls_logits = logits[:, -1, label_ids]  # [B, n_classes]
        y = to_class(labels)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            cls_logits, y).mean()
        acc = (jnp.argmax(cls_logits, -1) == y).mean()
        return loss, acc

    @jax.jit
    def train_step(soft, opt_state, ids, labels):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            soft, ids, labels)
        updates, opt_state = tx.update(grads, opt_state, soft)
        return optax.apply_updates(soft, updates), opt_state, loss, acc

    history = []
    if n_soft > 0:
        for ids, labels in _episode_batches(dataset, batch_size, steps, seed):
            soft, opt_state, loss, acc = train_step(soft, opt_state, ids,
                                                    labels)
            history.append({"loss": float(loss), "acc": float(acc)})

    @jax.jit
    def predict(ids):
        kwargs = {"soft_prefix": soft} if n_soft > 0 else {}
        logits = model.apply({"params": params}, ids, None,
                             deterministic=True, **kwargs)
        return jnp.argmax(logits[:, -1, label_ids], axis=-1)

    return {"soft_prefix": soft, "history": history, "predict": predict}


def soft_prompt_eval(model, params, train_episodes, eval_episodes, *,
                     label_token_ids: Sequence[int],
                     soft_tokens: Sequence[int] = (0, 2, 32),
                     steps: int = 100, batch_size: int = 8,
                     lr: float = 1e-3, seed: int = 0) -> Dict[int, float]:
    """The yaml protocol: accuracy as a function of the soft-token count."""
    results = {}
    for n_soft in soft_tokens:
        tuned = soft_prompt_tune(
            model, params, train_episodes, label_token_ids=label_token_ids,
            n_soft=n_soft, steps=steps, batch_size=batch_size, lr=lr,
            seed=seed)
        # one deterministic pass over every eval episode exactly once
        ids_all, labels_all = _episode_arrays(eval_episodes)
        lab_ids = np.asarray(list(label_token_ids))
        y_all = np.argmax(labels_all[:, None] == lab_ids[None, :], axis=1)
        correct = 0
        for lo in range(0, len(y_all), batch_size):
            chunk = jnp.asarray(ids_all[lo:lo + batch_size])
            pred = np.asarray(tuned["predict"](chunk))
            correct += int((pred == y_all[lo:lo + batch_size]).sum())
        results[n_soft] = correct / max(len(y_all), 1)
    return results


def instruction_tune(build_loop, *, tuning_samples: Sequence[int] = (2, 16),
                     seed: int = 0) -> Dict[int, Dict]:
    """Few-sample full finetuning sweep (instruction_tuned_genomics.yaml):
    `build_loop(n_samples, seed)` must return a ready TrainLoop limited to
    n_samples training examples; returns per-count final metrics."""
    out = {}
    for n in tuning_samples:
        loop = build_loop(n, seed)
        res = loop.run()
        out[n] = res.final_metrics
    return out
