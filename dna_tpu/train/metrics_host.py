"""Host-side evaluation metrics over gathered predictions.

The reference computes MCC/F1/AUROC via sklearn on CPU
(`src/tasks/metrics.py:83-87,229-233,276-356`). Same approach here (gather
logits to host, compute in numpy) with self-contained implementations — no
sklearn dependency. All functions take numpy arrays.
"""

from __future__ import annotations

import numpy as np


def confusion_matrix(y_true: np.ndarray, y_pred: np.ndarray, n_classes: int
                     ) -> np.ndarray:
    cm = np.zeros((n_classes, n_classes), dtype=np.int64)
    np.add.at(cm, (y_true.astype(int), y_pred.astype(int)), 1)
    return cm


def mcc(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Multiclass Matthews correlation (sklearn-compatible, via the
    generalized Gorodkin formula)."""
    classes = np.unique(np.concatenate([y_true, y_pred]))
    n = int(classes.max()) + 1 if len(classes) else 1
    cm = confusion_matrix(y_true, y_pred, n).astype(np.float64)
    t = cm.sum(axis=1)  # true counts
    p = cm.sum(axis=0)  # predicted counts
    c = np.trace(cm)
    s = cm.sum()
    num = c * s - t @ p
    den = np.sqrt(s * s - p @ p) * np.sqrt(s * s - t @ t)
    return float(num / den) if den != 0 else 0.0


def _binary_f1(y_true, y_pred, positive):
    tp = np.sum((y_pred == positive) & (y_true == positive))
    fp = np.sum((y_pred == positive) & (y_true != positive))
    fn = np.sum((y_pred != positive) & (y_true == positive))
    denom = 2 * tp + fp + fn
    return float(2 * tp / denom) if denom else 0.0


def f1(y_true: np.ndarray, y_pred: np.ndarray, average: str = "macro") -> float:
    classes = np.unique(y_true)
    if average == "binary":
        return _binary_f1(y_true, y_pred, 1)
    if average == "macro":
        return float(np.mean([_binary_f1(y_true, y_pred, c) for c in classes]))
    if average == "micro":
        # micro-F1 over all classes == accuracy for single-label problems
        return float(np.mean(y_true == y_pred))
    raise ValueError(average)


def roc_auc(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Binary AUROC via the rank statistic (ties averaged)."""
    y_true = np.asarray(y_true).astype(bool)
    y_score = np.asarray(y_score, dtype=np.float64)
    n_pos = y_true.sum()
    n_neg = (~y_true).sum()
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(y_score, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    sorted_scores = y_score[order]
    # average ranks over ties
    i = 0
    r = 1.0
    n = len(y_score)
    while i < n:
        j = i
        while j + 1 < n and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        avg = (r + r + (j - i)) / 2.0
        ranks[order[i:j + 1]] = avg
        r += j - i + 1
        i = j + 1
    return float((ranks[y_true].sum() - n_pos * (n_pos + 1) / 2.0)
                 / (n_pos * n_neg))


def roc_auc_multilabel(y_true: np.ndarray, y_score: np.ndarray,
                       average: str = "macro") -> float:
    """Mean AUROC over label columns (DeepSEA `roc`, `metrics.py:276-285`);
    columns without both classes are skipped."""
    aucs = []
    for j in range(y_true.shape[1]):
        col = y_true[:, j]
        if col.min() == col.max():
            continue
        aucs.append(roc_auc(col, y_score[:, j]))
    return float(np.mean(aucs)) if aucs else float("nan")


def pearsonr(x: np.ndarray, y: np.ndarray) -> float:
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    xm = x - x.mean()
    ym = y - y.mean()
    den = np.sqrt((xm ** 2).sum() * (ym ** 2).sum())
    return float((xm * ym).sum() / den) if den else 0.0


def accuracy(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    return float(np.mean(y_true == y_pred))


# Registry keyed like the reference's metric names
# (`configs/dataset/nucleotide_transformer.yaml` metric column and
# `src/tasks/metrics.py:374-416`).
def compute_metric(name: str, y_true: np.ndarray, logits: np.ndarray) -> float:
    if name == "mcc":
        return mcc(y_true, np.argmax(logits, axis=-1))
    if name in ("f1", "f1_macro"):
        return f1(y_true, np.argmax(logits, axis=-1), "macro")
    if name == "f1_micro":
        return f1(y_true, np.argmax(logits, axis=-1), "micro")
    if name == "f1_binary":
        return f1(y_true, np.argmax(logits, axis=-1), "binary")
    if name in ("accuracy", "acc"):
        return accuracy(y_true, np.argmax(logits, axis=-1))
    if name in ("roc", "roc_auc_macro"):
        probs = 1.0 / (1.0 + np.exp(-logits))
        if y_true.ndim == 2:
            return roc_auc_multilabel(y_true, probs)
        return roc_auc(y_true, probs[:, -1] if probs.ndim == 2 else probs)
    if name == "pearsonr_mean":
        rs = [pearsonr(y_true[:, j], logits[:, j])
              for j in range(y_true.shape[1])]
        return float(np.mean(rs))
    if name == "pearsonr_dev":
        return pearsonr(y_true[:, 0], logits[:, 0])
    if name == "pearsonr_hk":
        return pearsonr(y_true[:, 1], logits[:, 1])
    raise ValueError(f"unknown metric {name!r}")


def per_class_prf(y_true: np.ndarray, y_pred: np.ndarray, n_classes: int):
    """Per-class (precision, recall, f1) arrays from the confusion matrix
    (the reference's wandb val heatmaps, `src/callbacks/wandb.py:90-123`)."""
    cm = confusion_matrix(y_true, y_pred, n_classes).astype(np.float64)
    tp = np.diag(cm)
    pred_tot = cm.sum(axis=0)
    true_tot = cm.sum(axis=1)
    precision = np.divide(tp, pred_tot, out=np.zeros_like(tp),
                          where=pred_tot > 0)
    recall = np.divide(tp, true_tot, out=np.zeros_like(tp),
                       where=true_tot > 0)
    denom = precision + recall
    f1c = np.divide(2 * precision * recall, denom,
                    out=np.zeros_like(tp), where=denom > 0)
    return precision, recall, f1c
