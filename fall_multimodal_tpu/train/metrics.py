"""Evaluation metrics, jit-friendly.

Capabilities of the reference metric surface: top-k accuracy
(``Fall_2_Spatial_Temporal_SR/main.py:57-77``), macro precision/recall/F1
(``main_cross_validation.py:251``), micro PRF + specificity + confusion
matrix + per-class report (notebook eval cells, ``GSTCAN_UR_conv.ipynb:6``)
— re-derived from the confusion matrix rather than wrapping sklearn, so the
entire eval epoch stays on device; only the final report formats on host.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np


def as_class_indices(target: jnp.ndarray) -> jnp.ndarray:
    """Labels may be ints or (soft) one-hot rows; reduce to class indices."""
    if target.ndim == 1:
        return target.astype(jnp.int32)
    return jnp.argmax(target, axis=-1).astype(jnp.int32)


def top_k_accuracy(
    logits: jnp.ndarray, target: jnp.ndarray, top_k: Sequence[int] = (1,)
) -> jnp.ndarray:
    """Fraction of rows whose true class is within the top-k predictions.

    Returns an array of shape ``(len(top_k),)``. Soft/one-hot targets are
    collapsed via argmax, matching ``cal_top_k_accuracy`` semantics.
    """
    true = as_class_indices(target)
    max_k = max(top_k)
    # rank[i, j] = class index of the j-th largest logit of row i
    rank = jnp.argsort(logits, axis=-1)[:, ::-1][:, :max_k]
    hits = rank == true[:, None]
    return jnp.stack([hits[:, :k].any(axis=-1).mean() for k in top_k])


def confusion_matrix(
    logits_or_pred: jnp.ndarray, target: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """(num_classes, num_classes) counts; rows = true class, cols = predicted."""
    if logits_or_pred.ndim > 1:
        pred = jnp.argmax(logits_or_pred, axis=-1)
    else:
        pred = logits_or_pred.astype(jnp.int32)
    true = as_class_indices(target)
    flat = true * num_classes + pred
    counts = jnp.bincount(flat, length=num_classes * num_classes)
    return counts.reshape(num_classes, num_classes)


def prf_from_confusion(cm: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-class and aggregate precision/recall/F1/specificity/accuracy.

    Zero-denominator classes contribute 0 (sklearn's ``zero_division=0``).
    """
    cm = cm.astype(jnp.float64) if cm.dtype == jnp.int64 else cm.astype(jnp.float32)
    tp = jnp.diag(cm)
    fp = cm.sum(axis=0) - tp
    fn = cm.sum(axis=1) - tp
    total = cm.sum()
    tn = total - tp - fp - fn

    def safe_div(a, b):
        return jnp.where(b > 0, a / jnp.where(b > 0, b, 1.0), 0.0)

    precision = safe_div(tp, tp + fp)
    recall = safe_div(tp, tp + fn)
    f1 = safe_div(2 * precision * recall, precision + recall)
    specificity = safe_div(tn, tn + fp)
    support = cm.sum(axis=1)

    micro_p = safe_div(tp.sum(), (tp + fp).sum())
    micro_r = safe_div(tp.sum(), (tp + fn).sum())
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "specificity": specificity,
        "support": support,
        "accuracy": safe_div(tp.sum(), total),
        "macro_precision": precision.mean(),
        "macro_recall": recall.mean(),
        "macro_f1": f1.mean(),
        "macro_specificity": specificity.mean(),
        "micro_precision": micro_p,
        "micro_recall": micro_r,
        "micro_f1": safe_div(2 * micro_p * micro_r, micro_p + micro_r),
        "weighted_f1": safe_div((f1 * support).sum(), support.sum()),
    }


def classification_report(
    cm: np.ndarray, class_names: Optional[Sequence[str]] = None
) -> str:
    """Host-side formatted per-class report (sklearn-report capability)."""
    stats = {k: np.asarray(v) for k, v in prf_from_confusion(jnp.asarray(cm)).items()}
    n = cm.shape[0]
    names = list(class_names) if class_names else [str(i) for i in range(n)]
    width = max(12, max(len(s) for s in names) + 2)
    lines = [
        f"{'':<{width}}{'precision':>10}{'recall':>10}{'f1-score':>10}"
        f"{'specificity':>12}{'support':>10}"
    ]
    for i, name in enumerate(names):
        lines.append(
            f"{name:<{width}}{stats['precision'][i]:>10.5f}{stats['recall'][i]:>10.5f}"
            f"{stats['f1'][i]:>10.5f}{stats['specificity'][i]:>12.5f}"
            f"{int(stats['support'][i]):>10d}"
        )
    lines.append("")
    lines.append(f"{'accuracy':<{width}}{stats['accuracy']:>40.5f}")
    for agg in ("macro", "micro"):
        lines.append(
            f"{agg + ' avg':<{width}}{stats[agg + '_precision']:>10.5f}"
            f"{stats[agg + '_recall']:>10.5f}{stats[agg + '_f1']:>10.5f}"
        )
    return "\n".join(lines)


def save_confusion_png(
    cm: np.ndarray,
    path: str,
    class_names: Optional[Sequence[str]] = None,
    title: str = "Confusion matrix",
) -> str:
    """Confusion-matrix heatmap PNG (notebook capability,
    ``GSTCAN_UR_conv.ipynb:6``). Requires matplotlib; raises ImportError
    otherwise."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cm = np.asarray(cm)
    n = cm.shape[0]
    names = list(class_names) if class_names else [str(i) for i in range(n)]
    fig, ax = plt.subplots(figsize=(max(4, n * 0.8), max(3.5, n * 0.7)))
    im = ax.imshow(cm, cmap="Blues")
    ax.set_xticks(range(n), names, rotation=45, ha="right")
    ax.set_yticks(range(n), names)
    ax.set_xlabel("predicted")
    ax.set_ylabel("true")
    ax.set_title(title)
    thresh = cm.max() / 2 if cm.max() else 0.5
    for i in range(n):
        for j in range(n):
            ax.text(j, i, f"{int(cm[i, j])}", ha="center", va="center",
                    color="white" if cm[i, j] > thresh else "black")
    fig.colorbar(im, ax=ax, shrink=0.8)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path
