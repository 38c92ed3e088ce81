"""K-fold cross-validation and hyperparameter grid-search drivers.

Capabilities of ``main_cross_validation.py:256-370`` (10-fold CV with
per-fold macro PRF collected into a summary table) and
``hyperparameter_tuning.py:442-471`` (cartesian grid over model kwargs,
re-running the trainer per point, accumulating a CSV).

TPU-native improvement over the reference: each fold gets its own
checkpoint directory (the reference shared one ``best_model.pt`` across
folds), and folds reuse one compiled train/eval program when their shapes
agree (same batch size / steps) — recompilation cost is paid once, not per
fold.
"""

from __future__ import annotations

import itertools
from typing import Any, Dict, Iterable, List, Mapping, Optional

import numpy as np

from fall_multimodal_tpu.configs import Config
from fall_multimodal_tpu.data import kfold_datasets, to_device
from fall_multimodal_tpu.data.synthetic import WindowedDataset
from fall_multimodal_tpu.models import build_model
from fall_multimodal_tpu.train.loop import fit
from fall_multimodal_tpu.train.optim import build_optimizer, build_schedule
from fall_multimodal_tpu.train.state import create_train_state


def run_fold(
    config: Config,
    splits,
    epochs: Optional[int] = None,
    logger=None,
    checkpointer=None,
    fold_seed: int = 0,
    metrics_callback=None,
    resume_from: Optional[str] = None,
    pretrained_path: Optional[str] = None,
    grad_norms: bool = False,
    step_metrics_callback=None,
    mesh=None,
):
    """Train one fold; returns the FitResult.

    ``resume_from``: checkpoint dir — restores the full latest TrainState
    (params/opt/batch_stats/step) and continues at the saved epoch
    (reference RESUME_FROM, ``main.py:295-304``). ``pretrained_path``:
    checkpoint dir — loads the best weights only, then trains from epoch 1
    (reference PRETRAINED_WEIGHT_PATH, ``main.py:306-310``).
    ``mesh``: 1-D device mesh — data-parallel training + eval (see
    :func:`fall_multimodal_tpu.train.loop.fit`).
    """
    model = build_model(config)
    steps_per_epoch = max(1, splits["train"].n // config.train.batch_size)
    optimizer = build_optimizer(
        config.optim,
        scheduler=config.lr_scheduler,
        steps_per_epoch=steps_per_epoch,
        max_norm=config.train.max_norm,
        # must match what --test-only / serve.Predictor.from_checkpoint
        # rebuild from the full Config, or the orbax opt_state restore
        # fails on a MultiSteps-vs-plain pytree mismatch
        accum_iter=config.train.accum_iter,
    )
    state = create_train_state(
        model,
        optimizer,
        splits["train"].features[:2],
        splits["train"].sensors[:2],
        seed=config.seed + fold_seed,
        weight_init=config.model.weight_init,
    )
    start_epoch, initial_best, initial_best_state = 1, -1.0, None
    if resume_from:
        from fall_multimodal_tpu.utils.checkpoint import Checkpointer

        src = Checkpointer(resume_from)
        state, saved_epoch, initial_best = src.restore("latest", state)
        if src.has("best"):
            # the final test must run on the best weights even if no
            # post-resume epoch improves (reference reloads best,
            # main.py:344); the latest weights are not the best ones.
            initial_best_state, _, _ = src.restore("best", state)
        start_epoch = saved_epoch + 1
        if logger:
            logger.info(f"resumed from {resume_from} at epoch {saved_epoch} "
                        f"(best acc {initial_best:.4f})")
    elif pretrained_path:
        if pretrained_path.endswith((".pt", ".pth", ".npz")):
            # reference torch checkpoint: convert via interop and fine-tune
            # from the ported weights (the migration path for reference
            # users — best_model.pt trains on here without retraining)
            from fall_multimodal_tpu.interop import load_pretrained_torch

            variables = load_pretrained_torch(config, pretrained_path)
            state = state._replace(
                params=variables["params"],
                batch_stats=variables.get("batch_stats", state.batch_stats),
            )
            if logger:
                logger.info(
                    f"converted torch weights from {pretrained_path} (interop)"
                )
        else:
            from fall_multimodal_tpu.utils.checkpoint import Checkpointer

            restored, _, _ = Checkpointer(pretrained_path).restore("best", state)
            state = state._replace(
                params=restored.params, batch_stats=restored.batch_stats
            )
            if logger:
                logger.info(f"loaded pretrained weights from {pretrained_path}")
    import jax.numpy as jnp

    from fall_multimodal_tpu.data.augment import make_augment_fn

    compute_dtype = jnp.bfloat16 if config.train.dtype == "bfloat16" else None
    lr_fn = build_schedule(config.lr_scheduler, config.optim.lr, steps_per_epoch)
    augment_fn = make_augment_fn(config.augment, config.graph.layout)
    return fit(
        model,
        optimizer,
        state,
        splits,
        epochs=epochs or config.train.epochs,
        batch_size=config.train.batch_size,
        num_classes=splits["train"].labels.shape[-1],
        label_smoothing=config.train.label_smoothing,
        softmax_before_ce=config.model.softmax_output,
        drop_last=config.train.drop_last,
        shuffle_seed=config.seed + fold_seed,
        logger=logger,
        checkpointer=checkpointer,
        compute_dtype=compute_dtype,
        metrics_callback=metrics_callback,
        start_epoch=start_epoch,
        initial_best_acc=initial_best,
        initial_best_state=initial_best_state,
        grad_norms=grad_norms,
        step_metrics_callback=step_metrics_callback,
        lr_fn=lr_fn if callable(lr_fn) else None,
        epoch_impl=config.train.epoch_impl,
        scan_epochs=config.train.scan_epochs,
        log_every=config.logging_interval,
        mesh=mesh,
        augment_fn=augment_fn,
    )


def cross_validate(
    config: Config,
    data: WindowedDataset,
    n_folds: Optional[int] = None,
    epochs: Optional[int] = None,
    logger=None,
    checkpoint_dir: Optional[str] = None,
    artifacts_dir: Optional[str] = None,
    grad_norms: bool = False,
    metrics_factory=None,
    step_metrics_factory=None,
    mesh=None,
) -> Dict[str, Any]:
    """K-fold CV over unique videos; per-fold test metrics + summary.

    Returns {"folds": [per-fold dicts], "summary": {mean/std of
    accuracy, macro P/R/F1}} — the reference's ``precision_recall_f1.csv``
    capability as a structured dict.

    ``artifacts_dir``: when given, each fold leaves the notebook CV loop's
    artifacts (``GSTCAN_HAR_conv_10kfold.ipynb:7``) under ``fold{i}/`` —
    ``confusion.png`` (test confusion heatmap) and ``history.csv``
    (per-epoch train/val curves). ``metrics_factory(fold_i)`` /
    ``step_metrics_factory(fold_i)`` return per-fold ``(epoch, scalars)`` /
    ``(step, scalars)`` callbacks (TensorBoard epoch curves and
    ``grad_norms`` streaming respectively).
    ``mesh``: data-parallel training/eval per fold.
    """
    n_folds = n_folds or config.data.n_folds
    folds = kfold_datasets(
        data, n_folds=n_folds, seed=config.seed,
        by_video=config.data.split_by_video,
        stratify=config.data.stratify_folds,
    )
    per_fold: List[Dict[str, float]] = []
    for i, fold in enumerate(folds):
        splits = {k: to_device(v) for k, v in fold.items()}
        ckpt = None
        if checkpoint_dir is not None:
            from fall_multimodal_tpu.utils.checkpoint import Checkpointer

            ckpt = Checkpointer(f"{checkpoint_dir}/fold{i}")
        result = run_fold(
            config, splits, epochs=epochs, logger=logger,
            checkpointer=ckpt, fold_seed=i,
            grad_norms=grad_norms,
            metrics_callback=(
                metrics_factory(i) if metrics_factory else None
            ),
            step_metrics_callback=(
                step_metrics_factory(i) if step_metrics_factory else None
            ),
            mesh=mesh,
        )
        if artifacts_dir is not None:
            _write_fold_artifacts(artifacts_dir, i, result, logger=logger)
        test = result.test
        row = {
            "fold": i,
            "val_accuracy": result.best_val_accuracy,
            "test_accuracy": float(test.stats["accuracy"]),
            "macro_precision": float(test.stats["macro_precision"]),
            "macro_recall": float(test.stats["macro_recall"]),
            "macro_f1": float(test.stats["macro_f1"]),
            "micro_f1": float(test.stats["micro_f1"]),
        }
        per_fold.append(row)
        if logger:
            logger.info(
                f"fold {i}: test acc {row['test_accuracy']:.4f} "
                f"macro F1 {row['macro_f1']:.4f}"
            )

    metrics = [k for k in per_fold[0] if k != "fold"]
    summary = {
        f"{m}_{agg}": float(getattr(np, agg)([row[m] for row in per_fold]))
        for m in metrics
        for agg in ("mean", "std")
    }
    return {"folds": per_fold, "summary": summary}


def _write_fold_artifacts(artifacts_dir: str, fold_i: int, result, logger=None):
    """Per-fold notebook artifacts (``GSTCAN_HAR_conv_10kfold.ipynb:7``):
    a confusion-matrix heatmap PNG of the fold's test evaluation and a
    per-epoch history CSV of the training curves."""
    import csv
    import os

    fold_dir = os.path.join(artifacts_dir, f"fold{fold_i}")
    os.makedirs(fold_dir, exist_ok=True)

    hist = result.history
    # After fit()'s NaN guard breaks mid-epoch, train_loss is one entry
    # longer than the other series — keep every column and pad the short
    # ones blank rather than silently dropping the curves.
    epochs_run = max((len(v) for v in hist.values()), default=0)
    with open(os.path.join(fold_dir, "history.csv"), "w", newline="") as fh:
        writer = csv.writer(fh)
        cols = list(hist)
        writer.writerow(["epoch"] + cols)
        for e in range(epochs_run):
            writer.writerow(
                [e + 1]
                + [hist[c][e] if e < len(hist[c]) else "" for c in cols]
            )

    if result.test is not None:
        try:
            from fall_multimodal_tpu.train.metrics import save_confusion_png

            save_confusion_png(
                result.test.confusion,
                os.path.join(fold_dir, "confusion.png"),
                title=f"Fold {fold_i} confusion",
            )
        except ImportError:  # matplotlib absent: keep CV runs working
            if logger:
                logger.warning(
                    "matplotlib unavailable; skipping confusion.png for "
                    f"fold {fold_i}"
                )


def grid_search(
    config: Config,
    data: WindowedDataset,
    grid: Mapping[str, Iterable[Any]],
    epochs: Optional[int] = None,
    logger=None,
    mesh=None,
    grad_norms: bool = False,
    metrics_factory=None,
    step_metrics_factory=None,
) -> List[Dict[str, Any]]:
    """Cartesian grid over model kwargs (e.g. embed_dim x n_stage x
    act_type, ``hyperparameter_tuning.py:450-458``). Each point trains on a
    fresh split and records val/test accuracy; returns rows in grid
    iteration order (the reference CSV's row order,
    ``hyperparameter_tuning.py:461-471``) with a ``rank`` column by
    validation accuracy. ``metrics_factory(point_idx)`` /
    ``step_metrics_factory(point_idx)`` return per-point epoch-curve /
    grad-norm callbacks."""
    from fall_multimodal_tpu.data import split_dataset

    keys = list(grid)
    rows: List[Dict[str, Any]] = []
    for point_i, values in enumerate(itertools.product(*(grid[k] for k in keys))):
        point = dict(zip(keys, values))
        import dataclasses

        kwargs = dict(config.model.kwargs)
        kwargs.update(point)
        cfg = config.replace(
            model=dataclasses.replace(config.model, kwargs=kwargs)
        )
        splits_np = split_dataset(
            data, split=config.data.split, seed=cfg.seed,
            by_video=config.data.split_by_video,
        )
        splits = {k: to_device(v) for k, v in splits_np.items()}
        result = run_fold(
            cfg, splits, epochs=epochs, logger=logger, mesh=mesh,
            grad_norms=grad_norms,
            metrics_callback=(
                metrics_factory(point_i) if metrics_factory else None
            ),
            step_metrics_callback=(
                step_metrics_factory(point_i) if step_metrics_factory else None
            ),
        )
        row = {
            **point,
            "val_accuracy": result.best_val_accuracy,
            "test_accuracy": float(result.test.stats["accuracy"]) if result.test else None,
        }
        rows.append(row)
        if logger:
            logger.info(f"grid point {point}: val {row['val_accuracy']:.4f}")
    # keep grid-iteration row order (the reference artifact's order); expose
    # the ranking as a column instead of reordering
    order = sorted(range(len(rows)), key=lambda i: -(rows[i]["val_accuracy"] or 0))
    for rank, i in enumerate(order):
        rows[i]["rank"] = rank + 1
    return rows


def reference_grid() -> Dict[str, List[Any]]:
    """The reference's shipped 48-point search space
    (``hyperparameter_tuning.py:449-454``)."""
    return {
        "embed_dim": [16, 32, 64],
        "n_stage": [1, 2, 3, 4],
        "act_type": ["relu", "leakyrelu", "tanh", "gelu"],
    }
