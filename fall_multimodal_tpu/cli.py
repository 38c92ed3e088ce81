"""Command-line training/evaluation driver.

Capability of the reference entrypoints (``main.py:41-50,253-357``,
``main_cross_validation.py``, ``Multimodal_Fall3/main.py``):

    python -m fall_multimodal_tpu.cli --config two_stgcan_bilstm_harup \
        --set optim.lr=5e-4 --set train.epochs=50 --output-dir outputs/run1
    python -m fall_multimodal_tpu.cli --config gstcan_urfall_3stream --cv

Writes ``history.json`` (per-epoch curves), ``report.txt`` (classification
report), ``cv_results.json`` (per-fold PRF table in CV mode) and orbax
checkpoints (best + latest) under the output dir. Unlike the reference, the
output dir is never wiped (``main.py:52-55`` rmtree'd it, breaking resume).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="fall_multimodal_tpu trainer")
    p.add_argument("-c", "--config", required=True,
                   help="preset name or YAML path")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="dotted config override, e.g. optim.lr=5e-4")
    p.add_argument("--output-dir", default=None)
    p.add_argument("--cv", action="store_true", help="k-fold cross-validation")
    p.add_argument("--cv-vmapped", action="store_true",
                   help="k-fold CV with all folds trained in one vmapped program")
    p.add_argument("--cv-mesh", type=int, default=None, metavar="N",
                   help="with --cv-vmapped: shard the fold axis over an "
                        "N-device mesh (N must divide the fold count)")
    p.add_argument("--folds", type=int, default=None)
    p.add_argument("--grid", nargs="?", const="reference", default=None,
                   metavar="JSON",
                   help="hyperparameter grid search (reference "
                        "hyperparameter_tuning.py). Bare --grid runs the "
                        "shipped 48-point embed_dim x n_stage x act_type "
                        "space; or pass a JSON dict of lists, e.g. "
                        '\'{"embed_dim": [16, 32]}\'. Writes grid_results.csv')
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--data-path", default=None, help="dataset root (CSV dir or pickle)")
    p.add_argument("--test-only", action="store_true")
    p.add_argument("--resume", default=None, help="checkpoint dir to resume from")
    p.add_argument("--pretrained", default=None,
                   help="checkpoint dir to load best weights from (fresh training)")
    p.add_argument("--synthetic-windows", type=int, default=2048,
                   help="synthetic dataset size when no --data-path")
    p.add_argument("--tensorboard", action="store_true",
                   help="write per-epoch scalars via torch.utils.tensorboard")
    p.add_argument("--grad-norms", action="store_true",
                   help="also log per-parameter per-step gradient norms "
                        "(reference main.py:84-89; implies on-device "
                        "accumulation, flushed per epoch)")
    return p.parse_args(argv)


def load_cli_config(args):
    from fall_multimodal_tpu.configs import load_config, preset_path

    path = args.config
    if not os.path.exists(path):
        path = preset_path(args.config)
    overrides = {}
    for item in args.set:
        key, _, value = item.partition("=")
        overrides[key] = value
    cfg = load_config(path, overrides)
    if args.epochs:
        cfg = cfg.replace(train=cfg.train.__class__(
            **{**cfg.train.__dict__, "epochs": args.epochs}))
    return cfg


def main(argv=None) -> Dict:
    args = parse_args(argv)
    from fall_multimodal_tpu.data import load_dataset, split_dataset, to_device
    from fall_multimodal_tpu.models import build_model
    from fall_multimodal_tpu.train import (
        build_optimizer, classification_report, create_train_state, evaluate,
        make_eval_epoch,
    )
    from fall_multimodal_tpu.train.cv import cross_validate, run_fold
    from fall_multimodal_tpu.utils import create_logger
    from fall_multimodal_tpu.utils.checkpoint import Checkpointer

    cfg = load_cli_config(args)
    out_dir = args.output_dir or os.path.join(
        "outputs", f"{cfg.model.name}_{time.strftime('%Y%m%dT%H%M%S')}"
    )
    os.makedirs(out_dir, exist_ok=True)
    logger = create_logger(output_dir=out_dir, name="fall_multimodal_tpu.cli")
    logger.info(f"config: {cfg.model.name} dataset={cfg.data.dataset}")

    data = load_dataset(
        cfg.data.dataset,
        path=args.data_path or cfg.data.path,
        seq_len=cfg.data.seq_len,
        num_joints=cfg.data.num_joints,
        num_classes=cfg.data.num_classes,
        sensor_dim=cfg.data.sensor_dim,
        seed=cfg.seed,
        n_windows=args.synthetic_windows,
    )
    logger.info(f"dataset: {len(data)} windows, {data.num_classes} classes")

    with open(os.path.join(out_dir, "config.json"), "w") as fh:
        json.dump(cfg.to_dict(), fh, indent=2, default=str)

    if args.grad_norms and (args.grid or args.cv or args.cv_vmapped):
        logger.warning(
            "--grad-norms is only wired on the single-split path; "
            "ignoring it for --grid/--cv/--cv-vmapped runs"
        )

    if args.grid:
        from fall_multimodal_tpu.train.cv import grid_search, reference_grid

        grid = (reference_grid() if args.grid == "reference"
                else json.loads(args.grid))
        empty = [k for k, v in grid.items() if not list(v)]
        if not grid or empty:
            raise SystemExit(
                f"--grid needs a non-empty dict of non-empty lists"
                f"{'; empty values for ' + ', '.join(empty) if empty else ''}"
            )
        rows = grid_search(cfg, data, grid, epochs=args.epochs, logger=logger)
        # CSV accumulation as the reference writes it
        # (hyperparameter_tuning.py:466-471): one row per grid point,
        # hyperparameter columns then accuracies
        import csv

        csv_path = os.path.join(out_dir, "grid_results.csv")
        with open(csv_path, "w", newline="") as fh:
            writer = csv.DictWriter(fh, fieldnames=list(rows[0]))
            writer.writeheader()
            writer.writerows(rows)
        with open(os.path.join(out_dir, "grid_results.json"), "w") as fh:
            json.dump(rows, fh, indent=2)
        logger.info(f"best grid point: {rows[0]}")
        return {"grid": rows}

    if args.cv or args.cv_vmapped:
        if args.cv_vmapped:
            from fall_multimodal_tpu.train.cv_vmapped import cross_validate_vmapped

            mesh = None
            if args.cv_mesh:
                from fall_multimodal_tpu.parallel import make_mesh

                mesh = make_mesh(args.cv_mesh, axis="fold")
            results = cross_validate_vmapped(
                cfg, data, n_folds=args.folds, epochs=args.epochs,
                logger=logger, mesh=mesh,
            )
        else:
            results = cross_validate(
                cfg, data, n_folds=args.folds, epochs=args.epochs,
                logger=logger, checkpoint_dir=os.path.join(out_dir, "ckpt"),
            )
        with open(os.path.join(out_dir, "cv_results.json"), "w") as fh:
            json.dump(results, fh, indent=2)
        logger.info(f"CV summary: {results['summary']}")
        return results

    splits_np = split_dataset(
        data, split=cfg.data.split, seed=cfg.seed, by_video=cfg.data.split_by_video
    )
    splits = {k: to_device(v) for k, v in splits_np.items()}
    ckpt = Checkpointer(os.path.join(out_dir, "ckpt")) if cfg.save_checkpoint else None

    if args.test_only:
        model = build_model(cfg)
        optimizer = build_optimizer(cfg)
        state = create_train_state(
            model, optimizer,
            splits["train"].features[:2], splits["train"].sensors[:2], seed=cfg.seed,
        )
        src = Checkpointer(args.resume or os.path.join(out_dir, "ckpt"))
        state, epoch, best = src.restore("best", state)
        eval_epoch = make_eval_epoch(
            model, data.num_classes,
            label_smoothing=cfg.train.label_smoothing,
            softmax_before_ce=cfg.model.softmax_output,
        )
        test = evaluate(eval_epoch, state, splits["test"], cfg.train.batch_size)
        report = classification_report(test.confusion)
        logger.info(f"test accuracy {test.accuracy:.5f}\n{report}")
        with open(os.path.join(out_dir, "report.txt"), "w") as fh:
            fh.write(report)
        return {"test_accuracy": test.accuracy}

    metrics_callback = None
    step_metrics_callback = None
    if args.tensorboard or args.grad_norms:
        # capability of the reference's SummaryWriter scalars (main.py:146-148)
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(log_dir=out_dir)

        def metrics_callback(epoch, scalars):
            for name, value in scalars.items():
                writer.add_scalar(name, value, epoch)

        if args.grad_norms:
            # per-parameter per-step gradient norms (main.py:84-89,129)
            def step_metrics_callback(step, scalars):
                for name, value in scalars.items():
                    writer.add_scalar(name, value, step)

    result = run_fold(cfg, splits, epochs=args.epochs, logger=logger,
                      checkpointer=ckpt, metrics_callback=metrics_callback,
                      resume_from=args.resume or cfg.resume_from,
                      pretrained_path=args.pretrained or cfg.pretrained_weight_path,
                      grad_norms=args.grad_norms,
                      step_metrics_callback=step_metrics_callback)
    model = build_model(cfg)
    logger.info(
        f"best val accuracy {result.best_val_accuracy:.5f}; "
        f"test accuracy {float(result.test.stats['accuracy']):.5f}"
    )
    report = classification_report(result.test.confusion)
    logger.info("\n" + report)
    with open(os.path.join(out_dir, "history.json"), "w") as fh:
        json.dump(result.history, fh, indent=2)
    with open(os.path.join(out_dir, "report.txt"), "w") as fh:
        fh.write(report)
    return {
        "best_val_accuracy": result.best_val_accuracy,
        "test_accuracy": float(result.test.stats["accuracy"]),
    }


if __name__ == "__main__":
    main()
