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
    p.add_argument("--mesh", type=int, default=None, metavar="N",
                   help="data-parallel training over an N-device mesh: "
                        "params replicated, per-step batch compute sharded "
                        "across chips (applies to the single-split, --cv, "
                        "and --grid paths; for --cv-vmapped use --cv-mesh)")
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
                   help="weights to start fresh training from: a checkpoint "
                        "dir (loads best), or a reference torch checkpoint "
                        "file (.pt/.pth/.npz, converted via interop)")
    p.add_argument("--synthetic-windows", type=int, default=2048,
                   help="synthetic dataset size when no --data-path")
    p.add_argument("--tensorboard", action="store_true",
                   help="write per-epoch scalars via torch.utils.tensorboard")
    p.add_argument("--grad-norms", action="store_true",
                   help="also log per-parameter per-step gradient norms "
                        "(reference main.py:84-89; implies on-device "
                        "accumulation, flushed per epoch)")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of the run under "
                        "<output-dir>/profile (TensorBoard/Perfetto "
                        "viewable)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: initialize jax.distributed before any "
                        "device use (coordinator from JAX_COORDINATOR_ADDRESS/"
                        "JAX_NUM_PROCESSES/JAX_PROCESS_ID, or cloud "
                        "auto-detection); jax.devices() then spans all "
                        "hosts and --mesh N lays DP over ICI + DCN")
    return p.parse_args(argv)


def load_cli_config(args):
    import dataclasses

    from fall_multimodal_tpu.configs import load_config, preset_path

    path = args.config
    if not os.path.exists(path):
        path = preset_path(args.config)
    overrides = {}
    for item in args.set:
        key, _, value = item.partition("=")
        overrides[key] = value
    # validate the file alone first so errors are attributed correctly: a
    # bad value in the YAML itself must not be reported as a --set problem
    try:
        cfg = load_config(path)
    except (KeyError, TypeError, ValueError, AttributeError) as e:
        raise SystemExit(f"invalid config file {path!r}: {e}") from e
    try:
        if overrides:
            cfg = load_config(path, overrides)
    except (KeyError, TypeError, ValueError, AttributeError) as e:
        # bad --set keys fail loudly with the offending key and the valid
        # ones (config._build raises KeyError listing them); ValueError
        # covers uncoercible values (optim.lr=not_a_number), AttributeError
        # nested overrides onto scalar fields (optim.lr.min=1)
        raise SystemExit(f"invalid config override: {e}") from e
    if args.epochs is not None:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, epochs=args.epochs))
    return cfg


def _log_model_summary(cfg, data, logger) -> None:
    """Print the parameter table at driver start (the reference runs
    ``torchinfo.summary`` before training, ``Multimodal_Fall3/main.py:326-328``).
    Shapes come from ``jax.eval_shape`` — no compute, no compilation."""
    try:
        import jax
        import jax.numpy as jnp
        import numpy as _np

        from fall_multimodal_tpu.models import build_model
        from fall_multimodal_tpu.utils.profiling import model_summary

        model = build_model(cfg)
        feats = jnp.zeros((2,) + tuple(_np.shape(data.features)[1:]), jnp.float32)
        sens = (
            jnp.zeros((2,) + tuple(_np.shape(data.sensors)[1:]), jnp.float32)
            if data.sensors is not None
            else jnp.zeros((2, 1, 1), jnp.float32)
        )
        variables = jax.eval_shape(
            lambda: model.init(jax.random.key(0), feats, sens, train=False)
        )
        logger.info("model summary:\n" + model_summary(variables["params"]))
    except Exception as e:  # summary must never block training
        logger.warning(f"model summary unavailable: {e}")


def validate_args(args) -> None:
    """Pure-argument conflicts fail before any data is loaded."""
    if args.cv_mesh and not args.cv_vmapped:
        raise SystemExit(
            "--cv-mesh shards the fold axis of the vmapped CV driver; "
            "pass it together with --cv-vmapped (for data-parallel "
            "training of the other paths use --mesh N)"
        )
    if args.mesh and args.cv_vmapped:
        raise SystemExit(
            "--mesh (batch data-parallelism) does not apply to "
            "--cv-vmapped; use --cv-mesh N to shard the fold axis"
        )
    multi_run = args.cv or args.cv_vmapped or bool(args.grid)
    if multi_run and (args.resume or args.pretrained):
        # silently retraining every fold from scratch while the user thinks
        # they resumed is worse than refusing
        raise SystemExit(
            "--resume/--pretrained apply to the single-split path only; "
            "the CV and grid drivers build fresh per-fold/per-point states "
            "(per-fold checkpoints live under <output-dir>/ckpt/fold{i})"
        )
    if multi_run and args.test_only:
        raise SystemExit(
            "--test-only applies to the single-split path only; to "
            "re-evaluate a CV fold, point --resume at its fold checkpoint "
            "dir without --cv"
        )
    if args.epochs is not None and args.epochs < 1:
        raise SystemExit("--epochs must be >= 1")


def main(argv=None) -> Dict:
    args = parse_args(argv)
    validate_args(args)
    if args.distributed:
        # must run before ANY jax device use (the runtime handshake
        # happens at backend initialization)
        from fall_multimodal_tpu.parallel import initialize_distributed

        n = initialize_distributed()
        print(f"jax.distributed initialized: {n} process(es)", flush=True)
    cfg = load_cli_config(args)
    out_dir = args.output_dir or os.path.join(
        "outputs", f"{cfg.model.name}_{time.strftime('%Y%m%dT%H%M%S')}"
    )
    os.makedirs(out_dir, exist_ok=True)
    if args.profile:
        # whole-run jax.profiler capture (reference has only wall-clock
        # ETA instrumentation, SURVEY.md section 5-tracing)
        from fall_multimodal_tpu.utils.profiling import trace

        with trace(os.path.join(out_dir, "profile")):
            return _run(args, cfg, out_dir)
    return _run(args, cfg, out_dir)


def _run(args, cfg, out_dir) -> Dict:
    # ensure buffered TensorBoard events reach disk: the writer's flush
    # thread is a daemon with no atexit hook, so without an explicit close
    # a short run can lose ALL its scalars
    holder = {}
    try:
        return _run_inner(args, cfg, out_dir, holder)
    finally:
        if holder.get("writer") is not None:
            holder["writer"].close()


def _json_safe_history(hist):
    """history.json must stay strict JSON: the NaN-guard appends
    ``float('nan')`` to train_loss, which ``json.dump`` would emit as a bare
    ``NaN`` token that strict parsers reject — encode non-finite as null."""
    import math

    return {
        k: [
            None if isinstance(v, float) and not math.isfinite(v) else v
            for v in series
        ]
        for k, series in hist.items()
    }


def _run_inner(args, cfg, out_dir, holder) -> Dict:
    from fall_multimodal_tpu.data import load_dataset, split_dataset, to_device
    from fall_multimodal_tpu.models import build_model
    from fall_multimodal_tpu.train import (
        build_optimizer, classification_report, create_train_state, evaluate,
        make_eval_epoch,
    )
    from fall_multimodal_tpu.train.cv import cross_validate, run_fold
    from fall_multimodal_tpu.utils import create_logger
    from fall_multimodal_tpu.utils.checkpoint import Checkpointer

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

    # driver-start parameter table (reference torchinfo.summary,
    # Multimodal_Fall3/main.py:326-328) — via eval_shape, zero compute
    _log_model_summary(cfg, data, logger)

    mesh = None
    if args.mesh:
        from fall_multimodal_tpu.parallel import make_mesh

        mesh = make_mesh(args.mesh)
        logger.info(f"data-parallel mesh: {args.mesh} devices")

    # TensorBoard scalars (reference SummaryWriter, main.py:146-148) and
    # per-parameter per-step gradient norms (main.py:84-89,129) — wired on
    # every path; CV/grid tag scalars by fold/point.
    metrics_callback = None
    metrics_factory = None
    step_metrics_callback = None
    step_metrics_factory = None
    # --cv tags scalars fold{i}/, --grid tags them point{i}/ — a grid run
    # and a CV run in the same TB instance must stay distinguishable
    tag_prefix = "point" if args.grid else "fold"
    if args.tensorboard or args.grad_norms:
        from torch.utils.tensorboard import SummaryWriter

        writer = holder["writer"] = SummaryWriter(log_dir=out_dir)

        def metrics_callback(epoch, scalars):
            for name, value in scalars.items():
                writer.add_scalar(name, value, epoch)

        def metrics_factory(tag):
            # per-fold (--cv/--cv-vmapped) / per-point (--grid) epoch curves
            def cb(epoch, scalars):
                for name, value in scalars.items():
                    writer.add_scalar(f"{tag_prefix}{tag}/{name}", value, epoch)
            return cb

        if args.grad_norms:
            def step_metrics_callback(step, scalars):
                for name, value in scalars.items():
                    writer.add_scalar(name, value, step)

            def step_metrics_factory(tag):
                def cb(step, scalars):
                    for name, value in scalars.items():
                        writer.add_scalar(f"{tag_prefix}{tag}/{name}", value, step)
                return cb

    if args.grid:
        from fall_multimodal_tpu.train.cv import grid_search, reference_grid

        grid = (reference_grid() if args.grid == "reference"
                else json.loads(args.grid))
        if not isinstance(grid, dict) or not all(
            isinstance(v, (list, tuple)) for v in grid.values()
        ):
            raise SystemExit(
                "--grid expects a JSON dict of lists, "
                'e.g. \'{"embed_dim": [16, 32]}\''
            )
        empty = [k for k, v in grid.items() if not list(v)]
        if not grid or empty:
            raise SystemExit(
                f"--grid needs a non-empty dict of non-empty lists"
                f"{'; empty values for ' + ', '.join(empty) if empty else ''}"
            )
        rows = grid_search(cfg, data, grid, epochs=args.epochs, logger=logger,
                           mesh=mesh, grad_norms=args.grad_norms,
                           metrics_factory=metrics_factory,
                           step_metrics_factory=step_metrics_factory)
        # one CSV row per grid point in grid-iteration order (the reference
        # accumulation order, hyperparameter_tuning.py:466-471), with a
        # rank column instead of reordering
        import csv

        csv_path = os.path.join(out_dir, "grid_results.csv")
        with open(csv_path, "w", newline="") as fh:
            csv_writer = csv.DictWriter(fh, fieldnames=list(rows[0]))
            csv_writer.writeheader()
            csv_writer.writerows(rows)
        with open(os.path.join(out_dir, "grid_results.json"), "w") as fh:
            json.dump(rows, fh, indent=2)
        best = min(rows, key=lambda r: r["rank"])
        logger.info(f"best grid point: {best}")
        return {"grid": rows}

    if args.cv or args.cv_vmapped:
        if args.cv_vmapped:
            from fall_multimodal_tpu.train.cv_vmapped import cross_validate_vmapped

            fold_mesh = None
            if args.cv_mesh:
                from fall_multimodal_tpu.parallel import make_mesh

                fold_mesh = make_mesh(args.cv_mesh, axis="fold")
            results = cross_validate_vmapped(
                cfg, data, n_folds=args.folds, epochs=args.epochs,
                logger=logger, mesh=fold_mesh,
                grad_norms=args.grad_norms,
                metrics_factory=metrics_factory,
                step_metrics_factory=step_metrics_factory,
            )
        else:
            results = cross_validate(
                cfg, data, n_folds=args.folds, epochs=args.epochs,
                logger=logger, checkpoint_dir=os.path.join(out_dir, "ckpt"),
                artifacts_dir=out_dir,
                grad_norms=args.grad_norms,
                metrics_factory=metrics_factory,
                step_metrics_factory=step_metrics_factory,
                mesh=mesh,
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
        batch_sharding = None
        if mesh is not None:
            from fall_multimodal_tpu.parallel import (
                batch_sharded, replicate_data, replicate_state,
            )

            batch_sharding = batch_sharded(mesh, mesh.axis_names[0])
            state = replicate_state(state, mesh)
            splits = {k: replicate_data(v, mesh) for k, v in splits.items()}
        eval_epoch = make_eval_epoch(
            model, data.num_classes,
            label_smoothing=cfg.train.label_smoothing,
            softmax_before_ce=cfg.model.softmax_output,
            batch_sharding=batch_sharding,
        )
        test = evaluate(eval_epoch, state, splits["test"], cfg.train.batch_size)
        report = classification_report(test.confusion)
        logger.info(f"test accuracy {test.accuracy:.5f}\n{report}")
        with open(os.path.join(out_dir, "report.txt"), "w") as fh:
            fh.write(report)
        return {"test_accuracy": test.accuracy}

    result = run_fold(cfg, splits, epochs=args.epochs, logger=logger,
                      checkpointer=ckpt, metrics_callback=metrics_callback,
                      resume_from=args.resume or cfg.resume_from,
                      pretrained_path=args.pretrained or cfg.pretrained_weight_path,
                      grad_norms=args.grad_norms,
                      step_metrics_callback=step_metrics_callback,
                      mesh=mesh)
    logger.info(
        f"best val accuracy {result.best_val_accuracy:.5f}; "
        f"test accuracy {float(result.test.stats['accuracy']):.5f}"
    )
    report = classification_report(result.test.confusion)
    logger.info("\n" + report)
    with open(os.path.join(out_dir, "history.json"), "w") as fh:
        json.dump(_json_safe_history(result.history), fh, indent=2)
    with open(os.path.join(out_dir, "report.txt"), "w") as fh:
        fh.write(report)
    return {
        "best_val_accuracy": result.best_val_accuracy,
        "test_accuracy": float(result.test.stats["accuracy"]),
    }


if __name__ == "__main__":
    main()
