"""Fold-parallel (vmapped) CV vs sequential CV: the wall-clock head-to-head.

The fold-parallel CV driver (``train/cv_vmapped.py``) is the framework's
marquee TPU capability — K folds training as one vmapped program over a
device-resident dataset (SURVEY.md §7.6) — but through round 3 it shipped
with correctness tests only and NO measured wall-clock advantage (VERDICT
r3 weak #1). This harness runs BOTH drivers on the real chip at the
reference CV protocol shape (``main_cross_validation.py:284-358``:
10 folds x 100 epochs x batch 32) over the same below-ceiling synthetic
dataset and the same fold indices (both drivers derive folds from
``kfold_indices(videos, seed)``), and reports per-arm:

* total wall-clock, cold (includes jit/compile) — the honest end-to-end
  time a user experiences for ``--cv`` vs ``--cv-vmapped``;
* warm wall-clock (second invocation in-process; remote-compile cache and
  jit tracing amortized) — the steady-state number;
* effective training throughput (train windows consumed / wall-clock);
* the accuracy/macro-F1 summary of each arm (the vmapped driver's only
  protocol delta is its common per-epoch step count; PARITY.md bounds it).

    python experiments/cv_speed.py --family gstcan3 --folds 10 --epochs 100
    python experiments/cv_speed.py --family bilstm  --folds 10 --epochs 100
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILIES = {
    # preset, sensor_dim, classes — flagship + the smallest sensor family
    "gstcan3": ("gstcan_urfall_3stream", 4, 2),
    "bilstm": ("bilstm", 15, 11),
    "cnn_bilstm": ("sensor_cnn_bilstm_urfall", 4, 2),
}


def run_arm(arm, cfg, data, folds, epochs, scan_chunk=None):
    from fall_multimodal_tpu.train.cv import cross_validate
    from fall_multimodal_tpu.train.cv_vmapped import cross_validate_vmapped

    kwargs = {}
    if arm == "sequential":
        fn = cross_validate
    else:
        fn = cross_validate_vmapped
        if scan_chunk:
            # bound the single-device-call duration: one giant fused
            # execution (10 flagship folds x 100 epochs, ~15 min) crashed
            # the axon TPU worker; ~100 s calls run reliably
            kwargs["scan_epochs"] = scan_chunk
    t0 = time.perf_counter()
    out = fn(cfg, data, n_folds=folds, epochs=epochs, **kwargs)
    dt = time.perf_counter() - t0
    return out, dt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--family", choices=sorted(FAMILIES),
                        default="gstcan3")
    parser.add_argument("--folds", type=int, default=10)
    parser.add_argument("--epochs", type=int, default=100)
    # ~UR-Fall scale: the reference UR conv notebook trains on ~1.1k
    # windows (229 test windows at 80/20, GSTCAN_UR_conv.ipynb:6)
    parser.add_argument("--windows", type=int, default=1152)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--noise", type=float, default=0.45)
    parser.add_argument("--label-flip", type=float, default=0.0,
                        help="fraction of train labels flipped (the "
                             "cv_protocol regime uses 0.15; keeps the run "
                             "below the accuracy ceiling so per-fold "
                             "sequential-vs-vmapped accuracies are a "
                             "sensitive equivalence check, not saturation)")
    parser.add_argument("--arms", default="sequential,vmapped",
                        help="comma list; each runs cold then warm")
    parser.add_argument("--repeats", type=int, default=2,
                        help="invocations per arm (first = cold, "
                             "rest aggregate into warm)")
    parser.add_argument("--scan-chunk", type=int, default=None,
                        help="vmapped arm: epochs per fused device call "
                             "(bounds execution duration for big models)")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    from fall_multimodal_tpu.configs import load_config, preset_path
    from fall_multimodal_tpu.data import make_synthetic

    preset, sensor_dim, classes = FAMILIES[args.family]
    cfg = load_config(
        preset_path(preset),
        overrides={"seed": 0, "data.num_classes": classes,
                   "train.batch_size": args.batch_size},
    )
    data = make_synthetic(
        n_windows=args.windows, num_classes=classes, sensor_dim=sensor_dim,
        windows_per_video=16, noise=args.noise, seed=0,
    )
    if args.label_flip:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from parity_training import flip_labels

        data = flip_labels(data, args.label_flip, seed=1)

    # both drivers see identical fold sizes; the train-window count per
    # epoch differs only by the drivers' own stepping rules, so report each
    # arm's actual consumed windows
    results = {}
    for arm in args.arms.split(","):
        arm = arm.strip()
        times = []
        out = None
        for rep in range(args.repeats):
            out, dt = run_arm(arm, cfg, data, args.folds, args.epochs,
                              scan_chunk=args.scan_chunk)
            times.append(round(dt, 2))
            print(f"{arm} rep{rep}: {dt:.1f}s "
                  f"acc {out['summary']['test_accuracy_mean']:.4f}",
                  flush=True)
        # consumed train windows: sequential runs each fold's full train
        # split (len//batch steps); vmapped uses the common min-fold step
        # count for every fold
        from fall_multimodal_tpu.data import kfold_indices

        folds_ix = kfold_indices(data.videos, n_folds=args.folds,
                                 seed=cfg.seed, by_video=True)
        b = args.batch_size
        if arm == "sequential":
            steps = sum(len(f["train"]) // b for f in folds_ix)
        else:
            steps = args.folds * (
                min(len(f["train"]) for f in folds_ix) // b
            )
        consumed = steps * b * args.epochs
        warm = times[1:] or times
        results[arm] = {
            "wall_seconds_cold": times[0],
            "wall_seconds_warm": round(float(np.mean(warm)), 2),
            "wall_seconds_all": times,
            "train_windows_consumed": consumed,
            "windows_per_sec_warm": round(consumed / float(np.mean(warm)), 1),
            "summary": out["summary"],
            # per-fold metrics make the equivalence claim checkable
            # fold-by-fold (below the ceiling they are a sensitive check;
            # at the ceiling every fold reads 1.0 and proves nothing)
            "per_fold_test_accuracy": [
                round(float(f["test_accuracy"]), 4) for f in out["folds"]
            ],
            "per_fold_val_accuracy": [
                round(float(f["val_accuracy"]), 4) for f in out["folds"]
            ],
        }

    if {"sequential", "vmapped"} <= set(results):
        s, v = results["sequential"], results["vmapped"]
        results["speedup_cold"] = round(
            s["wall_seconds_cold"] / v["wall_seconds_cold"], 2)
        results["speedup_warm"] = round(
            s["wall_seconds_warm"] / v["wall_seconds_warm"], 2)
        results["accuracy_delta"] = round(
            v["summary"]["test_accuracy_mean"]
            - s["summary"]["test_accuracy_mean"], 4)

    payload = {
        "protocol": {
            "family": args.family, "preset": preset, "folds": args.folds,
            "epochs": args.epochs, "windows": args.windows,
            "batch_size": args.batch_size, "noise": args.noise,
            "label_flip": args.label_flip,
            "backend": __import__("jax").default_backend(),
            "reference_point": "sequential folds, "
                               "main_cross_validation.py:284-358",
        },
        **results,
    }
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"cv_speed_{args.family}.json")
    json.dump(payload, open(out_path, "w"), indent=2)
    print(json.dumps(payload, indent=2))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
