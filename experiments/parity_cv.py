"""K-fold CV training-outcome parity: reference torch GSTCAN vs ours.

BASELINE.json's headline is "accuracy/F1 parity on UR-Fall 10-fold CV".
The real archives are not mounted, so — like the single-split below-ceiling
experiment — both frameworks run the SAME CV protocol on the SAME synthetic
dataset with the SAME video-level fold indices (ours:
``data/splits.py:kfold_indices``, mirroring ``cv_dataloader.py:157-189``,
valid == test per fold), in a regime hard enough that neither saturates.
Reported per arm: per-fold best-val accuracy and macro F1, mean +/- std
across folds — the statistics the reference CV driver writes to
``precision_recall_f1.csv`` (``main_cross_validation.py:355-360``).

    python experiments/parity_cv.py --folds 5 --epochs 25 --cpu
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parity_training import flip_labels, run_reference  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--folds", type=int, default=5)
    parser.add_argument("--epochs", type=int, default=25)
    parser.add_argument("--windows", type=int, default=480)
    parser.add_argument("--classes", type=int, default=6)
    parser.add_argument("--noise", type=float, default=0.45)
    parser.add_argument("--label-flip", type=float, default=0.15)
    parser.add_argument("--reference-path", default="/root/reference")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from fall_multimodal_tpu.configs import load_config, preset_path
    from fall_multimodal_tpu.data import make_synthetic, to_device
    from fall_multimodal_tpu.data.splits import kfold_indices
    from fall_multimodal_tpu.train.cv import run_fold

    data = make_synthetic(
        n_windows=args.windows, num_classes=args.classes, sensor_dim=4,
        windows_per_video=16, noise=args.noise, seed=0,
    )
    data = flip_labels(data, args.label_flip, seed=1)
    folds = kfold_indices(data.videos, n_folds=args.folds, seed=42,
                          by_video=True)

    cfg = load_config(
        preset_path("gstcan_urfall_3stream"),
        overrides={"seed": 0, "data.num_classes": args.classes,
                   "train.batch_size": 32},
    )

    ours_rows, ref_rows = [], []
    for i, fold in enumerate(folds):
        tr = data.subset(fold["train"])
        va = data.subset(fold["valid"])

        splits = {"train": to_device(tr), "valid": to_device(va),
                  "test": to_device(va)}
        result = run_fold(cfg, splits, epochs=args.epochs, fold_seed=i)
        ours_rows.append({
            "fold": i,
            "best_val_accuracy": result.best_val_accuracy,
            "test_accuracy": float(result.test.stats["accuracy"]),
            "macro_f1": float(result.test.stats["macro_f1"]),
        })
        print("ours", ours_rows[-1], flush=True)

        ref = run_reference(tr, va, args.epochs, seed=i,
                            classes=args.classes,
                            reference_path=args.reference_path)
        ref_rows.append({
            "fold": i,
            "best_val_accuracy": ref["best_val_accuracy"],
            "final_val_accuracy": ref["final_val_accuracy"],
        })
        print("ref ", ref_rows[-1], flush=True)

    def agg(rows, key):
        vals = [r[key] for r in rows if r.get(key) is not None]
        return {"mean": float(np.mean(vals)), "std": float(np.std(vals)),
                "per_fold": vals}

    summary = {
        "protocol": {
            "folds": args.folds, "epochs": args.epochs,
            "windows": args.windows, "classes": args.classes,
            "noise": args.noise, "label_flip": args.label_flip,
            "split": "video-level k-fold, valid==test (cv_dataloader.py)",
        },
        "ours": {
            "best_val_accuracy": agg(ours_rows, "best_val_accuracy"),
            "macro_f1": agg(ours_rows, "macro_f1"),
            "rows": ours_rows,
        },
        "reference": {
            "best_val_accuracy": agg(ref_rows, "best_val_accuracy"),
            "rows": ref_rows,
        },
    }
    o, r = summary["ours"], summary["reference"]
    diff = abs(o["best_val_accuracy"]["mean"] - r["best_val_accuracy"]["mean"])
    spread = max(r["best_val_accuracy"]["std"], 0.02)
    summary["parity"] = {"mean_gap": diff, "within_fold_spread": diff <= 2 * spread}

    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "parity_cv_results.json")
    json.dump(summary, open(out, "w"), indent=2)
    print(json.dumps({k: v for k, v in summary.items()
                      if k in ("protocol", "parity")}, indent=2))
    print("ours  CV acc %.4f ± %.4f" % (
        o["best_val_accuracy"]["mean"], o["best_val_accuracy"]["std"]))
    print("ref   CV acc %.4f ± %.4f" % (
        r["best_val_accuracy"]["mean"], r["best_val_accuracy"]["std"]))
    print("wrote", out)


if __name__ == "__main__":
    main()
