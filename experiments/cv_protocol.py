"""Full-protocol 10-fold CV head-to-head: torch reference (CPU) vs ours (TPU).

Upgrades the BASELINE headline artifact from the round-3 miniature
(5 folds x 25 epochs x 480 windows) to the reference's own CV protocol
shape (``main_cross_validation.py:284-358`` /
``GSTCAN_UR_conv.ipynb:7``): **10 folds x 100 epochs x batch 32** on a
>=2k-window below-ceiling synthetic dataset (real archives are not
mounted). Both arms consume the SAME windows and the SAME video-level
fold indices; each arm writes the reference's
``cv_precision_recall_f1.csv`` (one row per fold: macro precision /
recall / f1 + test accuracy from the best-val model, valid == test per
fold, ``main_cross_validation.py:355-360``) plus total wall-clock — the
honest end-to-end "whole-CV time" comparison, not just steady-state w/s.

Feasibility note (1 CPU core on this box): the torch arm is only runnable
to completion for the sensor family (``cnn_bilstm``, the 0.98690 anchor
model). The flagship 3-stream torch arm at protocol scale is ~83 h at its
measured 5.98 windows/s — physically infeasible in any round — so
``--arm torch-measure`` instead times a bounded slice of fold 0 and
extrapolates the whole-CV wall-clock; flagship *accuracy* parity rests on
the committed 6-seed below-ceiling study + the 5x25 CV parity
(``parity_cv_results.json``), and this file's ours-arm upgrades the ours
side to full protocol.

    python experiments/cv_protocol.py --family cnn_bilstm --arm ours
    python experiments/cv_protocol.py --family cnn_bilstm --arm torch
    python experiments/cv_protocol.py --family gstcan3 --arm ours
    python experiments/cv_protocol.py --family gstcan3 --arm torch-measure
    python experiments/cv_protocol.py --family X --merge   # combine + summary
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parity_training import (  # noqa: E402
    flip_labels,
    load_reference_cnn_bilstm_class,
    load_reference_gstcan_class,
)

HERE = os.path.dirname(os.path.abspath(__file__))

FAMILIES = {
    "cnn_bilstm": ("sensor_cnn_bilstm_urfall", 4, 2),
    "gstcan3": ("gstcan_urfall_3stream", 4, 2),
}


def make_shared_data(args):
    """The one dataset + fold split both arms consume (seeded)."""
    from fall_multimodal_tpu.data import make_synthetic
    from fall_multimodal_tpu.data.splits import kfold_indices

    _, sensor_dim, classes = FAMILIES[args.family]
    data = make_synthetic(
        n_windows=args.windows, num_classes=classes, sensor_dim=sensor_dim,
        windows_per_video=16, noise=args.noise, seed=0,
    )
    data = flip_labels(data, args.label_flip, seed=1)
    folds = kfold_indices(data.videos, n_folds=args.folds, seed=42,
                          by_video=True)
    return data, folds


def run_ours(args, data, folds):
    from fall_multimodal_tpu.configs import load_config, preset_path
    from fall_multimodal_tpu.data import to_device
    from fall_multimodal_tpu.train.cv import run_fold

    preset, _, classes = FAMILIES[args.family]
    cfg = load_config(
        preset_path(preset),
        overrides={"seed": 0, "data.num_classes": classes,
                   "train.batch_size": args.batch_size},
    )
    rows = []
    t0 = time.perf_counter()
    for i, fold in enumerate(folds):
        tr = data.subset(fold["train"])
        va = data.subset(fold["valid"])
        splits = {"train": to_device(tr), "valid": to_device(va),
                  "test": to_device(va)}
        result = run_fold(cfg, splits, epochs=args.epochs, fold_seed=i)
        s = result.test.stats
        rows.append({
            "precision": float(s["macro_precision"]),
            "recall": float(s["macro_recall"]),
            "f1": float(s["macro_f1"]),
            "accuracy": float(s["accuracy"]),
        })
        print(f"ours fold {i}: acc {rows[-1]['accuracy']:.4f} "
              f"f1 {rows[-1]['f1']:.4f}", flush=True)
    wall = time.perf_counter() - t0
    return rows, wall


def _torch_setup(args, data, folds):
    import torch

    _, _, classes = FAMILIES[args.family]
    if args.family == "cnn_bilstm":
        cls = load_reference_cnn_bilstm_class(args.reference_path)

        def build(seed):
            torch.manual_seed(seed)
            return cls(hidden_size=16, num_layers=1, dropout_prob=0.3,
                       num_classes=classes, feature="mean")

        def tensors(ds):
            return (torch.tensor(ds.sensors), torch.tensor(ds.labels))

        def forward(model, split, idx):
            return model(split[0][idx])
    else:
        import contextlib
        import io

        cls = load_reference_gstcan_class(args.reference_path)

        def build(seed):
            torch.manual_seed(seed)
            return cls({"strategy": "spatial"}, classes)

        def tensors(ds):
            skel = torch.tensor(np.transpose(ds.features, (0, 3, 1, 2)))
            mot = skel[:, :2, 1:] - skel[:, :2, :-1]
            return (skel, mot, torch.tensor(ds.sensors),
                    torch.tensor(ds.labels))

        def forward(model, split, idx):
            with contextlib.redirect_stdout(io.StringIO()):
                return model((split[0][idx], split[1][idx], split[2][idx]))

    return build, tensors, forward


def run_torch(args, data, folds):
    """The reference CV driver's protocol, executed with the live reference
    model: per fold — fresh model + RMSprop(1e-3), CE on soft labels,
    best-val state tracked and reloaded for the final test
    (``main_cross_validation.py:322-352``)."""
    import torch
    from sklearn.metrics import precision_recall_fscore_support

    build, tensors, forward = _torch_setup(args, data, folds)
    loss_fn = torch.nn.CrossEntropyLoss()
    rows = []
    t0 = time.perf_counter()
    for i, fold in enumerate(folds):
        tr = tensors(data.subset(fold["train"]))
        va = tensors(data.subset(fold["valid"]))
        model = build(seed=i)
        opt = torch.optim.RMSprop(model.parameters(), lr=1e-3)
        n = len(tr[-1])
        rng = np.random.default_rng(i)
        best_acc, best_state = -1.0, None

        def val_accuracy():
            model.eval()
            with torch.no_grad():
                out = forward(model, va, slice(None))
            return float(
                (out.argmax(1) == va[-1].argmax(1)).float().mean()), out

        for _ in range(args.epochs):
            model.train()
            perm = rng.permutation(n)
            for s in range(0, n - args.batch_size + 1, args.batch_size):
                idx = perm[s : s + args.batch_size]
                loss = loss_fn(forward(model, tr, idx), tr[-1][idx])
                loss.backward()
                opt.step()
                opt.zero_grad()
            acc, _ = val_accuracy()
            if acc > best_acc:
                best_acc = acc
                best_state = copy.deepcopy(model.state_dict())

        model.load_state_dict(best_state)
        acc, out = val_accuracy()
        pred = out.argmax(1).numpy()
        labels = va[-1].argmax(1).numpy()
        p, r, f1, _ = precision_recall_fscore_support(
            labels, pred, average="macro", zero_division=0)
        rows.append({"precision": float(p), "recall": float(r),
                     "f1": float(f1), "accuracy": acc})
        print(f"torch fold {i}: acc {acc:.4f} f1 {f1:.4f} "
              f"({time.perf_counter() - t0:.0f}s elapsed)", flush=True)
    wall = time.perf_counter() - t0
    return rows, wall


def run_torch_measure(args, data, folds):
    """Bounded-slice wall-clock measurement of the torch arm (for the
    family where full protocol is infeasible on 1 CPU core): train fold 0
    for --measure-epochs epochs, measure steady-state windows/s, and
    extrapolate the whole-CV wall-clock."""
    import torch

    build, tensors, forward = _torch_setup(args, data, folds)
    loss_fn = torch.nn.CrossEntropyLoss()
    fold = folds[0]
    tr = tensors(data.subset(fold["train"]))
    va = tensors(data.subset(fold["valid"]))
    model = build(seed=0)
    opt = torch.optim.RMSprop(model.parameters(), lr=1e-3)
    n = len(tr[-1])
    rng = np.random.default_rng(0)
    b = args.batch_size
    steps = len(range(0, n - b + 1, b))

    def one_epoch():
        model.train()
        perm = rng.permutation(n)
        for s in range(0, n - b + 1, b):
            idx = perm[s : s + b]
            loss = loss_fn(forward(model, tr, idx), tr[-1][idx])
            loss.backward()
            opt.step()
            opt.zero_grad()
        model.eval()
        with torch.no_grad():
            out = forward(model, va, slice(None))
        return float((out.argmax(1) == va[-1].argmax(1)).float().mean())

    one_epoch()                                   # warm caches
    t0 = time.perf_counter()
    for _ in range(args.measure_epochs):
        one_epoch()
    dt = time.perf_counter() - t0
    per_epoch = dt / args.measure_epochs
    wps = steps * b / per_epoch
    # extrapolate: mean train-fold size across folds ~ fold 0's
    total_epochs = args.folds * args.epochs
    est_wall = per_epoch * total_epochs
    return {
        "measured_epochs": args.measure_epochs,
        "seconds_per_epoch": round(per_epoch, 2),
        "train_windows_per_sec": round(wps, 2),
        "estimated_whole_cv_wall_seconds": round(est_wall, 1),
        "estimated_whole_cv_wall_hours": round(est_wall / 3600, 2),
        "note": "extrapolated: fold-0 epoch time x folds x epochs; "
                "full torch protocol infeasible on 1 CPU core",
    }


def write_csv(rows, path):
    import csv

    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["", "precision", "recall", "f1", "accuracy"])
        for i, r in enumerate(rows):
            w.writerow([i, r["precision"], r["recall"], r["f1"],
                        r["accuracy"]])


def agg(rows, key):
    vals = [r[key] for r in rows]
    return {"mean": round(float(np.mean(vals)), 4),
            "std": round(float(np.std(vals)), 4)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--family", choices=sorted(FAMILIES),
                        default="cnn_bilstm")
    parser.add_argument("--arm",
                        choices=["ours", "torch", "torch-measure", "merge"],
                        default="merge")
    parser.add_argument("--folds", type=int, default=10)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--windows", type=int, default=2304)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--noise", type=float, default=0.45)
    parser.add_argument("--label-flip", type=float, default=0.15)
    parser.add_argument("--measure-epochs", type=int, default=3)
    parser.add_argument("--reference-path", default="/root/reference")
    args = parser.parse_args()

    protocol = {
        "family": args.family, "folds": args.folds, "epochs": args.epochs,
        "windows": args.windows, "batch_size": args.batch_size,
        "noise": args.noise, "label_flip": args.label_flip,
        "split": "video-level 10-fold, valid==test "
                 "(main_cross_validation.py:284-358)",
    }
    tag = f"cv_protocol_{args.family}"

    if args.arm == "ours":
        data, folds = make_shared_data(args)
        rows, wall = run_ours(args, data, folds)
        payload = {
            "protocol": protocol, "arm": "ours",
            "backend": __import__("jax").default_backend(),
            "wall_seconds": round(wall, 1), "rows": rows,
            "accuracy": agg(rows, "accuracy"), "f1": agg(rows, "f1"),
        }
        write_csv(rows, os.path.join(HERE, f"{tag}_ours.csv"))
        json.dump(payload, open(os.path.join(HERE, f"{tag}_ours.json"), "w"),
                  indent=2)
    elif args.arm == "torch":
        data, folds = make_shared_data(args)
        rows, wall = run_torch(args, data, folds)
        payload = {
            "protocol": protocol, "arm": "reference_torch_cpu",
            "wall_seconds": round(wall, 1), "rows": rows,
            "accuracy": agg(rows, "accuracy"), "f1": agg(rows, "f1"),
        }
        write_csv(rows, os.path.join(HERE, f"{tag}_torch.csv"))
        json.dump(payload, open(os.path.join(HERE, f"{tag}_torch.json"), "w"),
                  indent=2)
    elif args.arm == "torch-measure":
        data, folds = make_shared_data(args)
        payload = {"protocol": protocol, "arm": "reference_torch_cpu",
                   **run_torch_measure(args, data, folds)}
        json.dump(payload,
                  open(os.path.join(HERE, f"{tag}_torch_measure.json"), "w"),
                  indent=2)
    else:  # merge
        ours = json.load(open(os.path.join(HERE, f"{tag}_ours.json")))
        torch_path = os.path.join(HERE, f"{tag}_torch.json")
        measure_path = os.path.join(HERE, f"{tag}_torch_measure.json")
        payload = {"protocol": ours["protocol"], "ours": ours}
        if os.path.exists(torch_path):
            ref = json.load(open(torch_path))
            payload["reference"] = ref
            payload["headline"] = {
                "accuracy_gap": round(
                    ours["accuracy"]["mean"] - ref["accuracy"]["mean"], 4),
                "f1_gap": round(ours["f1"]["mean"] - ref["f1"]["mean"], 4),
                "within_fold_spread": bool(
                    abs(ours["accuracy"]["mean"] - ref["accuracy"]["mean"])
                    <= 2 * max(np.std([r["accuracy"] for r in ref["rows"]]),
                               0.02)),
                "whole_cv_speedup": round(
                    ref["wall_seconds"] / ours["wall_seconds"], 1),
            }
        if os.path.exists(measure_path):
            m = json.load(open(measure_path))
            payload["reference_measured"] = m
            payload.setdefault("headline", {})[
                "whole_cv_speedup_extrapolated"] = round(
                m["estimated_whole_cv_wall_seconds"] / ours["wall_seconds"],
                1)
        json.dump(payload, open(os.path.join(HERE, f"{tag}.json"), "w"),
                  indent=2)

    print(json.dumps(payload, indent=2)[:4000])


if __name__ == "__main__":
    main()
