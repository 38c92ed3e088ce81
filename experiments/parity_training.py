"""From-scratch training-parity experiment: reference torch models vs ours.

Real UR-Fall/HAR-UP archives are not mounted, so the notebooks' saved
anchors cannot be replicated directly; instead both frameworks train on
identical synthetic data under an identical protocol (each family's own
reference training cell: RMSprop, batch 32, CE on soft labels — e.g.
``GSTCAN_UR_conv.ipynb:7``) and their learning outcomes are compared.
``--family`` selects the head-to-head pair: ``gstcan`` (notebook 3-stream
flagship), ``musa`` (Gen-3 flagship), ``cnn_bilstm`` (sensor-only anchor),
``transformer`` (root skeleton_transformer.py), ``targcn`` (root TRAGCN
package). Reference arms execute the actual reference sources from
``--reference-path`` at runtime (importlib / notebook-cell exec) — nothing
is vendored.

Round-1 weakness (VERDICT): the old regime saturated at 1.0 for both
frameworks — a ceiling cannot detect a systematically-worse training
dynamic. This version makes the task hard enough that the reference lands
at 0.7–0.9 val accuracy (more classes, heavy feature noise, label flips,
few windows), runs N seeds per framework, and reports whether our mean
falls inside the reference's seed spread. Ours trains from torch-matching
init (``models/init.py``) — the round-2 default.

    python experiments/parity_training.py --epochs 12 --windows 240 \
        --classes 6 --noise 0.45 --label-flip 0.15 --seeds 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# runnable as `python experiments/parity_training.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def flip_labels(ds, rate: float, seed: int):
    """Move each flipped sample's soft label mass to a random other class
    (applied identically for both frameworks)."""
    if rate <= 0:
        return ds
    rng = np.random.default_rng(seed)
    labels = ds.labels.copy()
    n, k = labels.shape
    flip = rng.random(n) < rate
    for i in np.where(flip)[0]:
        true = int(labels[i].argmax())
        mass = labels[i, true]
        new = int(rng.integers(0, k - 1))
        new = new + 1 if new >= true else new
        labels[i, true] = 0.0
        labels[i, new] = mass
    import dataclasses

    return dataclasses.replace(ds, labels=labels)


def make_data(n_windows: int, classes: int, noise: float, label_flip: float,
              seed: int = 0, sensor_dim: int = 4):
    from fall_multimodal_tpu.data import make_synthetic, split_dataset

    data = make_synthetic(
        n_windows=n_windows, num_classes=classes, sensor_dim=sensor_dim,
        windows_per_video=16, noise=noise, seed=seed,
    )
    data = flip_labels(data, label_flip, seed=seed + 1)
    splits = split_dataset(data, split=(0.8, 0.2, 0.0), seed=9)
    return splits["train"], splits["valid"]


# identical optimizer protocol for BOTH arms, per family — each is the
# reference's own training cell's setting (TARGCN's notebook uses 1e-5,
# TARGCN_HAR_conv_10kfold.ipynb:3; every other family trains at 1e-3)
FAMILY_LR = {"gstcan": 1e-3, "musa": 1e-3, "cnn_bilstm": 1e-3,
             "transformer": 1e-3, "targcn": 1e-5, "ensemble": 1e-3}

# HAR-UP families consume the 15-channel accelerometer stream
# (har_create4_sensor.py:88-92); UR families the 4-channel one
FAMILY_SENSOR_DIM = {"gstcan": 4, "musa": 4, "cnn_bilstm": 4,
                     "transformer": 4, "targcn": 4, "ensemble": 15}


def run_ours(train_np, valid_np, epochs: int, seed: int, classes: int,
             batch_size: int = 32, family: str = "gstcan",
             lr: float = None):
    from fall_multimodal_tpu.configs import load_config, preset_path
    from fall_multimodal_tpu.data import to_device
    from fall_multimodal_tpu.train.cv import run_fold

    preset = {
        "gstcan": "gstcan_urfall_3stream",
        "musa": "musa_harup",
        "cnn_bilstm": "sensor_cnn_bilstm_urfall",
        "transformer": "skeleton_transformer_harup",
        "targcn": "targcn_harup",
        "ensemble": "transformer_ensemble_harup",
    }[family]
    cfg = load_config(
        preset_path(preset),
        overrides={"seed": seed, "data.num_classes": classes,
                   "train.batch_size": batch_size,
                   "optim.lr": lr or FAMILY_LR[family]},
    )
    splits = {
        "train": to_device(train_np),
        "valid": to_device(valid_np),
        "test": to_device(valid_np),
    }
    t0 = time.perf_counter()
    result = run_fold(cfg, splits, epochs=epochs)
    dt = time.perf_counter() - t0
    return {
        "framework": "fall_multimodal_tpu",
        "seed": seed,
        "best_val_accuracy": result.best_val_accuracy,
        "final_val_accuracy": result.history["val_acc"][-1],
        "final_train_accuracy": result.history["train_acc"][-1],
        "val_curve": [round(v, 4) for v in result.history["val_acc"]],
        "wall_seconds": dt,
    }


def run_reference_musa(train_np, valid_np, epochs: int, seed: int,
                       classes: int, reference_path: str,
                       batch_size: int = 32, lr: float = None):
    """Gen-3 flagship head-to-head: the vendored ``musa_model.py`` trained
    with the hard-coded ``Multimodal_Fall3/main.py:307-320,362`` config
    (coco_cut/uniform, bias/edge True, block_size 41, embed 64, n_stage 1,
    tanh, RMSprop 1e-3)."""
    import importlib.util

    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_musa_model",
        os.path.join(reference_path, "Multimodal_Fall3", "model",
                     "musa_model.py"),
    )
    mm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mm)

    torch.manual_seed(seed)
    model = mm.Model(
        num_class=classes, num_point=14, max_frame=300,
        graph=mm.adjGraph(layout="coco_cut", strategy="uniform"),
        bias=True, edge=True, block_size=41,
        embed_dim=64, n_stage=1, act_type="tanh",
    )

    def to_torch(ds):
        skel = torch.tensor(np.transpose(ds.features, (0, 3, 1, 2)))  # NCTV
        return skel, torch.tensor(ds.labels)

    def forward(model, split, idx):
        return model(split[0][idx])

    return _torch_train_eval_loop(
        model, to_torch(train_np), to_torch(valid_np), epochs, seed,
        lr or FAMILY_LR["musa"], batch_size, forward,
    )


def _torch_train_eval_loop(model, tr, va, epochs, seed, lr, batch_size,
                           forward):
    """Shared reference-arm loop: RMSprop + CE on soft labels, per-epoch
    val accuracy, best tracking (the common protocol of every reference
    training cell)."""
    import torch

    opt = torch.optim.RMSprop(model.parameters(), lr=lr)
    loss_fn = torch.nn.CrossEntropyLoss()
    n = len(tr[-1])

    def accuracy(split):
        model.eval()
        with torch.no_grad():
            out = forward(model, split, slice(None))
        return float((out.argmax(1) == split[-1].argmax(1)).float().mean())

    t0 = time.perf_counter()
    best, curve = 0.0, []
    rng = np.random.default_rng(seed)
    for _ in range(epochs):
        model.train()
        perm = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            idx = perm[i : i + batch_size]
            loss = loss_fn(forward(model, tr, idx), tr[-1][idx])
            loss.backward()
            opt.step()
            opt.zero_grad()
        va_acc = accuracy(va)
        curve.append(round(va_acc, 4))
        best = max(best, va_acc)
    dt = time.perf_counter() - t0
    return {
        "framework": "reference_torch",
        "seed": seed,
        "best_val_accuracy": best,
        "final_val_accuracy": curve[-1],
        "final_train_accuracy": accuracy(tr),
        "val_curve": curve,
        "wall_seconds": dt,
    }


def _ensure_torchvision_stub():
    """This image ships no torchvision; the reference only uses
    ``ops.StochasticDepth`` — stub it with torchvision's exact semantics
    (survival-scaled Bernoulli, one draw per call in "batch" mode,
    per-sample in "row" mode)."""
    import sys
    import types

    import torch

    if "torchvision" in sys.modules:
        return

    class _StochasticDepth(torch.nn.Module):
        def __init__(self, p, mode):
            super().__init__()
            self.p, self.mode = float(p), mode

        def forward(self, x):
            if not self.training or self.p == 0.0:
                return x
            keep = 1.0 - self.p
            size = (
                [x.shape[0]] + [1] * (x.ndim - 1)
                if self.mode == "row" else [1] * x.ndim
            )
            noise = torch.empty(
                size, dtype=x.dtype, device=x.device
            ).bernoulli_(keep)
            return x * noise / keep

    tv = types.ModuleType("torchvision")
    tv.ops = types.ModuleType("torchvision.ops")
    tv.ops.StochasticDepth = _StochasticDepth
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = tv.ops


def run_reference_transformer(train_np, valid_np, epochs: int, seed: int,
                              classes: int, reference_path: str,
                              batch_size: int = 32, lr: float = None):
    """Skeleton-transformer head-to-head: the root
    ``skeleton_transformer.py`` module (imported from the reference tree at
    runtime) trained per the notebook protocol
    (``GSTCAN_HAR_conv_kfold_trans.ipynb:25``: RMSprop 1e-3, CE,
    ``SkeletonTransformer(in_channels=3, n_joints=14, seq_len=30, ...)``
    on (B, C, T, V, M=1) inputs)."""
    import importlib.util

    import torch

    _ensure_torchvision_stub()

    spec = importlib.util.spec_from_file_location(
        "ref_skeleton_transformer",
        os.path.join(reference_path, "skeleton_transformer.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(seed)
    model = mod.SkeletonTransformer(
        in_channels=3, n_joints=14, seq_len=30, num_classes=classes,
        embedding_dim=32, n_block=6, head_dim=16, n_heads=8,
    )

    def to_torch(ds):
        # (N, T, V, C) -> (N, C, T, V, M=1), the reference forward contract
        skel = torch.tensor(
            np.transpose(ds.features, (0, 3, 1, 2))[..., None]
        )
        return (skel, torch.tensor(ds.labels))

    def forward(model, split, idx):
        return model(split[0][idx])

    return _torch_train_eval_loop(
        model, to_torch(train_np), to_torch(valid_np), epochs, seed,
        lr or FAMILY_LR["transformer"], batch_size, forward,
    )


def import_reference_targcn(reference_path: str):
    """Assemble the root ``TRAGCN.py``/``GRU.py``/``TA.py``/``EmbGCN.py``
    modules into the ``TRAGCN`` package layout their imports expect
    (``TRAGCN.zip``'s layout, ``TRAGCN.py:4-5``) in a temp dir and return
    the reference ``TARGCN`` class. Shared by this harness and the lockstep
    one (``parity_train_step_targcn.py``) so both close-out artifacts load
    the reference identically."""
    import shutil
    import sys
    import tempfile

    pkg_root = tempfile.mkdtemp(prefix="ref_targcn_")
    pkg = os.path.join(pkg_root, "TRAGCN")
    os.makedirs(pkg)
    for fname in ("EmbGCN.py", "GRU.py", "TA.py", "TRAGCN.py"):
        shutil.copy(os.path.join(reference_path, fname),
                    os.path.join(pkg, fname))
    open(os.path.join(pkg, "__init__.py"), "w").close()
    sys.path.insert(0, pkg_root)
    try:
        from TRAGCN.TRAGCN import TARGCN as RefTARGCN
    finally:
        sys.path.remove(pkg_root)
    return RefTARGCN


def run_reference_targcn(train_np, valid_np, epochs: int, seed: int,
                         classes: int, reference_path: str,
                         batch_size: int = 32, lr: float = None):
    """TARGCN head-to-head: the reference TRAGCN package (see
    :func:`import_reference_targcn`) trained per the notebook protocol
    (``TARGCN_HAR_conv_10kfold.ipynb:3``: ``TARGCN(adj=None)`` — the
    ``adj != None`` quirk's all-ones adjacency — RMSprop **1e-5**, CE, on
    (B, T, V, C) inputs)."""
    import torch

    RefTARGCN = import_reference_targcn(reference_path)

    torch.manual_seed(seed)
    model = RefTARGCN(num_classes=classes, adj=None)

    def to_torch(ds):
        return (torch.tensor(ds.features), torch.tensor(ds.labels))

    def forward(model, split, idx):
        return model(split[0][idx])

    return _torch_train_eval_loop(
        model, to_torch(train_np), to_torch(valid_np), epochs, seed,
        lr or FAMILY_LR["targcn"], batch_size, forward,
    )


def load_reference_cnn_bilstm_class(reference_path: str):
    """Execute the ``CNN_BiLSTM`` cell of ``GSTCAN_UR_sensor.ipynb`` and
    return the class (shared with ``cv_protocol.py``)."""
    import json as _json

    nb = _json.load(
        open(os.path.join(reference_path, "GSTCAN_UR_sensor.ipynb"))
    )
    cells = [c for c in nb["cells"] if c["cell_type"] == "code"]
    ns = {}
    exec("".join(cells[2]["source"]), ns)
    return ns["CNN_BiLSTM"]


def load_reference_gstcan_class(reference_path: str):
    """Execute the model cells of ``GSTCAN_UR_conv.ipynb`` and return the
    notebook-canonical ``TwoStreamSpatialTemporalGraph`` (shared with
    ``cv_protocol.py``)."""
    import json as _json

    nb = _json.load(open(os.path.join(reference_path, "GSTCAN_UR_conv.ipynb")))
    cells = [c for c in nb["cells"] if c["cell_type"] == "code"]
    ns = {}
    exec("".join(cells[1]["source"]) + "\n" + "".join(cells[2]["source"]), ns)
    return ns["TwoStreamSpatialTemporalGraph"]


def run_reference_cnn_bilstm(train_np, valid_np, epochs: int, seed: int,
                             classes: int, reference_path: str,
                             batch_size: int = 32, lr: float = None):
    """Sensor-only head-to-head: the notebook ``CNN_BiLSTM`` — the model
    behind the 0.98690 sensor-only BASELINE anchor
    (``GSTCAN_UR_sensor.ipynb:2``, trained per cell 6: RMSprop 1e-3, CE on
    soft labels, sensor stream only). The module hard-codes its output dim
    to 2 inside the class (the ignored-ctor-args quirk our port documents),
    so this arm requires ``classes == 2``."""
    import torch

    cls = load_reference_cnn_bilstm_class(reference_path)
    torch.manual_seed(seed)
    model = cls(hidden_size=16, num_layers=1, dropout_prob=0.3,
                num_classes=classes, feature="mean")

    def to_torch(ds):
        return (torch.tensor(ds.sensors), torch.tensor(ds.labels))

    def forward(model, split, idx):
        return model(split[0][idx])

    return _torch_train_eval_loop(
        model, to_torch(train_np), to_torch(valid_np), epochs, seed,
        lr or FAMILY_LR["cnn_bilstm"], batch_size, forward,
    )


def run_reference_ensemble(train_np, valid_np, epochs: int, seed: int,
                           classes: int, reference_path: str,
                           batch_size: int = 32, lr: float = None):
    """Ensemble head-to-head: the notebook ``Ensemble`` (skeleton
    transformer on pts + CNN_BiLSTM on the 15-ch sensor stream, per-stream
    logits concat -> Linear; ``GSTCAN_HAR_conv_kfold_trans.ipynb:3``),
    trained per the notebook's k-fold cell (``:8``: RMSprop 1e-3, CE,
    batch 32).

    The committed cell cannot execute as-is — three unblocking patches,
    each preserving the evident intent, are applied to the cell SOURCE
    before exec:

    1. ``num_classes`` is a free notebook global (used in
       ``nn.Linear(num_classes*2, num_classes)``) — bound to 11, the value
       every HAR-UP cell uses (and the hard-coded output dim of the
       CNN_BiLSTM sensor head in cell 2).
    2. ``SkeletonTransformer(n_joints=14, seq_len=30)`` omits the required
       ``in_channels``/``num_classes`` positional args (TypeError as
       committed) — filled with the values of the notebook's own
       standalone-transformer line (cell 8: ``in_channels=3 ...
       num_classes=11, embedding_dim=32, n_block=6, head_dim=16,
       n_heads=8``).
    3. ``forward`` references ``self.skeleton_transofrmer`` (typo) while
       ``__init__`` assigns ``self.skeleton_transformer`` (AttributeError
       as committed) — the typo is normalized.

    Our ``TransformerEnsemble`` implements the same patched semantics
    (``models/fusion.py``)."""
    import json as _json
    import sys

    import torch

    _ensure_torchvision_stub()

    nb = _json.load(
        open(os.path.join(reference_path, "GSTCAN_HAR_conv_kfold_trans.ipynb"))
    )
    cells = [c for c in nb["cells"] if c["cell_type"] == "code"]
    sensor_src = "".join(cells[2]["source"])       # CNN1D/BiLSTM/CNN_BiLSTM
    ens_src = "".join(cells[3]["source"])          # Ensemble
    ens_src = ens_src.replace(
        "SkeletonTransformer(n_joints=14,seq_len=30)",
        "SkeletonTransformer(in_channels=3,n_joints=14,seq_len=30,"
        "num_classes=num_classes,embedding_dim=32,n_block=6,head_dim=16,"
        "n_heads=8)",
    ).replace("self.skeleton_transofrmer(", "self.skeleton_transformer(")

    # cell 3 does `from skeleton_transformer import SkeletonTransformer`
    sys.path.insert(0, reference_path)
    try:
        ns = {"num_classes": classes}
        exec(sensor_src, ns)
        exec(ens_src, ns)
    finally:
        sys.path.remove(reference_path)

    torch.manual_seed(seed)
    model = ns["Ensemble"]()

    def to_torch(ds):
        # transformer stream: (N, T, V, C) -> (N, C, T, V, M=1)
        skel = torch.tensor(
            np.transpose(ds.features, (0, 3, 1, 2))[..., None]
        )
        return (skel, torch.tensor(ds.sensors), torch.tensor(ds.labels))

    def forward(model, split, idx):
        return model((split[0][idx], split[1][idx]))

    return _torch_train_eval_loop(
        model, to_torch(train_np), to_torch(valid_np), epochs, seed,
        lr or FAMILY_LR["ensemble"], batch_size, forward,
    )


def run_reference(train_np, valid_np, epochs: int, seed: int, classes: int,
                  reference_path: str, batch_size: int = 32,
                  lr: float = None):
    import contextlib
    import io

    import torch

    cls = load_reference_gstcan_class(reference_path)
    torch.manual_seed(seed)
    model = cls({"strategy": "spatial"}, classes)

    def to_torch(ds):
        skel = torch.tensor(np.transpose(ds.features, (0, 3, 1, 2)))  # NCTV
        mot = skel[:, :2, 1:] - skel[:, :2, :-1]
        sensor = torch.tensor(ds.sensors)
        labels = torch.tensor(ds.labels)
        return skel, mot, sensor, labels

    def forward(model, split, idx):
        # the notebook model prints shapes in forward; keep stdout clean
        with contextlib.redirect_stdout(io.StringIO()):
            return model((split[0][idx], split[1][idx], split[2][idx]))

    return _torch_train_eval_loop(
        model, to_torch(train_np), to_torch(valid_np), epochs, seed,
        lr or FAMILY_LR["gstcan"], batch_size, forward,
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=12)
    parser.add_argument("--windows", type=int, default=240)
    parser.add_argument("--classes", type=int, default=6)
    parser.add_argument("--noise", type=float, default=0.45)
    parser.add_argument("--label-flip", type=float, default=0.15)
    parser.add_argument("--seeds", type=int, default=3)
    parser.add_argument("--seed-start", type=int, default=0,
                        help="first seed to run (extend an earlier N-seed "
                             "result with seeds N..--seeds-1, then --merge "
                             "the two run files)")
    parser.add_argument("--reference-path", default="/root/reference")
    parser.add_argument("--skip-reference", action="store_true")
    parser.add_argument("--skip-ours", action="store_true",
                        help="reference arm only (e.g. to run the torch arm "
                             "on CPU while ours runs on TPU in a separate "
                             "process; merge the JSONs afterwards)")
    parser.add_argument("--merge", nargs=2, metavar=("OURS_JSON", "REF_JSON"),
                        default=None,
                        help="merge two single-arm result files into one "
                             "summary (no training)")
    parser.add_argument("--out", default=None)
    parser.add_argument(
        "--family",
        choices=["gstcan", "musa", "cnn_bilstm", "transformer", "targcn",
                 "ensemble"],
        default="gstcan",
    )
    parser.add_argument(
        "--lr", type=float, default=None,
        help="override the family protocol LR in BOTH arms (e.g. TARGCN's "
             "notebook 1e-5 never leaves chance in a short run)",
    )
    parser.add_argument("--cpu", action="store_true",
                        help="force the local CPU backend (the env var is "
                             "overridden by the axon plugin; the config "
                             "update wins)")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.family == "cnn_bilstm" and args.classes != 2:
        parser.error("--family cnn_bilstm requires --classes 2: the "
                     "reference module hard-codes its output dim to 2")
    if args.family == "ensemble" and args.classes != 11:
        parser.error("--family ensemble requires --classes 11: the "
                     "reference CNN_BiLSTM sensor head hard-codes its "
                     "output dim to 11")

    train_np, valid_np = make_data(
        args.windows, args.classes, args.noise, args.label_flip,
        sensor_dim=FAMILY_SENSOR_DIM[args.family],
    )
    ref_fn = {
        "gstcan": run_reference,
        "musa": run_reference_musa,
        "cnn_bilstm": run_reference_cnn_bilstm,
        "transformer": run_reference_transformer,
        "targcn": run_reference_targcn,
        "ensemble": run_reference_ensemble,
    }[args.family]
    rows = []
    if args.merge:
        for path in args.merge:
            rows.extend(json.load(open(path))["runs"])
    else:
        ref_kw = {"lr": args.lr} if args.lr else {}
        for seed in range(args.seed_start, args.seeds):
            if not args.skip_ours:
                rows.append(run_ours(train_np, valid_np, args.epochs, seed,
                                     args.classes, family=args.family,
                                     lr=args.lr))
                print(rows[-1], flush=True)
            if not args.skip_reference and os.path.isdir(args.reference_path):
                rows.append(
                    ref_fn(train_np, valid_np, args.epochs, seed,
                           args.classes, args.reference_path, **ref_kw)
                )
                print(rows[-1], flush=True)

    def stats(fw):
        accs = [r["best_val_accuracy"] for r in rows if r["framework"] == fw]
        # max-over-epochs on a small val set is a high-variance statistic;
        # the mean of the last 10 epochs is the robust companion number
        tails = [
            float(np.mean(r["val_curve"][-10:]))
            for r in rows if r["framework"] == fw
        ]
        return {
            "mean": float(np.mean(accs)), "std": float(np.std(accs)),
            "min": float(np.min(accs)), "max": float(np.max(accs)),
            "per_seed": accs,
            "last10_mean": float(np.mean(tails)),
            "last10_std": float(np.std(tails)),
            "last10_per_seed": tails,
        } if accs else None

    summary = {
        "regime": {
            "windows": args.windows, "classes": args.classes,
            "noise": args.noise, "label_flip": args.label_flip,
            "epochs": args.epochs, "seeds": args.seeds,
            "lr": args.lr or FAMILY_LR[args.family],
        },
        "ours": stats("fall_multimodal_tpu"),
        "reference": stats("reference_torch"),
        "runs": rows,
    }
    ref, ours = summary["reference"], summary["ours"]
    if ref and ours:
        spread = max(ref["max"] - ref["min"], 2 * ref["std"], 0.02)
        summary["ours_within_reference_spread"] = bool(
            ref["min"] - spread <= ours["mean"] <= ref["max"] + spread
        )
        summary["below_ceiling"] = bool(ref["max"] < 0.995 and ours["max"] < 0.995)

    summary["family"] = args.family
    suffix = "" if args.family == "gstcan" else f"_{args.family}"
    out = args.out or os.path.join(
        os.path.dirname(__file__), f"parity_results_belowceiling{suffix}.json"
    )
    with open(out, "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "runs"}, indent=2))


if __name__ == "__main__":
    main()
