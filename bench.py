"""Benchmark harness: per-family training throughput on the real chip.

Default (no args): the flagship 3-stream GSTCAN — the BASELINE.json
north-star workload (UR-Fall 3-stream: pts STGCAN + motion STGCAN +
CNN_BiLSTM sensor). Measures the framework's actual execution model — whole
scanned epochs (on-device shuffle + batch gather + fwd+bwd+update per step,
zero host round-trips) — and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "windows/sec", "vs_baseline": N}

``--family {gstcan3,bilstm,cnn_bilstm,musa,targcn,transformer}`` reproduces
the corresponding row of PARITY.md's per-family throughput table with the
same measurement discipline (VERDICT r2 item 3: every row re-derivable from
one committed command). ``--family musa --cost-split`` additionally times
the DropGraph-disabled model (keep_prob=1.0 compiles the masks away), the
per-block-shared mask pipeline, and bf16 — the committed artifact behind
the "DropGraph masks dominate musa" claim. ``--family gstcan3
--cost-split`` decomposes the flagship step by ablation (2-stream /
1-stream / sparse-GCN arms): the step is exactly the two skeleton
backbones — the sensor head measures at 0.0% (PARITY.md "Flagship cost
split").

Baseline: the PyTorch reference model (notebook-canonical
``TwoStreamSpatialTemporalGraph`` from ``GSTCAN_UR_conv.ipynb``) measured on
this machine's CPU (1 core, torch 2.x, batch 32, fwd+bwd+RMSprop step):
5.98 windows/sec. BASELINE.md's target is >= 20x that per chip. The other
families have no reference throughput at all (the reference's only
instrumentation is a per-step ETA, ``main.py:137-142``); their
``vs_baseline`` is reported against the same 5.98 w/s for scale.

Measurement notes (v5e):
* CRITICAL: on this axon remote-TPU platform ``block_until_ready`` returns
  before device execution completes — every timing here synchronizes by
  fetching the loss VALUE to host instead. (Un-synced timings inflate
  throughput by >100x; early round-1 numbers were corrected for this.)
* batch 4096 compiles as of round 2 (the round-1 crash was transient) but
  8192 still crashes the remote compile helper; round 3 remeasured the
  1024-4096 range and 1024 reproducibly wins (~+3% over 2048), so 1024 is
  the flagship default.
* round 2: the GCN runs in dense mode by default (adjacency folded into
  the weights, models/layers.py GraphConv.dense_mode) — measured +49%
  (9.15k -> 13.6k windows/s) on the HBM-bound step.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_CPU_WINDOWS_PER_SEC = 5.98

# family -> (preset, default batch, sensor_dim, num_classes, default dtype)
# batches and dtypes are the PARITY.md table's measurement points (the
# dtype is each family's measured winner; --dtype overrides).
FAMILIES = {
    # gstcan3: 1024 reproducibly edges out 2048 (14.26k vs 13.9k w/s bf16,
    # two runs each, round 3); throughput is flat-to-falling above that.
    "gstcan3": ("gstcan_urfall_3stream", 1024, 4, 2, "bfloat16"),
    "bilstm": ("bilstm", 1024, 15, 11, "bfloat16"),
    "cnn_bilstm": ("sensor_cnn_bilstm_urfall", 1024, 4, 2, "float32"),
    "musa": ("musa_harup", 1024, 15, 11, "float32"),
    "targcn": ("targcn_harup", 1024, 15, 11, "bfloat16"),
    # transformer: throughput falls with batch above 128 (kernel-
    # serialization bound; round-3 sweep 64/128/256/512 in PARITY.md)
    "transformer": ("skeleton_transformer_harup", 128, 15, 11, "bfloat16"),
    # ensemble: skeleton transformer + CNN_BiLSTM logit concat
    # (GSTCAN_HAR_conv_kfold_trans.ipynb:3); inherits the transformer's
    # batch-128 serialization bound since it dominates the step
    "ensemble": ("transformer_ensemble_harup", 128, 15, 11, "bfloat16"),
}


def measure(
    preset: str,
    batch_size: int,
    sensor_dim: int,
    num_classes: int,
    dtype: str,
    windows: int = 16384,
    epochs: int = 5,
    overrides=None,
):
    """Scanned-epoch training throughput (windows/sec), value-fetch synced."""
    from fall_multimodal_tpu.configs import load_config, preset_path
    from fall_multimodal_tpu.data import (
        epoch_batch_indices, make_synthetic, to_device,
    )
    from fall_multimodal_tpu.models import build_model
    from fall_multimodal_tpu.train import (
        build_optimizer, create_train_state, make_train_epoch,
    )

    cfg = load_config(preset_path(preset), overrides=overrides or {})
    data = make_synthetic(
        n_windows=windows, num_classes=num_classes, sensor_dim=sensor_dim,
        seed=0,
    )
    dev = to_device(data)
    model = build_model(cfg)
    optimizer = build_optimizer(cfg)
    state = create_train_state(
        model, optimizer, dev.features[:2], dev.sensors[:2], seed=0
    )
    compute_dtype = jnp.bfloat16 if dtype == "bfloat16" else None
    from fall_multimodal_tpu.data.augment import make_augment_fn

    epoch = make_train_epoch(
        model, optimizer, softmax_before_ce=cfg.model.softmax_output,
        compute_dtype=compute_dtype,
        augment_fn=make_augment_fn(cfg.augment, cfg.graph.layout),
    )

    warm_idx = epoch_batch_indices(jax.random.key(0), dev.n, batch_size)
    state, metrics = epoch(state, dev, warm_idx)           # compile
    float(metrics["loss"])                                 # real sync (see notes)
    steps = warm_idx.shape[0]

    t0 = time.perf_counter()
    for e in range(epochs):
        idx = epoch_batch_indices(jax.random.key(e + 1), dev.n, batch_size)
        state, metrics = epoch(state, dev, idx)
    float(metrics["loss"])                                 # value fetch = sync
    dt = time.perf_counter() - t0
    wps = epochs * steps * batch_size / dt
    return {
        "windows_per_sec": round(wps, 2),
        "ms_per_step": round(1000 * dt / (epochs * steps), 3),
        "batch": batch_size,
        "dtype": dtype,
        "steps_per_epoch": steps,
    }


def musa_cost_split(batch_size: int, windows: int, epochs: int):
    """The committed artifact behind the musa DropGraph cost claim: times
    the shipped model, the DropGraph-free model (keep_prob=1.0 — every mask
    pipeline compiles away), and both in bf16. The DropGraph share of the
    step is 1 - t_nodrop/t_full."""
    rows = {}
    for tag, dtype, kp in (
        ("full_f32", "float32", None),
        ("full_bf16", "bfloat16", None),
        ("nodrop_f32", "float32", 1.0),
        ("nodrop_bf16", "bfloat16", 1.0),
    ):
        overrides = {}
        if kp is not None:
            overrides["model.kwargs.keep_prob"] = kp
        rows[tag] = measure(
            "musa_harup", batch_size, 15, 11, dtype,
            windows=windows, epochs=epochs, overrides=overrides,
        )
    f, nf = rows["full_f32"], rows["nodrop_f32"]
    rows["dropgraph_fraction_of_step_f32"] = round(
        1.0 - nf["ms_per_step"] / f["ms_per_step"], 4
    )
    rows["dropgraph_ms_per_step_f32"] = round(
        f["ms_per_step"] - nf["ms_per_step"], 3
    )
    return rows


def gstcan3_cost_split(batch_size: int, windows: int, epochs: int):
    """Flagship step decomposition by ablation arms (all bf16, the shipped
    dtype): the full 3-stream model, the 2-stream pts+motion model (sensor
    head removed), the single-stream backbone, and the 3-stream model with
    the dense GCN fold disabled. Derived shares: the sensor head is
    1 - t_2stream/t_full of the step; one backbone is ~(t_2stream -
    t_1stream); the dense fold's win is t_sparse/t_full."""
    arms = {
        "full_3stream": ("gstcan_urfall_3stream", {}),
        "two_stream": ("twostream_stgcan", {"data.num_classes": 2}),
        "one_stream": ("default_urfall", {}),
        "sparse_gcn_3stream": (
            "gstcan_urfall_3stream", {"model.kwargs.dense_gcn": False},
        ),
    }
    rows = {}
    for tag, (preset, overrides) in arms.items():
        rows[tag] = measure(
            preset, batch_size, 4, 2, "bfloat16",
            windows=windows, epochs=epochs, overrides=overrides,
        )
    t3 = rows["full_3stream"]["ms_per_step"]
    t2 = rows["two_stream"]["ms_per_step"]
    t1 = rows["one_stream"]["ms_per_step"]
    rows["sensor_head_fraction_of_step"] = round(1.0 - t2 / t3, 4)
    rows["one_backbone_ms_per_step"] = round(t2 - t1, 3)
    rows["dense_fold_speedup"] = round(
        rows["sparse_gcn_3stream"]["ms_per_step"] / t3, 3
    )
    return rows


_COST_SPLITS = {"musa": musa_cost_split, "gstcan3": gstcan3_cost_split}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--family", choices=sorted(FAMILIES), default="gstcan3",
                        help="PARITY.md per-family table row to reproduce")
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--windows", type=int, default=16384,
                        help="device-resident dataset size")
    parser.add_argument("--epochs", type=int, default=5,
                        help="timed scanned epochs")
    parser.add_argument("--dtype", choices=["float32", "bfloat16"],
                        default=None,
                        help="compute dtype (default: the family's measured "
                             "winner; params stay f32 either way)")
    parser.add_argument("--repeats", type=int, default=1,
                        help="re-measure N times in-process and report the "
                             "median windows/sec with the min..max band "
                             "(PARITY.md's per-family rows use 5; the "
                             "sensor-family rows drift ~20% day-to-day, so "
                             "single runs are not citable)")
    parser.add_argument("--augment", action="store_true",
                        help="measure with the canonical augmentation recipe "
                             "on (rotate 15deg, scale 0.1, flip 0.5, jitter "
                             "0.01, sensor noise 0.02) — quantifies the "
                             "on-device augmentation overhead")
    parser.add_argument("--cost-split", action="store_true",
                        help="with --family musa: the DropGraph on/off/bf16 "
                             "cost decomposition; with --family gstcan3: "
                             "the stream/sensor-head/dense-fold ablation "
                             "decomposition")
    args = parser.parse_args()

    preset, d_batch, sensor_dim, num_classes, d_dtype = FAMILIES[args.family]
    batch = args.batch_size or d_batch
    dtype = args.dtype or d_dtype

    if args.cost_split:
        if args.augment:
            # the decomposition arms build their own epochs and would run
            # unaugmented; refuse rather than print mislabeled numbers
            raise SystemExit(
                "--augment does not apply to --cost-split (the decomposition "
                "measures the raw-window step); drop one of the flags"
            )
        if args.family not in _COST_SPLITS:
            raise SystemExit(
                f"--cost-split is defined for --family "
                f"{{{','.join(sorted(_COST_SPLITS))}}}"
            )
        rows = _COST_SPLITS[args.family](batch, args.windows, args.epochs)
        print(json.dumps({"metric": f"{args.family}_cost_split", **rows}))
        return

    overrides = None
    if args.augment:
        overrides = {
            "augment.enabled": True, "augment.rotate_deg": 15,
            "augment.scale": 0.1, "augment.flip_prob": 0.5,
            "augment.joint_jitter": 0.01, "augment.sensor_noise": 0.02,
        }
    reps = [
        measure(preset, batch, sensor_dim, num_classes, dtype,
                windows=args.windows, epochs=args.epochs, overrides=overrides)
        for _ in range(max(1, args.repeats))
    ]
    wps = sorted(r["windows_per_sec"] for r in reps)
    r = {**reps[0], "windows_per_sec": wps[len(wps) // 2]}
    metric = (
        "ur_fall_3stream_train_throughput"
        if args.family == "gstcan3"
        else f"{args.family}_train_throughput"
    )
    if args.augment:
        metric += "_augmented"
    line = {
        "metric": metric,
        "value": r["windows_per_sec"],
        "unit": "windows/sec",
        "vs_baseline": round(
            r["windows_per_sec"] / REFERENCE_CPU_WINDOWS_PER_SEC, 2
        ),
    }
    if len(wps) > 1:
        line["spread"] = {"repeats": len(wps), "min": wps[0], "max": wps[-1]}
    print(json.dumps(line))


if __name__ == "__main__":
    main()
