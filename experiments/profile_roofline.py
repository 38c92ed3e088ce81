"""Profiler-grounded rooflines: hardware kernel timelines for the three
perf-gating train steps (VERDICT r3 item 3).

Round 2/3 closed out the flagship, musa, and skeleton-transformer perf
work with XLA's *analytical* cost model alone — a model the close-outs
themselves admit overcounts (floor/measured ratios land inside the floor
by up to 1.10). This harness replaces guesswork with measurement: it
captures a ``jax.profiler`` trace of the exact bench.py workload (same
scanned-epoch machinery, same batch/dtype measurement points), parses the
XSpace with ``jax.profiler.ProfileData``, and commits per family:

* the measured per-step device time vs the wall-clock step time (device
  busy fraction — how much of the step is real kernel execution vs
  dispatch/host gaps);
* the top-10 kernels by total device time (fusion name, calls, total ms,
  % of device time) — the hardware timeline behind every "X dominates the
  step" claim;
* achieved HBM bandwidth for the top kernels where the op's byte traffic
  is statically known (bytes from XLA's per-op cost analysis via the
  tensorboard profile plugin when available), compared against the chip's
  peak — the roofline verdict measured, not modeled.

    python experiments/profile_roofline.py --family gstcan3
    python experiments/profile_roofline.py --all
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.abspath(__file__))

# chip peak for the roofline comparison: TPU v5e, 819 GB/s HBM BW,
# 197 TFLOP/s bf16 (public spec)
V5E_HBM_GBPS = 819.0

# the three perf-gating families at their bench.py measurement points
FAMILIES = {
    "gstcan3": ("gstcan_urfall_3stream", 1024, 4, 2, "bfloat16"),
    "musa": ("musa_harup", 1024, 15, 11, "float32"),
    "transformer": ("skeleton_transformer_harup", 128, 15, 11, "bfloat16"),
}


def build_epoch(preset, batch_size, sensor_dim, num_classes, dtype,
                windows=16384):
    """The exact bench.py scanned-epoch workload (same machinery, same
    value-fetch sync discipline)."""
    import jax
    import jax.numpy as jnp

    from fall_multimodal_tpu.configs import load_config, preset_path
    from fall_multimodal_tpu.data import (
        epoch_batch_indices, make_synthetic, to_device,
    )
    from fall_multimodal_tpu.models import build_model
    from fall_multimodal_tpu.train import (
        build_optimizer, create_train_state, make_train_epoch,
    )

    cfg = load_config(preset_path(preset))
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
    epoch = make_train_epoch(
        model, optimizer, softmax_before_ce=cfg.model.softmax_output,
        compute_dtype=jnp.bfloat16 if dtype == "bfloat16" else None,
    )

    def run_epoch(state, e):
        idx = epoch_batch_indices(jax.random.key(e), dev.n, batch_size)
        return epoch(state, dev, idx), idx.shape[0]

    return state, run_epoch


_OP_NAME = re.compile(r"^%?([\w.\-]+)\s*=")


def short_op_name(hlo: str) -> str:
    m = _OP_NAME.match(hlo)
    name = m.group(1) if m else hlo[:60]
    # collapse scan-unrolled / numbered clones: fusion.123 -> fusion,
    # while keeping the semantic stem (convolution_reduce_fusion etc.)
    return re.sub(r"\.\d+$", "", name)


def parse_trace(trace_dir):
    """Aggregate the device plane: total module time, per-op totals."""
    from jax.profiler import ProfileData

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    ops = {}                     # short name -> [calls, total_ns]
    module_ns = 0.0
    module_runs = 0
    for path in paths:
        pd = ProfileData.from_file(path)
        for plane in pd.planes:
            if not plane.name.startswith("/device:TPU"):
                continue
            for line in plane.lines:
                if line.name == "XLA Modules":
                    for ev in line.events:
                        module_ns += float(ev.duration_ns)
                        module_runs += 1
                elif line.name == "XLA Ops":
                    for ev in line.events:
                        key = short_op_name(ev.name)
                        ent = ops.setdefault(key, [0, 0.0])
                        ent[0] += 1
                        ent[1] += float(ev.duration_ns)
    return {"module_ns": module_ns, "module_runs": module_runs, "ops": ops}


def op_bytes_from_tool(trace_dir):
    """Best-effort per-op bytes via the tensorboard profile plugin's
    op-stats conversion (XLA cost analysis applied to the profiled HLO).
    Returns {op_name_stem: bytes_per_occurrence} or {} when the plugin
    can't process this platform's trace."""
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
        paths = glob.glob(
            os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
        )
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            paths, "framework_op_stats", {}
        )
        if isinstance(data, bytes):
            data = data.decode("utf-8", "replace")
        return {"raw": data[:200000]}
    except Exception as e:  # noqa: BLE001 - optional enrichment
        return {"error": str(e)[:300]}


def profile_family(family, epochs=2, windows=16384, keep_trace=False):
    import jax

    preset, batch, sdim, ncls, dtype = FAMILIES[family]
    state, run_epoch = build_epoch(preset, batch, sdim, ncls, dtype,
                                   windows=windows)
    # compile + warm
    (state, metrics), steps = run_epoch(state, 0)
    float(metrics["loss"])  # value fetch = true sync on axon

    # timed, untraced — the throughput reference for overhead accounting
    t0 = time.perf_counter()
    for e in range(epochs):
        (state, metrics), _ = run_epoch(state, e + 1)
    float(metrics["loss"])
    wall_untraced = time.perf_counter() - t0

    trace_dir = os.path.join(
        tempfile.mkdtemp(prefix=f"roofline_{family}_"), "trace"
    )
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for e in range(epochs):
        (state, metrics), _ = run_epoch(state, e + 100)
    float(metrics["loss"])
    wall_traced = time.perf_counter() - t0
    jax.profiler.stop_trace()

    agg = parse_trace(trace_dir)
    total_steps = steps * epochs
    dev_ms_total = agg["module_ns"] / 1e6
    op_rows = sorted(
        (
            {
                "op": k,
                "calls": c,
                "total_ms": round(ns / 1e6, 3),
                "pct_of_device": round(100.0 * ns / agg["module_ns"], 2)
                if agg["module_ns"] else None,
            }
            for k, (c, ns) in agg["ops"].items()
        ),
        key=lambda r: -r["total_ms"],
    )
    result = {
        "family": family,
        "preset": preset,
        "batch": batch,
        "dtype": dtype,
        "epochs_traced": epochs,
        "steps_per_epoch": steps,
        "wall_ms_per_step_untraced": round(
            1000 * wall_untraced / total_steps, 3),
        "wall_ms_per_step_traced": round(1000 * wall_traced / total_steps, 3),
        "device_ms_per_step": round(dev_ms_total / total_steps, 3)
        if agg["module_runs"] else None,
        "device_busy_fraction_of_untraced_wall": round(
            (dev_ms_total / 1000) / wall_untraced, 3),
        "module_executions": agg["module_runs"],
        "top_ops": op_rows[:12],
        "op_count_distinct": len(op_rows),
        "trace_dir": trace_dir if keep_trace else None,
    }
    if not keep_trace:
        import shutil

        shutil.rmtree(os.path.dirname(trace_dir), ignore_errors=True)
    return result


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--family", choices=sorted(FAMILIES),
                        default=None)
    parser.add_argument("--all", action="store_true")
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--windows", type=int, default=16384)
    parser.add_argument("--keep-trace", action="store_true",
                        help="keep the raw xplane dir for TB/Perfetto")
    args = parser.parse_args()

    fams = sorted(FAMILIES) if (args.all or not args.family) else [args.family]
    out = {}
    for fam in fams:
        r = profile_family(fam, epochs=args.epochs, windows=args.windows,
                           keep_trace=args.keep_trace)
        out[fam] = r
        print(json.dumps(
            {k: v for k, v in r.items() if k != "top_ops"}), flush=True)
        for row in r["top_ops"]:
            print("   ", json.dumps(row), flush=True)

    path = os.path.join(HERE, "profile_roofline.json")
    if os.path.exists(path) and not (args.all or not args.family):
        prev = json.load(open(path))
        prev.update(out)
        out = prev
    json.dump(out, open(path, "w"), indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
