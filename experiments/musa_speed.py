"""musa family roofline close-out.

Round 3's cost split showed DropGraph is 10.7% of the step and refuted the
round-2 "masks dominate" claim; this script supplies the remaining half of
the close-out — WHICH bound the family runs at. Methodology is the
transformer close-out's: XLA's analytical cost model (FLOPs + bytes
accessed) of the exact jitted train step, compared against the measured
step time and v5e peaks (bf16 MXU ~197 TFLOP/s, HBM ~819 GB/s).

Run: ``python experiments/musa_speed.py`` (real chip).
Results: experiments/musa_speed_results.json, PARITY.md "musa roofline".
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

HBM_GB_PER_S = 819.0   # v5e peak HBM bandwidth
MXU_BF16_TFLOPS = 197.0

ARMS = {
    # tag -> (overrides, dtype)
    "full_bf16": ({}, "bfloat16"),
    "full_f32": ({}, "float32"),
    "nodrop_bf16": ({"model.kwargs.keep_prob": 1.0}, "bfloat16"),
    "fused_bf16": ({"model.kwargs.fused_dropgraph": True}, "bfloat16"),
}


def cost_analysis(overrides, dtype, batch_size=1024):
    from fall_multimodal_tpu.configs import load_config, preset_path
    from fall_multimodal_tpu.data import make_synthetic, to_device
    from fall_multimodal_tpu.data.pipeline import gather_batch
    from fall_multimodal_tpu.models import build_model
    from fall_multimodal_tpu.train import build_optimizer, create_train_state
    from fall_multimodal_tpu.train.loop import make_train_step

    cfg = load_config(preset_path("musa_harup"), overrides=overrides)
    data = make_synthetic(n_windows=batch_size, num_classes=11,
                          sensor_dim=15, seed=0)
    dev = to_device(data)
    model = build_model(cfg)
    optimizer = build_optimizer(cfg)
    state = create_train_state(model, optimizer, dev.features[:2],
                               dev.sensors[:2], seed=0)
    cd = jnp.bfloat16 if dtype == "bfloat16" else None
    step = jax.jit(make_train_step(model, optimizer, compute_dtype=cd))
    batch = gather_batch(dev, jnp.arange(batch_size))
    ca = step.lower(state, batch).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return {"flops": float(ca.get("flops", -1)),
            "bytes": float(ca.get("bytes accessed", -1))}


def main():
    from bench import measure

    results = {}
    for tag, (overrides, dtype) in ARMS.items():
        ca = cost_analysis(overrides, dtype)
        tp = measure("musa_harup", 1024, 15, 11, dtype,
                     windows=8192, epochs=5, overrides=overrides)
        floor_ms = 1000 * ca["bytes"] / (HBM_GB_PER_S * 1e9)
        row = {
            **ca,
            "measured_ms_per_step": tp["ms_per_step"],
            "windows_per_sec": tp["windows_per_sec"],
            "hbm_floor_ms": round(floor_ms, 2),
            "fraction_of_bandwidth_bound": round(
                floor_ms / tp["ms_per_step"], 4),
            "achieved_tflops": round(
                ca["flops"] / (tp["ms_per_step"] * 1e-3) / 1e12, 2),
            "mxu_utilization": round(
                ca["flops"] / (tp["ms_per_step"] * 1e-3) / 1e12
                / MXU_BF16_TFLOPS, 4),
        }
        results[tag] = row
        print(tag, json.dumps(row), flush=True)

    f, nd = results["full_bf16"], results["nodrop_bf16"]
    results["dropgraph_byte_fraction"] = round(
        1.0 - nd["bytes"] / f["bytes"], 4)

    out = os.path.join(os.path.dirname(__file__), "musa_speed_results.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
