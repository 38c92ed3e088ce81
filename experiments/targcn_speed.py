"""TARGCN recurrence-formulation sweep on the real chip.

Measures the module path (``fast=false``: nn.scan over GraphGRUCell,
reference-shaped — per-step EmbGCN invariant recomputation) against the
hoisted formulations of ``_FastGRULayer`` (invariants-only vs additionally
precomputing all x-side matmuls over T) and ``lax.scan`` unroll factors,
with bench.py's exact measurement discipline (scanned epochs, value-fetch
sync). Writes targcn_speed_results.json next to this file.

Usage: python experiments/targcn_speed.py [--windows 16384] [--epochs 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import measure  # noqa: E402

_PX = "model.kwargs.precompute_x"

VARIANTS = {
    # tag -> (overrides, dtype)
    "module_path_f32": ({"model.kwargs.fast": False}, "float32"),
    "module_path_bf16": ({"model.kwargs.fast": False}, "bfloat16"),
    "inv_hoist_f32": ({_PX: False}, "float32"),
    "inv_hoist_bf16": ({_PX: False}, "bfloat16"),
    "inv_hoist_unroll5_bf16": (
        {_PX: False, "model.kwargs.unroll": 5}, "bfloat16"),
    "inv_hoist_unroll10_bf16": (
        {_PX: False, "model.kwargs.unroll": 10}, "bfloat16"),
    "precompute_x_f32": ({_PX: True}, "float32"),
    "precompute_x_bf16": ({_PX: True}, "bfloat16"),
    "precompute_x_unroll5_bf16": (
        {_PX: True, "model.kwargs.unroll": 5}, "bfloat16"),
    # the shipped default: hoist x only on layers with input >= hidden width
    "auto_f32": ({}, "float32"),
    "auto_bf16": ({}, "bfloat16"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=16384)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of variant tags")
    args = ap.parse_args()

    out = os.path.join(os.path.dirname(__file__), "targcn_speed_results.json")
    results = {}
    if os.path.exists(out):
        with open(out) as f:
            results = json.load(f)
    for tag, (overrides, dtype) in VARIANTS.items():
        if args.only and tag not in args.only:
            continue
        r = measure(
            "targcn_harup", args.batch_size, 15, 11, dtype,
            windows=args.windows, epochs=args.epochs, overrides=overrides,
        )
        results[tag] = r
        print(json.dumps({"variant": tag, **r}), flush=True)

    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
