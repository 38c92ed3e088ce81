"""A/B the skeleton transformer's attention layout variants on the chip.

The round-4 profiler trace (``profile_roofline.json``) corrected the
round-3 "kernel serialization" story: ~43% of the transformer train
step's device time is raw layout-conversion ``copy`` ops on the attention
intermediates — e.g. bf16[128,14,8,30,30] logits whose (30,30) minor
pair tiles to physical (32,128) blocks (4.5x padding waste), copied
between the layouts the producer and consumer matmuls prefer.

Which einsum form minimizes those copies is an empirical question, so the
model exposes ``attn_impl``:

* ``resident`` (round-3 default): temporal attention over axis=-3 in the
  resident (N, M, T, V, C) layout — no transposes in the HLO;
* ``swap``: reference-style swapaxes -> axis=-2 attention -> swap back —
  explicit transposes of lane-aligned C=128 activations instead of XLA's
  implicit relayouts of the logits monsters.

This harness measures bench.py-style scanned-epoch train throughput for
both variants across a batch sweep and writes
``transformer_attn_variants.json``; the winner becomes the preset
default (PARITY.md "Skeleton transformer close-out").

    python experiments/transformer_attn_variants.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", type=int, nargs="+",
                        default=[128, 256, 512])
    parser.add_argument("--windows", type=int, default=16384)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--repeats", type=int, default=3)
    args = parser.parse_args()

    import bench

    rows = []
    for impl in ("resident", "swap"):
        for batch in args.batches:
            reps = [
                bench.measure(
                    "skeleton_transformer_harup", batch, 15, 11, "bfloat16",
                    windows=args.windows, epochs=args.epochs,
                    overrides={"model.kwargs.attn_impl": impl},
                )
                for _ in range(args.repeats)
            ]
            wps = sorted(r["windows_per_sec"] for r in reps)
            row = {
                "attn_impl": impl,
                "batch": batch,
                "windows_per_sec_median": wps[len(wps) // 2],
                "windows_per_sec_min": wps[0],
                "windows_per_sec_max": wps[-1],
                "ms_per_step": reps[0]["ms_per_step"],
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    best = max(rows, key=lambda r: r["windows_per_sec_median"])
    payload = {"rows": rows, "best": best,
               "baseline_note": "round-3 shipped resident @ batch 128"}
    json.dump(payload,
              open(os.path.join(HERE, "transformer_attn_variants.json"), "w"),
              indent=2)
    print("best:", json.dumps(best))


if __name__ == "__main__":
    main()
