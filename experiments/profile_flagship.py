"""Cost-split profile of the flagship 3-stream train step (VERDICT r1 item 4).

Times scanned training epochs (identical machinery to bench.py, value-fetch
synced — axon's block_until_ready returns early) for the full flagship and
each component in isolation, so the dominant cost is measured rather than
guessed:

    python experiments/profile_flagship.py --batch-size 2048

Also retries larger batches (round-1's 4096 crashed the remote compile
helper) and bf16 vs f32.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_model(name, batch_size, windows=8192, epochs=3, dtype="bfloat16",
               kwargs=None):
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

    if name == "gstcan_3stream":
        cfg = load_config(preset_path("gstcan_urfall_3stream"))
    else:
        # clean config: preset kwargs are flagship-specific
        overrides = {"model.name": name, "data.num_classes": 2,
                     "data.sensor_dim": 4}
        for k, v in (kwargs or {}).items():
            overrides[f"model.kwargs.{k}"] = v
        cfg = load_config(None, overrides=overrides)
    data = make_synthetic(n_windows=windows, num_classes=2, sensor_dim=4, seed=0)
    dev = to_device(data)
    model = build_model(cfg)
    optimizer = build_optimizer(cfg)
    state = create_train_state(model, optimizer, dev.features[:2],
                               dev.sensors[:2], seed=0)
    compute_dtype = jnp.bfloat16 if dtype == "bfloat16" else None
    epoch = make_train_epoch(
        model, optimizer, softmax_before_ce=cfg.model.softmax_output,
        compute_dtype=compute_dtype,
    )
    warm = epoch_batch_indices(jax.random.key(0), dev.n, batch_size)
    state, m = epoch(state, dev, warm)
    float(m["loss"])  # value fetch = true sync on axon
    steps = warm.shape[0]

    t0 = time.perf_counter()
    for e in range(epochs):
        idx = epoch_batch_indices(jax.random.key(e + 1), dev.n, batch_size)
        state, m = epoch(state, dev, idx)
    float(m["loss"])
    dt = time.perf_counter() - t0
    wps = epochs * steps * batch_size / dt
    return {"model": name, "batch": batch_size, "dtype": dtype,
            "windows_per_sec": round(wps, 1),
            "ms_per_step": round(1000 * dt / (epochs * steps), 3)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=2048)
    parser.add_argument("--full-only", action="store_true")
    args = parser.parse_args()

    rows = []
    plan = [("gstcan_3stream", {})]
    if not args.full_only:
        plan += [
            ("two_stgcan", {}),        # pts + mot backbones, no sensor
            ("stgcan", {}),            # one backbone
            ("cnn_bilstm", {}),        # sensor head alone
        ]
    for name, kw in plan:
        try:
            row = time_model(name, args.batch_size, kwargs=kw)
        except Exception as e:  # noqa: BLE001 - survey harness
            row = {"model": name, "error": str(e)[:200]}
        rows.append(row)
        print(json.dumps(row), flush=True)

    # batch scaling of the flagship
    for bs in (1024, 4096, 8192):
        try:
            row = time_model("gstcan_3stream", bs)
        except Exception as e:  # noqa: BLE001
            row = {"model": "gstcan_3stream", "batch": bs,
                   "error": str(e)[:200]}
        rows.append(row)
        print(json.dumps(row), flush=True)

    # f32 point of comparison
    try:
        row = time_model("gstcan_3stream", args.batch_size, dtype="float32")
    except Exception as e:  # noqa: BLE001
        row = {"model": "gstcan_3stream_f32", "error": str(e)[:200]}
    rows.append(row)
    print(json.dumps(row), flush=True)

    with open(os.path.join(os.path.dirname(__file__), "profile_flagship.json"),
              "w") as fh:
        json.dump(rows, fh, indent=2)


if __name__ == "__main__":
    main()
