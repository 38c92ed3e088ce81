"""Benchmark harness: flagship 3-stream GSTCAN training throughput.

Measures the framework's actual execution model — whole scanned epochs
(on-device shuffle + batch gather + fwd+bwd+update per step, zero host
round-trips) — on the BASELINE.json north-star workload (UR-Fall 3-stream:
pts STGCAN + motion STGCAN + CNN_BiLSTM sensor). Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "windows/sec", "vs_baseline": N}

Baseline: the PyTorch reference model (notebook-canonical
``TwoStreamSpatialTemporalGraph`` from ``GSTCAN_UR_conv.ipynb``) measured on
this machine's CPU (1 core, torch 2.x, batch 32, fwd+bwd+RMSprop step):
5.98 windows/sec. BASELINE.md's target is >= 20x that per chip.

Measurement notes (v5e):
* CRITICAL: on this axon remote-TPU platform ``block_until_ready`` returns
  before device execution completes — every timing here synchronizes by
  fetching the loss VALUE to host instead. (Un-synced timings inflate
  throughput by >100x; early round-1 numbers were corrected for this.)
* batch 4096 compiles as of round 2 (the round-1 crash was transient) but
  8192 still crashes the remote compile helper; throughput is flat across
  1024-4096, 2048 stays the default.
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


def build_flagship(batch_size: int):
    """Isolated train step (kept for kernel-level comparisons)."""
    from fall_multimodal_tpu.configs import load_config, preset_path
    from fall_multimodal_tpu.data.pipeline import DeviceData
    from fall_multimodal_tpu.models import build_model
    from fall_multimodal_tpu.train import build_optimizer, create_train_state
    from fall_multimodal_tpu.train.loop import make_train_step

    cfg = load_config(preset_path("gstcan_urfall_3stream"))
    model = build_model(cfg)
    optimizer = build_optimizer(cfg)

    rng = np.random.default_rng(0)
    skel = jnp.asarray(rng.normal(size=(batch_size, 30, 14, 3)), jnp.float32)
    sensor = jnp.asarray(rng.normal(size=(batch_size, 30, 4)), jnp.float32)
    labels = jax.nn.softmax(jnp.asarray(rng.normal(size=(batch_size, 2)), jnp.float32))
    batch = DeviceData(features=skel, labels=labels, sensors=sensor)

    state = create_train_state(model, optimizer, skel[:2], sensor[:2], seed=0)
    step = jax.jit(
        make_train_step(
            model, optimizer, softmax_before_ce=cfg.model.softmax_output
        ),
        donate_argnums=(0,),
    )
    return step, state, batch


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=2048)
    parser.add_argument("--windows", type=int, default=16384,
                        help="device-resident dataset size")
    parser.add_argument("--epochs", type=int, default=5,
                        help="timed scanned epochs")
    parser.add_argument("--dtype", choices=["float32", "bfloat16"],
                        default="bfloat16",
                        help="compute dtype (bf16 measured ~15%% faster and "
                             "matches the reference Gen-3 autocast; params "
                             "stay f32 either way)")
    args = parser.parse_args()

    from fall_multimodal_tpu.configs import load_config, preset_path
    from fall_multimodal_tpu.data import (
        epoch_batch_indices, make_synthetic, to_device,
    )
    from fall_multimodal_tpu.models import build_model
    from fall_multimodal_tpu.train import (
        build_optimizer, create_train_state, make_train_epoch,
    )

    cfg = load_config(preset_path("gstcan_urfall_3stream"))
    data = make_synthetic(
        n_windows=args.windows, num_classes=2, sensor_dim=4, seed=0
    )
    dev = to_device(data)
    model = build_model(cfg)
    optimizer = build_optimizer(cfg)
    state = create_train_state(
        model, optimizer, dev.features[:2], dev.sensors[:2], seed=0
    )
    compute_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    epoch = make_train_epoch(
        model, optimizer, softmax_before_ce=cfg.model.softmax_output,
        compute_dtype=compute_dtype,
    )

    warm_idx = epoch_batch_indices(jax.random.key(0), dev.n, args.batch_size)
    state, metrics = epoch(state, dev, warm_idx)           # compile
    float(metrics["loss"])                                 # real sync (see notes)
    steps = warm_idx.shape[0]

    t0 = time.perf_counter()
    for e in range(args.epochs):
        idx = epoch_batch_indices(jax.random.key(e + 1), dev.n, args.batch_size)
        state, metrics = epoch(state, dev, idx)
    float(metrics["loss"])                                 # value fetch = sync
    dt = time.perf_counter() - t0

    windows_per_sec = args.epochs * steps * args.batch_size / dt
    print(
        json.dumps(
            {
                "metric": "ur_fall_3stream_train_throughput",
                "value": round(windows_per_sec, 2),
                "unit": "windows/sec",
                "vs_baseline": round(windows_per_sec / REFERENCE_CPU_WINDOWS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
