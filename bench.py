"""Benchmark harness: flagship 3-stream GSTCAN training throughput.

Measures fwd+bwd+update windows/sec on the attached accelerator for the
BASELINE.json north-star workload (UR-Fall 3-stream: pts STGCAN + motion
STGCAN + CNN_BiLSTM sensor, batch training step), and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "windows/sec", "vs_baseline": N}

Baseline: the PyTorch reference model (notebook-canonical
``TwoStreamSpatialTemporalGraph`` from ``GSTCAN_UR_conv.ipynb``) measured on
this machine's CPU (1 core, torch 2.x, batch 32, fwd+bwd+RMSprop step):
5.98 windows/sec. BASELINE.md's target is >= 20x that per chip.

Batch-size sweep on v5e (f32): 256 -> 91k, 512 -> 159k, 1024 -> 267k,
2048 -> 794k windows/s (default); 4096 crashes this toolchain's remote
compile helper (not an HBM limit), so 2048 is the practical ceiling here.
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
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--warmup", type=int, default=5)
    args = parser.parse_args()

    step, state, batch = build_flagship(args.batch_size)

    for _ in range(args.warmup):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    windows_per_sec = args.iters * args.batch_size / dt
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
