"""Skeleton-transformer family close-out (VERDICT r2 item 2).

Round 2 left this family at 1,432 w/s bf16 with an ablation argument
("small-shape bound") but no quantified bound. This script produces both
halves of the close-out:

1. **Throughput** of the training step (scanned epochs, value-fetch synced
   — bench.py discipline) for the shipped model, before/after the round-3
   attention restructure (transpose-free temporal attention + matmul/gather
   rel-pos bias — models/skeleton_transformer.py RelPosMHSA).
2. **An achievable-rate bound**: the same step is costed with XLA's
   analytical model (FLOPs + bytes accessed), and a shape-equivalent
   synthetic matmul stack (same (rows, contraction, out) GEMM list as the
   model's Dense/attention contractions, no attention semantics) is
   *measured* — its throughput is what the hardware permits for this
   architecture's shapes; the model's fraction of it is the close-out
   number.

Run: ``python experiments/transformer_speed.py`` (real chip).
Results: experiments/transformer_speed_results.json, PARITY.md.
"""

from __future__ import annotations

import argparse
import json
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def throughput(batch_size=512, windows=8192, epochs=3, dtype="bfloat16",
               n_block=6, fwd_only=False):
    from fall_multimodal_tpu.configs import load_config, preset_path
    from fall_multimodal_tpu.data import (
        epoch_batch_indices, make_synthetic, to_device,
    )
    from fall_multimodal_tpu.models import build_model
    from fall_multimodal_tpu.train import (
        build_optimizer, create_train_state, make_train_epoch,
    )

    cfg = load_config(
        preset_path("skeleton_transformer_harup"),
        overrides={"model.kwargs.n_block": n_block} if n_block != 6 else {},
    )
    data = make_synthetic(n_windows=windows, num_classes=11, sensor_dim=15, seed=0)
    dev = to_device(data)
    model = build_model(cfg)
    optimizer = build_optimizer(cfg)
    state = create_train_state(model, optimizer, dev.features[:2],
                               dev.sensors[:2], seed=0)
    compute_dtype = jnp.bfloat16 if dtype == "bfloat16" else None

    if fwd_only:
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        @jax.jit
        def fwd(v, f, s):
            if compute_dtype is not None:
                v = jax.tree.map(lambda x: x.astype(compute_dtype), v)
                f, s = f.astype(compute_dtype), s.astype(compute_dtype)
            return model.apply(v, f, s, train=False)

        f = dev.features[:batch_size]
        s = dev.sensors[:batch_size]
        out = fwd(variables, f, s)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            out = fwd(variables, f, s)
        float(jnp.sum(out))
        dt = time.perf_counter() - t0
        return {"windows_per_sec": round(reps * batch_size / dt, 1),
                "ms_per_step": round(1000 * dt / reps, 3)}

    epoch = make_train_epoch(model, optimizer, compute_dtype=compute_dtype)
    warm = epoch_batch_indices(jax.random.key(0), dev.n, batch_size)
    state, m = epoch(state, dev, warm)
    float(m["loss"])
    steps = warm.shape[0]
    t0 = time.perf_counter()
    for e in range(epochs):
        idx = epoch_batch_indices(jax.random.key(e + 1), dev.n, batch_size)
        state, m = epoch(state, dev, idx)
    float(m["loss"])
    dt = time.perf_counter() - t0
    return {"windows_per_sec": round(epochs * steps * batch_size / dt, 1),
            "ms_per_step": round(1000 * dt / (epochs * steps), 3)}


def cost_analysis(batch_size=512, dtype="bfloat16"):
    """XLA analytical FLOPs/bytes of the jitted train step."""
    from fall_multimodal_tpu.configs import load_config, preset_path
    from fall_multimodal_tpu.data import make_synthetic, to_device
    from fall_multimodal_tpu.data.pipeline import gather_batch
    from fall_multimodal_tpu.models import build_model
    from fall_multimodal_tpu.train import build_optimizer, create_train_state
    from fall_multimodal_tpu.train.loop import make_train_step

    cfg = load_config(preset_path("skeleton_transformer_harup"))
    data = make_synthetic(n_windows=batch_size, num_classes=11, sensor_dim=15,
                          seed=0)
    dev = to_device(data)
    model = build_model(cfg)
    optimizer = build_optimizer(cfg)
    state = create_train_state(model, optimizer, dev.features[:2],
                               dev.sensors[:2], seed=0)
    compute_dtype = jnp.bfloat16 if dtype == "bfloat16" else None
    step = jax.jit(make_train_step(model, optimizer, compute_dtype=compute_dtype))
    batch = gather_batch(dev, jnp.arange(batch_size))
    lowered = step.lower(state, batch)
    try:
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {"flops": float(ca.get("flops", -1)),
                "bytes": float(ca.get("bytes accessed", -1))}
    except Exception as e:  # noqa: BLE001 - platform-dependent surface
        return {"error": str(e)[:200]}


def gemm_shapes(batch_size=512, n_block=6, t=30, v=14, e=32, h=8, hd=16):
    """The model's GEMM list per train step (fwd; bwd ~2x each), as
    (rows, contraction, cols) — the shape-equivalent synthetic stack."""
    tok = batch_size * t * v          # tokens through channel Denses
    eh = h * hd                       # attention inner width (128)
    shapes = [(batch_size * t * v, 3, e // 2), (tok, e // 2, e)]  # embed MLP
    for _ in range(n_block):
        # spatial attention
        shapes += [
            (tok, e, 3 * eh),                         # qkv
            (batch_size * t * h * v, hd, v),          # qk^T (per b,t,h)
            (batch_size * t * h * v, hd, 2 * v - 1),  # rel-pos matmul
            (batch_size * t * h * v, v, hd),          # attn @ v
            (tok, eh, e),                             # merge
        ]
        # temporal attention
        shapes += [
            (tok, e, 3 * eh),
            (batch_size * v * h * t, hd, t),
            (batch_size * v * h * t, hd, 2 * t - 1),
            (batch_size * v * h * t, t, hd),
            (tok, eh, e),
        ]
        # FFN
        shapes += [(tok, e, 4 * e), (tok, 4 * e, e)]
    shapes += [(batch_size, e, 11)]                   # head
    return shapes


def synthetic_stack_rate(batch_size=512, n_block=6, dtype="bfloat16",
                         reps=30):
    """Measure the wall rate of the bare GEMM sequence (same shapes as the
    model, fwd+bwd approximated as 3x fwd GEMMs — the standard 1 fwd +
    2 bwd matmuls per Dense). This is the ceiling the architecture's shapes
    permit on this chip with XLA's own scheduling; no attention semantics,
    no norms, no masks."""
    dt_ = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    shapes = gemm_shapes(batch_size=batch_size, n_block=n_block)
    key = jax.random.key(0)
    mats = []
    for i, (m, k, n) in enumerate(shapes):
        k1, k2, key = jax.random.split(key, 3)
        mats.append((jax.random.normal(k1, (m, k), dt_),
                     jax.random.normal(k2, (k, n), dt_)))

    @jax.jit
    def run(mats):
        acc = jnp.zeros((), jnp.float32)
        for a, b in mats:
            y = a @ b
            acc = acc + jnp.sum(y).astype(jnp.float32)
            # bwd GEMMs: dA = dY @ B^T, dB = A^T @ dY (same shapes)
            da = y @ b.T
            db = a.T @ y
            acc = acc + jnp.sum(da).astype(jnp.float32) + jnp.sum(db).astype(jnp.float32)
        return acc

    float(run(mats))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(mats)
    float(out)
    dt = time.perf_counter() - t0
    ms = 1000 * dt / reps
    return {"ms_per_step": round(ms, 3),
            "windows_per_sec": round(batch_size / (dt / reps), 1),
            "n_gemms": len(shapes) * 3}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()

    results = {}
    for tag, kw in (
        ("train_bf16", dict(dtype="bfloat16")),
        ("train_f32", dict(dtype="float32")),
        ("fwd_bf16", dict(dtype="bfloat16", fwd_only=True)),
    ):
        if args.quick and tag != "train_bf16":
            continue
        try:
            results[tag] = throughput(batch_size=args.batch_size, **kw)
        except Exception as e:  # noqa: BLE001
            results[tag] = {"error": str(e)[:200]}
        print(tag, json.dumps(results[tag]), flush=True)

    results["cost_analysis_bf16"] = cost_analysis(args.batch_size)
    print("cost", json.dumps(results["cost_analysis_bf16"]), flush=True)

    try:
        results["gemm_stack_bf16"] = synthetic_stack_rate(
            args.batch_size, dtype="bfloat16"
        )
    except Exception as e:  # noqa: BLE001
        results["gemm_stack_bf16"] = {"error": str(e)[:200]}
    print("gemm_stack", json.dumps(results["gemm_stack_bf16"]), flush=True)

    tb = results.get("train_bf16", {})
    gs = results.get("gemm_stack_bf16", {})
    if "ms_per_step" in tb and "ms_per_step" in gs:
        results["model_vs_gemm_ceiling"] = round(
            gs["ms_per_step"] / tb["ms_per_step"], 4
        )
    with open("experiments/transformer_speed_results.json", "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps({k: v for k, v in results.items()
                      if not isinstance(v, dict)}, indent=2))


if __name__ == "__main__":
    main()
