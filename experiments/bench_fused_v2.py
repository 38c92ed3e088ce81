"""Real-chip benchmark: whole-backbone fused Pallas kernel (v2) vs plain XLA.

Round-1's per-block Pallas path lost end-to-end (11.2k vs 21.1k w/s) because
activations round-tripped HBM between the seven pallas_calls. v2 runs the
entire inference backbone in ONE pallas_call per batch tile
(ops/pallas/fused_backbone_v2.py). This script measures both paths on the
real TPU at serving batch sizes, value-fetch synced (block_until_ready is
unreliable on this remote platform — see PARITY.md).

Run: python experiments/bench_fused_v2.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, *args, iters=30):
    float(jnp.sum(f(*args)))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
        float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from fall_multimodal_tpu.models.stgcan import STGCANBackbone
    from fall_multimodal_tpu.ops.pallas.fused_backbone_v2 import (
        fold_backbone,
        fused_backbone_forward,
    )

    rng = np.random.default_rng(0)
    model = STGCANBackbone(num_classes=11)
    x_init = jnp.asarray(rng.normal(size=(2, 30, 14, 3)), jnp.float32)
    vv = model.init(jax.random.key(0), x_init, train=False)
    fb = fold_backbone(model, vv)
    fb_bf16 = fold_backbone(model, vv, dtype=jnp.bfloat16)

    xla_fn = jax.jit(lambda v, xx: model.apply(v, xx, train=False))

    for n in (256, 1024, 4096):
        x = jnp.asarray(rng.normal(size=(n, 30, 14, 3)), np.float32)
        ref = np.asarray(xla_fn(vv, x))
        ms_xla = timeit(xla_fn, vv, x)
        print(f"N={n:5d}  XLA: {ms_xla:7.2f} ms  {n / ms_xla * 1e3:9.0f} w/s")
        for spp in (32, 64, 128, 256):
            if spp > n:
                continue
            for tag, folded in (("f32 ", fb), ("bf16", fb_bf16)):
                fn = jax.jit(
                    lambda xx, _spp=spp, _f=folded: fused_backbone_forward(
                        xx, _f, samples_per_program=_spp
                    )
                )
                try:
                    got = np.asarray(fn(x))
                except Exception as e:  # noqa: BLE001 - report and move on
                    print(f"        pallas {tag} spp={spp:3d}: FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}")
                    continue
                err = np.abs(got - ref).max()
                ms = timeit(fn, x)
                print(f"        pallas {tag} spp={spp:3d}: {ms:7.2f} ms "
                      f"{n / ms * 1e3:9.0f} w/s  ({ms_xla / ms:4.2f}x XLA, "
                      f"maxerr {err:.2e})")


if __name__ == "__main__":
    main()
