"""Flagship HBM-traffic experiment: selective rematerialization policies.

Round 2 measured the dense-GCN train step HBM-bound (~83 GB accessed/step,
~550 GB/s sustained at batch 2048 = ~67% of v5e peak) and rejected FULL
per-block remat (7,210 w/s — recompute added its own traffic). This probes
the lighter option: ``jax.checkpoint`` with a *policy* that saves only the
matmul outputs (``dots_with_no_batch_dims_saveable``) or only named
checkpoints, so the backward pass re-forms cheap elementwise/BN chains
instead of loading them from HBM.

Run: ``python experiments/flagship_remat_policies.py`` (real chip, via
nohup — each arm compiles a fresh scanned epoch).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def measure(policy_name, batch_size=2048, windows=8192, epochs=3):
    from fall_multimodal_tpu.configs import load_config, preset_path
    from fall_multimodal_tpu.data import (
        epoch_batch_indices, make_synthetic, to_device,
    )
    from fall_multimodal_tpu.data.pipeline import DeviceData, gather_batch
    from fall_multimodal_tpu.models import build_model
    from fall_multimodal_tpu.train import build_optimizer, create_train_state
    from fall_multimodal_tpu.train.losses import cross_entropy

    cfg = load_config(preset_path("gstcan_urfall_3stream"))
    data = make_synthetic(n_windows=windows, num_classes=2, sensor_dim=4, seed=0)
    dev = to_device(data)
    model = build_model(cfg)
    optimizer = build_optimizer(cfg)
    state = create_train_state(model, optimizer, dev.features[:2],
                               dev.sensors[:2], seed=0)

    policies = {
        "none": None,
        "dots_saveable": jax.checkpoint_policies.dots_saveable,
        "dots_no_batch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        "nothing": jax.checkpoint_policies.nothing_saveable,
    }
    policy = policies[policy_name]
    import optax

    def step(st, batch):
        key = jax.random.fold_in(st.rng, st.step)

        def loss_fn(params):
            p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
            feats = batch.features.astype(jnp.bfloat16)
            sens = batch.sensors.astype(jnp.bfloat16)

            def fwd(p, feats, sens):
                variables = {"params": p, "batch_stats": st.batch_stats}
                return model.apply(
                    variables, feats, sens, train=True,
                    mutable=["batch_stats"], rngs={"dropout": key},
                )

            if policy is not None:
                fwd = jax.checkpoint(fwd, policy=policy)
            out, mutated = fwd(p, feats, sens)
            loss = cross_entropy(
                out.astype(jnp.float32), batch.labels,
                softmax_before_ce=cfg.model.softmax_output,
            )
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        new_stats = jax.tree.map(
            lambda new, old: new.astype(old.dtype), new_stats, st.batch_stats
        )
        updates, new_opt = optimizer.update(grads, st.opt_state, st.params)
        new_params = optax.apply_updates(st.params, updates)
        return st._replace(params=new_params, batch_stats=new_stats,
                           opt_state=new_opt, step=st.step + 1), loss

    @jax.jit
    def epoch(st, data_, idx):
        def body(s, i):
            return step(s, gather_batch(data_, i))
        return jax.lax.scan(body, st, idx)

    warm = epoch_batch_indices(jax.random.key(0), dev.n, batch_size)
    state, losses = epoch(state, dev, warm)
    float(losses[-1])
    steps = warm.shape[0]
    t0 = time.perf_counter()
    for e in range(epochs):
        idx = epoch_batch_indices(jax.random.key(e + 1), dev.n, batch_size)
        state, losses = epoch(state, dev, idx)
    float(losses[-1])
    dt = time.perf_counter() - t0
    return {"policy": policy_name,
            "windows_per_sec": round(epochs * steps * batch_size / dt, 1),
            "ms_per_step": round(1000 * dt / (epochs * steps), 2)}


def main():
    rows = []
    for name in ("none", "dots_saveable", "dots_no_batch", "nothing"):
        try:
            row = measure(name)
        except Exception as e:  # noqa: BLE001 - survey harness
            row = {"policy": name, "error": str(e)[:200]}
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open("experiments/flagship_remat_results.json", "w") as fh:
        json.dump(rows, fh, indent=2)


if __name__ == "__main__":
    main()
