"""Deterministic multi-step training parity: reference musa vs ours.

The below-ceiling experiment (``parity_results_belowceiling_musa.json``)
showed a best-val gap on a 48-window validation set. Eval-mode logit parity
is already proven at 2e-5 (``tests/test_musa_parity.py``), so any genuine
training-dynamics divergence must come from gradients, train-mode BatchNorm
batch-stats, running-stat updates, or the RMSprop step. This experiment
isolates exactly those: both frameworks start from the SAME weights (torch
state_dict ported into flax), stochastic regularizers are disabled
(keep_prob=1, dropout p=0), and both take K optimizer steps over the SAME
batch sequence (no shuffling). If per-step losses track, the training
dynamics are identical and the below-ceiling gap is attributable to
stochastic-regularizer seeds + the tiny validation set.

Reference arm: ``Multimodal_Fall3/model/musa_model.py`` Model with the
hard-coded ``Multimodal_Fall3/main.py:307-320,362`` config, RMSprop 1e-3.

    python experiments/parity_train_step_musa.py --steps 30
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

EMBED, NSTAGE, CLASSES, V = 64, 1, 6, 14


def make_batches(n_batches: int, batch: int, seed: int = 0):
    from fall_multimodal_tpu.data import make_synthetic

    data = make_synthetic(
        n_windows=n_batches * batch, num_classes=CLASSES, sensor_dim=4,
        windows_per_video=16, noise=0.45, seed=seed,
    )
    feats = data.features.astype(np.float32)          # (N, T, V, C)
    labels = data.labels.astype(np.float32)           # (N, K) soft
    return [
        (feats[i * batch:(i + 1) * batch], labels[i * batch:(i + 1) * batch])
        for i in range(n_batches)
    ]


def build_reference(reference_path: str, seed: int = 0):
    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_musa_model",
        os.path.join(reference_path, "Multimodal_Fall3", "model",
                     "musa_model.py"),
    )
    mm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mm)
    torch.manual_seed(seed)
    model = mm.Model(
        num_class=CLASSES, num_point=V, max_frame=300,
        graph=mm.adjGraph(layout="coco_cut", strategy="uniform"),
        bias=True, edge=True, block_size=41,
        embed_dim=EMBED, n_stage=NSTAGE, act_type="tanh",
    )
    # disable every stochastic regularizer so both arms are deterministic
    for m in model.modules():
        if hasattr(m, "keep_prob"):
            m.keep_prob = 1.0
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    return model


def run_reference(model, batches, steps: int):
    import torch

    opt = torch.optim.RMSprop(model.parameters(), lr=1e-3)
    loss_fn = torch.nn.CrossEntropyLoss()
    losses = []
    model.train()
    for s in range(steps):
        feats, labels = batches[s % len(batches)]
        x = torch.tensor(np.transpose(feats, (0, 3, 1, 2)))  # NCTV
        y = torch.tensor(labels)
        loss = loss_fn(model(x), y)
        loss.backward()
        opt.step()
        opt.zero_grad()
        losses.append(float(loss))
    return losses


def run_ours(state_dict, batches, steps: int):
    import jax
    import jax.numpy as jnp
    import optax
    from flax.traverse_util import unflatten_dict

    from fall_multimodal_tpu.configs.config import OptimConfig
    from fall_multimodal_tpu.models.musa import MusaModel
    from fall_multimodal_tpu.train.optim import build_optimizer
    from test_musa_parity import _port

    model = MusaModel(
        num_classes=CLASSES, embed_dim=EMBED, n_stage=NSTAGE,
        act_type="tanh", block_size=41, edge=True, bias=True,
        keep_prob=1.0, dropout=0.0,
    )
    sd = {k: v.detach().numpy() for k, v in state_dict.items()}
    ported_p, ported_bs = _port(sd)
    variables = {
        "params": unflatten_dict(
            {k: jnp.asarray(v) for k, v in ported_p.items()}),
        "batch_stats": unflatten_dict(
            {k: jnp.asarray(v) for k, v in ported_bs.items()}),
    }

    tx = build_optimizer(OptimConfig(type="rmsprop", lr=1e-3))
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state, feats, labels):
        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                feats, None, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(0)},
            )
            loss = optax.softmax_cross_entropy(logits, labels).mean()
            return loss, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    params, batch_stats = variables["params"], variables["batch_stats"]
    losses = []
    for s in range(steps):
        feats, labels = batches[s % len(batches)]
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state,
            jnp.asarray(feats), jnp.asarray(labels))
        losses.append(float(loss))
    return losses


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--n-batches", type=int, default=6)
    parser.add_argument("--reference-path", default="/root/reference")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    batches = make_batches(args.n_batches, args.batch)
    ref_model = build_reference(args.reference_path)
    state_dict = {k: v.clone() for k, v in ref_model.state_dict().items()}

    ours = run_ours(state_dict, batches, args.steps)
    ref_model.load_state_dict(state_dict)
    ref = run_reference(ref_model, batches, args.steps)

    rows = []
    for s, (a, b) in enumerate(zip(ours, ref)):
        rows.append({"step": s, "ours": a, "reference": b,
                     "abs_diff": abs(a - b)})
        print(f"step {s:3d}  ours {a:.6f}  ref {b:.6f}  "
              f"|d| {abs(a - b):.2e}")
    max_diff = max(r["abs_diff"] for r in rows)
    rel = max_diff / max(abs(r["reference"]) for r in rows)
    print(f"max |loss diff| over {args.steps} steps: {max_diff:.3e} "
          f"(rel {rel:.3e})")
    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "parity_train_step_musa.json")
    json.dump({"steps": rows, "max_abs_diff": max_diff,
               "max_rel_diff": rel}, open(out, "w"), indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
