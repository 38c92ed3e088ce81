"""Fold-parallel cross-validation: train all K folds simultaneously.

A genuinely TPU-native capability the reference cannot express
(SURVEY.md section 7.6): the dataset lives ONCE in HBM; each fold is just an
index set; K model replicas train as a ``vmap`` over the fold axis, so one
jitted program advances every fold per epoch and small per-fold matmuls
batch into K-times-larger ones. Per-fold BatchNorm statistics, dropout keys,
optimizer state, and best-state tracking all carry the fold axis.

Shape constraint: the scanned epoch needs a common (steps, batch) index
matrix across folds, so steps = min_fold_train_size // batch — larger folds
subsample a fresh random subset each epoch (full coverage over epochs);
deviation from sequential CV is the per-epoch step count only (measured at
0.008 accuracy vs the sequential driver — PARITY.md).

Multi-chip: pass ``mesh`` (1-D) and the fold axis shards across devices —
each chip trains its folds entirely locally (dataset replicated, zero
cross-chip collectives in the epoch program), so K folds on D chips run in
ceil(K/D) fold-time. Works with any K divisible by D.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fall_multimodal_tpu.configs import Config
from fall_multimodal_tpu.data import kfold_indices, to_device
from fall_multimodal_tpu.data.pipeline import DeviceData, gather_batch
from fall_multimodal_tpu.data.synthetic import WindowedDataset
from fall_multimodal_tpu.models import build_model
from fall_multimodal_tpu.train.loop import (
    cross_entropy_per_sample,
    equal_chunk,
    make_train_step,
)
from fall_multimodal_tpu.train.metrics import prf_from_confusion
from fall_multimodal_tpu.train.optim import build_optimizer
from fall_multimodal_tpu.train.state import TrainState, create_train_state


def _stack_states(states: List[TrainState]) -> TrainState:
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *states)


def cross_validate_vmapped(
    config: Config,
    data: WindowedDataset,
    n_folds: Optional[int] = None,
    epochs: Optional[int] = None,
    logger=None,
    mesh: Optional[Mesh] = None,
    grad_norms: bool = False,
    metrics_factory=None,
    step_metrics_factory=None,
    scan_epochs: Union[bool, int, None] = None,
) -> Dict[str, Any]:
    """K-fold CV with all folds training in one vmapped program.

    With ``mesh`` (a 1-D device mesh), the fold axis is sharded across the
    mesh devices: same program, each chip advances its local folds.
    Returns the same structure as ``cv.cross_validate``.

    Honors ``config.train.dtype`` (bf16 compute with f32 master params —
    15-47%% faster where the MXU dominates) and ``config.train.epoch_impl``
    (``host`` loops a jitted vmapped step from python — the XLA CPU backend
    runs scan carries ~6.5x slower than the same step standalone; ``auto``
    picks by backend). ``grad_norms`` + ``step_metrics_factory(fold_i)``
    stream per-parameter per-step gradient norms per fold (reference
    ``main.py:84-89``), flushed to host once per epoch.
    ``metrics_factory(fold_i)`` returns a per-fold ``(epoch, scalars)``
    callback for train/val epoch curves (the ``fit()`` metrics_callback
    contract, one callback per fold of the vmapped program).

    ``scan_epochs`` (default: auto) additionally fuses the EPOCH loop into
    the device program: one ``lax.scan`` over epochs carries
    (states, best_states, best_acc) with per-epoch eval + best-state
    gating on device, so the whole K-fold CV is ONE jit call with a
    single host round-trip at the end. On this remote-TPU platform the
    per-epoch host sync is the dominant cost of small-model CV (~0.9 s x
    epochs x folds for the sensor families), so the fused driver is the
    default whenever it is expressible: scanned epoch impl and no
    per-step gradient-norm streaming (epoch curves still come back,
    stacked as scan outputs). Epoch shuffles are precomputed host-side
    with the same seeded generator as the per-epoch driver, so the two
    paths consume identical batch index sequences.
    """
    n_folds = n_folds or config.data.n_folds
    epochs = epochs or config.train.epochs
    batch = config.train.batch_size
    num_classes = data.num_classes

    if config.data.stratify_folds:
        from fall_multimodal_tpu.data.splits import stratified_kfold_indices

        folds = stratified_kfold_indices(
            data.labels, n_folds=n_folds, seed=config.seed
        )
    else:
        folds = kfold_indices(
            data.videos, n_folds=n_folds, seed=config.seed,
            by_video=config.data.split_by_video,
        )
    dev = to_device(data)                     # ONE copy of the full dataset

    if mesh is not None:
        if n_folds % mesh.devices.size:
            raise ValueError(
                f"n_folds={n_folds} must divide evenly over the "
                f"{mesh.devices.size}-device mesh"
            )
        fold_shard = NamedSharding(mesh, P(mesh.axis_names[0]))
        dev = jax.device_put(dev, NamedSharding(mesh, P()))  # replicated

        def put_folded(arr):
            return jax.device_put(jnp.asarray(arr), fold_shard)
    else:
        put_folded = jnp.asarray

    model = build_model(config)
    steps = max(1, min(len(f["train"]) for f in folds) // batch)
    optimizer = build_optimizer(
        config.optim,
        scheduler=config.lr_scheduler,
        steps_per_epoch=steps,
        max_norm=config.train.max_norm,
        accum_iter=config.train.accum_iter,
    )
    states = _stack_states([
        create_train_state(
            model, optimizer, dev.features[:2], dev.sensors[:2],
            seed=config.seed + k, weight_init=config.model.weight_init,
        )
        for k in range(n_folds)
    ])
    if mesh is not None:
        states = jax.device_put(states, fold_shard)

    compute_dtype = (
        jnp.bfloat16 if config.train.dtype == "bfloat16" else None
    )
    from fall_multimodal_tpu.data.augment import make_augment_fn

    train_step = make_train_step(
        model, optimizer,
        label_smoothing=config.train.label_smoothing,
        softmax_before_ce=config.model.softmax_output,
        compute_dtype=compute_dtype,
        grad_norms=grad_norms,
        # per-fold keys come free: the step key folds off state.rng, which
        # is seeded per fold, so vmapped folds draw independent transforms
        augment_fn=make_augment_fn(config.augment, config.graph.layout),
    )

    def fold_epoch(state: TrainState, data_: DeviceData, idx: jnp.ndarray):
        def body(st, i):
            return train_step(st, gather_batch(data_, i))

        state, metrics = jax.lax.scan(body, state, idx)
        per_step = metrics.pop("grad_norms", None)
        out = jax.tree.map(jnp.mean, metrics)
        if per_step is not None:
            out["grad_norms"] = per_step
        return state, out

    impl = config.train.epoch_impl
    if impl == "auto":
        impl = "host" if jax.default_backend() == "cpu" else "scan"
    if impl == "host":
        # python loop over steps driving one jitted vmapped step: the XLA
        # CPU backend runs scanned epochs ~6.5x slower than the identical
        # step compiled standalone (train/loop.py measurement note).
        def _gathered_step(state, data_, i):
            return train_step(state, gather_batch(data_, i))

        step_vm = jax.jit(jax.vmap(_gathered_step, in_axes=(0, None, 0)))

        def epoch_vm(states, dev_, idx):
            metrics = []
            for s in range(idx.shape[1]):
                states, m = step_vm(states, dev_, idx[:, s])
                metrics.append(m)
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=1), *metrics)
            per_step = stacked.pop("grad_norms", None)
            out = jax.tree.map(lambda x: jnp.mean(x, axis=1), stacked)
            if per_step is not None:
                out["grad_norms"] = per_step
            return states, out
    else:
        epoch_vm = jax.jit(jax.vmap(fold_epoch, in_axes=(0, None, 0)))

    def fold_eval(state: TrainState, data_: DeviceData, idx, mask):
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def body(carry, inp):
            cm, loss_sum = carry
            i, m = inp
            b = gather_batch(data_, i)
            logits = model.apply(variables, b.features, b.sensors, train=False)
            tgt = jnp.argmax(b.labels, -1)
            pred = jnp.argmax(logits, -1)
            counts = (
                jax.nn.one_hot(tgt * num_classes + pred, num_classes * num_classes)
                * m[:, None]
            )
            cm = cm + counts.sum(0).reshape(num_classes, num_classes)
            loss_sum = loss_sum + (
                cross_entropy_per_sample(
                    logits, b.labels,
                    config.train.label_smoothing, config.model.softmax_output,
                ) * m
            ).sum()
            return (cm, loss_sum), None

        init = (jnp.zeros((num_classes, num_classes)), jnp.zeros(()))
        (cm, loss_sum), _ = jax.lax.scan(body, init, (idx, mask))
        return cm, loss_sum

    eval_vm = jax.jit(jax.vmap(fold_eval, in_axes=(0, None, 0, 0)))

    # per-fold padded eval index/mask matrices with a common step count
    eval_steps = max(-(-len(f["test"]) // batch) for f in folds)
    eval_idx = np.zeros((n_folds, eval_steps, batch), np.int32)
    eval_mask = np.zeros((n_folds, eval_steps, batch), np.float32)
    for k, f in enumerate(folds):
        t = f["test"]
        flat = np.minimum(np.arange(eval_steps * batch), len(t) - 1)
        eval_idx[k] = t[flat].reshape(eval_steps, batch)
        eval_mask[k] = (np.arange(eval_steps * batch) < len(t)).reshape(
            eval_steps, batch
        )
    eval_counts = eval_mask.sum((1, 2))  # true (unpadded) test sizes
    eval_idx = put_folded(eval_idx)
    eval_mask = put_folded(eval_mask)

    rng = np.random.default_rng(config.seed)

    def epoch_indices():
        """One epoch's (n_folds, steps, batch) shuffled index matrix —
        shared by the fused and per-epoch drivers (identical rng draws)."""
        idx = np.zeros((n_folds, steps, batch), np.int32)
        for k, f in enumerate(folds):
            perm = rng.permutation(f["train"])
            need = steps * batch
            if need > len(perm):  # wraparound for the smallest folds —
                # tile as many times as needed (a fold can be smaller
                # than half the batch)
                reps = -(-need // len(perm))
                perm = np.tile(perm, reps)
            idx[k] = perm[:need].reshape(steps, batch)
        return idx

    if scan_epochs is None:
        scan_epochs = (
            impl == "scan"
            and not grad_norms
            and step_metrics_factory is None
        )
    if scan_epochs and (impl != "scan" or grad_norms
                        or step_metrics_factory is not None):
        raise ValueError(
            "scan_epochs=True needs the scanned epoch impl and no per-step "
            "gradient-norm streaming (per-step tensors for every epoch "
            "cannot ride a single scan output)"
        )

    if scan_epochs:
        # whole-CV-in-one-jit: scan over epochs carrying
        # (states, best_states, best_acc); eval + best gating on device.
        # ONE host round-trip for the entire K-fold run — or, when
        # ``scan_epochs`` is an int N, one per N-epoch chunk: a single
        # device execution lasting many minutes can crash this platform's
        # TPU worker (observed: 10 vmapped flagship folds x 100 fused
        # epochs, one ~15-minute execution, worker killed mid-run, while
        # ~100 s executions run reliably), so big models bound the
        # per-call duration with a chunk size and pay one sync per chunk.
        chunk = epochs if scan_epochs is True else max(1, int(scan_epochs))
        chunk = equal_chunk(epochs, chunk)
        idx_all = np.stack([epoch_indices() for _ in range(epochs)])
        if mesh is not None:
            idx_all = jax.device_put(
                jnp.asarray(idx_all),
                NamedSharding(mesh, P(None, mesh.axis_names[0])),
            )
        else:
            idx_all = jnp.asarray(idx_all)
        eval_counts_j = jnp.asarray(eval_counts, jnp.float32)

        epoch_fold = jax.vmap(fold_epoch, in_axes=(0, None, 0))
        eval_fold = jax.vmap(fold_eval, in_axes=(0, None, 0, 0))

        def epoch_body(carry, idx_e):
            states, best_states, best_acc = carry
            states, tm = epoch_fold(states, dev, idx_e)
            cms, loss_sums = eval_fold(states, dev, eval_idx, eval_mask)
            accs = (
                jnp.diagonal(cms, axis1=-2, axis2=-1).sum(-1)
                / jnp.maximum(cms.sum((-2, -1)), 1.0)
            )
            # same guard as fit()'s fused path: a fold whose training blew
            # up (NaN loss, constant argmax-0 predictions) must not promote
            # its state to best
            gate = (accs > best_acc) & jnp.isfinite(tm["loss"])
            best_states = jax.tree.map(
                lambda new, old: jnp.where(
                    gate.reshape((n_folds,) + (1,) * (new.ndim - 1)), new, old
                ),
                states,
                best_states,
            )
            # same gate for the scalar: a blown-up fold's degenerate
            # accuracy must not inflate the reported per-fold best either
            best_acc = jnp.where(gate, accs, best_acc)
            hist = {
                "train_loss": tm["loss"],
                "train_accuracy": tm["accuracy"],
                "val_loss": loss_sums / eval_counts_j,
                "val_accuracy": accs,
            }
            return (states, best_states, best_acc), hist

        @jax.jit
        def run_chunk(carry, idx_chunk):
            return jax.lax.scan(epoch_body, carry, idx_chunk)

        carry = (states, states, jnp.full((n_folds,), -1.0, jnp.float32))
        hists = []
        for s in range(0, epochs, chunk):
            carry, h = run_chunk(carry, idx_all[s : s + chunk])
            if chunk < epochs:
                # chunked mode syncs once per chunk anyway — flush the
                # history here so the device call's outputs stay small
                h = {k: np.asarray(v) for k, v in h.items()}
            hists.append(h)
        states, best_states, best_acc_j = carry
        hist = {
            k: np.concatenate([np.asarray(h[k]) for h in hists])
            for k in hists[0]
        }                                                       # (E, K)
        best_acc = np.asarray(best_acc_j)
        if metrics_factory is not None:
            for k in range(n_folds):
                cb = metrics_factory(k)
                if cb is None:
                    continue
                for e in range(epochs):
                    cb(e + 1, {
                        "train_loss": float(hist["train_loss"][e, k]),
                        "train_accuracy": float(hist["train_accuracy"][e, k]),
                        "val_loss": float(hist["val_loss"][e, k]),
                        "val_accuracy": float(hist["val_accuracy"][e, k]),
                    })
        if logger:
            logger.info(
                f"[vmapped CV, fused] {epochs} epochs x {n_folds} folds in "
                f"one device program; mean best val acc {best_acc.mean():.4f}"
            )
        return _finalize(
            best_states, best_acc, eval_vm, dev, eval_idx, eval_mask,
            folds, n_folds,
        )

    best_acc = np.full(n_folds, -1.0)
    best_states = states

    for epoch_i in range(1, epochs + 1):
        idx = epoch_indices()
        states, tm = epoch_vm(states, dev, put_folded(idx))
        per_step_norms = tm.pop("grad_norms", None)
        if per_step_norms is not None and step_metrics_factory is not None:
            # one device->host flush per epoch; (n_folds, steps) per param
            host = {k: np.asarray(v) for k, v in per_step_norms.items()}
            base = (epoch_i - 1) * steps
            for k in range(n_folds):
                cb = step_metrics_factory(k)
                if cb is None:
                    continue
                for s in range(steps):
                    cb(base + s,
                       {f"grad_norm/{name}": float(v[k, s])
                        for name, v in host.items()})

        cms, loss_sums = eval_vm(states, dev, eval_idx, eval_mask)
        accs = np.asarray(
            jnp.stack([prf_from_confusion(cms[k])["accuracy"] for k in range(n_folds)])
        )
        if metrics_factory is not None:
            tm_host = {k: np.asarray(v) for k, v in tm.items()}
            val_loss = np.asarray(loss_sums) / eval_counts
            for k in range(n_folds):
                cb = metrics_factory(k)
                if cb is None:
                    continue
                cb(epoch_i, {
                    "train_loss": float(tm_host["loss"][k]),
                    "train_accuracy": float(tm_host["accuracy"][k]),
                    "val_loss": float(val_loss[k]),
                    "val_accuracy": float(accs[k]),
                })
        # same contract as the fused driver's gate: a fold whose training
        # blew up (NaN loss, constant argmax-0 predictions) must not promote
        # its state or inflate its reported best accuracy
        improved = (accs > best_acc) & np.isfinite(np.asarray(tm["loss"]))
        if improved.any():
            gate = jnp.asarray(improved)
            best_states = jax.tree.map(
                lambda new, old: jnp.where(
                    gate.reshape((n_folds,) + (1,) * (new.ndim - 1)), new, old
                ),
                states,
                best_states,
            )
            best_acc = np.where(improved, accs, best_acc)
        if logger and epoch_i % 10 == 0:
            logger.info(
                f"[vmapped CV] epoch {epoch_i}/{epochs} "
                f"mean val acc {accs.mean():.4f} (best {best_acc.mean():.4f})"
            )

    return _finalize(
        best_states, best_acc, eval_vm, dev, eval_idx, eval_mask,
        folds, n_folds,
    )


def _finalize(best_states, best_acc, eval_vm, dev, eval_idx, eval_mask,
              folds, n_folds):
    """Final per-fold test metrics from the best states (shared tail of the
    fused and per-epoch drivers)."""
    cms, loss_sums = eval_vm(best_states, dev, eval_idx, eval_mask)
    per_fold = []
    for k, f in enumerate(folds):
        stats = {kk: np.asarray(vv) for kk, vv in prf_from_confusion(cms[k]).items()}
        per_fold.append({
            "fold": k,
            "val_accuracy": float(best_acc[k]),
            "test_accuracy": float(stats["accuracy"]),
            "macro_precision": float(stats["macro_precision"]),
            "macro_recall": float(stats["macro_recall"]),
            "macro_f1": float(stats["macro_f1"]),
            "micro_f1": float(stats["micro_f1"]),
        })
    metrics = [k for k in per_fold[0] if k != "fold"]
    summary = {
        f"{m}_{agg}": float(getattr(np, agg)([row[m] for row in per_fold]))
        for m in metrics
        for agg in ("mean", "std")
    }
    return {"folds": per_fold, "summary": summary}
