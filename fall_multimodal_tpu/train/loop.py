"""Jitted training / evaluation engine.

TPU-first structure: an epoch is ONE jitted ``lax.scan`` over a shuffled
(steps, batch) index matrix gathered from HBM-resident splits — the
capability of the reference per-batch python loop (``main.py:91-148``)
with zero host round-trips. Eval likewise scans and accumulates a confusion
matrix on device; only final scalars land on host.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fall_multimodal_tpu.data.pipeline import (
    DeviceData,
    epoch_batch_indices,
    eval_batch_indices,
    eval_batch_mask,
    gather_batch,
)
from fall_multimodal_tpu.train.losses import cross_entropy
from fall_multimodal_tpu.train.metrics import prf_from_confusion
from fall_multimodal_tpu.train.state import TrainState


class EvalResult(NamedTuple):
    loss: float
    accuracy: float
    confusion: np.ndarray
    stats: Dict[str, Any]


def _constrain_batch(batch: DeviceData, sharding) -> DeviceData:
    """Annotate the per-step batch with a sharding so GSPMD partitions the
    forward/backward across the mesh (gradient reduction compiles to a
    ``psum`` over ICI). No-op when ``sharding`` is None."""
    if sharding is None:
        return batch
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(x, sharding), batch
    )


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    label_smoothing: float = 0.0,
    softmax_before_ce: bool = False,
    compute_dtype: Optional[jnp.dtype] = None,
    grad_norms: bool = False,
    batch_sharding=None,
    augment_fn=None,
) -> Callable[[TrainState, DeviceData], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """One optimizer step: forward (train-mode BN + dropout), loss, grads,
    update. Returns (new_state, {loss, accuracy}).

    ``batch_sharding`` (a ``NamedSharding`` with the batch axis in its spec)
    turns the step data-parallel: the batch is sharding-constrained so XLA
    partitions compute across the mesh and all-reduces gradients; parameters
    and optimizer state stay replicated. Semantics (including BatchNorm batch
    statistics) are *globally* identical to the single-device step.

    ``compute_dtype=jnp.bfloat16`` enables mixed precision: master params and
    optimizer state stay float32, activations/weights are cast to bf16 for
    forward+backward (the cast is differentiable, so gradients come back in
    float32), and the loss is computed in float32. No loss scaler is needed
    on TPU (bf16 shares float32's exponent range — SURVEY.md section 2.5).

    Measured on v5e (flagship 3-stream, batch 2048, value-fetch synced):
    bf16 7,378 vs f32 6,441 windows/s — a ~15% win. (An earlier "18x slower"
    reading was a synchronization artifact of the remote-TPU platform's
    broken block_until_ready; see bench.py measurement notes.)
    """

    def step(state: TrainState, batch: DeviceData):
        batch = _constrain_batch(batch, batch_sharding)
        step_key = jax.random.fold_in(state.rng, state.step)
        if augment_fn is not None:
            # augmentation draws fold off the step key (distinct from the
            # dropout stream, which stays step_key so augment-off runs are
            # bit-identical to pre-augmentation builds)
            feats, sens = augment_fn(
                jax.random.fold_in(step_key, 1), batch.features, batch.sensors
            )
            batch = batch._replace(features=feats, sensors=sens)

        def loss_fn(params):
            if compute_dtype is not None:
                p = jax.tree.map(lambda x: x.astype(compute_dtype), params)
                feats = batch.features.astype(compute_dtype)
                sens = batch.sensors.astype(compute_dtype)
            else:
                p, feats, sens = params, batch.features, batch.sensors
            variables = {"params": p, "batch_stats": state.batch_stats}
            out, mutated = model.apply(
                variables,
                feats,
                sens,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": step_key},
            )
            loss = cross_entropy(
                out.astype(jnp.float32),
                batch.labels,
                label_smoothing=label_smoothing,
                softmax_before_ce=softmax_before_ce,
            )
            return loss, (out, mutated["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if compute_dtype is not None:
            # keep running-stat dtypes invariant (scan carry requirement)
            new_stats = jax.tree.map(
                lambda new, old: new.astype(old.dtype),
                new_stats,
                state.batch_stats,
            )
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        acc = (
            (jnp.argmax(logits, -1) == jnp.argmax(batch.labels, -1))
            .astype(jnp.float32)
            .mean()
        )
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
            rng=state.rng,
        )
        metrics: Dict[str, Any] = {"loss": loss, "accuracy": acc}
        if grad_norms:
            from fall_multimodal_tpu.utils.profiling import grad_norms as _gn

            metrics["grad_norms"] = _gn(grads)
        return new_state, metrics

    return step


def make_train_epoch(model, optimizer, label_smoothing=0.0, softmax_before_ce=False,
                     compute_dtype=None, grad_norms=False, impl: str = "scan",
                     batch_sharding=None, augment_fn=None):
    """Whole-epoch function: (state, data, batch_idx) -> (state, metrics).

    With ``grad_norms=True`` the returned metrics carry a ``"grad_norms"``
    subtree of per-parameter per-step (steps,) arrays — accumulated on
    device in the scan stack and flushed to host once per epoch (the
    reference wrote each step's scalars to TensorBoard synchronously,
    ``main.py:84-89,129``; one device->host flush per epoch is the TPU-sane
    equivalent).

    ``impl``: ``"scan"`` compiles the epoch as one ``lax.scan`` over steps —
    the TPU path (amortizes dispatch; the whole epoch is one device call).
    ``"host"`` drives the SAME jitted step from a python loop — on the XLA
    CPU backend the scanned epoch executes ~6.5x slower per step than the
    identical step compiled standalone (measured: musa batch 32, 24.0 s vs
    3.7 s/step; scan carries defeat the CPU backend's buffer reuse), so CPU
    runs want the loop. ``"auto"`` picks by backend. Both produce the same
    (state, metrics) contract and the same numbers up to fp reassociation.
    """
    train_step = make_train_step(
        model, optimizer, label_smoothing, softmax_before_ce, compute_dtype,
        grad_norms=grad_norms, batch_sharding=batch_sharding,
        augment_fn=augment_fn,
    )
    if impl == "auto":
        impl = "host" if jax.default_backend() == "cpu" else "scan"

    if impl == "host":
        jstep = jax.jit(train_step)

        def epoch_host(state: TrainState, data: DeviceData, batch_idx):
            if batch_idx.shape[0] == 0:
                # a zero-step epoch (train n < batch_size with drop_last)
                # degrades to NaN metrics, matching the scan impl so the
                # fit() nan_guard catches it with a clear message instead
                # of an opaque tree.map TypeError on an empty list.
                nan = jnp.full((), jnp.nan)
                return state, {"loss": nan, "accuracy": nan}
            metrics = []
            for i in range(batch_idx.shape[0]):
                state, m = jstep(state, gather_batch(data, batch_idx[i]))
                metrics.append(m)
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *metrics)
            per_step = stacked.pop("grad_norms", None)
            out = jax.tree.map(jnp.mean, stacked)
            if per_step is not None:
                out["grad_norms"] = per_step
            return state, out

        return epoch_host
    if impl != "scan":
        raise ValueError(f"epoch impl must be scan|host|auto, got {impl!r}")

    @jax.jit
    def epoch(state: TrainState, data: DeviceData, batch_idx: jnp.ndarray):
        def body(st, idx):
            return train_step(st, gather_batch(data, idx))

        state, metrics = jax.lax.scan(body, state, batch_idx)
        # scalars are epoch means; per-step grad norms stay per-step
        per_step = metrics.pop("grad_norms", None)
        out = jax.tree.map(jnp.mean, metrics)
        if per_step is not None:
            out["grad_norms"] = per_step
        return state, out

    return epoch


def make_eval_epoch(model, num_classes: int, label_smoothing=0.0, softmax_before_ce=False,
                    batch_sharding=None):
    """Jitted eval: scans padded batches, accumulates masked confusion matrix
    and loss; returns (confusion (K,K), loss_sum, n).

    With ``batch_sharding`` the per-batch forward is partitioned across the
    mesh (the reference eval loops, ``main.py:150-248``, were single-device;
    under a mesh ours shards the same way the train step does)."""

    @jax.jit
    def epoch(
        state: TrainState,
        data: DeviceData,
        batch_idx: jnp.ndarray,
        batch_mask: jnp.ndarray,
    ):
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def body(carry, inp):
            cm, loss_sum = carry
            idx, mask = inp
            batch = _constrain_batch(gather_batch(data, idx), batch_sharding)
            logits = model.apply(
                variables, batch.features, batch.sensors, train=False
            )
            target = jnp.argmax(batch.labels, -1)
            pred = jnp.argmax(logits, -1)
            flat = target * num_classes + pred
            counts = jax.nn.one_hot(flat, num_classes * num_classes) * mask[:, None]
            cm = cm + counts.sum(0).reshape(num_classes, num_classes)
            per_sample = cross_entropy_per_sample(
                logits, batch.labels, label_smoothing, softmax_before_ce
            )
            loss_sum = loss_sum + (per_sample * mask).sum()
            return (cm, loss_sum), None

        init = (jnp.zeros((num_classes, num_classes)), jnp.zeros(()))
        (cm, loss_sum), _ = jax.lax.scan(body, init, (batch_idx, batch_mask))
        return cm, loss_sum

    return epoch


def cross_entropy_per_sample(logits, target, label_smoothing=0.0, softmax_before_ce=False):
    from fall_multimodal_tpu.train.losses import one_hot_if_needed, smooth_labels

    target = one_hot_if_needed(target, logits.shape[-1]).astype(logits.dtype)
    target = smooth_labels(target, label_smoothing)
    if softmax_before_ce:
        logits = jax.nn.softmax(logits, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -(target * logp).sum(axis=-1)


def evaluate(
    eval_epoch,
    state: TrainState,
    data: DeviceData,
    batch_size: int,
) -> EvalResult:
    if data.n == 0:
        raise ValueError(
            "evaluate() got an empty split (0 windows) — the dataset is too "
            "small for the configured split fractions / fold count"
        )
    idx = jnp.asarray(eval_batch_indices(data.n, batch_size))
    mask = jnp.asarray(eval_batch_mask(data.n, batch_size), jnp.float32)
    cm, loss_sum = eval_epoch(state, data, idx, mask)
    cm = np.asarray(cm)
    stats = {k: np.asarray(v) for k, v in prf_from_confusion(jnp.asarray(cm)).items()}
    return EvalResult(
        loss=float(loss_sum) / data.n,
        accuracy=float(stats["accuracy"]),
        confusion=cm,
        stats=stats,
    )


def equal_chunk(n: int, chunk: int) -> int:
    """Largest chunk size <= ``chunk`` that divides ``n`` exactly.

    The fused epoch drivers split an ``n``-epoch scan into chunks to bound
    the single-device-call duration; every distinct chunk length is a
    distinct XLA program shape (a multi-minute compile on this platform).
    Rounding the requested chunk down to a divisor of ``n`` makes every
    call the same length, so exactly one program compiles — e.g. 100
    epochs with a requested chunk of 33 runs as 4 calls of 25 instead of
    33+33+33+1 (two compiles, one of them for a single-epoch tail).
    """
    if n <= 0:
        return max(1, chunk)
    chunk = max(1, min(chunk, n))
    while n % chunk:
        chunk -= 1
    return chunk


class FitResult(NamedTuple):
    state: TrainState
    best_state: TrainState
    best_val_accuracy: float
    history: Dict[str, list]
    test: Optional[EvalResult]


def fit(
    model,
    optimizer,
    state: TrainState,
    splits: Dict[str, DeviceData],
    epochs: int,
    batch_size: int,
    num_classes: int,
    label_smoothing: float = 0.0,
    softmax_before_ce: bool = False,
    drop_last: bool = True,
    shuffle_seed: int = 0,
    logger=None,
    log_every: int = 10,
    checkpointer=None,
    compute_dtype=None,
    metrics_callback=None,
    start_epoch: int = 1,
    initial_best_acc: float = -1.0,
    initial_best_state: Optional[TrainState] = None,
    nan_guard: bool = True,
    grad_norms: bool = False,
    step_metrics_callback=None,
    lr_fn=None,
    epoch_impl: str = "scan",
    mesh=None,
    augment_fn=None,
    scan_epochs: Union[bool, int, None] = None,
) -> FitResult:
    """Epoch driver: train -> valid (track best) -> final test on best.

    Capability of the reference ``run()`` (``main.py:253-348``): best-model
    tracking on validation accuracy, resumable state, final reload-best-then
    -test. Host work per epoch is one shuffle-key fold and a few scalars.

    ``scan_epochs`` (default: auto) fuses the WHOLE run — every epoch's
    shuffle, train scan, eval, and best-state gating — into one jitted
    ``lax.scan`` over epochs with a single host round-trip at the end.
    On this remote-TPU platform the per-epoch host sync costs ~0.3-0.9 s,
    which dominates small-model training (a 100-epoch sensor-family fold
    spends more time syncing than computing). Auto-enables when every
    requested capability is expressible on device: scanned epoch impl, no
    checkpointer (it writes per epoch), no per-epoch callbacks, no
    grad-norm streaming. Epoch curves still come back (stacked scan
    outputs). Semantics vs the per-epoch loop: identical shuffles (same
    per-epoch key folds) and identical math up to XLA scheduling; the NaN
    guard becomes post-hoc (a NaN epoch can no longer break the loop
    early, but best-state tracking ignores NaN epochs the same way).

    ``mesh``: a 1-D ``jax.sharding.Mesh`` turns the whole run data-parallel —
    state (and restored best state) replicated, splits replicated in each
    chip's HBM, per-step batch compute sharded across the mesh axis for BOTH
    train and eval. Every capability of the single-device path (bf16,
    grad-norms, NaN guard, checkpointing, resume, best tracking) runs
    unchanged; semantics are globally identical to single-device (GSPMD).
    """
    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        batch_sharding = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        replicated = NamedSharding(mesh, PartitionSpec())
        state = jax.device_put(state, replicated)
        if initial_best_state is not None:
            initial_best_state = jax.device_put(initial_best_state, replicated)
        splits = {k: jax.device_put(v, replicated) for k, v in splits.items()}
    train_epoch = make_train_epoch(
        model, optimizer, label_smoothing, softmax_before_ce, compute_dtype,
        grad_norms=grad_norms, impl=epoch_impl, batch_sharding=batch_sharding,
        augment_fn=augment_fn,
    )
    eval_epoch = make_eval_epoch(model, num_classes, label_smoothing, softmax_before_ce,
                                 batch_sharding=batch_sharding)

    shuffle_key = jax.random.key(shuffle_seed)
    history: Dict[str, list] = {
        "train_loss": [], "train_acc": [], "val_loss": [], "val_acc": [],
        "epoch_time": [],
    }
    # On resume, the caller passes the restored *best* checkpoint separately
    # (initial_best_state): seeding best_state with the restored latest
    # weights would silently test non-best weights if no post-resume epoch
    # improves on initial_best_acc (the reference reloads best before its
    # final test, main.py:344).
    best_state = initial_best_state if initial_best_state is not None else state
    best_acc = initial_best_acc

    resolved_impl = epoch_impl
    if resolved_impl == "auto":
        resolved_impl = "host" if jax.default_backend() == "cpu" else "scan"
    if scan_epochs is None:
        scan_epochs = (
            resolved_impl == "scan"
            and checkpointer is None
            and metrics_callback is None
            and step_metrics_callback is None
            and not grad_norms
        )
    if scan_epochs and (
        resolved_impl != "scan" or checkpointer is not None
        or metrics_callback is not None or step_metrics_callback is not None
        or grad_norms
    ):
        raise ValueError(
            "scan_epochs=True fuses the epoch loop on device — it needs the "
            "scanned epoch impl and cannot run per-epoch host work "
            "(checkpointer / metrics callbacks / grad-norm streaming)"
        )

    if scan_epochs:
        valid = splits["valid"]
        if valid.n == 0:
            # the per-epoch path fails loudly via evaluate() on epoch 1; the
            # fused path would otherwise divide by zero and run the whole
            # program producing NaN curves — fail identically up front
            raise ValueError(
                "evaluate() got an empty split (0 windows) — the dataset is "
                "too small for the configured split fractions / fold count"
            )
        vidx = jnp.asarray(eval_batch_indices(valid.n, batch_size))
        vmask = jnp.asarray(eval_batch_mask(valid.n, batch_size), jnp.float32)
        train_data = splits["train"]

        def _epoch_body(carry, epoch_i):
            st, best_st, best = carry
            ekey = jax.random.fold_in(shuffle_key, epoch_i)
            idx = epoch_batch_indices(ekey, train_data.n, batch_size, drop_last)
            st, tm = train_epoch(st, train_data, idx)
            cm, loss_sum = eval_epoch(st, valid, vidx, vmask)
            acc = jnp.diagonal(cm).sum() / jnp.maximum(cm.sum(), 1.0)
            # NaN params degrade to constant argmax-0 predictions whose
            # accuracy is NOT NaN — gate best tracking on a finite train
            # loss so a blown-up epoch can never be promoted to best (the
            # per-epoch guard would have stopped before evaluating it)
            improved = (acc > best) & jnp.isfinite(tm["loss"])
            best_st = jax.tree.map(
                lambda new, old: jnp.where(improved, new, old), st, best_st
            )
            # same gate for the scalar: a NaN-blown epoch's degenerate
            # constant predictions must not inflate best_val_accuracy either
            # (the state promotion above already refuses them)
            best = jnp.where(improved, acc, best)
            return (st, best_st, best), {
                "train_loss": tm["loss"],
                "train_acc": tm["accuracy"],
                "val_loss": loss_sum / valid.n,
                "val_acc": acc,
            }

        @jax.jit
        def _run_chunk(carry, epoch_nums):
            return jax.lax.scan(_epoch_body, carry, epoch_nums)

        # scan_epochs=int bounds the single-device-call duration (a
        # many-minute execution can crash this platform's TPU worker —
        # see cross_validate_vmapped); True = the whole run in one call
        n_epochs = epochs - start_epoch + 1
        chunk = n_epochs if scan_epochs is True else max(1, int(scan_epochs))
        chunk = equal_chunk(n_epochs, chunk)
        epoch_nums = np.arange(start_epoch, epochs + 1)

        t0 = time.perf_counter()
        carry = (state, best_state, jnp.asarray(best_acc, jnp.float32))
        hists = []
        for s in range(0, n_epochs, chunk):
            carry, h = _run_chunk(carry, jnp.asarray(epoch_nums[s : s + chunk]))
            if chunk < n_epochs:
                h = {k: np.asarray(v) for k, v in h.items()}
            hists.append(h)
        state, best_state, best_acc_j = carry
        if hists:
            hist = {
                k: np.concatenate([np.asarray(h[k]) for h in hists])
                for k in hists[0]
            }
        else:  # resume already complete (start_epoch > epochs)
            hist = {k: np.zeros((0,)) for k in
                    ("train_loss", "train_acc", "val_loss", "val_acc")}
        dt_total = time.perf_counter() - t0
        best_acc = float(best_acc_j)
        n_run = len(hist["train_loss"])
        for k in ("train_loss", "train_acc", "val_loss", "val_acc"):
            history[k] = [float(x) for x in hist[k]]
        history["epoch_time"] = [dt_total / max(n_run, 1)] * n_run
        if nan_guard and n_run and not np.isfinite(hist["train_loss"]).all():
            # reproduce the per-epoch guard's observable contract: history
            # truncated at the first non-finite epoch (train_loss keeps the
            # offending entry, the other series end one earlier) and the
            # best state from before the blow-up is kept. The fused program
            # has already run to completion — only the wasted epochs differ.
            first_bad = int(np.argmax(~np.isfinite(hist["train_loss"])))
            history["train_loss"] = history["train_loss"][: first_bad + 1]
            for k in ("train_acc", "val_loss", "val_acc", "epoch_time"):
                history[k] = history[k][:first_bad]
            if logger:
                logger.error(
                    f"non-finite train loss at epoch "
                    f"{start_epoch + first_bad}; stopping and keeping the "
                    f"best state (val acc {best_acc:.4f}) "
                    f"[fused epoch scan: detected post-hoc]"
                )
        elif logger:
            for e in range(n_run):
                epoch_abs = start_epoch + e
                if epoch_abs % log_every == 0 or epoch_abs == epochs:
                    logger.info(
                        f"epoch {epoch_abs}/{epochs} "
                        f"train loss {history['train_loss'][e]:.4f} "
                        f"acc {history['train_acc'][e]:.4f} | "
                        f"val loss {history['val_loss'][e]:.4f} "
                        f"acc {history['val_acc'][e]:.4f} "
                        f"| {dt_total / max(n_run, 1):.2f}s (fused)"
                    )

        test = None
        if "test" in splits and splits["test"].n > 0:
            test = evaluate(eval_epoch, best_state, splits["test"], batch_size)
        return FitResult(
            state=state,
            best_state=best_state,
            best_val_accuracy=float(best_acc),
            history=history,
            test=test,
        )

    for epoch_i in range(start_epoch, epochs + 1):
        t0 = time.perf_counter()
        ekey = jax.random.fold_in(shuffle_key, epoch_i)
        idx = epoch_batch_indices(ekey, splits["train"].n, batch_size, drop_last)
        state, tm = train_epoch(state, splits["train"], idx)
        val = evaluate(eval_epoch, state, splits["valid"], batch_size)
        dt = time.perf_counter() - t0

        per_step_norms = tm.pop("grad_norms", None)
        if per_step_norms is not None and step_metrics_callback is not None:
            # one device->host flush per epoch; emit per-step scalars with
            # global step numbers (reference main.py:84-89,129)
            host = {k: np.asarray(v) for k, v in per_step_norms.items()}
            steps_this_epoch = len(next(iter(host.values())))
            # global step numbering must survive --resume: epoch_i is the
            # absolute epoch, so anchor at epoch 1, not start_epoch (else a
            # resumed run re-emits steps 0..N-1 over the first run's curves)
            base = (epoch_i - 1) * steps_this_epoch
            for i in range(steps_this_epoch):
                step_metrics_callback(
                    base + i,
                    {f"grad_norm/{k}": float(v[i]) for k, v in host.items()},
                )

        train_loss = float(tm["loss"])
        if nan_guard and not np.isfinite(train_loss):
            # failure detection (capability absent in the reference, which
            # required a manual restart from checkpoint.pt): stop the run,
            # keep the best state, and report instead of training on NaNs.
            if logger:
                logger.error(
                    f"non-finite train loss at epoch {epoch_i}; stopping and "
                    f"keeping the best state (val acc {best_acc:.4f})"
                )
            history["train_loss"].append(train_loss)
            break
        history["train_loss"].append(train_loss)
        history["train_acc"].append(float(tm["accuracy"]))
        history["val_loss"].append(val.loss)
        history["val_acc"].append(val.accuracy)
        history["epoch_time"].append(dt)

        if val.accuracy > best_acc:
            best_acc, best_state = val.accuracy, state
            if checkpointer is not None:
                checkpointer.save_best(state, epoch_i, best_acc)

        if metrics_callback is not None:
            scalars = {
                "train_loss": float(tm["loss"]),
                "train_accuracy": float(tm["accuracy"]),
                "val_loss": val.loss,
                "val_accuracy": val.accuracy,
            }
            if lr_fn is not None:
                scalars["lr"] = float(lr_fn(int(state.step) - 1))
            metrics_callback(epoch_i, scalars)
        if logger and (epoch_i % log_every == 0 or epoch_i == epochs):
            logger.info(
                f"epoch {epoch_i}/{epochs} "
                f"train loss {float(tm['loss']):.4f} acc {float(tm['accuracy']):.4f} | "
                f"val loss {val.loss:.4f} acc {val.accuracy:.4f} | {dt:.2f}s"
            )
        if checkpointer is not None:
            checkpointer.save_latest(state, epoch_i, best_acc)

    test = None
    if "test" in splits and splits["test"].n > 0:
        test = evaluate(eval_epoch, best_state, splits["test"], batch_size)
    return FitResult(
        state=state,
        best_state=best_state,
        best_val_accuracy=best_acc,
        history=history,
        test=test,
    )


def k_copies_logits(model, variables, skeleton, sensor, num_copies: int = 2):
    """Strided-segment inference average (``Multimodal_Fall3/main.py:150-161``):
    split the window into ``num_copies`` contiguous temporal slices, run the
    model on each, average the logits. T axis is axis 1 in our layout.

    ``num_copies`` must be in [1, T]; when it does not divide T the last
    T %% num_copies frames are dropped (the reference's integer-stride
    slicing does the same)."""
    t_len = skeleton.shape[1]
    if not 1 <= num_copies <= t_len:
        raise ValueError(
            f"num_copies={num_copies} must be between 1 and the window "
            f"length T={t_len} (stride = T // num_copies would be 0)"
        )
    stride = t_len // num_copies
    outs = [
        model.apply(
            variables, skeleton[:, j * stride : (j + 1) * stride], sensor,
            train=False,
        )
        for j in range(num_copies)
    ]
    return jnp.stack(outs, axis=1).mean(axis=1)
