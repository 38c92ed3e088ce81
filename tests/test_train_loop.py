"""End-to-end training tests: overfit a tiny synthetic set per model family
(the test strategy SURVEY.md section 4e prescribes for the rebuild).

The CI box has a single CPU core, so skeleton models run with a reduced
3-block stage plan — the code path (GCN/TCN/SE/residual/fusion/scan-epoch)
is identical to the full 7-block production stack.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fall_multimodal_tpu.configs import load_config, preset_path
from fall_multimodal_tpu.data import make_synthetic, split_dataset, to_device
from fall_multimodal_tpu.models import build_model
from fall_multimodal_tpu.train import (
    build_optimizer,
    create_train_state,
    evaluate,
    fit,
    make_eval_epoch,
)

TINY_STAGES = ((16, 1, False), (16, 1, True), (32, 2, True))


def _device_splits(num_classes, sensor_dim, n=160, seed=0):
    data = make_synthetic(
        n_windows=n,
        num_classes=num_classes,
        sensor_dim=sensor_dim,
        noise=0.05,
        windows_per_video=8,
        seed=seed,
    )
    splits = split_dataset(data, split=(0.7, 0.15, 0.15), seed=1)
    return {k: to_device(v) for k, v in splits.items()}


def _run(preset, num_classes, sensor_dim, epochs=10, overrides=None, n=160):
    cfg = load_config(preset_path(preset), overrides=overrides)
    splits = _device_splits(num_classes, sensor_dim, n=n)
    model = build_model(cfg)
    optimizer = build_optimizer(cfg)
    state = create_train_state(
        model,
        optimizer,
        splits["train"].features[:2],
        splits["train"].sensors[:2],
        seed=cfg.seed,
    )
    return fit(
        model,
        optimizer,
        state,
        splits,
        epochs=epochs,
        batch_size=32,
        num_classes=num_classes,
        softmax_before_ce=cfg.model.softmax_output,
    )


def test_bilstm_learns_synthetic():
    result = _run("bilstm", num_classes=4, sensor_dim=6, epochs=12,
                  overrides={"data.num_classes": 4})
    assert result.history["train_acc"][-1] > 0.85
    assert result.best_val_accuracy > 0.7
    assert result.test is not None


def test_cnn_bilstm_learns_synthetic():
    result = _run("sensor_cnn_bilstm_urfall", num_classes=2, sensor_dim=4, epochs=10)
    assert result.history["train_acc"][-1] > 0.85


def test_stgcan_learns_synthetic():
    result = _run(
        "default", num_classes=4, sensor_dim=0, epochs=10,
        overrides={"data.num_classes": 4, "model.kwargs": {"stages": TINY_STAGES}},
    )
    assert result.history["train_acc"][-1] > 0.8


def test_three_stream_gstcan_learns_synthetic():
    result = _run(
        "gstcan_urfall_3stream", num_classes=2, sensor_dim=4, epochs=6,
        overrides={"model.kwargs": {"stages": TINY_STAGES, "sensor_encoder": "cnn_bilstm"}},
    )
    assert result.history["train_acc"][-1] > 0.8
    assert result.history["train_loss"][-1] < result.history["train_loss"][0]


def test_host_epoch_matches_scanned_epoch():
    """The host-loop epoch (CPU fast path, train.epoch_impl=host) must
    produce the same state and metrics as the lax.scan epoch — same jitted
    step, different sequencing."""
    from fall_multimodal_tpu.data import epoch_batch_indices
    from fall_multimodal_tpu.train import make_train_epoch

    cfg = load_config(preset_path("bilstm"),
                      overrides={"data.num_classes": 3})
    splits = _device_splits(3, cfg.data.sensor_dim, n=96)
    model = build_model(cfg)
    optimizer = build_optimizer(cfg)
    state0 = create_train_state(
        model, optimizer, splits["train"].features[:2],
        splits["train"].sensors[:2], seed=0,
    )
    idx = epoch_batch_indices(jax.random.key(5), splits["train"].n, 32)

    scan_epoch = make_train_epoch(model, optimizer, impl="scan")
    host_epoch = make_train_epoch(model, optimizer, impl="host")
    s_scan, m_scan = scan_epoch(state0, splits["train"], idx)
    s_host, m_host = host_epoch(state0, splits["train"], idx)

    np.testing.assert_allclose(
        float(m_scan["loss"]), float(m_host["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m_scan["accuracy"]), float(m_host["accuracy"]), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5),
        s_scan.params, s_host.params,
    )
    assert int(s_scan.step) == int(s_host.step)

    # the grad_norms contract survives both impls: (steps,) per parameter
    gn_epoch = make_train_epoch(model, optimizer, grad_norms=True,
                                impl="host")
    _, m_gn = gn_epoch(state0, splits["train"], idx)
    steps = idx.shape[0]
    assert all(v.shape == (steps,) for v in m_gn["grad_norms"].values())


def test_fit_fused_epoch_scan_matches_per_epoch_loop():
    """fit(scan_epochs=True) — the whole run (shuffles, train epochs, eval,
    best gating) as ONE lax.scan program — must reproduce the per-epoch
    driver's curves, best tracking, and test metrics (identical per-epoch
    key folds; only XLA scheduling differs)."""
    from fall_multimodal_tpu.train.cv import run_fold

    splits = _device_splits(3, 6, n=160)
    results = {}
    for impl, scan_epochs in (("host", False), ("scan", None)):
        cfg = load_config(
            preset_path("bilstm"),
            overrides={"data.num_classes": 3, "train.epoch_impl": impl},
        )
        results[impl] = run_fold(cfg, splits, epochs=6)
    # chunked fused mode (scan_epochs=int bounds the single-device-call
    # duration — the remote TPU worker dies on many-minute executions)
    # must be epoch-for-epoch identical to the all-epochs fused run
    cfg = load_config(preset_path("bilstm"),
                      overrides={"data.num_classes": 3})
    model = build_model(cfg)
    optimizer = build_optimizer(cfg)
    state = create_train_state(model, optimizer, splits["train"].features[:2],
                               splits["train"].sensors[:2], seed=0)
    chunked = fit(model, optimizer, state, splits, epochs=6, batch_size=32,
                  num_classes=3, epoch_impl="scan", scan_epochs=2)
    fused_all = fit(model, optimizer, state, splits, epochs=6, batch_size=32,
                    num_classes=3, epoch_impl="scan", scan_epochs=True)
    np.testing.assert_allclose(
        fused_all.history["val_acc"], chunked.history["val_acc"], atol=1e-5)

    a, b = results["host"], results["scan"]
    np.testing.assert_allclose(a.history["val_acc"], b.history["val_acc"],
                               atol=1e-5)
    np.testing.assert_allclose(a.history["train_loss"],
                               b.history["train_loss"], rtol=1e-4)
    assert a.best_val_accuracy == pytest.approx(b.best_val_accuracy, abs=1e-5)
    assert float(a.test.stats["accuracy"]) == pytest.approx(
        float(b.test.stats["accuracy"]), abs=1e-5)

    # requesting the fused path alongside per-epoch host work is a loud error
    cfg = load_config(preset_path("bilstm"),
                      overrides={"data.num_classes": 3})
    model = build_model(cfg)
    optimizer = build_optimizer(cfg)
    state = create_train_state(model, optimizer, splits["train"].features[:2],
                               splits["train"].sensors[:2], seed=0)
    with pytest.raises(ValueError):
        fit(model, optimizer, state, splits, epochs=1, batch_size=32,
            num_classes=3, scan_epochs=True, grad_norms=True,
            epoch_impl="scan")


def test_evaluate_confusion_consistency():
    cfg = load_config(preset_path("bilstm"), overrides={"data.num_classes": 3})
    splits = _device_splits(3, 6, n=96)
    model = build_model(cfg)
    optimizer = build_optimizer(cfg)
    state = create_train_state(
        model, optimizer, splits["train"].features[:2], splits["train"].sensors[:2]
    )
    eval_epoch = make_eval_epoch(model, 3)
    res = evaluate(eval_epoch, state, splits["valid"], batch_size=16)
    assert res.confusion.sum() == splits["valid"].n
    assert 0.0 <= res.accuracy <= 1.0
    assert res.loss > 0


def test_evaluate_empty_split_raises_clearly():
    cfg = load_config(preset_path("bilstm"), overrides={"data.num_classes": 3})
    splits = _device_splits(3, 6, n=96)
    model = build_model(cfg)
    optimizer = build_optimizer(cfg)
    state = create_train_state(
        model, optimizer, splits["train"].features[:2], splits["train"].sensors[:2]
    )
    eval_epoch = make_eval_epoch(model, 3)
    empty = splits["valid"]._replace(
        features=splits["valid"].features[:0],
        sensors=splits["valid"].sensors[:0],
        labels=splits["valid"].labels[:0],
    )
    with pytest.raises(ValueError, match="empty split"):
        evaluate(eval_epoch, state, empty, batch_size=16)


def test_k_copies_rejects_out_of_range_num_copies():
    from fall_multimodal_tpu.train.loop import k_copies_logits

    cfg = load_config(preset_path("bilstm"), overrides={"data.num_classes": 3})
    splits = _device_splits(3, 6, n=8)
    model = build_model(cfg)
    optimizer = build_optimizer(cfg)
    state = create_train_state(
        model, optimizer, splits["train"].features[:2], splits["train"].sensors[:2]
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    t_len = splits["train"].features.shape[1]
    with pytest.raises(ValueError, match="num_copies"):
        k_copies_logits(
            model, variables, splits["train"].features[:2],
            splits["train"].sensors[:2], num_copies=t_len + 1,
        )


def test_grad_norm_observability():
    """VERDICT r1 item 5: per-parameter per-step gradient norms accumulate
    in the scan carry and flush per epoch through step_metrics_callback
    (reference main.py:84-89,129)."""
    from fall_multimodal_tpu.train.cv import run_fold

    cfg = load_config(preset_path("bilstm"), overrides={"data.num_classes": 3})
    splits = _device_splits(num_classes=3, sensor_dim=6, n=96)
    seen = []

    def step_cb(step, scalars):
        seen.append((step, scalars))

    result = run_fold(cfg, splits, epochs=2, grad_norms=True,
                      step_metrics_callback=step_cb)
    assert len(result.history["train_loss"]) == 2
    assert seen, "per-step grad norms must reach the callback"
    steps = [s for s, _ in seen]
    assert steps == sorted(steps) and len(set(steps)) == len(steps)
    _, scalars = seen[0]
    names = list(scalars)
    assert all(n.startswith("grad_norm/") for n in names)
    # one scalar per parameter leaf, all finite and not all zero
    import numpy as np
    vals = np.array([v for _, sc in seen for v in sc.values()])
    assert np.isfinite(vals).all() and (vals > 0).any()
    # epoch-level scalars unaffected by the grad_norms side channel
    assert np.isfinite(result.history["train_loss"]).all()


def test_equal_chunk_single_program_shape():
    """ADVICE r4: chunked fused mode must not pay a second XLA compile for a
    ragged tail — the chunk size is rounded down to a divisor of n_epochs so
    every device call has one program shape (loop.py equal_chunk)."""
    from fall_multimodal_tpu.train.loop import equal_chunk

    assert equal_chunk(100, 33) == 25          # 33,33,33,1 -> 25x4
    assert equal_chunk(100, 25) == 25          # already a divisor
    assert equal_chunk(6, 2) == 2
    assert equal_chunk(7, 3) == 1              # prime: per-epoch calls
    assert equal_chunk(10, 100) == 10          # clamped to n
    assert equal_chunk(0, 5) == 5              # degenerate resume-complete
    for n in range(1, 50):
        for c in range(1, n + 1):
            s = equal_chunk(n, c)
            assert 1 <= s <= c and n % s == 0


def test_fused_empty_valid_split_raises_clearly():
    """ADVICE r4: the fused path must fail loudly on an empty valid split
    (matching evaluate()), not silently produce NaN curves."""
    cfg = load_config(preset_path("bilstm"), overrides={"data.num_classes": 3})
    splits = _device_splits(3, 6, n=96)
    model = build_model(cfg)
    optimizer = build_optimizer(cfg)
    state = create_train_state(
        model, optimizer, splits["train"].features[:2],
        splits["train"].sensors[:2]
    )
    empty = splits["valid"]._replace(
        features=splits["valid"].features[:0],
        sensors=splits["valid"].sensors[:0],
        labels=splits["valid"].labels[:0],
    )
    splits = dict(splits, valid=empty)
    with pytest.raises(ValueError, match="empty split"):
        fit(model, optimizer, state, splits, epochs=1, batch_size=32,
            num_classes=3, epoch_impl="scan", scan_epochs=True)


def test_config_scan_epochs_plumbs_through_run_fold():
    """train.scan_epochs (round 5): chunked fused mode is a config knob —
    run_fold passes it to fit(), and the chunked run is epoch-for-epoch
    identical to the whole-run fused default."""
    from fall_multimodal_tpu.train.cv import run_fold

    splits = _device_splits(3, 6, n=160)
    results = {}
    for chunk in (None, 2):
        cfg = load_config(
            preset_path("bilstm"),
            overrides={"data.num_classes": 3, "train.epoch_impl": "scan",
                       "train.scan_epochs": chunk},
        )
        results[chunk] = run_fold(cfg, splits, epochs=4)
    np.testing.assert_allclose(results[None].history["val_acc"],
                               results[2].history["val_acc"], atol=1e-5)
    assert results[None].best_val_accuracy == pytest.approx(
        results[2].best_val_accuracy, abs=1e-5)
