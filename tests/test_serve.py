"""Serving layer tests: predictor, streaming classifier, StableHLO export."""

import numpy as np
import pytest

from fall_multimodal_tpu.configs import load_config, preset_path
from fall_multimodal_tpu.data import make_synthetic, split_dataset, to_device
from fall_multimodal_tpu.serve import (
    Predictor,
    StreamingClassifier,
    export_stablehlo,
    load_stablehlo,
)
from fall_multimodal_tpu.train.cv import run_fold
from fall_multimodal_tpu.utils.checkpoint import Checkpointer


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    cfg = load_config(preset_path("bilstm"), overrides={"data.num_classes": 3})
    data = make_synthetic(n_windows=96, num_classes=3, sensor_dim=6,
                          noise=0.05, windows_per_video=8, seed=0)
    splits = {k: to_device(v) for k, v in split_dataset(data, seed=1).items()}
    ckpt_dir = str(tmp_path_factory.mktemp("serve") / "ckpt")
    ckpt = Checkpointer(ckpt_dir)
    run_fold(cfg, splits, epochs=3, checkpointer=ckpt)
    return cfg, ckpt_dir, data


def test_predictor_from_checkpoint_pads_and_chunks(trained):
    cfg, ckpt_dir, data = trained
    pred = Predictor.from_checkpoint(
        cfg, ckpt_dir, data.features[:2], data.sensors[:2], batch_size=16,
    )
    # 40 samples with batch 16 -> 3 chunks, last padded
    proba = pred.predict_proba(data.features[:40], data.sensors[:40])
    assert proba.shape == (40, 3)
    np.testing.assert_allclose(proba.sum(-1), np.ones(40), atol=1e-5)
    classes = pred.predict(data.features[:40], data.sensors[:40])
    assert classes.shape == (40,)
    assert set(classes.tolist()) <= {0, 1, 2}
    # padding must not change results vs a full batch
    proba_full = pred.predict_proba(data.features[:16], data.sensors[:16])
    np.testing.assert_allclose(proba[:16], proba_full, atol=1e-5)


def test_streaming_classifier(trained):
    cfg, ckpt_dir, data = trained
    pred = Predictor.from_checkpoint(
        cfg, ckpt_dir, data.features[:2], data.sensors[:2], batch_size=1,
    )
    stream = StreamingClassifier(pred, seq_len=30, smooth=3)
    decisions = []
    for t in range(45):
        d = stream.push(data.features[0, t % 30], data.sensors[0, t % 30])
        decisions.append(d)
    assert all(d is None for d in decisions[:29])
    assert all(d is not None for d in decisions[29:])
    stream.reset()
    assert stream.push(data.features[0, 0], data.sensors[0, 0]) is None


def test_stablehlo_export_roundtrip(trained):
    cfg, ckpt_dir, data = trained
    pred = Predictor.from_checkpoint(
        cfg, ckpt_dir, data.features[:2], data.sensors[:2], batch_size=4,
    )
    blob = export_stablehlo(
        cfg, pred.variables,
        skeleton_shape=(4, 30, 14, 3), sensor_shape=(4, 30, 6),
    )
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000
    restored = load_stablehlo(bytes(blob))
    import jax.numpy as jnp

    logits = restored(
        pred.variables,
        jnp.asarray(data.features[:4]),
        jnp.asarray(data.sensors[:4]),
    )
    expect = pred.predict_logits(data.features[:4], data.sensors[:4])
    np.testing.assert_allclose(np.asarray(logits), expect, atol=1e-5)


def test_streaming_uses_batch1_compile(trained):
    """StreamingClassifier must derive a batch-1 predictor instead of
    padding each push to the offline batch (round-2: ~128x wasted compute
    per push)."""
    cfg, ckpt_dir, data = trained
    pred = Predictor.from_checkpoint(
        cfg, ckpt_dir, data.features[:2], data.sensors[:2], batch_size=128,
    )
    stream = StreamingClassifier(pred, seq_len=30)
    assert stream.predictor.batch_size == 1
    # same weights, no reload
    assert stream.predictor.variables is pred.variables
    # an already-batch-1 predictor is reused as-is
    pred1 = pred.with_batch_size(1)
    assert StreamingClassifier(pred1).predictor is pred1


def test_streaming_batch1_matches_offline(trained):
    """The batch-1 streaming decision equals the offline batch prediction
    on the same window."""
    cfg, ckpt_dir, data = trained
    pred = Predictor.from_checkpoint(
        cfg, ckpt_dir, data.features[:2], data.sensors[:2], batch_size=64,
    )
    stream = StreamingClassifier(pred, seq_len=30)
    for t in range(30):
        decision = stream.push(data.features[0, t], data.sensors[0, t])
    offline = pred.predict(data.features[:1], data.sensors[:1])[0]
    assert decision == int(offline)


def test_sensor_none_raises_for_sensor_consuming_model(trained):
    cfg, ckpt_dir, data = trained  # bilstm: a sensor-consuming family
    pred = Predictor.from_checkpoint(
        cfg, ckpt_dir, data.features[:2], data.sensors[:2], batch_size=8,
    )
    assert pred.requires_sensor
    with pytest.raises(ValueError, match="sensor"):
        pred.predict_logits(data.features[:8])


def test_mismatched_sensor_count_raises(trained):
    cfg, ckpt_dir, data = trained
    pred = Predictor.from_checkpoint(
        cfg, ckpt_dir, data.features[:2], data.sensors[:2], batch_size=8,
    )
    with pytest.raises(ValueError, match="counts must match"):
        pred.predict_logits(data.features[:8], data.sensors[:4])


def test_empty_input_returns_empty_logits(trained):
    cfg, ckpt_dir, data = trained
    pred = Predictor.from_checkpoint(
        cfg, ckpt_dir, data.features[:2], data.sensors[:2], batch_size=8,
    )
    out = pred.predict_logits(data.features[:0], data.sensors[:0])
    assert out.shape == (0, cfg.data.num_classes)


def test_sensor_none_ok_for_skeleton_only_model():
    """Skeleton-only families accept sensor=None (placeholder keeps the
    uniform forward contract, never consumed)."""
    import jax

    from fall_multimodal_tpu.models import build_model

    cfg = load_config(
        preset_path("bilstm"),
        overrides={"model.name": "stgcan", "data.num_classes": 3},
    )
    model = build_model(cfg)
    skel = np.random.default_rng(0).normal(size=(4, 30, 14, 3)).astype(np.float32)
    variables = model.init(
        jax.random.key(0), skel, np.zeros((4, 1, 1), np.float32), train=False
    )
    pred = Predictor(cfg, variables, batch_size=4)
    assert not pred.requires_sensor
    logits = pred.predict_logits(skel)
    assert logits.shape == (4, 3)


def test_serve_cli_predict_latency_export(trained, tmp_path):
    """python -m fall_multimodal_tpu.serve: predict writes a CSV over .npz
    windows, latency reports ordered percentiles, export leaves a loadable
    StableHLO blob — all from a training run's checkpoint + config.json."""
    import csv
    import json

    from fall_multimodal_tpu.serve import main as serve_main

    cfg, ckpt_dir, data = trained
    # the CLI takes the config.json a training run writes (YAML superset)
    cfg_path = tmp_path / "config.json"
    with open(cfg_path, "w") as fh:
        json.dump(cfg.to_dict(), fh, default=str)
    npz = tmp_path / "windows.npz"
    np.savez(npz, skeleton=data.features[:12], sensor=data.sensors[:12])

    out = tmp_path / "pred.csv"
    res = serve_main([
        "predict", "--config", str(cfg_path), "--checkpoint", ckpt_dir,
        "--input", str(npz), "--output", str(out),
        "--batch-size", "8", "--proba",
    ])
    assert res["n"] == 12
    with open(out) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 12
    assert {int(r["prediction"]) for r in rows} <= {0, 1, 2}
    proba = np.array([[float(r[f"p{k}"]) for k in range(3)] for r in rows])
    np.testing.assert_allclose(proba.sum(-1), np.ones(12), atol=1e-4)
    # CSV predictions equal the library path on the same windows
    pred = Predictor.from_checkpoint(
        cfg, ckpt_dir, data.features[:2], data.sensors[:2], batch_size=8,
    )
    expect = pred.predict(data.features[:12], data.sensors[:12])
    assert [int(r["prediction"]) for r in rows] == expect.tolist()

    res = serve_main([
        "latency", "--config", str(cfg_path), "--checkpoint", ckpt_dir,
        "--pushes", "5", "--sensor-dim", "6", "--batch-size", "4",
    ])
    assert res["n"] == 5 and res["p50_ms"] > 0

    blob_path = tmp_path / "model.stablehlo"
    res = serve_main([
        "export", "--config", str(cfg_path), "--checkpoint", ckpt_dir,
        "--output", str(blob_path), "--batch-size", "4", "--sensor-dim", "6",
    ])
    assert res["bytes"] > 1000 and blob_path.stat().st_size == res["bytes"]
    restored = load_stablehlo(blob_path.read_bytes())
    import jax.numpy as jnp

    logits = restored(
        pred.variables,
        jnp.asarray(data.features[:4]),
        jnp.asarray(data.sensors[:4]),
    )
    np.testing.assert_allclose(
        np.asarray(logits),
        pred.predict_logits(data.features[:4], data.sensors[:4]),
        atol=1e-5,
    )


def test_serve_cli_predict_refuses_sensorless_input(trained, tmp_path):
    """serve predict on a sensor-consuming model with skeleton-only input
    must fail with the clear sensor-stream message BEFORE building the
    checkpoint template (which would otherwise die in orbax with a shape
    mismatch against the zero-filled placeholder sensor)."""
    import json

    from fall_multimodal_tpu.serve import main as serve_main

    cfg, ckpt_dir, data = trained  # bilstm: sensor-consuming
    cfg_path = tmp_path / "config.json"
    with open(cfg_path, "w") as fh:
        json.dump(cfg.to_dict(), fh, default=str)
    npy = tmp_path / "windows.npy"          # bare .npy = no sensor array
    np.save(npy, data.features[:4])
    with pytest.raises(SystemExit, match="sensor stream"):
        serve_main([
            "predict", "--config", str(cfg_path), "--checkpoint", ckpt_dir,
            "--input", str(npy),
        ])


def test_measure_push_latency_runs(trained):
    """The latency harness exercises the real streaming path and returns
    ordered percentiles (actual v5e numbers live in PARITY.md)."""
    from fall_multimodal_tpu.serve import measure_push_latency

    cfg, ckpt_dir, data = trained
    pred = Predictor.from_checkpoint(
        cfg, ckpt_dir, data.features[:2], data.sensors[:2], batch_size=32,
    )
    stream = StreamingClassifier(pred, seq_len=30)
    stats = measure_push_latency(
        stream, n_pushes=10, warmup=2, sensor_dim=6,
    )
    assert stats["n"] == 10
    assert 0 < stats["p50_ms"] <= stats["p90_ms"] <= stats["p99_ms"]


def test_push_keeps_pose_and_sensor_in_lockstep(trained):
    """A push that omits (or spuriously adds) the sensor frame raises
    instead of desynchronizing the two ring buffers (round-3 review: a
    dropped sensor packet used to produce a misaligned or shape-broken
    sensor window)."""
    cfg, ckpt_dir, data = trained  # bilstm: sensor-consuming
    pred = Predictor.from_checkpoint(
        cfg, ckpt_dir, data.features[:2], data.sensors[:2], batch_size=1,
    )
    stream = StreamingClassifier(pred, seq_len=30)
    for t in range(5):
        stream.push(data.features[0, t], data.sensors[0, t])
    with pytest.raises(ValueError, match="sensor"):
        stream.push(data.features[0, 5])          # dropped sensor frame
    # the rejected push must not have consumed the pose frame either
    assert len(stream._pose) == len(stream._sensor) == 5
    stream.push(data.features[0, 5], data.sensors[0, 5])
    assert len(stream._pose) == len(stream._sensor) == 6


def test_push_rejects_spurious_sensor_on_sensorless_stream():
    """The inverse desync: a sensor frame appearing mid-stream on a
    skeleton-only stream is rejected too."""
    import jax

    from fall_multimodal_tpu.models import build_model

    cfg = load_config(
        preset_path("bilstm"),
        overrides={"model.name": "stgcan", "data.num_classes": 3},
    )
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    skel = rng.normal(size=(2, 30, 14, 3)).astype(np.float32)
    variables = model.init(
        jax.random.key(0), skel, np.zeros((2, 1, 1), np.float32), train=False
    )
    stream = StreamingClassifier(Predictor(cfg, variables, batch_size=1),
                                 seq_len=30)
    stream.push(skel[0, 0])
    with pytest.raises(ValueError, match="inconsistent"):
        stream.push(skel[0, 1], np.zeros(6, np.float32))
    assert len(stream._pose) == 1 and not stream._sensor
