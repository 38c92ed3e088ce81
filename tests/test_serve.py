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
