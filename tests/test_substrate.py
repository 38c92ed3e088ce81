"""Config / metrics / losses / optimizer substrate tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fall_multimodal_tpu.configs import Config, load_config, preset_path
from fall_multimodal_tpu.train.losses import cross_entropy, smooth_labels
from fall_multimodal_tpu.train.metrics import (
    classification_report,
    confusion_matrix,
    prf_from_confusion,
    top_k_accuracy,
)
from fall_multimodal_tpu.train.optim import build_optimizer, build_schedule
from fall_multimodal_tpu.configs.config import OptimConfig, SchedulerConfig


# ----------------------------------------------------------------- config


def test_default_config_roundtrip():
    cfg = Config()
    assert cfg.optim.type == "rmsprop"
    d = cfg.to_dict()
    assert d["train"]["epochs"] == 100


@pytest.mark.parametrize(
    "name",
    [
        "default", "default_urfall", "bilstm", "bilstm_urfall",
        "twostream_stgcan", "two_stgcan_bilstm_harup", "two_stgcan_bilstm_urfall",
        "gstcan_urfall_3stream", "gstcan_harup_3stream", "musa_harup",
        "musa_ablation_harup", "musa_imvia", "musa_fukinect",
        "transformer_ensemble_harup",
        "targcn_harup", "skeleton_transformer_harup", "sensor_cnn_bilstm_urfall",
    ],
)
def test_all_presets_load(name):
    cfg = load_config(preset_path(name))
    assert isinstance(cfg, Config)
    assert cfg.optim.lr > 0


def test_overrides():
    cfg = load_config(
        preset_path("default"),
        overrides={"optim.lr": "5e-4", "data.num_classes": 7, "seed": "7"},
    )
    assert cfg.optim.lr == 5e-4
    assert cfg.data.num_classes == 7
    assert cfg.seed == 7


def test_flagship_preset_quirks():
    cfg = load_config(preset_path("gstcan_urfall_3stream"))
    assert cfg.model.softmax_output is True
    assert cfg.model.kwargs["sensor_encoder"] == "cnn_bilstm"


# ----------------------------------------------------------------- metrics


def test_top_k_accuracy_against_sklearn_style(rng):
    logits = jnp.asarray(rng.normal(size=(64, 5)))
    labels = jnp.asarray(rng.integers(0, 5, size=64))
    acc1, acc3 = np.asarray(top_k_accuracy(logits, labels, (1, 3)))
    pred = np.argmax(np.asarray(logits), axis=1)
    assert acc1 == pytest.approx((pred == np.asarray(labels)).mean())
    top3 = np.argsort(np.asarray(logits), axis=1)[:, -3:]
    assert acc3 == pytest.approx(
        np.mean([labels[i] in top3[i] for i in range(64)])
    )


def test_top_k_with_soft_targets(rng):
    logits = jnp.asarray(rng.normal(size=(32, 4)))
    soft = jax.nn.softmax(jnp.asarray(rng.normal(size=(32, 4))) * 3)
    acc = top_k_accuracy(logits, soft, (1,))
    hard = jnp.argmax(soft, axis=-1)
    acc_hard = top_k_accuracy(logits, hard, (1,))
    np.testing.assert_allclose(acc, acc_hard)


def test_prf_against_sklearn(rng):
    pytest.importorskip("sklearn")
    from sklearn import metrics as sk

    true = rng.integers(0, 3, size=200)
    pred = rng.integers(0, 3, size=200)
    cm = confusion_matrix(jnp.asarray(pred), jnp.asarray(true), 3)
    np.testing.assert_array_equal(np.asarray(cm), sk.confusion_matrix(true, pred))
    stats = prf_from_confusion(cm)
    assert float(stats["macro_f1"]) == pytest.approx(
        sk.f1_score(true, pred, average="macro"), abs=1e-6
    )
    assert float(stats["micro_precision"]) == pytest.approx(
        sk.precision_score(true, pred, average="micro"), abs=1e-6
    )
    assert float(stats["accuracy"]) == pytest.approx(sk.accuracy_score(true, pred))
    report = classification_report(np.asarray(cm), ["a", "b", "c"])
    assert "macro avg" in report


# ----------------------------------------------------------------- losses


def test_cross_entropy_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    logits = rng.normal(size=(16, 5)).astype(np.float32)
    soft = rng.dirichlet(np.ones(5), size=16).astype(np.float32)

    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(soft)))
    theirs = float(F.cross_entropy(torch.tensor(logits), torch.tensor(soft)))
    assert ours == pytest.approx(theirs, rel=1e-5)

    # softmax-before-CE quirk (notebook GSTCAN)
    ours_q = float(
        cross_entropy(jnp.asarray(logits), jnp.asarray(soft), softmax_before_ce=True)
    )
    theirs_q = float(
        F.cross_entropy(torch.softmax(torch.tensor(logits), -1), torch.tensor(soft))
    )
    assert ours_q == pytest.approx(theirs_q, rel=1e-5)

    # label smoothing
    ours_s = float(
        cross_entropy(jnp.asarray(logits), jnp.asarray(soft), label_smoothing=0.1)
    )
    theirs_s = float(
        F.cross_entropy(torch.tensor(logits), torch.tensor(soft), label_smoothing=0.1)
    )
    assert ours_s == pytest.approx(theirs_s, rel=1e-5)


def test_smooth_labels():
    y = jnp.eye(4)
    s = smooth_labels(y, 0.1)
    np.testing.assert_allclose(s.sum(-1), np.ones(4), atol=1e-6)
    assert float(s[0, 0]) == pytest.approx(0.9 + 0.1 / 4)


# ----------------------------------------------------------------- optim


def test_rmsprop_matches_torch(rng):
    import torch

    w0 = rng.normal(size=(7, 3)).astype(np.float32)
    tw = torch.tensor(w0.copy(), requires_grad=True)
    topt = torch.optim.RMSprop([tw], lr=1e-3)

    params = {"w": jnp.asarray(w0)}
    opt = build_optimizer(OptimConfig(type="rmsprop", lr=1e-3))
    state = opt.init(params)

    for i in range(5):
        g = rng.normal(size=(7, 3)).astype(np.float32)
        tw.grad = torch.tensor(g)
        topt.step()
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        import optax

        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), atol=1e-6)


def test_cosine_schedule_shape():
    sched = build_schedule(
        SchedulerConfig(type="cosine", t_initial=100, lr_min=1e-5, warmup_t=5, warmup_lr_init=1e-4),
        base_lr=1e-3,
        steps_per_epoch=10,
    )
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(5 * 10)) == pytest.approx(1e-3)
    assert float(sched(100 * 10)) == pytest.approx(1e-5, rel=1e-3)
    # monotone decay after warmup
    vals = [float(sched(e * 10)) for e in range(5, 101, 5)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_all_optimizers_build():
    import optax

    for typ in ("sgd", "adam", "adamw", "rmsprop"):
        opt = build_optimizer(OptimConfig(type=typ, lr=1e-3, momentum=0.9, weight_decay=0.01))
        params = {"w": jnp.ones((2, 2))}
        state = opt.init(params)
        updates, _ = opt.update({"w": jnp.ones((2, 2))}, state, params)
        optax.apply_updates(params, updates)
