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


def test_rmsprop_weight_decay_matches_torch(rng):
    """optim.weight_decay under rmsprop must apply torch's placement
    (grad += wd*p BEFORE the square-average update), not be silently
    dropped (no reference run sets it; our config exposes it)."""
    import torch

    import optax

    w0 = rng.normal(size=(7, 3)).astype(np.float32)
    tw = torch.tensor(w0.copy(), requires_grad=True)
    topt = torch.optim.RMSprop([tw], lr=1e-3, weight_decay=0.05)

    params = {"w": jnp.asarray(w0)}
    opt = build_optimizer(OptimConfig(type="rmsprop", lr=1e-3, weight_decay=0.05))
    state = opt.init(params)

    for i in range(5):
        g = rng.normal(size=(7, 3)).astype(np.float32)
        tw.grad = torch.tensor(g)
        topt.step()
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), atol=1e-6)


def test_cosine_schedule_matches_timm_trajectory():
    """Exact timm CosineLRScheduler values (t_in_epochs=True, cycle_limit=1,
    warmup_prefix=False — the reference construction, optimizer.py:32).
    Expected literals hand-computed from timm's published update rule:

      t < warmup_t:  lr = init + t * (base - init) / warmup_t
      t < t_initial: lr = lr_min + 0.5*(base - lr_min)*(1 + cos(pi*t/t_initial))
      else:          lr = lr_min

    Note warmup_prefix=False: the cosine at t=warmup_t is evaluated at the
    UNSHIFTED t (so it re-enters below base_lr), the detail VERDICT r1
    flagged as untested.
    """
    import math

    base, t_init, lr_min, w_t, w_init = 1e-3, 100, 1e-5, 5, 1e-4
    sched = build_schedule(
        SchedulerConfig(type="cosine", t_initial=t_init, lr_min=lr_min,
                        warmup_t=w_t, warmup_lr_init=w_init),
        base_lr=base,
        steps_per_epoch=10,
    )

    def timm_expected(t):
        if t < w_t:
            return w_init + t * (base - w_init) / w_t
        if t < t_init:
            return lr_min + 0.5 * (base - lr_min) * (1 + math.cos(math.pi * t / t_init))
        return lr_min

    for epoch in [0, 1, 2, 4, 5, 6, 10, 25, 50, 75, 99, 100, 120, 500]:
        for step_in_epoch in (0, 3, 9):
            got = float(sched(epoch * 10 + step_in_epoch))
            assert got == pytest.approx(timm_expected(epoch), rel=1e-5), (
                epoch, step_in_epoch
            )
    # spot literals: epoch 5 is cosine at t=5 (not base_lr!)
    assert float(sched(50)) == pytest.approx(
        1e-5 + 0.5 * (1e-3 - 1e-5) * (1 + math.cos(math.pi * 0.05)), rel=1e-6
    )
    assert float(sched(500)) == pytest.approx(5.05e-4, rel=1e-4)   # epoch 50
    assert float(sched(1000)) == pytest.approx(1e-5)               # cycle end


def test_step_schedule_matches_timm_trajectory():
    """timm StepLRScheduler: base * decay_rate ** (t // decay_t), with the
    linear warmup head when warmup_t > 0."""
    sched = build_schedule(
        SchedulerConfig(type="step", t_initial=30, decay_rate=0.1,
                        warmup_t=0, warmup_lr_init=0.0),
        base_lr=1e-2,
        steps_per_epoch=4,
    )
    expect = {0: 1e-2, 29: 1e-2, 30: 1e-3, 59: 1e-3, 60: 1e-4, 90: 1e-5}
    for epoch, lr in expect.items():
        assert float(sched(epoch * 4)) == pytest.approx(lr, rel=1e-6), epoch

    warm = build_schedule(
        SchedulerConfig(type="step", t_initial=30, decay_rate=0.1,
                        warmup_t=3, warmup_lr_init=1e-4),
        base_lr=1e-2,
        steps_per_epoch=1,
    )
    assert float(warm(0)) == pytest.approx(1e-4)
    assert float(warm(1)) == pytest.approx(1e-4 + (1e-2 - 1e-4) / 3)
    assert float(warm(3)) == pytest.approx(1e-2)


def test_model_kwargs_override_recovers_numeric_strings():
    """PyYAML parses '1e-3' as a string; typed fields coerce it via the
    dataclass type but model.kwargs has no type — the loader must recover
    numerics itself or they crash at trace time."""
    cfg = load_config(
        preset_path("musa_harup"),
        overrides={"model.kwargs.keep_prob": "1e-3",
                   "model.kwargs.n_stage": "2",
                   "model.kwargs.act_type": "tanh"},
    )
    assert cfg.model.kwargs["keep_prob"] == pytest.approx(1e-3)
    assert cfg.model.kwargs["n_stage"] == 2
    assert cfg.model.kwargs["act_type"] == "tanh"


def test_create_logger_does_not_stack_handlers(tmp_path):
    """The same named logger must not accumulate handlers across runs in
    one process (duplicated console lines; run B's records appended into
    run A's log file)."""
    from fall_multimodal_tpu.utils.logging import create_logger

    lg1 = create_logger(output_dir=str(tmp_path / "a"), name="fmt.test")
    n1 = len(lg1.handlers)
    lg2 = create_logger(output_dir=str(tmp_path / "b"), name="fmt.test")
    assert lg2 is lg1
    assert len(lg2.handlers) == n1          # reconfigured, not stacked
    files = [h for h in lg2.handlers
             if getattr(h, "baseFilename", "").startswith(str(tmp_path / "b"))]
    assert files                            # file handler points at run B


def test_schedule_pacing_under_grad_accum():
    """With accum_iter > 1 the optax.MultiSteps-wrapped optimizer advances
    its inner schedule once per GRADIENT step, while steps_per_epoch is
    counted in micro-steps — build_optimizer must pace the schedule in
    gradient steps so one schedule epoch remains one data epoch (the
    reference steps its scheduler per epoch regardless of ACCUM_ITER,
    main.py:321-322). Asserted on the actually-applied updates."""
    micro_per_epoch, accum = 4, 2
    opt = build_optimizer(
        OptimConfig(type="sgd", lr=1.0, momentum=0.0, weight_decay=0.0),
        scheduler=SchedulerConfig(
            type="multistep", decay_steps=(1, 2), decay_rate=0.1, warmup_t=0
        ),
        steps_per_epoch=micro_per_epoch,
        accum_iter=accum,
    )
    params = {"w": jnp.zeros(())}
    opt_state = opt.init(params)
    grads = {"w": jnp.ones(())}
    applied = []
    for _ in range(3 * micro_per_epoch):            # 3 data epochs
        updates, opt_state = opt.update(grads, opt_state, params)
        applied.append(-float(updates["w"]))        # sgd: update = -lr * g
    # every 2nd micro-step applies; per data epoch: 2 gradient steps at
    # that epoch's lr (1.0, then 0.1, then 0.01)
    nonzero = [u for u in applied if u != 0.0]
    assert len(nonzero) == 6
    assert nonzero[:2] == pytest.approx([1.0, 1.0])
    assert nonzero[2:4] == pytest.approx([0.1, 0.1])
    assert nonzero[4:6] == pytest.approx([0.01, 0.01])


def test_multistep_schedule_matches_timm_trajectory():
    """timm MultiStepLRScheduler: base * rate ** bisect_right(decay_t, t)
    — the boundary epoch itself already decays."""
    sched = build_schedule(
        SchedulerConfig(type="multistep", decay_steps=(30, 60, 80),
                        decay_rate=0.1, warmup_t=0),
        base_lr=1.0,
        steps_per_epoch=2,
    )
    expect = {0: 1.0, 29: 1.0, 30: 0.1, 59: 0.1, 60: 0.01, 80: 0.001, 200: 0.001}
    for epoch, lr in expect.items():
        assert float(sched(epoch * 2)) == pytest.approx(lr, rel=1e-5), epoch


def test_all_optimizers_build():
    import optax

    for typ in ("sgd", "adam", "adamw", "rmsprop"):
        opt = build_optimizer(OptimConfig(type=typ, lr=1e-3, momentum=0.9, weight_decay=0.01))
        params = {"w": jnp.ones((2, 2))}
        state = opt.init(params)
        updates, _ = opt.update({"w": jnp.ones((2, 2))}, state, params)
        optax.apply_updates(params, updates)
