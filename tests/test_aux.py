"""Aux-subsystem tests: profiling/telemetry, k_copies eval, ensemble model,
SA GRU variant, gradient accumulation."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fall_multimodal_tpu.configs import load_config, preset_path
from fall_multimodal_tpu.configs.config import OptimConfig
from fall_multimodal_tpu.models import build_model
from fall_multimodal_tpu.train.loop import k_copies_logits
from fall_multimodal_tpu.train.optim import build_optimizer
from fall_multimodal_tpu.utils.profiling import (
    Throughput,
    global_norm,
    grad_norms,
    model_summary,
    nan_debug,
)


def test_grad_norm_telemetry(rng):
    grads = {"a": {"w": jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))},
             "b": jnp.asarray(rng.normal(size=5).astype(np.float32))}
    norms = grad_norms(grads)
    assert set(norms) == {"a.w", "b"}
    assert float(norms["b"]) == pytest.approx(
        float(jnp.linalg.norm(grads["b"])), rel=1e-6
    )
    g = float(global_norm(grads))
    expect = np.sqrt(sum(np.sum(np.square(np.asarray(x)))
                         for x in jax.tree.leaves(grads)))
    assert g == pytest.approx(expect, rel=1e-6)


def test_model_summary_counts():
    cfg = load_config(preset_path("bilstm"), overrides={"data.num_classes": 3})
    model = build_model(cfg)
    v = model.init(jax.random.key(0), jnp.ones((2, 30, 14, 3)), jnp.ones((2, 30, 15)),
                   train=False)
    text = model_summary(v["params"])
    total = sum(x.size for x in jax.tree.leaves(v["params"]))
    assert f"{total:,}" in text


def test_throughput_counter():
    t = Throughput(n_devices=2)
    t.update(100)
    t.update(100)
    assert t.windows_per_sec > 0
    # per-chip divides by device count (values are time-dependent between
    # property reads, so compare the ratio loosely)
    assert 0 < t.windows_per_sec_per_chip <= t.windows_per_sec
    assert t.eta_seconds(10) >= 0


def test_nan_debug_context():
    with nan_debug(True):
        assert jax.config.jax_debug_nans
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: x / 0.0 * 0.0)(jnp.float32(1.0))
    assert not jax.config.jax_debug_nans


def test_k_copies_matches_manual(rng):
    cfg = load_config(
        preset_path("musa_harup"),
        overrides={"data.num_classes": 4,
                   "model.kwargs": {"embed_dim": 8, "n_stage": 1}},
    )
    model = build_model(cfg)
    skel = jnp.asarray(rng.normal(size=(2, 30, 14, 3)).astype(np.float32))
    v = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                   skel, None, train=False)
    out = k_copies_logits(model, v, skel, None, num_copies=2)
    manual = (
        model.apply(v, skel[:, :15], None, train=False)
        + model.apply(v, skel[:, 15:30], None, train=False)
    ) / 2
    np.testing.assert_allclose(np.asarray(out), np.asarray(manual), atol=1e-6)


def test_transformer_ensemble_forward():
    cfg = load_config(
        preset_path("skeleton_transformer_harup"),
        overrides={"model.name": "transformer_ensemble", "data.num_classes": 5,
                   "model.kwargs": {"embedding_dim": 16, "n_block": 2,
                                    "head_dim": 4, "n_heads": 2}},
    )
    model = build_model(cfg)
    skel = jnp.ones((2, 30, 14, 3))
    sensor = jnp.ones((2, 30, 15))
    v = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                   skel, sensor, train=False)
    assert model.apply(v, skel, sensor, train=False).shape == (2, 5)


def test_sa_gru_variant():
    from fall_multimodal_tpu.models.targcn import GraphGRUCell

    cell = GraphGRUCell(8, gcn_variant="sa")
    x = jnp.ones((2, 14, 3))
    h = jnp.zeros((2, 14, 8))
    emb = jnp.ones((14, 4))
    v = cell.init(jax.random.key(0), x, h, emb)
    assert cell.apply(v, x, h, emb).shape == (2, 14, 8)


def test_gradient_accumulation_averages():
    opt = build_optimizer(OptimConfig(type="sgd", lr=1.0), accum_iter=2)
    params = {"w": jnp.zeros(3)}
    state = opt.init(params)
    g1 = {"w": jnp.ones(3)}
    g2 = {"w": 3 * jnp.ones(3)}
    up1, state = opt.update(g1, state, params)
    params = optax.apply_updates(params, up1)
    np.testing.assert_allclose(np.asarray(params["w"]), 0.0)  # not applied yet
    up2, state = opt.update(g2, state, params)
    params = optax.apply_updates(params, up2)
    # mean grad = 2, lr 1 -> w = -2
    np.testing.assert_allclose(np.asarray(params["w"]), -2.0, atol=1e-6)


def test_dropblock_ske_zeroes_joints_and_rescales(rng):
    from fall_multimodal_tpu.models.musa import DropBlockSke
    from fall_multimodal_tpu.graphs import build_adjacency

    x = jnp.asarray(np.abs(rng.normal(size=(8, 30, 14, 16))).astype(np.float32)) + 1.0
    A = jnp.asarray(build_adjacency("coco_cut", "uniform"), jnp.float32)
    mod = DropBlockSke()
    v = mod.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                 x, 0.5, A, True)
    out = mod.apply(v, x, 0.5, A, True, rngs={"dropout": jax.random.key(7)})
    out = np.asarray(out)
    # eval mode / keep_prob 1 are identity
    np.testing.assert_allclose(
        np.asarray(mod.apply(v, x, 0.5, A, False)), np.asarray(x))
    np.testing.assert_allclose(
        np.asarray(mod.apply(v, x, 1.0, A, True, rngs={"dropout": jax.random.key(7)})),
        np.asarray(x))
    # some (sample, joint) columns fully zeroed, survivors rescaled up
    col_zero = (out == 0).all(axis=(1, 3))
    assert col_zero.any()
    survivors = out[out != 0]
    originals = np.asarray(x)[out != 0]
    assert float(np.min(survivors / originals)) > 1.0  # rescale factor > 1


def test_dropblock_t_zeroes_frames(rng):
    from fall_multimodal_tpu.models.musa import DropBlockT

    x = jnp.asarray(np.abs(rng.normal(size=(4, 30, 14, 8))).astype(np.float32)) + 1.0
    mod = DropBlockT(block_size=7)
    v = mod.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                 x, 0.5, True)
    out = np.asarray(
        mod.apply(v, x, 0.5, True, rngs={"dropout": jax.random.key(3)})
    )
    frame_zero = (out == 0).all(axis=(2, 3))
    assert frame_zero.any()
    np.testing.assert_allclose(np.asarray(mod.apply(v, x, 0.5, False)), np.asarray(x))


def test_dropblock_statistics_match_reference():
    """Cross-framework distributional parity of the DropGraph regularizers.

    ``tests/fixtures/reference_dropblock.npz`` holds 2000-draw sampling
    statistics of the reference ``Randomized_DropBlock_Ske`` /
    ``Randomized_DropBlockT_1d`` (``musa_model.py:39-98``) on a fixed input
    (generated by ``experiments/gen_dropblock_fixture.py``). Our modules
    must drop the same fraction, in the same activity-dependent pattern,
    with the same rescale — the stochastic half of musa training parity
    (the deterministic half is ``experiments/parity_grads_musa.py``)."""
    import os

    from fall_multimodal_tpu.models.musa import DropBlockSke, DropBlockT

    blob = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                                "reference_dropblock.npz"))
    x_nctv, A = blob["x"], blob["A"]
    draws, keep_prob = int(blob["draws"]), float(blob["keep_prob"])
    x = jnp.asarray(np.transpose(x_nctv, (0, 2, 3, 1)))      # NCTV -> NTVC
    A_j = jnp.asarray(A)

    ske = DropBlockSke()
    v = ske.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                 x, keep_prob, A_j, True)

    @jax.jit
    def ske_draw(key):
        out = ske.apply(v, x, keep_prob, A_j, True, rngs={"dropout": key})
        dropped = (out == 0).all(axis=(1, 3))                # (N, V)
        scale = jnp.where(out != 0, out / x, jnp.nan)
        return dropped, jnp.nanmean(scale)

    keys = jax.random.split(jax.random.key(42), draws)
    dropped, scales = jax.vmap(ske_draw)(keys)
    dropped, scales = np.asarray(dropped), np.asarray(scales)
    np.testing.assert_allclose(
        dropped.mean(), blob["ske_frac_mean"], atol=0.008)
    np.testing.assert_allclose(
        np.nanmean(scales), blob["ske_scale_mean"], atol=0.02)
    # per-(sample, joint) drop frequency: same activity-dependent pattern
    np.testing.assert_allclose(
        dropped.mean(axis=0), blob["ske_pos_freq"], atol=0.04)

    dt = DropBlockT(block_size=7)
    vt = dt.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                 x, keep_prob, True)

    @jax.jit
    def t_draw(key):
        out = dt.apply(vt, x, keep_prob, True, rngs={"dropout": key})
        dropped = (out == 0).all(axis=(2, 3))                # (N, T)
        scale = jnp.where(out != 0, out / x, jnp.nan)
        return dropped, jnp.nanmean(scale)

    dropped_t, scales_t = jax.vmap(t_draw)(keys)
    np.testing.assert_allclose(
        np.asarray(dropped_t).mean(), blob["t_frac_mean"], atol=0.008)
    np.testing.assert_allclose(
        np.nanmean(np.asarray(scales_t)), blob["t_scale_mean"], atol=0.02)


def test_save_confusion_png(tmp_path):
    from fall_multimodal_tpu.train.metrics import save_confusion_png

    cm = np.array([[10, 2], [1, 12]])
    out = save_confusion_png(cm, str(tmp_path / "cm.png"), ["fall", "adl"])
    import os
    assert os.path.getsize(out) > 1000


def test_param_count_exclude():
    from fall_multimodal_tpu.configs import load_config, preset_path
    from fall_multimodal_tpu.train import build_optimizer, create_train_state, param_count

    cfg = load_config(preset_path("bilstm"), overrides={"data.num_classes": 3})
    model = build_model(cfg)
    opt = build_optimizer(cfg)
    state = create_train_state(model, opt, jnp.ones((2, 30, 14, 3)), jnp.ones((2, 30, 15)))
    total = param_count(state)
    no_head = param_count(state, exclude="Dense")
    assert 0 < no_head < total


def test_nan_guard_stops_training():
    from fall_multimodal_tpu.data import make_synthetic, split_dataset, to_device
    from fall_multimodal_tpu.train import build_optimizer, create_train_state, fit
    from fall_multimodal_tpu.configs import load_config, preset_path

    cfg = load_config(preset_path("bilstm"),
                      overrides={"data.num_classes": 3, "optim.lr": "1e38",
                                 "train.max_norm": 0})
    data = make_synthetic(n_windows=96, num_classes=3, sensor_dim=6, seed=0)
    splits = {k: to_device(v) for k, v in split_dataset(data, seed=1).items()}
    model = build_model(cfg)
    opt = build_optimizer(cfg)
    state = create_train_state(model, opt, splits["train"].features[:2],
                               splits["train"].sensors[:2])
    result = fit(model, opt, state, splits, epochs=6, batch_size=32,
                 num_classes=3)
    # an absurd LR must blow up; the guard stops before 6 epochs complete
    assert len(result.history["train_loss"]) < 6


def test_fused_dropgraph_matches_module_pipeline_statistics():
    """The round-3 fused mask pipeline (one stacked pass for both branches,
    musa._dropgraph_masks) must be distributionally identical to the
    sequential per-module reference pipeline DropBlockT(DropBlockSke(.)):
    same per-joint / per-frame drop frequencies and the same rescale, per
    branch."""
    import jax
    import jax.numpy as jnp

    from fall_multimodal_tpu.models.musa import (
        DropBlockSke, DropBlockT, _apply_drop_pair,
    )

    rng = np.random.default_rng(3)
    n, t, v, c = 8, 20, 14, 6
    y = jnp.asarray(np.abs(rng.normal(size=(n, t, v, c))) + 0.05, jnp.float32)
    res = jnp.asarray(np.abs(rng.normal(size=(n, t, v, c))) + 0.05, jnp.float32)
    A = jnp.asarray(np.eye(v, dtype=np.float32) + np.eye(v, k=1) + np.eye(v, k=-1))
    keep_prob, block_size, draws = 0.82, 7, 1500

    def stats(out, ref):
        joint_zero = (out == 0).all(axis=(1, 3))             # (n, v)
        frame_zero = (out == 0).all(axis=(2, 3))             # (n, t)
        scale = jnp.where(out != 0, out / ref, jnp.nan)
        return joint_zero, frame_zero, jnp.nanmean(scale)

    @jax.jit
    def fused_draw(key):
        fy, fr = _apply_drop_pair(key, y, res, keep_prob, A, block_size)
        return stats(fy, y), stats(fr, res)

    ske = DropBlockSke()
    dt = DropBlockT(block_size)
    vs = ske.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                  y, keep_prob, A, True)
    vt = dt.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                 y, keep_prob, True)

    @jax.jit
    def module_draw(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        my = dt.apply(
            vt,
            ske.apply(vs, y, keep_prob, A, True, rngs={"dropout": k1}),
            keep_prob, True, rngs={"dropout": k2},
        )
        mr = dt.apply(
            vt,
            ske.apply(vs, res, keep_prob, A, True, rngs={"dropout": k3}),
            keep_prob, True, rngs={"dropout": k4},
        )
        return stats(my, y), stats(mr, res)

    keys = jax.random.split(jax.random.key(7), draws)
    f_stats = jax.vmap(fused_draw)(keys)
    m_stats = jax.vmap(module_draw)(jax.random.split(jax.random.key(11), draws))

    for branch in (0, 1):
        fj, ff, fs = (np.asarray(x) for x in f_stats[branch])
        mj, mf, ms = (np.asarray(x) for x in m_stats[branch])
        # overall drop fractions
        np.testing.assert_allclose(fj.mean(), mj.mean(), atol=0.012)
        np.testing.assert_allclose(ff.mean(), mf.mean(), atol=0.012)
        # activity-dependent per-position drop pattern
        np.testing.assert_allclose(
            fj.mean(axis=0), mj.mean(axis=0), atol=0.05
        )
        # rescale of surviving activations
        np.testing.assert_allclose(
            np.nanmean(fs), np.nanmean(ms), atol=0.025
        )
