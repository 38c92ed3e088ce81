"""On-device augmentation (``fall_multimodal_tpu/data/augment.py``).

Geometric invariants (rotation preserves pairwise distances, flip is an
involution and swaps left/right joints), statistical scales, determinism,
config gating, and end-to-end training through ``run_fold`` (single-split
and vmapped CV) with augmentation on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fall_multimodal_tpu.configs import AugmentConfig, load_config, preset_path
from fall_multimodal_tpu.data import make_synthetic, split_dataset, to_device
from fall_multimodal_tpu.data.augment import FLIP_PERMUTATIONS, make_augment_fn


def _batch(rng, n=4, t=30, v=14, c=3, s=6):
    feats = rng.uniform(-1, 1, size=(n, t, v, c)).astype(np.float32)
    sens = rng.normal(size=(n, t, s)).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(sens)


def test_disabled_or_zero_returns_none():
    assert make_augment_fn(AugmentConfig()) is None
    assert make_augment_fn(AugmentConfig(enabled=True)) is None  # all-zero
    # magnitudes without the master switch stay off
    assert make_augment_fn(AugmentConfig(enabled=False, rotate_deg=30)) is None
    assert make_augment_fn(AugmentConfig(enabled=True, rotate_deg=30)) is not None


def test_rotation_preserves_pairwise_distances(rng):
    feats, sens = _batch(rng)
    fn = make_augment_fn(AugmentConfig(enabled=True, rotate_deg=45))
    out, out_s = fn(jax.random.key(0), feats, sens)
    assert out.shape == feats.shape
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(sens))
    # score channel untouched
    np.testing.assert_array_equal(np.asarray(out[..., 2]), np.asarray(feats[..., 2]))
    # pure rotation: all pairwise joint distances preserved per frame
    def dists(x):
        xy = np.asarray(x[..., :2])
        return np.linalg.norm(xy[:, :, :, None, :] - xy[:, :, None, :, :], axis=-1)
    np.testing.assert_allclose(dists(out), dists(feats), atol=1e-5)
    # and it actually rotated (not identity)
    assert np.abs(np.asarray(out[..., :2] - feats[..., :2])).max() > 1e-3


def test_scale_and_translate(rng):
    feats, sens = _batch(rng)
    fn = make_augment_fn(AugmentConfig(enabled=True, scale=0.2))
    out, _ = fn(jax.random.key(1), feats, sens)
    # uniform scale about the centroid: distance ratios constant per window
    d0 = np.linalg.norm(
        np.asarray(feats[..., :2]) - np.asarray(feats[..., :2]).mean((1, 2), keepdims=True),
        axis=-1)
    d1 = np.linalg.norm(
        np.asarray(out[..., :2]) - np.asarray(out[..., :2]).mean((1, 2), keepdims=True),
        axis=-1)
    ratio = d1 / np.maximum(d0, 1e-6)
    per_window_spread = ratio.reshape(ratio.shape[0], -1)
    assert np.all(per_window_spread.std(axis=1) < 1e-3)
    assert np.all(np.abs(per_window_spread.mean(axis=1) - 1.0) <= 0.2 + 1e-5)

    fn = make_augment_fn(AugmentConfig(enabled=True, translate=0.1))
    out, _ = fn(jax.random.key(2), feats, sens)
    delta = np.asarray(out[..., :2] - feats[..., :2])
    # a pure per-window shift: constant over (T, V), bounded by 0.1
    assert np.abs(delta - delta.mean(axis=(1, 2), keepdims=True)).max() < 1e-5
    assert np.abs(delta).max() <= 0.1 + 1e-6


def test_flip_swaps_left_right_and_mirrors_x(rng):
    feats, sens = _batch(rng)
    fn = make_augment_fn(AugmentConfig(enabled=True, flip_prob=1.0))
    out, _ = fn(jax.random.key(3), feats, sens)
    perm = FLIP_PERMUTATIONS["coco_cut"]
    np.testing.assert_allclose(
        np.asarray(out[..., 0]), -np.asarray(feats[:, :, perm, 0]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out[..., 1]), np.asarray(feats[:, :, perm, 1]), atol=1e-6)
    # score moves with its joint
    np.testing.assert_allclose(
        np.asarray(out[..., 2]), np.asarray(feats[:, :, perm, 2]), atol=1e-6)
    # involution: flipping twice is identity
    out2, _ = fn(jax.random.key(4), out, sens)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(feats), atol=1e-6)
    # the permutation itself is an involution over L/R pairs
    assert (perm[perm] == np.arange(14)).all()


def test_flip_unknown_layout_raises():
    # every shipped layout now has a pairing; a custom layout without one
    # must still fail loudly at build time, not mid-train
    with pytest.raises(ValueError, match="left/right"):
        make_augment_fn(
            AugmentConfig(enabled=True, flip_prob=0.5), layout="my_custom")


@pytest.mark.parametrize("layout", sorted(FLIP_PERMUTATIONS))
def test_flip_permutations_preserve_skeleton_topology(layout):
    # A valid left/right swap must be an involution AND map the layout's
    # bone set onto itself (the skeleton is mirror-symmetric).
    from fall_multimodal_tpu.graphs.topology import LAYOUTS

    perm = FLIP_PERMUTATIONS[layout]
    lay = LAYOUTS[layout]
    assert perm.shape == (lay.num_node,)
    assert (np.sort(perm) == np.arange(lay.num_node)).all()
    assert (perm[perm] == np.arange(lay.num_node)).all()
    bones = {frozenset(e) for e in lay.neighbor_links}
    mirrored = {frozenset((perm[i], perm[j])) for i, j in lay.neighbor_links}
    assert mirrored == bones
    # the center joint is on the mirror axis
    assert perm[lay.center] == lay.center


def test_flip_coco_mmpose_batch(rng):
    feats, sens = _batch(rng, v=18)
    fn = make_augment_fn(
        AugmentConfig(enabled=True, flip_prob=1.0), layout="coco_mmpose")
    out, _ = fn(jax.random.key(11), feats, sens)
    perm = FLIP_PERMUTATIONS["coco_mmpose"]
    np.testing.assert_allclose(
        np.asarray(out[..., 0]), -np.asarray(feats[:, :, perm, 0]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out[..., 1]), np.asarray(feats[:, :, perm, 1]), atol=1e-6)


def test_negative_magnitude_raises_instead_of_silently_disabling():
    with pytest.raises(ValueError, match="rotate_deg"):
        make_augment_fn(AugmentConfig(enabled=True, rotate_deg=-15))
    # even alongside a positive one — no transform may silently drop
    with pytest.raises(ValueError, match="sensor_noise"):
        make_augment_fn(
            AugmentConfig(enabled=True, scale=0.1, sensor_noise=-0.02))


def test_sensor_noise_and_gain(rng):
    feats, sens = _batch(rng)
    fn = make_augment_fn(AugmentConfig(enabled=True, sensor_noise=0.05))
    out_f, out_s = fn(jax.random.key(5), feats, sens)
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(feats))
    resid = np.asarray(out_s - sens)
    assert 0.03 < resid.std() < 0.07
    fn = make_augment_fn(AugmentConfig(enabled=True, sensor_scale=0.3))
    _, out_s = fn(jax.random.key(6), feats, sens)
    gain = np.asarray(out_s / sens)
    per_window = gain.reshape(gain.shape[0], -1)
    assert np.all(per_window.std(axis=1) < 1e-4)       # one gain per window
    assert np.all(np.abs(per_window.mean(axis=1) - 1.0) <= 0.3 + 1e-5)


def test_deterministic_and_jittable(rng):
    feats, sens = _batch(rng)
    cfg = AugmentConfig(enabled=True, rotate_deg=20, scale=0.1, translate=0.05,
                        joint_jitter=0.01, flip_prob=0.5, sensor_noise=0.02,
                        sensor_scale=0.1)
    fn = make_augment_fn(cfg)
    a1 = fn(jax.random.key(7), feats, sens)
    a2 = fn(jax.random.key(7), feats, sens)
    for x, y in zip(a1, a2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    j1 = jax.jit(fn)(jax.random.key(7), feats, sens)
    for x, y in zip(a1, j1):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
    b = fn(jax.random.key(8), feats, sens)
    assert np.abs(np.asarray(b[0]) - np.asarray(a1[0])).max() > 1e-4


def test_run_fold_trains_with_augmentation():
    cfg = load_config(
        preset_path("bilstm"),
        overrides={
            "data.num_classes": 3, "data.sensor_dim": 6,
            "train.epochs": 2,
            "augment.enabled": True, "augment.rotate_deg": 15,
            "augment.scale": 0.1, "augment.flip_prob": 0.5,
            "augment.sensor_noise": 0.02, "augment.sensor_scale": 0.1,
        },
    )
    from fall_multimodal_tpu.train.cv import run_fold

    data = make_synthetic(n_windows=96, num_classes=3, sensor_dim=6,
                          windows_per_video=8, noise=0.05, seed=0)
    splits = {k: to_device(v) for k, v in split_dataset(data, seed=0).items()}
    result = run_fold(cfg, splits, epochs=2)
    assert all(np.isfinite(v) for v in result.history["train_loss"])
    assert 0.0 <= result.test.accuracy <= 1.0

    # augmentation changes the training trajectory vs the same seed without
    cfg_off = load_config(
        preset_path("bilstm"),
        overrides={"data.num_classes": 3, "data.sensor_dim": 6,
                   "train.epochs": 2},
    )
    base = run_fold(cfg_off, splits, epochs=2)
    assert result.history["train_loss"] != base.history["train_loss"]


def test_vmapped_cv_with_augmentation():
    cfg = load_config(
        preset_path("bilstm"),
        overrides={
            "data.num_classes": 3, "data.sensor_dim": 6, "data.n_folds": 2,
            "augment.enabled": True, "augment.sensor_noise": 0.05,
        },
    )
    from fall_multimodal_tpu.train.cv_vmapped import cross_validate_vmapped

    data = make_synthetic(n_windows=80, num_classes=3, sensor_dim=6,
                          windows_per_video=8, noise=0.05, seed=1)
    results = cross_validate_vmapped(cfg, data, n_folds=2, epochs=2)
    for row in results["folds"]:
        assert 0.0 <= row["test_accuracy"] <= 1.0
