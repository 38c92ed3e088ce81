"""Data layer tests: preprocessing golden parity, splits, pipeline."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fall_multimodal_tpu.data import (
    WindowedDataset,
    add_center_joint,
    epoch_batch_indices,
    epsilon_smooth,
    eval_batch_indices,
    eval_batch_mask,
    gather_batch,
    kfold_datasets,
    kfold_indices,
    load_pickle_windows,
    make_synthetic,
    scale_pose,
    scale_pose_jnp,
    score_weighted_labels,
    segment_continuous,
    seq_label_smoothing,
    sliding_windows,
    split_dataset,
    to_device,
    train_valid_test_split,
    window_video,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "reference_preprocess.npz")


# ------------------------------------------------------------ golden parity


def test_scale_pose_matches_reference():
    g = np.load(FIXTURES)
    ours = scale_pose(g["scale_in"])
    np.testing.assert_allclose(ours, g["scale_out"], atol=1e-12)


def test_scale_pose_jnp_matches_numpy(rng):
    xy = rng.random((4, 30, 14, 2)) * 100
    np.testing.assert_allclose(
        np.asarray(scale_pose_jnp(jnp.asarray(xy))), scale_pose(xy), atol=1e-6
    )


def test_seq_label_smoothing_matches_reference():
    g = np.load(FIXTURES)
    ours = seq_label_smoothing(g["smooth_in"].copy(), max_step=8)
    np.testing.assert_allclose(ours, g["smooth_out"], atol=1e-12)


# ------------------------------------------------------------ unit behavior


def test_add_center_joint():
    pose = np.zeros((5, 13, 3))
    pose[:, 1] = 2.0
    pose[:, 2] = 4.0
    out = add_center_joint(pose)
    assert out.shape == (5, 14, 3)
    np.testing.assert_allclose(out[:, -1], 3.0)


def test_epsilon_smooth_rowsum():
    y = np.eye(6)
    s = epsilon_smooth(y, 0.1)
    np.testing.assert_allclose(s.sum(-1), np.ones(6), atol=1e-12)
    assert s[0, 0] == pytest.approx(0.9)
    assert s[0, 1] == pytest.approx(0.1 / 5)


def test_score_weighted_labels():
    labels = np.ones((4, 3))
    scores = np.full((4, 14), 0.5)
    out = score_weighted_labels(labels, scores)
    # main parts boosted 1.5x: five of 14 joints -> mean = (9*0.5 + 5*0.75)/14
    expect = (9 * 0.5 + 5 * 0.75) / 14
    np.testing.assert_allclose(out, expect)


def test_segment_continuous():
    frames = [0, 1, 2, 50, 51, 52, 53, 100]
    segs = segment_continuous(frames, max_gap=10)
    assert [list(s) for s in segs] == [[0, 1, 2], [3, 4, 5, 6], [7]]


def test_sliding_windows_conventions():
    arr = np.arange(10)[:, None].astype(float)
    w_ref = sliding_windows(arr, 4, drop_last=True)      # reference prep
    assert w_ref.shape == (6, 4, 1)                      # range(10-4)
    np.testing.assert_array_equal(w_ref[0, :, 0], [0, 1, 2, 3])
    w_gen3 = sliding_windows(arr, 4, drop_last=False)    # Gen-3 loader
    assert w_gen3.shape == (7, 4, 1)
    np.testing.assert_array_equal(w_gen3[-1, :, 0], [6, 7, 8, 9])
    assert sliding_windows(arr[:3], 4).shape == (0, 4, 1)


def test_window_video_mean_labels():
    pose = np.random.default_rng(0).random((20, 14, 3))
    labels = np.tile(np.eye(2)[[0] * 10 + [1] * 10], 1).astype(float)
    feats, labs, sens = window_video(pose, labels, seq_len=10, sensor=np.ones((20, 4)))
    assert feats.shape == (10, 10, 14, 3)
    assert labs.shape == (10, 2)
    assert sens.shape == (10, 10, 4)
    np.testing.assert_allclose(labs[0], [1.0, 0.0])
    np.testing.assert_allclose(labs[5], [0.5, 0.5])


# ------------------------------------------------------------ splits


def test_video_split_has_no_leakage():
    data = make_synthetic(n_windows=256, windows_per_video=16, seed=1)
    splits = split_dataset(data, seed=3)
    vids = {k: set(v.videos.tolist()) for k, v in splits.items()}
    assert vids["train"] & vids["valid"] == set()
    assert vids["train"] & vids["test"] == set()
    assert vids["valid"] & vids["test"] == set()
    total = sum(len(v) for v in splits.values())
    assert total == 256


def test_sample_split_covers_all():
    idx = train_valid_test_split(np.arange(100), by_video=False, seed=0)
    all_idx = np.concatenate([idx["train"], idx["valid"], idx["test"]])
    assert sorted(all_idx.tolist()) == list(range(100))


def test_kfold_partitions_videos():
    data = make_synthetic(n_windows=200, windows_per_video=10, seed=2)
    folds = kfold_datasets(data, n_folds=5, seed=0)
    assert len(folds) == 5
    test_vids = [set(f["test"].videos.tolist()) for f in folds]
    # test sets are disjoint and cover all videos
    union = set().union(*test_vids)
    assert union == set(data.videos.tolist())
    for i in range(5):
        for j in range(i + 1, 5):
            assert test_vids[i] & test_vids[j] == set()
        # valid aliases test per fold (reference protocol)
        assert set(folds[i]["valid"].videos.tolist()) == test_vids[i]


def test_kfold_indices_by_sample():
    folds = kfold_indices(np.arange(50), n_folds=10, by_video=False)
    lens = [len(f["test"]) for f in folds]
    assert sum(lens) == 50


# ------------------------------------------------------------ pipeline


def test_pickle_roundtrip(tmp_path):
    import pickle

    data = make_synthetic(n_windows=32, seed=5)
    p = tmp_path / "windows.pkl"
    with open(p, "wb") as fh:
        pickle.dump(
            (data.videos.tolist(), data.features, data.sensors, data.labels), fh
        )
    loaded = load_pickle_windows([str(p)])
    np.testing.assert_allclose(loaded.features, data.features)
    np.testing.assert_allclose(loaded.sensors, data.sensors)
    assert loaded.num_classes == data.num_classes


def test_score_weighted_labels_without_center():
    """With add_center=False the -1 slot is a real joint (RAnkle), not the
    appended center — the boost must cover shoulders/hips only."""
    from fall_multimodal_tpu.data.preprocess import score_weighted_labels

    scores = np.full((2, 13), 0.5)
    labels = np.ones((2, 3))
    out = score_weighted_labels(labels, scores, has_center=False)
    boosted = scores.copy()
    boosted[:, [1, 2, 7, 8]] = 0.75
    np.testing.assert_allclose(out, labels * boosted.mean(-1, keepdims=True))


def test_split_no_test_fraction_keeps_every_video():
    """split[2]==0 (the _egawa valid==test alias): banker's rounding can
    round BOTH fractions down — the leftover video must land in valid, not
    vanish."""
    vids = np.repeat([f"v{i}" for i in range(5)], 4)
    idx = train_valid_test_split(vids, split=(0.5, 0.5, 0.0), seed=0)
    covered = np.sort(np.concatenate([idx["train"], idx["valid"]]))
    np.testing.assert_array_equal(covered, np.arange(len(vids)))
    np.testing.assert_array_equal(idx["valid"], idx["test"])


def test_kfold_more_folds_than_videos_raises():
    vids = np.repeat(["a", "b", "c"], 5)
    with pytest.raises(ValueError, match="n_folds"):
        kfold_indices(vids, n_folds=5)


def test_load_dataset_accepts_path_sequence(tmp_path):
    import pickle

    from fall_multimodal_tpu.data import load_dataset

    paths = []
    for i in range(2):
        data = make_synthetic(n_windows=16, seed=i)
        p = tmp_path / f"s{i}.pkl"
        with open(p, "wb") as fh:
            pickle.dump(
                (data.videos.tolist(), data.features, data.sensors,
                 data.labels), fh,
            )
        paths.append(str(p))
    loaded = load_dataset("harup", path=paths)
    assert len(loaded) == 32


def test_mixed_sensor_pickles_raise(tmp_path):
    import pickle

    data = make_synthetic(n_windows=16, seed=0)
    with_s = tmp_path / "with.pkl"
    without = tmp_path / "without.pkl"
    with open(with_s, "wb") as fh:
        pickle.dump(
            (data.videos.tolist(), data.features, data.sensors, data.labels),
            fh,
        )
    with open(without, "wb") as fh:
        pickle.dump((data.videos.tolist(), data.features, data.labels), fh)
    with pytest.raises(ValueError, match="inconsistent pickles"):
        load_pickle_windows([str(with_s), str(without)])


def test_device_pipeline_epoch():
    data = make_synthetic(n_windows=70, num_classes=4, sensor_dim=6, seed=4)
    dev = to_device(data)
    key = jax.random.key(0)
    idx = epoch_batch_indices(key, dev.n, batch_size=16, drop_last=True)
    assert idx.shape == (4, 16)
    # all indices valid & distinct within an epoch
    flat = np.asarray(idx).ravel()
    assert len(set(flat.tolist())) == len(flat)
    batch = gather_batch(dev, idx[0])
    assert batch.features.shape == (16, 30, 14, 3)
    assert batch.sensors.shape == (16, 30, 6)
    assert batch.labels.shape == (16, 4)


def test_eval_batching_mask():
    idx = eval_batch_indices(70, 16)
    mask = eval_batch_mask(70, 16)
    assert idx.shape == mask.shape == (5, 16)
    assert mask.sum() == 70
    assert (idx[mask] == np.arange(70)).all()


def test_epoch_indices_no_drop():
    idx = epoch_batch_indices(jax.random.key(1), 70, 16, drop_last=False)
    assert idx.shape == (5, 16)
    assert set(np.asarray(idx).ravel().tolist()) == set(range(70))


class TestStratifiedKFold:
    """Sample-level stratified k-fold (notebook KFold_load_dataset,
    GSTCAN_HAR_conv_10kfold.ipynb:5 — sklearn StratifiedKFold semantics,
    re-derived without sklearn)."""

    def test_hand_checked_tiny_fixture(self):
        from fall_multimodal_tpu.data import stratified_kfold_indices

        labels = np.array([0, 0, 0, 0, 1, 1])
        folds = stratified_kfold_indices(labels, n_folds=2, seed=0)
        assert len(folds) == 2
        for fold in folds:
            test_labels = labels[fold["test"]]
            assert (test_labels == 0).sum() == 2
            assert (test_labels == 1).sum() == 1
            np.testing.assert_array_equal(fold["valid"], fold["test"])
            # partition: train and test disjoint and complete
            both = np.concatenate([fold["train"], fold["test"]])
            np.testing.assert_array_equal(np.sort(both), np.arange(6))

    def test_folds_partition_and_balance(self):
        from fall_multimodal_tpu.data import stratified_kfold_indices

        rng = np.random.default_rng(0)
        labels = rng.integers(0, 5, size=237)
        n_folds = 10
        folds = stratified_kfold_indices(labels, n_folds=n_folds, seed=42)
        all_test = np.concatenate([f["test"] for f in folds])
        np.testing.assert_array_equal(np.sort(all_test), np.arange(237))
        for c in range(5):
            per_fold = [(labels[f["test"]] == c).sum() for f in folds]
            assert max(per_fold) - min(per_fold) <= 1, (c, per_fold)

    def test_soft_labels_and_determinism(self):
        from fall_multimodal_tpu.data import stratified_kfold_indices

        rng = np.random.default_rng(1)
        hard = rng.integers(0, 3, size=60)
        soft = np.eye(3, dtype=np.float32)[hard] * 0.9
        f1 = stratified_kfold_indices(soft, n_folds=3, seed=7)
        f2 = stratified_kfold_indices(hard, n_folds=3, seed=7)
        for a, b in zip(f1, f2):
            np.testing.assert_array_equal(a["test"], b["test"])

    def test_kfold_datasets_stratify_flag(self):
        from fall_multimodal_tpu.data import kfold_datasets, make_synthetic

        data = make_synthetic(n_windows=90, num_classes=3, sensor_dim=4, seed=0)
        folds = kfold_datasets(data, n_folds=3, seed=0, stratify=True)
        assert len(folds) == 3
        global_dist = data.labels.argmax(-1)
        for fold in folds:
            d = fold["test"].labels.argmax(-1)
            for c in range(3):
                expect = (global_dist == c).sum() / 3
                assert abs((d == c).sum() - expect) <= 1


def test_scale_pose_degenerate_frames_golden():
    """VERDICT r1 item 10: lock in the documented span==0 divergence against
    freshly generated reference output (har_create4.py:40-51).

    Reference: a constant axis gives 0/0 = NaN for the whole column (and a
    NaN joint stays NaN). Ours: the constant axis becomes 0.0 everywhere —
    intentional, so downstream jit code stays finite; NaN joints in
    non-degenerate axes are preserved identically.
    """
    g = np.load(FIXTURES)
    x = g["scale_degen_in"]
    ref = g["scale_degen_ref_out"]
    from fall_multimodal_tpu.data import scale_pose

    ours = scale_pose(x.copy())

    # frame 0: fully regular -> exact agreement
    np.testing.assert_allclose(ours[0], ref[0], atol=1e-12)
    # frame 1: NaN joint, spans > 0 -> NaNs in the same places, values match
    assert np.array_equal(np.isnan(ours[1]), np.isnan(ref[1]))
    m = ~np.isnan(ref[1])
    np.testing.assert_allclose(ours[1][m], ref[1][m], atol=1e-12)
    # frame 2: both axes constant -> reference all-NaN, ours all-zero
    assert np.isnan(ref[2]).all()
    np.testing.assert_array_equal(ours[2], 0.0)
    # frame 3: x constant, y regular -> reference x-NaN / ours x-zero,
    # y agrees exactly
    assert np.isnan(ref[3][:, 0]).all()
    np.testing.assert_array_equal(ours[3][:, 0], 0.0)
    np.testing.assert_allclose(ours[3][:, 1], ref[3][:, 1], atol=1e-12)
