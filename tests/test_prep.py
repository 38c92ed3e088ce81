"""Offline prep-pipeline tests: annotation CSV -> windowed dataset."""

import os
import pickle
import zipfile

import numpy as np
import pandas as pd
import pytest

from fall_multimodal_tpu.data.prep import (
    HARUP_ACCEL_COLUMNS,
    build_annotation_csv,
    build_windowed_dataset,
    cross_subject_folds,
    extract_archives,
    extract_pose_csv,
    join_pose_and_sensor,
    normalize_points_with_size,
    normalize_sensor_csv,
)
from fall_multimodal_tpu.data import load_pickle_windows


def _synthetic_annot(rng, n_videos=2, frames_per_video=80, n_joints=13, classes=("Fall", "Walk")):
    rows = []
    for v in range(n_videos):
        cls_seq = [classes[(v + (f // 40)) % len(classes)] for f in range(frames_per_video)]
        for f in range(frames_per_video):
            row = {"video": f"vid{v}", "frame": f, "label": cls_seq[f]}
            for j in range(n_joints):
                row[f"j{j}_x"] = rng.random() * 320
                row[f"j{j}_y"] = rng.random() * 240
                row[f"j{j}_s"] = 0.5 + 0.5 * rng.random()
            for c in HARUP_ACCEL_COLUMNS:
                row[c] = rng.normal()
            rows.append(row)
    return pd.DataFrame(rows)


def test_build_windowed_dataset_end_to_end(rng):
    annot = _synthetic_annot(rng)
    data = build_windowed_dataset(
        annot, n_frames=30, sensor_columns=list(HARUP_ACCEL_COLUMNS)
    )
    # 80 frames per video -> 50 windows per video (stride-1, range(80-30))
    assert len(data) == 2 * 50
    assert data.features.shape == (100, 30, 14, 3)   # center joint appended
    assert data.sensors.shape == (100, 30, 15)
    assert data.labels.shape[1] == 2
    # pose normalized to [-1, 1]
    assert float(np.nanmax(data.features[..., :2])) <= 1.0 + 1e-6
    assert float(np.nanmin(data.features[..., :2])) >= -1.0 - 1e-6
    # score weighting keeps labels positive but < 1
    assert 0 < data.labels.max() <= 1.0


def test_windowed_pickle_roundtrips_into_loader(tmp_path, rng):
    annot = _synthetic_annot(rng, n_videos=1)
    out = str(tmp_path / "windows.pkl")
    data = build_windowed_dataset(
        annot, n_frames=30, sensor_columns=list(HARUP_ACCEL_COLUMNS),
        out_pickle=out,
    )
    loaded = load_pickle_windows([out])
    np.testing.assert_allclose(loaded.features, data.features)
    np.testing.assert_allclose(loaded.sensors, data.sensors)


def test_nan_rows_are_dropped(rng):
    annot = _synthetic_annot(rng, n_videos=1)
    annot.loc[10:20, "j3_x"] = np.nan     # NaN stretch splits the video
    data = build_windowed_dataset(annot, n_frames=30)
    full = build_windowed_dataset(_synthetic_annot(rng, n_videos=1), n_frames=30)
    assert len(data) < len(full)


def test_annotation_csv_builder(tmp_path):
    df = build_annotation_csv(
        {"vidA": [(0, "Fall"), (1, "Fall")], "vidB": [(0, "Walk")]},
        out_csv=str(tmp_path / "annot.csv"),
    )
    assert list(df.columns) == ["video", "frame", "label"]
    assert len(df) == 3
    assert os.path.exists(tmp_path / "annot.csv")


def test_normalize_points_with_size():
    pts = np.array([[160.0, 120.0], [320.0, 240.0]])
    out = normalize_points_with_size(pts, 320, 240)
    np.testing.assert_allclose(out, [[0.5, 0.5], [1.0, 1.0]])
    flipped = normalize_points_with_size(pts, 320, 240, flip=True)
    np.testing.assert_allclose(flipped[:, 0], [0.5, 0.0])


def test_pose_extractor_interface(rng):
    def fake_extractor(frame):
        return rng.random((13, 3))

    frames = [np.zeros((240, 320, 3)) for _ in range(5)]
    df = extract_pose_csv(frames, fake_extractor, "vid0",
                          labels=["a"] * 5, frame_size=(320, 240))
    assert len(df) == 5
    assert "j12_s" in df.columns and "label" in df.columns


def test_sensor_csv_normalization(tmp_path, rng):
    # simulate the HAR-UP 2-row header layout
    sites = [f"{s}Accelerometer" for s in ("Ankle", "RightPocket", "Belt", "Neck", "Wrist")]
    top = ["Time", ""] + sum([[s, "", ""] for s in sites], [])
    sub = ["TimeStamps", "Subject"] + ["x-axis (g)", "y-axis (g)", "z-axis (g)"] * 5
    n = 20
    body = np.concatenate(
        [np.arange(n)[:, None], np.ones((n, 1)), rng.normal(size=(n, 15))], axis=1
    )
    path = tmp_path / "sensor_raw.csv"
    with open(path, "w") as fh:
        fh.write(",".join(top) + "\n")
        fh.write(",".join(sub) + "\n")
        for row in body:
            fh.write(",".join(str(x) for x in row) + "\n")
    df = normalize_sensor_csv(str(path))
    accel = [c for c in df.columns if c.endswith("(g)")]
    assert len(accel) == 15
    assert set(accel) <= set(HARUP_ACCEL_COLUMNS)

    pose = pd.DataFrame({"video": ["v"] * n, "frame": range(n)})
    joined = join_pose_and_sensor(pose, df)
    assert len(joined) == n
    assert all(c in joined.columns for c in accel)


def test_extract_archives(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    with zipfile.ZipFile(src / "subj1.zip", "w") as zf:
        zf.writestr("camera1/frame0.png", b"fake")
    out = extract_archives(str(src), str(tmp_path / "dst"))
    assert out == ["subj1.zip"]
    assert (tmp_path / "dst" / "camera1" / "frame0.png").exists()


def test_cross_subject_folds():
    files = [f"subj{i}.pkl" for i in range(10)]
    folds = cross_subject_folds(files, n_folds=5, seed=0)
    assert len(folds) == 5
    all_test = sum((f["test"] for f in folds), [])
    assert sorted(all_test) == sorted(files)
    for f in folds:
        assert set(f["train"]) & set(f["test"]) == set()
        assert len(f["train"]) + len(f["test"]) == 10
