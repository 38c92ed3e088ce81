"""Dataset ingestion: real formats -> host `WindowedDataset` -> device arrays.

Two on-disk formats from the reference pipeline are supported:

* **Windowed pickles** (Gen 1/2 prep output, ``har_create4_sensor.py:146``):
  ``(video_names, features(N,T,V,3), sensors(N,T,S), labels(N,K))`` or the
  sensor-less ``(features, labels)`` / ``(video_names, features, labels)``.
* **CSV-direct** (Gen 3, ``Multimodal_Fall3/dataloader.py:21-297``): a
  directory tree of per-video CSVs with columns
  ``video, frame, <13 joints x (x,y,score)>, label``; windows are sliced
  stride-1 per video, NaN or short windows dropped, the window label is the
  mean one-hot over frames, and pose is re-normalized + center-joint-extended
  at load (the reference did this per fetch in ``Fall2Dataset``; we do it
  once, vectorized).

Features keep the TPU layout ``(N, T, V, C)`` end to end (the reference
permutes to ``(C, T, V)`` for torch convs; we never do).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from fall_multimodal_tpu.data.preprocess import add_center_joint, scale_pose
from fall_multimodal_tpu.data.synthetic import WindowedDataset, make_synthetic
from fall_multimodal_tpu.data.splits import (
    kfold_indices,
    stratified_kfold_indices,
    train_valid_test_split,
)


def load_pickle_windows(paths: Union[str, Sequence[str]]) -> WindowedDataset:
    """Load and concatenate Gen-1/2 windowed pickles. A bare path loads one
    file (a string would otherwise iterate as characters)."""
    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    videos: List[np.ndarray] = []
    feats: List[np.ndarray] = []
    sens: List[np.ndarray] = []
    labs: List[np.ndarray] = []
    has_sensor = True
    for path in paths:
        with open(path, "rb") as fh:
            blob = pickle.load(fh)
        if len(blob) == 4:
            vid, f, s, l = blob
        elif len(blob) == 3:
            vid, f, l = blob
            s, has_sensor = None, False
        elif len(blob) == 2:
            f, l = blob
            vid = np.asarray([f"{os.path.basename(path)}:{i}" for i in range(len(f))])
            s, has_sensor = None, False
        else:
            raise ValueError(f"Unrecognized pickle structure in {path}")
        videos.append(np.asarray(vid))
        feats.append(np.asarray(f, dtype=np.float32))
        labs.append(np.asarray(l, dtype=np.float32))
        if s is not None:
            sens.append(np.asarray(s, dtype=np.float32))

    if sens and not has_sensor:
        # a silent drop here would train a multimodal model on the all-zeros
        # sensor placeholder
        raise ValueError(
            "inconsistent pickles: some files carry a sensor stream and "
            "some do not — load them separately or regenerate the "
            "sensorless files with sensor windows"
        )
    return WindowedDataset(
        features=np.concatenate(feats),
        labels=np.concatenate(labs),
        sensors=np.concatenate(sens) if has_sensor and sens else None,
        videos=np.concatenate(videos),
    )


def load_csv_windows(
    dataset_dir: str,
    seq_len: int = 30,
    rescale_pose: bool = True,
    center_joint: bool = True,
) -> WindowedDataset:
    """Gen-3 CSV-direct loader (host-side, runs once).

    Window slicing — the one genuinely hot host loop (the reference's
    python/pandas per-video loop, ``Multimodal_Fall3/dataloader.py:51-56``) —
    goes through the native C++ slicer (``data/native.py``; numpy fallback
    with identical semantics): one pass over the concatenated frame table,
    windows that cross a video boundary or contain NaN rejected.
    """
    import pandas as pd

    from fall_multimodal_tpu.data.native import slice_windows, window_mean_labels

    csv_paths = sorted(
        os.path.join(root, f)
        for root, _, files in os.walk(dataset_dir)
        for f in files
        if f.endswith(".csv")
    )
    if not csv_paths:
        raise FileNotFoundError(f"No CSVs under {dataset_dir}")
    df = pd.concat([pd.read_csv(p) for p in csv_paths], axis=0)
    label_onehot = pd.get_dummies(df["label"])
    classes = list(label_onehot.columns)
    df = pd.concat([df.drop(["label"], axis=1), label_onehot], axis=1)
    # rows of one video must be contiguous for the single-pass slicer
    df = df.sort_values(["video", "frame"], kind="stable").reset_index(drop=True)

    video_names, video_codes = np.unique(df["video"].to_numpy(), return_inverse=True)
    skel = df.drop(["video", "frame"] + classes, axis=1).to_numpy(np.float32)
    labs = df[classes].to_numpy(np.float32)

    windows, starts = slice_windows(
        skel, video_codes.astype(np.int64), seq_len, include_last=True
    )
    l_means = window_mean_labels(labs, starts, seq_len)
    vids = video_names[video_codes[starts]]
    feats = windows.reshape(-1, seq_len, skel.shape[1] // 3, 3)

    if rescale_pose:
        feats = feats.copy()
        feats[..., :2] = scale_pose(feats[..., :2])
    if center_joint:
        feats = add_center_joint(feats)
    return WindowedDataset(features=feats, labels=l_means, videos=vids)


# Canonical shapes per dataset name, used only when the caller doesn't say.
_SHAPE_PRESETS = {
    "harup": dict(num_classes=11, sensor_dim=15),
    "urfall": dict(num_classes=2, sensor_dim=4),
    "imvia": dict(num_classes=2, sensor_dim=0),
    "fukinect": dict(num_classes=4, sensor_dim=0),
}


def load_dataset(
    dataset: str,
    path: Optional[str] = None,
    seq_len: int = 30,
    num_joints: int = 14,
    num_classes: Optional[int] = None,
    sensor_dim: Optional[int] = None,
    seed: int = 0,
    n_windows: int = 1024,
) -> WindowedDataset:
    """Uniform entry: real data when ``path`` is given, else synthetic with
    the dataset's canonical shapes (explicit args always win)."""
    if path is not None:
        # sequence of pickle paths first: os.path.isdir(list) raises
        if not isinstance(path, (str, os.PathLike)):
            return load_pickle_windows(list(path))
        if os.path.isdir(path):
            return load_csv_windows(path, seq_len=seq_len)
        return load_pickle_windows([path])
    preset = _SHAPE_PRESETS.get(dataset, {})
    return make_synthetic(
        n_windows=n_windows,
        seq_len=seq_len,
        num_joints=num_joints,
        num_classes=num_classes if num_classes is not None else preset.get("num_classes", 11),
        sensor_dim=sensor_dim if sensor_dim is not None else preset.get("sensor_dim", 15),
        seed=seed,
    )


def split_dataset(
    data: WindowedDataset,
    split=(0.6, 0.2, 0.2),
    seed: int = 42,
    by_video: bool = True,
) -> Dict[str, WindowedDataset]:
    idx = train_valid_test_split(data.videos, split=split, seed=seed, by_video=by_video)
    return {name: data.subset(i) for name, i in idx.items()}


def kfold_datasets(
    data: WindowedDataset,
    n_folds: int = 10,
    seed: int = 42,
    by_video: bool = True,
    stratify: bool = False,
) -> List[Dict[str, WindowedDataset]]:
    """``stratify=True``: sample-level stratified folds (the notebook
    ``KFold_load_dataset`` protocol — overrides ``by_video``); otherwise
    plain/video k-fold."""
    if stratify:
        folds = stratified_kfold_indices(data.labels, n_folds=n_folds, seed=seed)
    else:
        folds = kfold_indices(
            data.videos, n_folds=n_folds, seed=seed, by_video=by_video
        )
    return [
        {name: data.subset(i) for name, i in fold.items()} for fold in folds
    ]
