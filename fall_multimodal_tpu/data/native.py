"""ctypes bindings for the native window slicer, with a numpy fallback.

The one host-side hot loop in this framework is stride-1 window slicing over
per-video CSV rows (the reference did it in python/pandas —
``Multimodal_Fall3/dataloader.py:51-56``). ``native/window_slicer.cpp``
implements it in C++ behind a C ABI; this module compiles it on first use
(g++ -O3 -shared), loads it via ctypes (no pybind11 in the image), and falls
back to an identical-semantics numpy implementation when no toolchain is
available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_SOURCE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "window_slicer.cpp",
)
_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _build_library() -> Optional[str]:
    if not os.path.exists(_SOURCE):
        return None
    cache_dir = os.path.join(
        os.path.expanduser("~"), ".cache", "fall_multimodal_tpu"
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "window_slicer.so")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(
        _SOURCE
    ):
        return so_path
    # compile to a unique temp name, then atomically rename into place:
    # two processes hitting first-use concurrently must not interleave
    # writes into the shared cache path (a corrupt .so with fresh mtime
    # would never be rebuilt)
    tmp_path = f"{so_path}.tmp.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SOURCE, "-o", tmp_path,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp_path, so_path)
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp_path)
        except OSError:
            pass
        return None
    return so_path


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so_path = _build_library()
    if so_path is None:
        return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None

    i64 = ctypes.c_int64
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.fm_count_windows.restype = i64
    lib.fm_count_windows.argtypes = [f32p, i64, i64, i64p, i64, ctypes.c_int]
    lib.fm_slice_windows.restype = i64
    lib.fm_slice_windows.argtypes = [
        f32p, i64, i64, i64p, i64, ctypes.c_int, f32p, i64p,
    ]
    lib.fm_window_mean_labels.restype = None
    lib.fm_window_mean_labels.argtypes = [f32p, i64, i64, i64p, i64, i64, f32p]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def _as_f32(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float32)


def slice_windows_numpy(
    data: np.ndarray, video_codes: np.ndarray, seq_len: int,
    include_last: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Reference-semantics fallback: windows that stay within one video and
    contain no NaN; returns (windows (W, seq, F), start_rows (W,)).

    ``include_last=False`` drops each video's final full window (the
    Gen-1/2 per-video ``range(n - seq_len)`` convention, har_create4.py:125):
    a window is kept only if the row after its end exists in the same video.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    n = len(data)
    count = n - seq_len + 1
    if count <= 0:
        return (
            np.zeros((0, seq_len, data.shape[1]), np.float32),
            np.zeros((0,), np.int64),
        )
    starts = np.arange(count)
    same_video = video_codes[starts] == video_codes[starts + seq_len - 1]
    if not include_last:
        nxt = starts + seq_len
        next_in_video = (nxt < n) & (
            video_codes[np.minimum(nxt, n - 1)] == video_codes[starts]
        )
        same_video = same_video & next_in_video
    has_nan = np.isnan(data).any(axis=1)
    nan_prefix = np.concatenate([[0], np.cumsum(has_nan)])
    clean = (nan_prefix[starts + seq_len] - nan_prefix[starts]) == 0
    keep = starts[same_video & clean]
    view = np.lib.stride_tricks.sliding_window_view(data, seq_len, axis=0)
    windows = np.ascontiguousarray(np.moveaxis(view, -1, 1)[keep], np.float32)
    return windows, keep.astype(np.int64)


def slice_windows(
    data: np.ndarray, video_codes: np.ndarray, seq_len: int,
    include_last: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-video stride-1 windows with NaN rejection (native when possible)."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    lib = _load()
    if lib is None:
        return slice_windows_numpy(data, video_codes, seq_len, include_last)

    data = _as_f32(data)
    codes = np.ascontiguousarray(video_codes, dtype=np.int64)
    n_rows, n_cols = data.shape
    i64 = ctypes.c_int64
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)

    count = lib.fm_count_windows(
        data.ctypes.data_as(f32p), i64(n_rows), i64(n_cols),
        codes.ctypes.data_as(i64p), i64(seq_len), int(include_last),
    )
    out = np.empty((count, seq_len, n_cols), np.float32)
    starts = np.empty((count,), np.int64)
    written = lib.fm_slice_windows(
        data.ctypes.data_as(f32p), i64(n_rows), i64(n_cols),
        codes.ctypes.data_as(i64p), i64(seq_len), int(include_last),
        out.ctypes.data_as(f32p), starts.ctypes.data_as(i64p),
    )
    if written != count:
        # a real guard, not an assert: under python -O a count/slice
        # disagreement would otherwise return uninitialized rows
        raise RuntimeError(
            f"native slicer wrote {written} windows but counted {count}"
        )
    return out, starts


def window_mean_labels(
    labels: np.ndarray, start_rows: np.ndarray, seq_len: int
) -> np.ndarray:
    """Mean label over each window (native when possible)."""
    lib = _load()
    labels = _as_f32(labels)
    starts = np.ascontiguousarray(start_rows, dtype=np.int64)
    if lib is None:
        return np.stack([labels[s : s + seq_len].mean(axis=0) for s in starts]) \
            if len(starts) else np.zeros((0, labels.shape[1]), np.float32)
    out = np.empty((len(starts), labels.shape[1]), np.float32)
    i64 = ctypes.c_int64
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.fm_window_mean_labels(
        labels.ctypes.data_as(f32p), i64(labels.shape[0]),
        i64(labels.shape[1]), starts.ctypes.data_as(i64p),
        i64(len(starts)), i64(seq_len), out.ctypes.data_as(f32p),
    )
    return out
