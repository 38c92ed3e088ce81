"""Native C++ window slicer: build, parity with the numpy fallback, and the
CSV-direct loader path that consumes it."""

import numpy as np
import pandas as pd
import pytest

from fall_multimodal_tpu.data.loaders import load_csv_windows
from fall_multimodal_tpu.data.native import (
    native_available,
    slice_windows,
    slice_windows_numpy,
    window_mean_labels,
)


@pytest.fixture(scope="module")
def table(rng_factory=None):
    rng = np.random.default_rng(3)
    n, f = 2000, 12
    data = rng.normal(size=(n, f)).astype(np.float32)
    data[rng.integers(0, n, 15), rng.integers(0, f, 15)] = np.nan
    codes = np.repeat(np.arange(n // 100), 100).astype(np.int64)
    return data, codes


def test_native_builds():
    # the image ships g++, so the native path must actually be taken
    assert native_available()


@pytest.mark.parametrize("include_last", [True, False])
def test_native_matches_numpy(table, include_last):
    data, codes = table
    w1, s1 = slice_windows(data, codes, 30, include_last)
    w2, s2 = slice_windows_numpy(data, codes, 30, include_last)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_allclose(w1, w2)
    # no window crosses a video boundary or contains NaN
    assert not np.isnan(w1).any()
    assert (codes[s1] == codes[s1 + 29]).all()


def test_window_mean_labels(table):
    data, codes = table
    _, starts = slice_windows(data, codes, 30)
    labels = np.random.default_rng(4).random((len(data), 3)).astype(np.float32)
    means = window_mean_labels(labels, starts, 30)
    ref = np.stack([labels[s : s + 30].mean(axis=0) for s in starts])
    np.testing.assert_allclose(means, ref, atol=1e-5)


def test_short_input_yields_zero_windows():
    data = np.zeros((5, 4), np.float32)
    codes = np.zeros(5, np.int64)
    w, s = slice_windows(data, codes, 30)
    assert w.shape == (0, 30, 4) and len(s) == 0


def test_csv_loader_uses_slicer(tmp_path):
    rng = np.random.default_rng(5)
    rows = []
    for vid in ("a", "b"):
        for f in range(50):
            row = {"video": vid, "frame": f, "label": "fall" if f > 25 else "walk"}
            for j in range(13):
                row[f"j{j}_x"] = rng.random()
                row[f"j{j}_y"] = rng.random()
                row[f"j{j}_s"] = rng.random()
            rows.append(row)
    pd.DataFrame(rows).to_csv(tmp_path / "data.csv", index=False)
    data = load_csv_windows(str(tmp_path), seq_len=30)
    # 50 frames per video, include_last -> 21 windows per video
    assert len(data) == 42
    assert data.features.shape == (42, 30, 14, 3)
    assert sorted(set(data.videos.tolist())) == ["a", "b"]
    assert data.labels.shape[1] == 2


def test_include_last_false_drops_final_window_per_video():
    """ADVICE r1 (low): with include_last=False every video's last full
    window must be dropped (per-video range(n - seq_len), har_create4.py:125)
    — not just the final window of the global concatenated table."""
    rng = np.random.default_rng(3)
    # two videos of 10 rows each, seq_len 4
    data = rng.normal(size=(20, 5)).astype(np.float32)
    codes = np.repeat(np.array([0, 1], np.int64), 10)
    for fn in (slice_windows, slice_windows_numpy):
        w, s = fn(data, codes, 4, include_last=False)
        # per video: starts 0..5 (range(10-4)) -> 6 windows; NOT start 6
        assert list(s) == [0, 1, 2, 3, 4, 5, 10, 11, 12, 13, 14, 15]
        wi, si = fn(data, codes, 4, include_last=True)
        assert list(si) == list(range(7)) + list(range(10, 17))
