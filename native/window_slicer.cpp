// Native window slicer: the host-side hot loop of dataset ingestion.
//
// The reference's CSV-direct loader slices stride-1 windows per video in a
// python/pandas loop (Multimodal_Fall3/dataloader.py:51-56 — its documented
// hot preprocessing loop). This library does the same work in C++:
// per-video stride-1 windows of seq_len rows, rejecting windows that cross a
// video boundary or contain NaN, using prefix sums for O(1) validity per
// window and a flat memcpy gather.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image);
// see fall_multimodal_tpu/data/native.py for the Python wrapper and the
// pure-numpy fallback with identical semantics.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// prefix sums of per-row NaN flags: nan_prefix[r+1]-nan_prefix[s] == 0 iff
// rows [s, r] are NaN-free
std::vector<int64_t> build_nan_prefix(const float* data, int64_t n_rows,
                                      int64_t n_cols) {
  std::vector<int64_t> nan_prefix(n_rows + 1, 0);
  for (int64_t r = 0; r < n_rows; ++r) {
    int has_nan = 0;
    const float* row = data + r * n_cols;
    for (int64_t c = 0; c < n_cols; ++c) {
      if (std::isnan(row[c])) { has_nan = 1; break; }
    }
    nan_prefix[r + 1] = nan_prefix[r] + has_nan;
  }
  return nan_prefix;
}

// The single validity rule shared by count and slice (they MUST agree or
// the caller's pre-sized output buffer ends up partially uninitialized).
// include_last=0 reproduces the Gen-1/2 prep convention range(n - seq_len)
// *per video* (har_create4.py:125): each video's final full window is
// dropped, i.e. a window is kept only if the row after its end exists and
// belongs to the same video. include_last=1 is the Gen-3 convention (every
// final full window kept).
inline bool window_valid(const int64_t* video_ids,
                         const std::vector<int64_t>& nan_prefix,
                         int64_t n_rows, int64_t seq_len, int include_last,
                         int64_t s) {
  if (video_ids[s] != video_ids[s + seq_len - 1]) return false;
  if (!include_last &&
      (s + seq_len >= n_rows || video_ids[s + seq_len] != video_ids[s]))
    return false;
  return nan_prefix[s + seq_len] - nan_prefix[s] == 0;
}

}  // namespace

extern "C" {

// Count valid windows. video_ids must be row-aligned group codes (rows of
// one video contiguous). seq_len < 1 yields 0 (the Python wrapper raises
// before calling; this guard keeps the C ABI memory-safe regardless).
int64_t fm_count_windows(const float* data, int64_t n_rows, int64_t n_cols,
                         const int64_t* video_ids, int64_t seq_len,
                         int include_last) {
  if (seq_len < 1 || n_rows < seq_len) return 0;
  const std::vector<int64_t> nan_prefix = build_nan_prefix(data, n_rows, n_cols);
  int64_t count = 0;
  for (int64_t s = 0; s <= n_rows - seq_len; ++s) {
    if (window_valid(video_ids, nan_prefix, n_rows, seq_len, include_last, s))
      ++count;
  }
  return count;
}

// Gather valid windows into out (n_windows, seq_len, n_cols) and record
// their start rows. Returns the number written (== fm_count_windows).
int64_t fm_slice_windows(const float* data, int64_t n_rows, int64_t n_cols,
                         const int64_t* video_ids, int64_t seq_len,
                         int include_last, float* out,
                         int64_t* out_start_rows) {
  if (seq_len < 1 || n_rows < seq_len) return 0;
  const std::vector<int64_t> nan_prefix = build_nan_prefix(data, n_rows, n_cols);
  int64_t w = 0;
  const int64_t window_bytes = seq_len * n_cols * sizeof(float);
  for (int64_t s = 0; s <= n_rows - seq_len; ++s) {
    if (!window_valid(video_ids, nan_prefix, n_rows, seq_len, include_last, s))
      continue;
    std::memcpy(out + w * seq_len * n_cols, data + s * n_cols, window_bytes);
    out_start_rows[w] = s;
    ++w;
  }
  return w;
}

// Window-mean labels: for each start row, mean of labels[s : s+seq_len]
// (the reference's per-window label mean, dataloader.py:58).
void fm_window_mean_labels(const float* labels, int64_t n_rows,
                           int64_t n_classes, const int64_t* start_rows,
                           int64_t n_windows, int64_t seq_len, float* out) {
  for (int64_t w = 0; w < n_windows; ++w) {
    const int64_t s = start_rows[w];
    float* dst = out + w * n_classes;
    for (int64_t c = 0; c < n_classes; ++c) dst[c] = 0.0f;
    for (int64_t r = 0; r < seq_len; ++r) {
      const float* row = labels + (s + r) * n_classes;
      for (int64_t c = 0; c < n_classes; ++c) dst[c] += row[c];
    }
    const float inv = 1.0f / static_cast<float>(seq_len);
    for (int64_t c = 0; c < n_classes; ++c) dst[c] *= inv;
  }
}

}  // extern "C"
