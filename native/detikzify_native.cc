// Native host-side kernels for detikzify_tpu.
//
// The TPU owns the compute path (JAX/XLA/Pallas); these C++ routines cover
// the *host* hot paths that the reference delegated to external native
// libraries (torchmetrics' C backends, torchvision/PIL internals):
//
//   * eed_distance       -- Extended Edit Distance DP with jump/coverage
//                           backtrace (O(n*m); the eval suite's hottest
//                           CPU loop -- pure Python takes seconds per pair
//                           on long TikZ programs)
//   * resize_normalize   -- bilinear resize + mean/std normalize of RGB
//                           images straight into the float32 NHWC layout
//                           the device expects (dataloader fast path)
//   * count_ngrams       -- hashed n-gram counting for CrystalBLEU corpus
//                           statistics
//
// Built as a plain shared library (no pybind11); consumed via ctypes.
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Extended Edit Distance (Stanchev, Wang & Ney 2019), token-level.
// Mirrors detikzify_tpu/evaluate/eed.py exactly (kept in lockstep by tests).
// ---------------------------------------------------------------------------

double eed_distance(const int32_t* hyp_in, int n_in,
                    const int32_t* ref_in, int m_in,
                    int32_t blank_id) {
  const double ALPHA = 2.0, DELETION = 0.2, INSERTION = 1.0,
               SUBSTITUTION = 1.0, RHO = 0.3;
  // pad with blank sentinels
  std::vector<int32_t> hyp(n_in + 2), ref(m_in + 2);
  hyp[0] = blank_id;
  std::memcpy(hyp.data() + 1, hyp_in, n_in * sizeof(int32_t));
  hyp[n_in + 1] = blank_id;
  ref[0] = blank_id;
  std::memcpy(ref.data() + 1, ref_in, m_in * sizeof(int32_t));
  ref[m_in + 1] = blank_id;
  const int n_h = static_cast<int>(hyp.size());
  const int n_r = static_cast<int>(ref.size());

  enum Op : uint8_t { SUB = 0, INS = 1, DEL = 2, JMP = 3 };
  const double INF = 1e30;
  std::vector<double> dist(static_cast<size_t>(n_r + 1) * (n_h + 1), INF);
  std::vector<uint8_t> op(dist.size(), SUB);
  std::vector<int32_t> jsrc(dist.size(), 0);
  auto at = [&](int j, int i) -> size_t {
    return static_cast<size_t>(j) * (n_h + 1) + i;
  };

  for (int i = 0; i <= n_h; ++i) {
    dist[at(0, i)] = i * DELETION;
    op[at(0, i)] = DEL;
  }
  for (int j = 1; j <= n_r; ++j) {
    dist[at(j, 0)] = dist[at(j - 1, 0)] + INSERTION;
    op[at(j, 0)] = INS;
    for (int i = 1; i <= n_h; ++i) {
      double sub = dist[at(j - 1, i - 1)] +
                   (hyp[i - 1] == ref[j - 1] ? 0.0 : SUBSTITUTION);
      double ins = dist[at(j - 1, i)] + INSERTION;
      double del = dist[at(j, i - 1)] + DELETION;
      double best = std::min(sub, std::min(ins, del));
      dist[at(j, i)] = best;
      op[at(j, i)] = best == sub ? SUB : (best == ins ? INS : DEL);
    }
    // jump to blank-adjacent positions from the row minimum
    int row_best = 0;
    for (int i = 1; i <= n_h; ++i)
      if (dist[at(j, i)] < dist[at(j, row_best)]) row_best = i;
    double base = dist[at(j, row_best)];
    for (int i = 0; i <= n_h; ++i) {
      bool blank_ok = (i == 0) || (hyp[i - 1] == blank_id);
      if (blank_ok && base + ALPHA < dist[at(j, i)]) {
        dist[at(j, i)] = base + ALPHA;
        op[at(j, i)] = JMP;
        jsrc[at(j, i)] = row_best;
      }
    }
  }

  double e = dist[at(n_r, n_h)];
  int j = n_r, i = n_h, jumps = 0;
  while (j > 0 || i > 0) {
    uint8_t o = op[at(j, i)];
    if (o == JMP) {
      ++jumps;
      i = jsrc[at(j, i)];
    } else if (o == SUB && j > 0 && i > 0) {
      --j;
      --i;
    } else if (o == INS && j > 0) {
      --j;
    } else {
      --i;
    }
  }
  double coverage = static_cast<double>(jumps);
  double denom = n_r + RHO * coverage;
  double score = (e + RHO * coverage) / (denom > 1e-9 ? denom : 1e-9);
  return score < 1.0 ? score : 1.0;
}

// ---------------------------------------------------------------------------
// Bilinear resize + normalize: uint8 HWC RGB -> float32 HWC, ((x/255)-m)/s.
// ---------------------------------------------------------------------------

void resize_normalize(const uint8_t* src, int h, int w, float* dst,
                      int out_size, float mean, float std) {
  const float inv255 = 1.0f / 255.0f;
  const float inv_std = 1.0f / std;
  // The x-axis sample positions are identical for every output row:
  // precompute byte offsets + lerp weights once (the naive loop redid
  // this per row), leaving a tight multiply-add inner loop the compiler
  // can keep in registers/vectorize.
  std::vector<int> xo0(out_size), xo1(out_size);
  std::vector<float> fxs(out_size);
  for (int ox = 0; ox < out_size; ++ox) {
    float sx = (ox + 0.5f) * w / out_size - 0.5f;
    int x0 = sx < 0 ? 0 : static_cast<int>(sx);
    int x1 = std::min(x0 + 1, w - 1);
    float fx = sx - x0;
    xo0[ox] = x0 * 3;
    xo1[ox] = x1 * 3;
    fxs[ox] = fx < 0 ? 0 : fx;
  }
  for (int oy = 0; oy < out_size; ++oy) {
    float sy = (oy + 0.5f) * h / out_size - 0.5f;
    int y0 = sy < 0 ? 0 : static_cast<int>(sy);
    int y1 = std::min(y0 + 1, h - 1);
    float fy = sy - y0;
    if (fy < 0) fy = 0;
    const uint8_t* row0 = src + static_cast<size_t>(y0) * w * 3;
    const uint8_t* row1 = src + static_cast<size_t>(y1) * w * 3;
    float* out = dst + static_cast<size_t>(oy) * out_size * 3;
    for (int ox = 0; ox < out_size; ++ox) {
      const uint8_t* p00 = row0 + xo0[ox];
      const uint8_t* p01 = row0 + xo1[ox];
      const uint8_t* p10 = row1 + xo0[ox];
      const uint8_t* p11 = row1 + xo1[ox];
      float fx = fxs[ox];
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] + fx * (p01[c] - p00[c]);
        float bot = p10[c] + fx * (p11[c] - p10[c]);
        float v = top + fy * (bot - top);
        out[ox * 3 + c] = (v * inv255 - mean) * inv_std;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Hashed n-gram counting (CrystalBLEU trivially-shared statistics).
// tokens: int32 ids; writes up to cap (hash, count) pairs, returns count.
// ---------------------------------------------------------------------------

int64_t count_ngrams(const int32_t* tokens, int n_tokens, int max_n,
                     uint64_t* out_hashes, int64_t* out_counts,
                     int64_t cap) {
  std::unordered_map<uint64_t, int64_t> counts;
  counts.reserve(static_cast<size_t>(n_tokens) * max_n);
  for (int n = 1; n <= max_n; ++n) {
    for (int i = 0; i + n <= n_tokens; ++i) {
      uint64_t hsh = 1469598103934665603ULL ^ static_cast<uint64_t>(n);
      for (int k = 0; k < n; ++k) {
        hsh ^= static_cast<uint64_t>(static_cast<uint32_t>(tokens[i + k]));
        hsh *= 1099511628211ULL;
      }
      ++counts[hsh];
    }
  }
  int64_t written = 0;
  for (const auto& kv : counts) {
    if (written >= cap) break;
    out_hashes[written] = kv.first;
    out_counts[written] = kv.second;
    ++written;
  }
  return written;
}

}  // extern "C"
