// Host (CPU) DTW kernel: batched dynamic-time-warping distances with
// backtracked path-length normalization.
//
// The TPU-native DTW lives in `cpc2_tpu/ops/dtw.py` (anti-diagonal
// wavefront `lax.scan`) and `ops/dtw_pallas.py` (hand-written TPU kernel).
// This is the C++ host fallback the SURVEY (§7 "Hard parts") allows for:
//   * environments without a JAX backend worth warming up (tiny ABX runs,
//     the reference-comparison benchmark harness), and
//   * giving the *reference* stack a compiled kernel in timing comparisons
//     (`scripts/bench_eval.py`): the reference's own Cython build targets
//     Python <= 3.10 and cannot compile here, and timing it against a
//     pure-Python DP would flatter our numbers.
//
// Semantics follow the reference kernel `cpc/eval/ABX/dtw.pyx:40-77`:
// 3-neighbour DP over the (n1, n2) distance matrix, then a backtrack that
// prefers diagonal, then left, then up (ties included), counting path
// cells; the score is final_cost / path_length. Bit-compatible with the
// JAX wavefront implementation (same f32 operand order per cell).

#include <cstddef>
#include <cstdint>
#include <vector>

using std::size_t;

namespace {

inline float dtw_one(const float* dist, int s2_stride, int n1, int n2,
                     std::vector<float>& cost) {
  cost.resize(size_t(n1) * n2);
  // DP: cost[i,j] = dist[i,j] + min(cost[i-1,j], cost[i-1,j-1], cost[i,j-1])
  cost[0] = dist[0];
  for (int j = 1; j < n2; ++j) cost[j] = dist[j] + cost[j - 1];
  for (int i = 1; i < n1; ++i) {
    const float* drow = dist + size_t(i) * s2_stride;
    float* crow = cost.data() + size_t(i) * n2;
    const float* prow = crow - n2;
    crow[0] = drow[0] + prow[0];
    for (int j = 1; j < n2; ++j) {
      float up = prow[j], diag = prow[j - 1], left = crow[j - 1];
      float m = diag < left ? diag : left;
      if (up < m) m = up;
      crow[j] = drow[j] + m;
    }
  }
  // Backtrack with the reference's tie-break (diag <= left <= up).
  int i = n1 - 1, j = n2 - 1;
  long path = 1;
  while (i > 0 && j > 0) {
    float up = cost[size_t(i - 1) * n2 + j];
    float left = cost[size_t(i) * n2 + j - 1];
    float diag = cost[size_t(i - 1) * n2 + j - 1];
    if (diag <= left && diag <= up) {
      --i; --j;
    } else if (left <= up) {
      --j;
    } else {
      --i;
    }
    ++path;
  }
  path += i + j;  // only one direction remains along the border
  return cost[size_t(n1 - 1) * n2 + (n2 - 1)] / float(path);
}

}  // namespace

extern "C" {

// dist: (n, s1, s2) row-major padded distance matrices; n1/n2: true
// lengths per pair (>= 1); out: (n,) normalized DTW scores.
void dtw_host_batch(const float* dist, long long n, int s1, int s2,
                    const int* n1, const int* n2, float* out) {
  std::vector<float> scratch;
  for (long long b = 0; b < n; ++b) {
    const float* d = dist + size_t(b) * s1 * s2;
    out[b] = dtw_one(d, s2, n1[b], n2[b], scratch);
  }
}

}  // extern "C"
