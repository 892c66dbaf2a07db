// Native scalar reference kernel: affine/gap-series Gotoh DP + traceback.
//
// Mirrors praline_tpu/oracle/align.py (the pinned parity contract,
// SURVEY.md §8) cell for cell: same state machine (M + k-level Ix/Iy, no
// Ix<->Iy transitions), same tie-breaks (M > Ix > Iy, lower level first),
// same border semantics per mode, same traceback rules — in IEEE float32
// arithmetic so scores are bit-identical to the NumPy oracle and the TPU
// kernels.  Compile with -ffp-contract=off (no FMA reassociation).
//
// This is the native stand-in for the reference's interpreted DP loop
// (SURVEY.md §3.1): a fast CPU cross-check completing the
// oracle <-> C++ <-> XLA <-> Pallas parity square.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>
#include <limits>

namespace {

constexpr float NEG = -1.0e30f;
constexpr uint8_t PTR_NONE = 255;

enum Mode { GLOBAL = 0, SEMIGLOBAL = 1, LOCAL = 2 };

struct Dp {
  int L1, L2, k;
  std::vector<float> M;        // (L1+1)*(L2+1)
  std::vector<float> IX, IY;   // k*(L1+1)*(L2+1)
  std::vector<uint8_t> pM;     // 0=M, 1..k=Ix lvl, k+1..2k=Iy lvl, 255=none
  std::vector<uint8_t> pIXk, pIYk;  // 1 = stay at level k (extend)

  Dp(int l1, int l2, int kk)
      : L1(l1), L2(l2), k(kk),
        M((l1 + 1) * (size_t)(l2 + 1), NEG),
        IX((size_t)kk * (l1 + 1) * (l2 + 1), NEG),
        IY((size_t)kk * (l1 + 1) * (l2 + 1), NEG),
        pM((l1 + 1) * (size_t)(l2 + 1), PTR_NONE),
        pIXk((l1 + 1) * (size_t)(l2 + 1), 0),
        pIYk((l1 + 1) * (size_t)(l2 + 1), 0) {}

  size_t at(int i, int j) const { return (size_t)i * (L2 + 1) + j; }
  float& m(int i, int j) { return M[at(i, j)]; }
  float& ix(int l, int i, int j) { return IX[(size_t)l * (L1 + 1) * (L2 + 1) + at(i, j)]; }
  float& iy(int l, int i, int j) { return IY[(size_t)l * (L1 + 1) * (L2 + 1) + at(i, j)]; }
};

inline float cum_gap(const float* g, int k, int m) {
  float c = 0.0f;
  for (int t = 1; t <= m; ++t) c += g[(t < k ? t : k) - 1];
  return c;
}

}  // namespace

extern "C" {

// Fills the DP and tracebacks.  h: row-major L1*L2 float scores.
// out_cols_x/out_cols_y must hold at least L1+L2 int32 entries.
// Returns 0 on success, -1 on bad arguments.
int praline_gotoh_align(const float* h, int L1, int L2, const float* gap_series,
                        int k, int mode, float* out_score, int* out_ti,
                        int* out_tj, int* out_ncols, int* out_cols_x,
                        int* out_cols_y) {
  if (L1 < 1 || L2 < 1 || k < 1 || k > 31) return -1;
  if (mode != GLOBAL && mode != SEMIGLOBAL && mode != LOCAL) return -1;
  const float* g = gap_series;
  const bool local = mode == LOCAL;
  const bool semi = mode == SEMIGLOBAL;

  Dp dp(L1, L2, k);
  dp.m(0, 0) = 0.0f;
  if (mode == GLOBAL) {
    for (int i = 1; i <= L1; ++i) dp.ix(std::min(i, k) - 1, i, 0) = -cum_gap(g, k, i);
    for (int j = 1; j <= L2; ++j) dp.iy(std::min(j, k) - 1, 0, j) = -cum_gap(g, k, j);
  } else if (semi) {
    for (int i = 1; i <= L1; ++i) dp.ix(std::min(i, k) - 1, i, 0) = 0.0f;
    for (int j = 1; j <= L2; ++j) dp.iy(std::min(j, k) - 1, 0, j) = 0.0f;
  } else {
    for (int i = 0; i <= L1; ++i) dp.m(i, 0) = 0.0f;
    for (int j = 0; j <= L2; ++j) dp.m(0, j) = 0.0f;
  }

  for (int i = 1; i <= L1; ++i) {
    for (int j = 1; j <= L2; ++j) {
      for (int l = 1; l <= k; ++l) {
        if (l == 1 && k == 1) {
          float a = dp.m(i - 1, j), b = dp.ix(0, i - 1, j);
          bool stay = b > a;  // ties prefer entering from M
          dp.ix(0, i, j) = (stay ? b : a) - g[0];
          dp.pIXk[dp.at(i, j)] = stay ? 1 : 0;
          a = dp.m(i, j - 1); b = dp.iy(0, i, j - 1);
          stay = b > a;
          dp.iy(0, i, j) = (stay ? b : a) - g[0];
          dp.pIYk[dp.at(i, j)] = stay ? 1 : 0;
        } else if (l == 1) {
          dp.ix(0, i, j) = dp.m(i - 1, j) - g[0];
          dp.iy(0, i, j) = dp.m(i, j - 1) - g[0];
        } else if (l < k) {
          dp.ix(l - 1, i, j) = dp.ix(l - 2, i - 1, j) - g[l - 1];
          dp.iy(l - 1, i, j) = dp.iy(l - 2, i, j - 1) - g[l - 1];
        } else {
          float a = dp.ix(k - 2, i - 1, j), b = dp.ix(k - 1, i - 1, j);
          bool stay = b > a;  // ties prefer the lower level
          dp.ix(k - 1, i, j) = (stay ? b : a) - g[k - 1];
          dp.pIXk[dp.at(i, j)] = stay ? 1 : 0;
          a = dp.iy(k - 2, i, j - 1); b = dp.iy(k - 1, i, j - 1);
          stay = b > a;
          dp.iy(k - 1, i, j) = (stay ? b : a) - g[k - 1];
          dp.pIYk[dp.at(i, j)] = stay ? 1 : 0;
        }
      }

      float best = dp.m(i - 1, j - 1);
      uint8_t ptr = 0;
      for (int l = 0; l < k; ++l) {
        float v = dp.ix(l, i - 1, j - 1);
        if (v > best) { best = v; ptr = (uint8_t)(1 + l); }
      }
      for (int l = 0; l < k; ++l) {
        float v = dp.iy(l, i - 1, j - 1);
        if (v > best) { best = v; ptr = (uint8_t)(1 + k + l); }
      }
      float mv = h[(size_t)(i - 1) * L2 + (j - 1)] + best;
      if (local && mv < 0.0f) { mv = 0.0f; ptr = PTR_NONE; }
      dp.m(i, j) = mv;
      dp.pM[dp.at(i, j)] = ptr;
    }
  }

  // ---- terminal selection ----
  auto best_state = [&](int i, int j, int* state, int* lvl) -> float {
    float best = dp.m(i, j);
    *state = 0; *lvl = 0;  // state: 0=M, 1=IX, 2=IY
    for (int l = 0; l < k; ++l)
      if (dp.ix(l, i, j) > best) { best = dp.ix(l, i, j); *state = 1; *lvl = l + 1; }
    for (int l = 0; l < k; ++l)
      if (dp.iy(l, i, j) > best) { best = dp.iy(l, i, j); *state = 2; *lvl = l + 1; }
    return best;
  };

  int ti = L1, tj = L2, state = 0, lvl = 0;
  float score;
  if (mode == GLOBAL) {
    score = best_state(L1, L2, &state, &lvl);
  } else if (semi) {
    // larger i first, then larger j (§8.3)
    bool have = false;
    score = NEG;
    for (int i = L1; i >= 0; --i) {
      if (i == L1) {
        for (int j = L2; j >= 0; --j) {
          int s, l; float v = best_state(i, j, &s, &l);
          if (!have || v > score) { have = true; score = v; ti = i; tj = j; state = s; lvl = l; }
        }
      } else {
        int s, l; float v = best_state(i, L2, &s, &l);
        if (!have || v > score) { have = true; score = v; ti = i; tj = L2; state = s; lvl = l; }
      }
    }
  } else {
    // local: argmax over M, ties smallest i then smallest j
    score = NEG; ti = 1; tj = 1;
    for (int i = 1; i <= L1; ++i)
      for (int j = 1; j <= L2; ++j)
        if (dp.m(i, j) > score) { score = dp.m(i, j); ti = i; tj = j; }
    state = 0; lvl = 0;
  }

  // ---- traceback (mirrors oracle _traceback) ----
  std::vector<int> rx, ry;
  rx.reserve(L1 + L2);
  ry.reserve(L1 + L2);
  int i = ti, j = tj;

  if (semi) {
    for (int ii = L1; ii > i; --ii) { rx.push_back(ii - 1); ry.push_back(-1); }
    for (int jj = L2; jj > j; --jj) { rx.push_back(-1); ry.push_back(jj - 1); }
  }

  bool empty_local = local && score <= 0.0f;
  if (!empty_local) {
    for (;;) {
      if (state == 0) {  // M
        if (i == 0 && j == 0) break;
        if (local && dp.m(i, j) <= 0.0f) break;
        rx.push_back(i - 1);
        ry.push_back(j - 1);
        uint8_t ptr = dp.pM[dp.at(i, j)];
        --i; --j;
        if (ptr == PTR_NONE) break;
        if (ptr == 0) state = 0;
        else if (ptr <= k) { state = 1; lvl = ptr; }
        else { state = 2; lvl = ptr - k; }
      } else if (state == 1) {  // IX
        rx.push_back(i - 1);
        ry.push_back(-1);
        if (j == 0) {
          --i;
          if (i == 0) break;
          lvl = std::min(i, k);
          continue;
        }
        if (lvl == 1 && k == 1) {
          bool stay = dp.pIXk[dp.at(i, j)];
          --i;
          if (stay) { state = 1; lvl = 1; } else { state = 0; lvl = 0; }
        } else if (lvl == 1) { --i; state = 0; }
        else if (lvl < k) { --i; --lvl; }
        else { bool stay = dp.pIXk[dp.at(i, j)]; --i; lvl = stay ? k : k - 1; }
        if (state == 0 && i == 0 && j == 0) break;
      } else {  // IY
        rx.push_back(-1);
        ry.push_back(j - 1);
        if (i == 0) {
          --j;
          if (j == 0) break;
          lvl = std::min(j, k);
          continue;
        }
        if (lvl == 1 && k == 1) {
          bool stay = dp.pIYk[dp.at(i, j)];
          --j;
          if (stay) { state = 2; lvl = 1; } else { state = 0; lvl = 0; }
        } else if (lvl == 1) { --j; state = 0; }
        else if (lvl < k) { --j; --lvl; }
        else { bool stay = dp.pIYk[dp.at(i, j)]; --j; lvl = stay ? k : k - 1; }
        if (state == 0 && i == 0 && j == 0) break;
      }
    }
  }

  int n = (int)rx.size();
  for (int c = 0; c < n; ++c) {
    out_cols_x[c] = rx[n - 1 - c];
    out_cols_y[c] = ry[n - 1 - c];
  }
  *out_ncols = n;
  *out_score = empty_local ? 0.0f : score;
  *out_ti = ti;
  *out_tj = tj;
  return 0;
}

// Scores-only batch entry: independent problems, OpenMP-free simple loop.
int praline_gotoh_scores(const float* h_flat, const int* offsets, const int* l1s,
                         const int* l2s, int n_problems, const float* gap_series,
                         int k, int mode, float* out_scores, int* out_lengths) {
  std::vector<int> cols_x, cols_y;
  for (int p = 0; p < n_problems; ++p) {
    int L1 = l1s[p], L2 = l2s[p];
    cols_x.resize(L1 + L2);
    cols_y.resize(L1 + L2);
    float score;
    int ti, tj, ncols;
    int rc = praline_gotoh_align(h_flat + offsets[p], L1, L2, gap_series, k,
                                 mode, &score, &ti, &tj, &ncols,
                                 cols_x.data(), cols_y.data());
    if (rc != 0) return rc;
    out_scores[p] = score;
    out_lengths[p] = ncols;
  }
  return 0;
}

}  // extern "C"
