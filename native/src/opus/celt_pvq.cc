// PVQ codeword decode + spherical codebook handling (RFC 6716 §4.3.4):
// combinatorial index -> pulse vector (CWRS), spreading rotation,
// normalization, and the Hadamard/haar helpers used by band splitting.

#include <cmath>
#include <cstring>

#include "prof_tsc.h"

#include "celt.h"
#include "celt_tables.h"

namespace iamf_opus {

// U(n,k): number of PVQ codewords counted by the CWRS recurrence
// U(n,k) = U(n-1,k) + U(n,k-1) + U(n-1,k-1); symmetric in (n,k).
// Table computed once; covers n,k needed at 48 kHz (N<=208, K<=128).
constexpr int U_MAX_N = 212;
constexpr int U_MAX_K = 132;

static const uint32_t* u_table() {
  // magic-static initialization: C++11 guarantees exactly one thread runs
  // the builder (substreams decode on parallel host threads — a manual
  // `if (!tab)` lazy init here double-freed the DP scratch under races)
  static const uint32_t* tab = [] {
    // u64 DP then saturate-store (all used values fit u32)
    uint64_t* dp = new uint64_t[(size_t)U_MAX_N * U_MAX_K];
    for (int k = 0; k < U_MAX_K; ++k) dp[k] = 0;  // n = 0
    for (int n = 1; n < U_MAX_N; ++n) {
      dp[(size_t)n * U_MAX_K + 0] = 0;
      dp[(size_t)n * U_MAX_K + 1] = 1;
      for (int k = 2; k < U_MAX_K; ++k) {
        uint64_t v = dp[(size_t)(n - 1) * U_MAX_K + k] +
                     dp[(size_t)n * U_MAX_K + k - 1] +
                     dp[(size_t)(n - 1) * U_MAX_K + k - 1];
        if (v > 0xFFFFFFFFull) v = 0xFFFFFFFFull;
        dp[(size_t)n * U_MAX_K + k] = v;
      }
    }
    uint32_t* t32 = new uint32_t[(size_t)U_MAX_N * U_MAX_K];
    for (size_t i = 0; i < (size_t)U_MAX_N * U_MAX_K; ++i)
      t32[i] = (uint32_t)dp[i];
    delete[] dp;
    return (const uint32_t*)t32;
  }();
  return tab;
}

static inline uint32_t U(int n, int k) {
  // U(n,k) with U(n,0)=0, U(0,k)=0, U(n,1)=1; symmetric in (n,k) —
  // canonicalize so the smaller argument indexes the k axis.
  if (n < 0 || k < 0) return 0;
  if (k > n) {
    int t = n;
    n = k;
    k = t;
  }
  if (k >= U_MAX_K || n >= U_MAX_N) return 0xFFFFFFFFu;
  return u_table()[(size_t)n * U_MAX_K + k];
}

static inline uint32_t V(int n, int k) { return U(n, k) + U(n, k + 1); }

// Row-contiguous search table: rows_tab[n][j] = U(j, n) for every j the
// walk can touch. The canonical (n-major, k<=n) layout makes the k>=n
// branch's descending search a COLUMN access (one cache line per probe,
// measured as the dominant cwrsi cost); this 132-wide symmetric row view
// keeps every probe of a dimension inside one ~528 B row.
constexpr int ROW_W = U_MAX_K;  // 132 covers k+1 <= 129
static const uint32_t* rows_tab() {
  static const uint32_t* tab = [] {
    uint32_t* t = new uint32_t[(size_t)U_MAX_N * ROW_W];
    for (int n = 0; n < U_MAX_N; ++n)
      for (int j = 0; j < ROW_W; ++j) t[(size_t)n * ROW_W + j] = U(j, n);
    return (const uint32_t*)t;
  }();
  return tab;
}

// Largest j <= start with row[j] <= i (row nondecreasing, row[0] = 0).
// Contiguous descending probes; an AVX2 8-wide chunk variant measured
// slightly SLOWER here (searches are short on real content — the win is
// the row-contiguous layout, not SIMD).
static inline int row_search_le(const uint32_t* row, int start, uint32_t i) {
  int s = start;
  while (s > 0 && row[s] > i) s--;
  return s;
}

// cwrsi: PVQ index -> pulse vector (cwrs.c semantics)
static void cwrsi(int n, int k, uint32_t i, int* y) {
  const uint32_t* rows = rows_tab();
  while (n > 2) {
    const uint32_t* row = rows + (size_t)n * ROW_W;
    uint32_t p;
    int s, k0;
    if (k >= n) {  // lots of pulses: search within this dimension first
      p = row[k + 1];
      s = -(int)(i >= p);
      i -= p & (uint32_t)s;
      k0 = k;
      uint32_t q = row[n];
      k = row_search_le(row, q > i ? n - 1 : k, i);
      p = row[k];
      i -= p;
      *y++ = (int)(((k0 - k + s) ^ s));
    } else {  // lots of dimensions
      uint32_t p0 = row[k];
      uint32_t q = row[k + 1];
      if (p0 <= i && i < q) {
        i -= p0;
        *y++ = 0;
      } else {
        s = -(int)(i >= q);
        i -= q & (uint32_t)s;
        k0 = k;
        // the reference do-while decrements before its first probe, so a
        // k=0 start lands on U(-1,n)=0 at k=-1
        k = k > 0 ? row_search_le(row, k - 1, i) : -1;
        p = k >= 0 ? row[k] : 0;
        i -= p;
        *y++ = (int)(((k0 - k + s) ^ s));
      }
    }
    n--;
  }
  // n == 2
  {
    uint32_t p = 2 * (uint32_t)k + 1;
    int s = -(int)(i >= p);
    i -= p & (uint32_t)s;
    int k0 = k;
    k = (int)((i + 1) >> 1);
    if (k) i -= 2 * (uint32_t)k - 1;
    *y++ = (int)(((k0 - k + s) ^ s));
  }
  // n == 1
  {
    int s = -(int)i;
    *y++ = (int)(((k + s) ^ s));
  }
}

LeafTap g_leaf_tap;
// mutable tap level: env var provides the initial value; tests toggle it
// per-run via iamf_leaf_tap_set (a cached env read broke cross-test
// toggling in one process)
static std::atomic<int> g_leaf_tap_level{[] {
  const char* e = getenv("IAMF_LEAF_TAP");
  return e ? atoi(e) : 0;
}()};
void leaf_tap_set(int lv) {
  g_leaf_tap_level.store(lv, std::memory_order_relaxed);
}
int leaf_tap_level() {
  return g_leaf_tap_level.load(std::memory_order_relaxed);
}
bool leaf_tap_enabled() { return leaf_tap_level() > 0; }
static thread_local long long tl_leaf_slot = -1;

void cwrsi_export(int n, int k, uint32_t i, int* y) { cwrsi(n, k, i, y); }

void decode_pulses(int* y, int n, int k, EntDec& dec) {
  ProfTsc _pt(4);
  uint32_t i;
  {
    ProfTsc _pu(7);  // sub-slot: the range-decoder uint read alone
    // V(n,k) via the row-contiguous table (same cache argument as the
    // cwrsi searches: k >= n would column-access the canonical table)
    const uint32_t* row = rows_tab() + (size_t)n * ROW_W;
    i = dec.uint(row[k] + row[k + 1]);
  }
  if (leaf_tap_enabled()) {
    long long c =
        g_leaf_tap.count.fetch_add(1, std::memory_order_relaxed);
    tl_leaf_slot = c;
    if (c < LeafTap::CAP) {
      g_leaf_tap.n[c] = n;
      g_leaf_tap.k[c] = k;
      g_leaf_tap.idx[c] = i;
    }
  }
  if (skip_recon()) {
    // pass-1: only the range-decoder read is entropy-coupled; the
    // index -> pulse walk defers to the device (device_cwrsi.py)
    memset(y, 0, (size_t)n * sizeof(int));
    return;
  }
  cwrsi(n, k, i, y);
}

static void exp_rotation1(float* X, int len, int stride, float c, float s) {
  float ms = -s;
  float* Xptr = X;
  for (int i = 0; i < len - stride; ++i) {
    float x1 = Xptr[0];
    float x2 = Xptr[stride];
    Xptr[stride] = c * x2 + s * x1;
    *Xptr++ = c * x1 + ms * x2;
  }
  Xptr = X + (len - 2 * stride - 1);
  for (int i = len - 2 * stride - 1; i >= 0; --i) {
    float x1 = Xptr[0];
    float x2 = Xptr[stride];
    Xptr[stride] = c * x2 + s * x1;
    *Xptr-- = c * x1 + ms * x2;
  }
}

void exp_rotation(float* X, int len, int dir, int stride, int K, int spread) {
  ProfTsc _pt(5);
  int stride2 = 0;
  if (2 * K >= len || spread == SPREAD_NONE) return;
  int factor = SPREAD_FACTOR[spread - 1];
  float gain = (float)len / (float)(len + factor * K);
  float theta = 0.5f * gain * gain;
  float c = cosf(0.5f * (float)M_PI * theta);
  float s = cosf(0.5f * (float)M_PI * (1.f - theta));  // sin(theta)
  if (len >= 8 * stride) {
    stride2 = 1;
    while ((stride2 * stride2 + stride2) * stride + (stride >> 2) < len)
      stride2++;
  }
  len /= stride;
  for (int i = 0; i < stride; ++i) {
    if (dir < 0) {
      if (stride2) exp_rotation1(X + i * len, len, stride2, s, c);
      exp_rotation1(X + i * len, len, 1, c, s);
    } else {
      exp_rotation1(X + i * len, len, 1, c, -s);
      if (stride2) exp_rotation1(X + i * len, len, stride2, s, -c);
    }
  }
}

static unsigned extract_collapse_mask(const int* iy, int N, int B) {
  if (B <= 1) return 1;
  int N0 = N / B;
  unsigned collapse_mask = 0;
  for (int i = 0; i < B; ++i) {
    unsigned tmp = 0;
    for (int j = 0; j < N0; ++j) tmp |= (unsigned)(iy[i * N0 + j] != 0);
    collapse_mask |= tmp << i;
  }
  return collapse_mask;
}

void renormalise_vector(float* X, int N, float gain) {
  float E = 1e-15f;
  for (int i = 0; i < N; ++i) E += X[i] * X[i];
  float g = gain / sqrtf(E);
  for (int i = 0; i < N; ++i) X[i] *= g;
}

bool skip_recon() {
  static const bool on = getenv("IAMF_SKIP_RECON") != nullptr;
  return on;
}

unsigned alg_unquant(float* X, int N, int K, int spread, int B, EntDec& dec,
                     float gain) {
  int iy[256];
  decode_pulses(iy, N, K, dec);
  if (skip_recon()) return 1;  // pass-1: pulses decoded, floats deferred
  float Ryy = 0;
  for (int j = 0; j < N; ++j) {
    X[j] = (float)iy[j];  // one pass: int->float convert + energy
    Ryy += X[j] * X[j];
  }
  float g = gain / sqrtf(Ryy);
  for (int j = 0; j < N; ++j) X[j] *= g;
  exp_rotation(X, N, -1, B, K, spread);
  if (leaf_tap_enabled() && tl_leaf_slot >= 0 &&
      tl_leaf_slot < LeafTap::CAP) {
    long long c = tl_leaf_slot;
    g_leaf_tap.gain[c] = gain;
    g_leaf_tap.spread[c] = (unsigned char)spread;
    g_leaf_tap.blocks[c] = (unsigned char)B;
    if (leaf_tap_level() >= 2 && c < LeafTap::XCAP)
      for (int j = 0; j < N && j < LeafTap::XW; ++j)
        g_leaf_tap.x[c][j] = X[j];
    tl_leaf_slot = -1;
  }
  return extract_collapse_mask(iy, N, B);
}

void haar1(float* X, int N0, int stride) {
  if (band_stats_enabled()) {
    g_band_stats.haar_calls.fetch_add(1, std::memory_order_relaxed);
    g_band_stats.haar_bins.fetch_add(N0 * stride,
                                     std::memory_order_relaxed);
  }
  N0 >>= 1;
  for (int i = 0; i < stride; ++i) {
    for (int j = 0; j < N0; ++j) {
      float tmp1 = 0.70710678f * X[stride * 2 * j + i];
      float tmp2 = 0.70710678f * X[stride * (2 * j + 1) + i];
      X[stride * 2 * j + i] = tmp1 + tmp2;
      X[stride * (2 * j + 1) + i] = tmp1 - tmp2;
    }
  }
}

void deinterleave_hadamard(float* X, int N0, int stride, int hadamard) {
  float tmp[1024];
  int N = N0 * stride;
  if (hadamard) {
    const int* ordery = ordery_table + stride - 2;
    for (int i = 0; i < stride; ++i)
      for (int j = 0; j < N0; ++j) tmp[ordery[i] * N0 + j] = X[j * stride + i];
  } else {
    for (int i = 0; i < stride; ++i)
      for (int j = 0; j < N0; ++j) tmp[i * N0 + j] = X[j * stride + i];
  }
  memcpy(X, tmp, N * sizeof(float));
}

void interleave_hadamard(float* X, int N0, int stride, int hadamard) {
  float tmp[1024];
  int N = N0 * stride;
  if (hadamard) {
    const int* ordery = ordery_table + stride - 2;
    for (int i = 0; i < stride; ++i)
      for (int j = 0; j < N0; ++j) tmp[j * stride + i] = X[ordery[i] * N0 + j];
  } else {
    for (int i = 0; i < stride; ++i)
      for (int j = 0; j < N0; ++j) tmp[j * stride + i] = X[i * N0 + j];
  }
  memcpy(X, tmp, N * sizeof(float));
}

void stereo_merge(float* X, float* Y, float mid, int N) {
  float xp = 0, side = 0;
  for (int j = 0; j < N; ++j) {
    xp += Y[j] * X[j];
    side += Y[j] * Y[j];
  }
  xp = mid * xp;
  float El = mid * mid + side - 2 * xp;
  float Er = mid * mid + side + 2 * xp;
  if (Er < 6e-4f || El < 6e-4f) {
    memcpy(Y, X, N * sizeof(float));
    return;
  }
  float lgain = 1.f / sqrtf(El);
  float rgain = 1.f / sqrtf(Er);
  for (int j = 0; j < N; ++j) {
    float l = mid * X[j];
    float r = Y[j];
    X[j] = lgain * (l - r);
    Y[j] = rgain * (l + r);
  }
}

}  // namespace iamf_opus
