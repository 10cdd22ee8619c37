// Band decoding (RFC 6716 §4.3.4): theta (stereo/split angle) decode,
// recursive band partitioning with folding, time-frequency interleaving,
// and the top-level coded-band loop; plus anti-collapse (§4.3.5).

#include <cmath>
#include <cstring>

#include "prof_tsc.h"

#include "celt.h"
#include "celt_tables.h"

namespace iamf_opus {

thread_local EmitBuf* g_emit = nullptr;
static inline uint32_t* emit_rec(int op) {
  if (!g_emit || g_emit->count >= EmitBuf::CAP) return nullptr;
  uint32_t* r = g_emit->rec[g_emit->count++];
  memset(r, 0, 16 * sizeof(uint32_t));
  r[0] = (uint32_t)op;
  return r;
}
static inline void emit_f(uint32_t* r, int i, float v) {
  memcpy(&r[i], &v, 4);
}
static thread_local const float* tl_band_base = nullptr;
static thread_local int tl_emit_ch = 0;

BandStats g_band_stats;
bool band_stats_enabled() {
  static const bool on = getenv("IAMF_BAND_STATS") != nullptr;
  return on;
}
static thread_local long long tl_frame_leaves = 0;

static inline int imin(int a, int b) { return a < b ? a : b; }
static inline int imax(int a, int b) { return a > b ? a : b; }

// ---- bit-exact trig helpers (bands.c) ----------------------------------

static inline int frac_mul16(int a, int b) {
  return (16384 + (int)((int16_t)a * (int16_t)b)) >> 15;
}

static int bitexact_cos(int16_t x) {
  int tmp = (4096 + ((int32_t)x * x)) >> 13;
  int x2 = tmp;
  x2 = (32767 - x2) +
       frac_mul16(x2, -7651 + frac_mul16(x2, 8277 + frac_mul16(-626, x2)));
  return 1 + x2;
}

static int bitexact_log2tan(int isin, int icos) {
  int lc = ec_ilog((uint32_t)icos);
  int ls = ec_ilog((uint32_t)isin);
  icos <<= 15 - lc;
  isin <<= 15 - ls;
  return (ls - lc) * (1 << 11) +
         frac_mul16(isin, frac_mul16(isin, -2597) + 7932) -
         frac_mul16(icos, frac_mul16(icos, -2597) + 7932);
}

static uint32_t isqrt32(uint32_t val) {
  uint32_t g = 0;
  int bshift = (ec_ilog(val) - 1) >> 1;
  uint32_t b = 1u << bshift;
  do {
    uint32_t t = ((g << 1) + b) << bshift;
    if (t <= val) {
      g += b;
      val -= t;
    }
    b >>= 1;
    bshift--;
  } while (bshift >= 0);
  return g;
}

// ---- band context -------------------------------------------------------

struct BandCtx {
  int i;
  int intensity;
  int spread;
  int tf_change;
  EntDec* ec;
  int32_t remaining_bits;
  uint32_t seed;
};

struct SplitCtx {
  int inv;
  int imid;
  int iside;
  int delta;
  int itheta;
  int qalloc;
};

static int compute_qn(int N, int b, int offset, int pulse_cap, int stereo) {
  static const int16_t exp2_table8[8] = {16384, 17866, 19483, 21247,
                                         23170, 25267, 27554, 30048};
  int qn, qb;
  int N2 = 2 * N - 1;
  if (stereo && N == 2) N2--;
  qb = (b + N2 * offset) / N2;
  qb = imin(b - pulse_cap - (4 << BITRES), qb);
  qb = imin(8 << BITRES, qb);
  if (qb < (1 << BITRES >> 1)) {
    qn = 1;
  } else {
    qn = exp2_table8[qb & 0x7] >> (14 - (qb >> BITRES));
    qn = (qn + 1) >> 1 << 1;
  }
  return qn;
}

static void compute_theta(BandCtx* ctx, SplitCtx* sctx, float* X, float* Y,
                          int N, int* b, int B, int B0, int LM, int stereo,
                          int* fill) {
  ProfTsc _pt(6);
  int qn;
  int itheta = 0;
  int delta;
  int imid, iside;
  int inv = 0;
  EntDec& ec = *ctx->ec;
  int i = ctx->i;

  int pulse_cap = mode_logN()[i] + LM * (1 << BITRES);
  int offset = (pulse_cap >> 1) - (stereo && N == 2 ? 16 : 4);
  qn = compute_qn(N, *b, offset, pulse_cap, stereo);
  if (stereo && i >= ctx->intensity) qn = 1;

  int tell = (int)ec.tell_frac();
  if (qn != 1) {
    if (stereo && N > 2) {
      int p0 = 3;
      int x0 = qn / 2;
      int ft = p0 * (x0 + 1) + x0;
      int fm = (int)ec.decode((unsigned)ft);
      int x;
      if (fm < (x0 + 1) * p0)
        x = fm / p0;
      else
        x = x0 + 1 + (fm - (x0 + 1) * p0);
      int fl = x <= x0 ? p0 * x : (x - 1 - x0) + (x0 + 1) * p0;
      int fh = fl + (x <= x0 ? p0 : 1);
      ec.update((unsigned)fl, (unsigned)fh, (unsigned)ft);
      itheta = x;
    } else if (B0 > 1 || stereo) {
      itheta = (int)ec.uint((uint32_t)qn + 1);
    } else {
      int fs = 1;
      int ft = ((qn >> 1) + 1) * ((qn >> 1) + 1);
      int fl = 0;
      int fm = (int)ec.decode((unsigned)ft);
      if (fm < ((qn >> 1) * ((qn >> 1) + 1) >> 1)) {
        itheta = (int)((isqrt32(8 * (uint32_t)fm + 1) - 1) >> 1);
        fs = itheta + 1;
        fl = itheta * (itheta + 1) >> 1;
      } else {
        itheta =
            (int)((2 * (qn + 1) - isqrt32(8 * (uint32_t)(ft - fm - 1) + 1)) >>
                  1);
        fs = qn + 1 - itheta;
        fl = ft - ((qn + 1 - itheta) * (qn + 2 - itheta) >> 1);
      }
      ec.update((unsigned)fl, (unsigned)(fl + fs), (unsigned)ft);
    }
    itheta = (int)((int64_t)itheta * 16384 / qn);
    if (stereo && i >= ctx->intensity) itheta = 0;  // unreachable: qn==1
  } else if (stereo) {
    if (*b > 2 << BITRES && ctx->remaining_bits > 2 << BITRES) {
      inv = ec.bit_logp(2);
    }
    itheta = 0;
  }
  int qalloc = (int)ec.tell_frac() - tell;
  *b -= qalloc;

  if (itheta == 0) {
    imid = 32767;
    iside = 0;
    *fill &= (1 << B) - 1;
    delta = -16384;
  } else if (itheta == 16384) {
    imid = 0;
    iside = 32767;
    *fill &= ((1 << B) - 1) << B;
    delta = 16384;
  } else {
    imid = bitexact_cos((int16_t)itheta);
    iside = bitexact_cos((int16_t)(16384 - itheta));
    delta = frac_mul16((N - 1) << 7, bitexact_log2tan(iside, imid));
  }

  sctx->inv = inv;
  sctx->imid = imid;
  sctx->iside = iside;
  sctx->delta = delta;
  sctx->itheta = itheta;
  sctx->qalloc = qalloc;
}

static unsigned quant_band(BandCtx* ctx, float* X, int N, int b, int B,
                           float* lowband, int LM, float* lowband_out,
                           float gain, float* lowband_scratch, int fill);

static unsigned quant_band_n1(BandCtx* ctx, float* X, float* Y,
                              float* lowband_out) {
  float* x = X;
  EntDec& ec = *ctx->ec;
  int stereo = Y != nullptr;
  int c = 0;
  do {
    int sign = 0;
    if (ctx->remaining_bits >= 1 << BITRES) {
      sign = (int)ec.bits(1);
      ctx->remaining_bits -= 1 << BITRES;
    }
    x[0] = sign ? -1.f : 1.f;
    if (uint32_t* r = emit_rec(EMIT_N1)) {
      r[1] = (uint32_t)(int)( (c == 0 ? X : Y) - tl_band_base);
      emit_f(r, 2, x[0]);
      r[3] = (uint32_t)(tl_emit_ch + c);
    }
    x = Y;
  } while (++c < 1 + stereo);
  if (lowband_out) lowband_out[0] = X[0];
  return 1;
}

static unsigned quant_partition(BandCtx* ctx, float* X, int N, int b, int B,
                                float* lowband, int LM, float gain, int fill) {
  unsigned cm = 0;
  int i = ctx->i;
  EntDec& ec = *ctx->ec;
  const unsigned char* cache =
      mode_cache_bits() + mode_cache_index()[(LM + 1) * NB_EBANDS + i];

  if (LM != -1 && b > cache[cache[0]] + 12 && N > 2) {
    int B0 = B;
    N >>= 1;
    float* Y = X + N;
    LM -= 1;
    if (B == 1) fill = (fill & 1) | (fill << 1);
    B = (B + 1) >> 1;
    SplitCtx sctx;
    compute_theta(ctx, &sctx, X, Y, N, &b, B, B0, LM, 0, &fill);
    if (band_stats_enabled()) {
      g_band_stats.splits.fetch_add(1, std::memory_order_relaxed);
      g_band_stats.theta_calls.fetch_add(1, std::memory_order_relaxed);
    }
    if (uint32_t* r = emit_rec(EMIT_THETA)) {
      r[1] = (uint32_t)sctx.itheta;
      r[2] = (uint32_t)sctx.imid;
      r[3] = (uint32_t)sctx.iside;
      r[4] = 0;
      r[5] = 0;
      r[6] = (uint32_t)N;
      r[7] = (uint32_t)(int)(X - tl_band_base);
      r[8] = (uint32_t)tl_emit_ch;
      r[9] = (uint32_t)fill;
    }
    int imid = sctx.imid, iside = sctx.iside;
    int delta = sctx.delta, itheta = sctx.itheta, qalloc = sctx.qalloc;
    float mid = (1.f / 32768) * imid;
    float side = (1.f / 32768) * iside;

    if (B0 > 1 && (itheta & 0x3fff)) {
      if (itheta > 8192)
        delta -= delta >> (4 - LM);
      else
        delta = imin(0, delta + (N << BITRES >> (5 - LM)));
    }
    int mbits = imax(0, imin(b, (b - delta) / 2));
    int sbits = b - mbits;
    ctx->remaining_bits -= qalloc;

    float* next_lowband2 = nullptr;
    if (lowband) next_lowband2 = lowband + N;

    int32_t rebalance = ctx->remaining_bits;
    if (mbits >= sbits) {
      cm = quant_partition(ctx, X, N, mbits, B, lowband, LM, gain * mid, fill);
      rebalance = mbits - (rebalance - ctx->remaining_bits);
      if (rebalance > 3 << BITRES && itheta != 0)
        sbits += rebalance - (3 << BITRES);
      cm |= quant_partition(ctx, Y, N, sbits, B, next_lowband2, LM,
                            gain * side, fill >> B)
            << (B0 >> 1);
    } else {
      cm = quant_partition(ctx, Y, N, sbits, B, next_lowband2, LM, gain * side,
                           fill >> B)
           << (B0 >> 1);
      rebalance = sbits - (rebalance - ctx->remaining_bits);
      if (rebalance > 3 << BITRES && itheta != 16384)
        mbits += rebalance - (3 << BITRES);
      cm |= quant_partition(ctx, X, N, mbits, B, lowband, LM, gain * mid, fill);
    }
  } else {
    // basic case: PVQ or folding
    int q = bits2pulses(i, LM, b);
    int curr_bits = pulses2bits(i, LM, q);
    ctx->remaining_bits -= curr_bits;
    while (ctx->remaining_bits < 0 && q > 0) {
      ctx->remaining_bits += curr_bits;
      q--;
      curr_bits = pulses2bits(i, LM, q);
      ctx->remaining_bits -= curr_bits;
    }
    if (uint32_t* r = emit_rec(EMIT_LEAF)) {
      r[1] = (uint32_t)(int)(X - tl_band_base);
      r[2] = (uint32_t)N;
      r[3] = (uint32_t)(q != 0 ? get_pulses(q) : 0);
      emit_f(r, 5, gain);
      r[6] = (uint32_t)B;
      r[8] = (uint32_t)tl_emit_ch;
      int kind = 0;
      if (q == 0) {
        unsigned cmk = (unsigned)(1 << B) - 1;
        int f2 = fill & (int)cmk;
        kind = !f2 ? 1 : (lowband == nullptr ? 2 : 3);
      }
      r[9] = (uint32_t)kind;
      r[10] = (uint32_t)(unsigned)fill;
      r[12] = ctx->seed;
    }
    if (q != 0) {
      int K = get_pulses(q);
      cm = alg_unquant(X, N, K, ctx->spread, B, ec, gain);
      if (band_stats_enabled()) {
        g_band_stats.pvq_leaves.fetch_add(1, std::memory_order_relaxed);
        g_band_stats.pvq_bins.fetch_add(N, std::memory_order_relaxed);
        tl_frame_leaves++;
      }
    } else {
      unsigned cm_mask = (unsigned)(1 << B) - 1;
      fill &= (int)cm_mask;
      if (!fill) {
        memset(X, 0, N * sizeof(float));
        if (band_stats_enabled()) {
          g_band_stats.zero_leaves.fetch_add(1, std::memory_order_relaxed);
          g_band_stats.zero_bins.fetch_add(N, std::memory_order_relaxed);
          tl_frame_leaves++;
        }
      } else if (skip_recon()) {
        cm = cm_mask;  // pass-1: noise/fold values + seed walk deferred
      } else {
        if (lowband == nullptr) {
          for (int j = 0; j < N; ++j) {
            ctx->seed = celt_lcg_rand(ctx->seed);
            X[j] = (float)((int32_t)ctx->seed >> 20);
          }
          cm = cm_mask;
          if (band_stats_enabled()) {
            g_band_stats.noise_leaves.fetch_add(1,
                                                std::memory_order_relaxed);
            g_band_stats.noise_bins.fetch_add(N, std::memory_order_relaxed);
            tl_frame_leaves++;
          }
        } else {
          for (int j = 0; j < N; ++j) {
            ctx->seed = celt_lcg_rand(ctx->seed);
            float tmp = 1.f / 256;
            tmp = (ctx->seed & 0x8000) ? tmp : -tmp;
            X[j] = lowband[j] + tmp;
          }
          cm = (unsigned)fill;
          if (band_stats_enabled()) {
            g_band_stats.fold_leaves.fetch_add(1,
                                               std::memory_order_relaxed);
            g_band_stats.fold_bins.fetch_add(N, std::memory_order_relaxed);
            tl_frame_leaves++;
          }
        }
        renormalise_vector(X, N, gain);
      }
    }
  }
  return cm;
}

static unsigned quant_band(BandCtx* ctx, float* X, int N, int b, int B,
                           float* lowband, int LM, float* lowband_out,
                           float gain, float* lowband_scratch, int fill) {
  int N0 = N;
  int N_B = N / B;
  int N_B0;
  int B0 = B;
  int time_divide = 0;
  int recombine = 0;
  int longBlocks = B0 == 1;
  unsigned cm = 0;

  if (N == 1) {
    if (g_emit) tl_band_base = X;
    return quant_band_n1(ctx, X, nullptr, lowband_out);
  }

  int tf_change = ctx->tf_change;
  const int tf_change_in = tf_change;
  const bool skipf = skip_recon();
  if (skipf) lowband_scratch = nullptr;
  if (tf_change > 0) recombine = tf_change;
  if (lowband_scratch && lowband &&
      (recombine || ((N_B & 1) == 0 && tf_change < 0) || B0 > 1)) {
    memcpy(lowband_scratch, lowband, N * sizeof(float));
    lowband = lowband_scratch;
  }
  for (int k = 0; k < recombine; ++k) {
    if (lowband && !skipf) haar1(lowband, N >> k, 1 << k);
    fill = bit_interleave_table[fill & 0xF] |
           bit_interleave_table[fill >> 4] << 2;
  }
  B >>= recombine;
  N_B <<= recombine;

  while ((N_B & 1) == 0 && tf_change < 0) {
    if (lowband && !skipf) haar1(lowband, N_B, B);
    fill |= fill << B;
    B <<= 1;
    N_B >>= 1;
    time_divide++;
    tf_change++;
  }
  B0 = B;
  N_B0 = N_B;
  if (g_emit) tl_band_base = X;
  if (uint32_t* r = emit_rec(EMIT_BANDCFG)) {
    r[1] = (uint32_t)recombine;
    r[2] = (uint32_t)time_divide;
    r[3] = (uint32_t)longBlocks;
    r[4] = (uint32_t)B0;
    r[5] = (uint32_t)N_B0;
    r[6] = (uint32_t)(lowband != nullptr);
    r[7] = (uint32_t)N0;
    r[8] = (uint32_t)tl_emit_ch;
    r[9] = (uint32_t)(lowband_out != nullptr);
    r[10] = (uint32_t)tf_change_in;
  }

  if (B0 > 1 && lowband && !skipf)
    deinterleave_hadamard(lowband, N_B >> recombine, B0 << recombine,
                          longBlocks);

  cm = quant_partition(ctx, X, N, b, B, lowband, LM, gain, fill);

  if (B0 > 1 && !skipf)
    interleave_hadamard(X, N_B >> recombine, B0 << recombine, longBlocks);

  N_B = N_B0;
  B = B0;
  for (int k = 0; k < time_divide; ++k) {
    B >>= 1;
    N_B <<= 1;
    cm |= cm >> B;
    if (!skipf) haar1(X, N_B, B);
  }
  for (int k = 0; k < recombine; ++k) {
    cm = bit_deinterleave_table[cm];
    if (!skipf) haar1(X, N0 >> k, 1 << k);
  }
  B <<= recombine;

  if (lowband_out && !skipf) {
    float n = sqrtf((float)N0);
    for (int j = 0; j < N0; ++j) lowband_out[j] = n * X[j];
  }
  cm &= (unsigned)(1 << B) - 1;
  return cm;
}

static unsigned quant_band_stereo(BandCtx* ctx, float* X, float* Y, int N,
                                  int b, int B, float* lowband, int LM,
                                  float* lowband_out, float* lowband_scratch,
                                  int fill) {
  unsigned cm = 0;
  EntDec& ec = *ctx->ec;
  if (N == 1) {
    if (g_emit) tl_band_base = X;
    return quant_band_n1(ctx, X, Y, lowband_out);
  }

  int orig_fill = fill;
  if (band_stats_enabled())
    g_band_stats.stereo_bands.fetch_add(1, std::memory_order_relaxed);
  SplitCtx sctx;
  compute_theta(ctx, &sctx, X, Y, N, &b, B, B, LM, 1, &fill);
  if (uint32_t* r = emit_rec(EMIT_THETA)) {
    r[1] = (uint32_t)sctx.itheta;
    r[2] = (uint32_t)sctx.imid;
    r[3] = (uint32_t)sctx.iside;
    r[4] = (uint32_t)sctx.inv;
    r[5] = 1;
    r[6] = (uint32_t)N;
    r[7] = 0;
    r[8] = 0;
    r[9] = (uint32_t)fill;
  }
  int inv = sctx.inv;
  int imid = sctx.imid, iside = sctx.iside;
  int delta = sctx.delta, itheta = sctx.itheta, qalloc = sctx.qalloc;
  float mid = (1.f / 32768) * imid;
  float side = (1.f / 32768) * iside;

  if (N == 2) {
    int mbits = b;
    int sbits = 0;
    if (itheta != 0 && itheta != 16384) sbits = 1 << BITRES;
    mbits -= sbits;
    int c = itheta > 8192;
    ctx->remaining_bits -= qalloc + sbits;

    float* x2 = c ? Y : X;
    float* y2 = c ? X : Y;
    int sign = 0;
    if (sbits) sign = (int)ec.bits(1);
    sign = 1 - 2 * sign;
    if (uint32_t* r = emit_rec(EMIT_N2S)) {
      r[1] = (uint32_t)sign;
      r[2] = (uint32_t)c;
      r[3] = (uint32_t)imid;
      r[4] = (uint32_t)iside;
    }
    if (g_emit) tl_emit_ch = c ? 1 : 0;
    cm = quant_band(ctx, x2, N, mbits, B, lowband, LM, lowband_out, 1.f,
                    lowband_scratch, orig_fill);
    if (!skip_recon()) {
    y2[0] = -(float)sign * x2[1];
    y2[1] = (float)sign * x2[0];
    X[0] = mid * X[0];
    X[1] = mid * X[1];
    Y[0] = side * Y[0];
    Y[1] = side * Y[1];
    float tmp = X[0];
    X[0] = tmp - Y[0];
    Y[0] = tmp + Y[0];
    tmp = X[1];
    X[1] = tmp - Y[1];
    Y[1] = tmp + Y[1];
    }
  } else {
    int mbits = imax(0, imin(b, (b - delta) / 2));
    int sbits = b - mbits;
    ctx->remaining_bits -= qalloc;
    int32_t rebalance = ctx->remaining_bits;
    if (mbits >= sbits) {
      if (g_emit) tl_emit_ch = 0;
      cm = quant_band(ctx, X, N, mbits, B, lowband, LM, lowband_out, 1.f,
                      lowband_scratch, fill);
      rebalance = mbits - (rebalance - ctx->remaining_bits);
      if (rebalance > 3 << BITRES && itheta != 0)
        sbits += rebalance - (3 << BITRES);
      if (g_emit) tl_emit_ch = 1;
      cm |= quant_band(ctx, Y, N, sbits, B, nullptr, LM, nullptr, side,
                       nullptr, fill >> B);
    } else {
      if (g_emit) tl_emit_ch = 1;
      cm = quant_band(ctx, Y, N, sbits, B, nullptr, LM, nullptr, side, nullptr,
                      fill >> B);
      rebalance = sbits - (rebalance - ctx->remaining_bits);
      if (rebalance > 3 << BITRES && itheta != 16384)
        mbits += rebalance - (3 << BITRES);
      if (g_emit) tl_emit_ch = 0;
      cm |= quant_band(ctx, X, N, mbits, B, lowband, LM, lowband_out, 1.f,
                       lowband_scratch, fill);
    }
    if (N != 2 && !skip_recon()) stereo_merge(X, Y, mid, N);
    if (N != 2)
      if (uint32_t* r = emit_rec(EMIT_MERGE)) {
        r[1] = 0;
        r[2] = (uint32_t)N;
        r[3] = (uint32_t)sctx.imid;
        r[4] = (uint32_t)inv;
      }
  }
  if (N == 2) {
    // handled above (already resynthesized)
  }
  if (inv && !skip_recon()) {
    for (int j = 0; j < N; ++j) Y[j] = -Y[j];
  }
  return cm;
}

void quant_all_bands_decode(int start, int end, float* X_, float* Y_,
                            unsigned char* collapse_masks, const int* pulses,
                            int shortBlocks, int spread, int dual_stereo,
                            int intensity, const int* tf_res, int total_bits,
                            int balance, EntDec& ec, int LM, int codedBands,
                            uint32_t* seed) {
  const short* eBands = mode_eBands();
  int M = 1 << LM;
  int B = shortBlocks ? M : 1;
  int norm_offset = M * eBands[start];
  int C = Y_ ? 2 : 1;

  static thread_local float norm_buf[2 * 8 * 100];
  float* norm = norm_buf;
  float* norm2 = norm + M * eBands[NB_EBANDS - 1] - norm_offset;
  // scratch: beyond the last coded bin of X_
  float* lowband_scratch = X_ + M * eBands[NB_EBANDS - 1];

  int lowband_offset = 0;
  int update_lowband = 1;

  BandCtx ctx;
  ctx.ec = &ec;
  ctx.intensity = intensity;
  ctx.spread = spread;
  ctx.seed = *seed;

  if (band_stats_enabled()) {
    g_band_stats.frames.fetch_add(1, std::memory_order_relaxed);
    tl_frame_leaves = 0;
  }
  if (uint32_t* r = emit_rec(EMIT_FRAME)) {
    r[1] = (uint32_t)C;
    r[2] = (uint32_t)LM;
    r[3] = (uint32_t)(shortBlocks ? 1 : 0);
    r[4] = (uint32_t)spread;
    r[5] = (uint32_t)intensity;
    r[6] = (uint32_t)dual_stereo;
    r[7] = *seed;
    r[8] = (uint32_t)start;
    r[9] = (uint32_t)end;
    r[10] = (uint32_t)codedBands;
    r[11] = (uint32_t)norm_offset;
    r[12] = (uint32_t)M;
  }
  for (int i = start; i < end; ++i) {
    ctx.i = i;
    int last = i == end - 1;
    float* X = X_ + M * eBands[i];
    float* Y = Y_ ? Y_ + M * eBands[i] : nullptr;
    int N = M * eBands[i + 1] - M * eBands[i];
    int tell = (int)ec.tell_frac();

    if (i != start) balance -= tell;
    int32_t remaining_bits = total_bits - tell - 1;
    ctx.remaining_bits = remaining_bits;
    int b = 0;
    if (i <= codedBands - 1) {
      int curr_balance = balance / imin(3, codedBands - i);
      b = imax(0, imin(16383, imin(remaining_bits + 1,
                                   pulses[i] + curr_balance)));
    }

    if ((M * eBands[i] - N >= M * eBands[start] || i == start + 1) &&
        (update_lowband || lowband_offset == 0))
      lowband_offset = i;

    int tf_change = tf_res[i];
    ctx.tf_change = tf_change;

    float* effective_lowband_ptr = nullptr;
    float* effective_lowband_ptr2 = nullptr;
    // without a fold source every block is fair game for LCG noise fill
    unsigned x_cm = (1u << B) - 1, y_cm = (1u << B) - 1;

    if (i == end - 1) lowband_scratch = nullptr;

    if (lowband_offset != 0 &&
        (spread != SPREAD_AGGRESSIVE || B > 1 || tf_change < 0)) {
      x_cm = y_cm = 0;
      int effective_lowband =
          imax(0, M * eBands[lowband_offset] - norm_offset - N);
      int fold_start = lowband_offset;
      while (M * eBands[--fold_start] > effective_lowband + norm_offset) {
      }
      int fold_end = lowband_offset - 1;
      while (M * eBands[++fold_end] < effective_lowband + norm_offset + N) {
      }
      int fold_i = fold_start;
      do {
        x_cm |= collapse_masks[fold_i * C + 0];
        y_cm |= collapse_masks[fold_i * C + C - 1];
      } while (++fold_i < fold_end);
      effective_lowband_ptr = norm + effective_lowband;
      effective_lowband_ptr2 = norm2 + effective_lowband;
    }

    int emit_avg = 0;
    if (dual_stereo && i == intensity) {
      dual_stereo = 0;
      emit_avg = 1;
      if (!skip_recon())
        for (int j = 0; j < M * eBands[i] - norm_offset; ++j)
          norm[j] = 0.5f * (norm[j] + norm2[j]);
    }
    if (uint32_t* r = emit_rec(EMIT_BAND)) {
      int eff = effective_lowband_ptr
                    ? (int)(effective_lowband_ptr - norm)
                    : -1;
      r[1] = (uint32_t)i;
      r[2] = (uint32_t)(M * eBands[i] - norm_offset);
      r[3] = (uint32_t)N;
      r[4] = (uint32_t)B;
      r[5] = (uint32_t)(effective_lowband_ptr != nullptr);
      r[6] = (uint32_t)eff;
      r[7] = (uint32_t)b;
      r[8] = (uint32_t)last;
      r[9] = (uint32_t)dual_stereo;
      r[10] = (uint32_t)x_cm;
      r[11] = (uint32_t)y_cm;
      r[12] = (uint32_t)emit_avg;
      r[13] = (uint32_t)tf_change;
      r[14] = (uint32_t)lowband_offset;
      r[15] = ctx.seed;
    }

    if (dual_stereo) {
      if (g_emit) tl_emit_ch = 0;
      x_cm = quant_band(&ctx, X, N, b / 2, B, effective_lowband_ptr, LM,
                        last ? nullptr : norm + M * eBands[i] - norm_offset,
                        1.f, lowband_scratch, (int)x_cm);
      {
        if (g_emit) tl_emit_ch = 1;
      }
      y_cm = quant_band(&ctx, Y, N, b / 2, B, effective_lowband_ptr2, LM,
                        last ? nullptr : norm2 + M * eBands[i] - norm_offset,
                        1.f, lowband_scratch, (int)y_cm);
    } else {
      if (g_emit) tl_emit_ch = 0;
      if (Y) {
        x_cm = quant_band_stereo(
            &ctx, X, Y, N, b, B, effective_lowband_ptr, LM,
            last ? nullptr : norm + M * eBands[i] - norm_offset,
            lowband_scratch, (int)(x_cm | y_cm));
      } else {
        x_cm = quant_band(&ctx, X, N, b, B, effective_lowband_ptr, LM,
                          last ? nullptr : norm + M * eBands[i] - norm_offset,
                          1.f, lowband_scratch, (int)(x_cm | y_cm));
      }
      y_cm = x_cm;
    }
    collapse_masks[i * C + 0] = (unsigned char)x_cm;
    collapse_masks[i * C + C - 1] = (unsigned char)y_cm;
    balance += pulses[i] + tell;
    update_lowband = b > (N << BITRES);
  }
  if (uint32_t* r = emit_rec(EMIT_END)) r[1] = ctx.seed;
  *seed = ctx.seed;
  if (band_stats_enabled()) {
    long long cur = g_band_stats.max_leaves_frame.load(
        std::memory_order_relaxed);
    while (tl_frame_leaves > cur &&
           !g_band_stats.max_leaves_frame.compare_exchange_weak(
               cur, tl_frame_leaves, std::memory_order_relaxed)) {
    }
  }
}

void anti_collapse(float* X_, const unsigned char* collapse_masks, int LM,
                   int C, int size, int start, int end, const float* logE,
                   const float* prev1logE, const float* prev2logE,
                   const int* pulses, uint32_t seed) {
  const short* eBands = mode_eBands();
  for (int i = start; i < end; ++i) {
    int N0 = eBands[i + 1] - eBands[i];
    // depth in 1/8 bits per sample
    int depth = (1 + pulses[i]) / (N0 << LM);
    float thresh = 0.5f * exp2f(-0.125f * depth);
    float sqrt_1 = 1.f / sqrtf((float)(N0 << LM));

    for (int c = 0; c < C; ++c) {
      float* X = X_ + c * size + (eBands[i] << LM);
      float prev1 = prev1logE[c * NB_EBANDS + i];
      float prev2 = prev2logE[c * NB_EBANDS + i];
      if (C == 1) {
        prev1 = fmaxf(prev1, prev1logE[NB_EBANDS + i]);
        prev2 = fmaxf(prev2, prev2logE[NB_EBANDS + i]);
      }
      float Ediff = logE[c * NB_EBANDS + i] - fminf(prev1, prev2);
      Ediff = fmaxf(0.f, Ediff);
      float r = 2.f * exp2f(-Ediff);
      if (LM == 3) r *= 1.41421356f;
      r = fminf(thresh, r);
      r = r * sqrt_1;
      int N = N0 << LM;  // unused directly; per-block loop below
      (void)N;
      int renormalize = 0;
      for (int k = 0; k < (1 << LM); ++k) {
        if (!(collapse_masks[i * C + c] & (1 << k))) {
          // fill with noise
          for (int j = 0; j < N0; ++j) {
            seed = celt_lcg_rand(seed);
            X[(j << LM) + k] = (seed & 0x8000) ? r : -r;
          }
          renormalize = 1;
        }
      }
      if (renormalize) renormalise_vector(X, N0 << LM, 1.f);
    }
  }
}

}  // namespace iamf_opus
