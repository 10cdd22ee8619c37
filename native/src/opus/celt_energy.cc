// Band energy decode (RFC 6716 §4.3.2): coarse (2-D Laplace prediction),
// fine bits, and final-bit distribution; plus time-frequency resolution
// flag decode (§4.3.1).

#include <cmath>

#include "celt.h"
#include "celt_tables.h"

namespace iamf_opus {

static inline int imin(int a, int b) { return a < b ? a : b; }
static inline int imax(int a, int b) { return a > b ? a : b; }

static const float beta_intra_const = 4915.f / 32768.f;

void unquant_coarse_energy(int start, int end, float* oldEBands, int intra,
                           EntDec& dec, int C, int LM) {
  const unsigned char* prob_model = e_prob_model + (LM * 2 + intra) * 42;
  float prev[2] = {0, 0};
  float coef, beta;
  if (intra) {
    coef = 0;
    beta = beta_intra_const;
  } else {
    coef = pred_coef[LM];
    beta = beta_coef[LM];
  }
  int budget = dec.storage * 8;
  for (int i = start; i < end; ++i) {
    for (int c = 0; c < C; ++c) {
      int tell = dec.tell();
      int qi;
      if (budget - tell >= 15) {
        int pi = 2 * imin(i, 20);
        qi = ec_laplace_decode(dec, (unsigned)prob_model[pi] << 7,
                               (int)prob_model[pi + 1] << 6);
      } else if (budget - tell >= 2) {
        qi = dec.icdf(small_energy_icdf, 2);
        qi = (qi >> 1) ^ -(qi & 1);
      } else if (budget - tell >= 1) {
        qi = -dec.bit_logp(1);
      } else {
        qi = -1;
      }
      float q = (float)qi;
      float old = oldEBands[i + c * NB_EBANDS];
      if (old < -9.f) old = -9.f;
      oldEBands[i + c * NB_EBANDS] = coef * old + prev[c] + q;
      prev[c] = prev[c] + q - beta * q;
    }
  }
}

void unquant_fine_energy(int start, int end, float* oldEBands,
                         const int* fine_quant, EntDec& dec, int C) {
  for (int i = start; i < end; ++i) {
    if (fine_quant[i] <= 0) continue;
    for (int c = 0; c < C; ++c) {
      int q2 = (int)dec.bits(fine_quant[i]);
      float offset = (q2 + .5f) * (1 << (14 - fine_quant[i])) * (1.f / 16384) -
                     .5f;
      oldEBands[i + c * NB_EBANDS] += offset;
    }
  }
}

void unquant_energy_finalise(int start, int end, float* oldEBands,
                             const int* fine_quant, const int* fine_priority,
                             int bits_left, EntDec& dec, int C) {
  for (int prio = 0; prio < 2; ++prio) {
    for (int i = start; i < end && bits_left >= C; ++i) {
      if (fine_quant[i] >= MAX_FINE_BITS || fine_priority[i] != prio)
        continue;
      for (int c = 0; c < C; ++c) {
        int q2 = (int)dec.bits(1);
        float offset =
            (q2 - .5f) * (1 << (14 - fine_quant[i] - 1)) * (1.f / 16384);
        oldEBands[i + c * NB_EBANDS] += offset;
        bits_left--;
      }
    }
  }
}

void tf_decode(int start, int end, int isTransient, int* tf_res, int LM,
               EntDec& dec) {
  int budget = dec.storage * 8;
  int tell = dec.tell();
  int logp = isTransient ? 2 : 4;
  int tf_select_rsv = LM > 0 && tell + logp + 1 <= budget;
  budget -= tf_select_rsv;
  int tf_changed = 0, curr = 0;
  for (int i = start; i < end; ++i) {
    if (tell + logp <= budget) {
      curr ^= dec.bit_logp(logp);
      tell = dec.tell();
      tf_changed |= curr;
    }
    tf_res[i] = curr;
    logp = isTransient ? 4 : 5;
  }
  int tf_select = 0;
  if (tf_select_rsv &&
      tf_select_table[LM * 8 + 4 * isTransient + 0 + tf_changed] !=
          tf_select_table[LM * 8 + 4 * isTransient + 2 + tf_changed]) {
    tf_select = dec.bit_logp(1);
  }
  for (int i = start; i < end; ++i) {
    tf_res[i] =
        tf_select_table[LM * 8 + 4 * isTransient + 2 * tf_select + tf_res[i]];
  }
}

void denormalise_bands(const float* X, float* freq, const float* bandLogE,
                       int start, int end, int M, int silence) {
  const short* eBands = mode_eBands();
  int N = M * SHORT_MDCT_SIZE;  // frame size at this M (LM = log2 M)
  int bound = M * eBands[end];
  if (silence) {
    bound = 0;
    start = end = 0;
  }
  float* f = freq;
  const float* x = X + M * eBands[start];
  for (int i = 0; i < M * eBands[start]; ++i) *f++ = 0.f;
  for (int i = start; i < end; ++i) {
    int band_end = M * eBands[i + 1];
    float lg = bandLogE[i] + eMeans[i];
    if (lg > 32.f) lg = 32.f;
    float g = exp2f(lg);
    int j = M * eBands[i];
    do {
      *f++ = *x++ * g;
    } while (++j < band_end);
  }
  for (int i = bound; i < N; ++i) freq[i] = 0.f;
}

uint32_t celt_lcg_rand(uint32_t seed) { return 1664525u * seed + 1013904223u; }

}  // namespace iamf_opus
