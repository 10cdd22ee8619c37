// From-scratch SILK decoder (RFC 6716 §4.2), fixed-point arithmetic
// matching the reference libopus formulation so decode is bit-exact.
// Replaces the libopus LP layer the reference links through its prebuilt
// libopus.a (opus/opus_multistream2_decoder.c); only spec constant tables
// were extracted from that binary (silk_tables.cc). Inline constants whose
// provenance is the binary's disassembly are marked where they appear.

#include "silk.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>

#include "silk_tables.h"

namespace iamf_silk {

using iamf_opus::EntDec;

// ----------------------------------------------------------- fixed point
static inline int32_t SMULWB(int32_t a, int32_t b) {
  return (int32_t)(((int64_t)a * (int16_t)b) >> 16);
}
static inline int32_t SMLAWB(int32_t a, int32_t b, int32_t c) {
  return a + SMULWB(b, c);
}
static inline int32_t SMULWW(int32_t a, int32_t b) {
  return (int32_t)(((int64_t)a * b) >> 16);
}
static inline int32_t SMLAWW(int32_t a, int32_t b, int32_t c) {
  return a + SMULWW(b, c);
}
static inline int32_t SMULBB(int32_t a, int32_t b) {
  return (int32_t)(int16_t)a * (int16_t)b;
}
static inline int32_t SMLABB(int32_t a, int32_t b, int32_t c) {
  return a + SMULBB(b, c);
}
static inline int32_t SMMUL(int32_t a, int32_t b) {
  return (int32_t)(((int64_t)a * b) >> 32);
}
static inline int32_t RSHIFT_ROUND(int32_t a, int n) {
  return n == 1 ? (a >> 1) + (a & 1) : ((a >> (n - 1)) + 1) >> 1;
}
static inline int64_t RSHIFT_ROUND64(int64_t a, int n) {
  return n == 1 ? (a >> 1) + (a & 1) : ((a >> (n - 1)) + 1) >> 1;
}
static inline int32_t SAT16(int32_t a) {
  return a > 32767 ? 32767 : (a < -32768 ? -32768 : a);
}
static inline int32_t LIMIT(int32_t a, int32_t lo, int32_t hi) {
  return a < lo ? lo : (a > hi ? hi : a);
}
static inline int32_t silk_min(int32_t a, int32_t b) { return a < b ? a : b; }
static inline int32_t silk_max(int32_t a, int32_t b) { return a > b ? a : b; }
static inline int32_t silk_abs(int32_t a) { return a < 0 ? -a : a; }
static inline int CLZ32(int32_t x) {
  return x ? __builtin_clz((uint32_t)x) : 32;
}
static inline int32_t ADD_SAT32(int32_t a, int32_t b) {
  int64_t s = (int64_t)a + b;
  return s > INT32_MAX ? INT32_MAX : (s < INT32_MIN ? INT32_MIN : (int32_t)s);
}
static inline int32_t SUB_SAT32(int32_t a, int32_t b) {
  int64_t s = (int64_t)a - b;
  return s > INT32_MAX ? INT32_MAX : (s < INT32_MIN ? INT32_MIN : (int32_t)s);
}
static inline int16_t ADD_SAT16(int16_t a, int16_t b) {
  return (int16_t)SAT16((int32_t)a + b);
}
static inline int32_t LSHIFT_SAT32(int32_t a, int n) {
  int32_t lo = INT32_MIN >> n, hi = INT32_MAX >> n;
  return LIMIT(a, lo, hi) * (1 << n);
}
static inline int32_t ADD32_ovflw(int32_t a, int32_t b) {
  return (int32_t)((uint32_t)a + (uint32_t)b);
}
static inline int32_t MLA_ovflw(int32_t a, int32_t b, int32_t c) {
  return ADD32_ovflw(a, (int32_t)((uint32_t)b * (uint32_t)c));
}
static inline int32_t silk_RAND(int32_t seed) {
  return MLA_ovflw(907633515, seed, 196314165);
}
// a32 / b32 in Qres (silk/Inlines.h)
static inline int32_t DIV32_varQ(int32_t a32, int32_t b32, int Qres) {
  int a_headrm = CLZ32(silk_abs(a32)) - 1;
  int32_t a32_nrm = (int32_t)((uint32_t)a32 << a_headrm);
  int b_headrm = CLZ32(silk_abs(b32)) - 1;
  int32_t b32_nrm = (int32_t)((uint32_t)b32 << b_headrm);
  int32_t b32_inv = (INT32_MAX >> 2) / (int16_t)(b32_nrm >> 16);
  int32_t result = SMULWB(a32_nrm, b32_inv);
  // refine with the residual of the first approximation
  a32_nrm = (int32_t)((uint32_t)a32_nrm -
                      ((uint32_t)SMMUL(b32_nrm, result) << 3));
  result = SMLAWB(result, a32_nrm, b32_inv);
  int lshift = 29 + a_headrm - b_headrm - Qres;
  if (lshift < 0) return LSHIFT_SAT32(result, -lshift);
  return lshift < 32 ? result >> lshift : 0;
}
static inline int32_t INVERSE32_varQ(int32_t b32, int Qres) {
  int b_headrm = CLZ32(silk_abs(b32)) - 1;
  int32_t b32_nrm = b32 * (1u << b_headrm);
  int32_t b32_inv = (INT32_MAX >> 2) / (int16_t)(b32_nrm >> 16);
  int32_t result = (int32_t)((uint32_t)b32_inv << 16);
  int32_t err_Q32 = (int32_t)(((uint32_t)(1u << 29) -
                               (uint32_t)SMULWB(b32_nrm, b32_inv)) << 3);
  result = SMLAWW(result, err_Q32, b32_inv);
  int lshift = 61 - b_headrm - Qres;
  if (lshift <= 0) return LSHIFT_SAT32(result, -lshift);
  return lshift < 32 ? result >> lshift : 0;
}

// silk/log2lin.c
static int32_t silk_log2lin(int32_t inLog_Q7) {
  if (inLog_Q7 < 0) return 0;
  if (inLog_Q7 >= 3967) return INT32_MAX;
  int32_t out = 1 << (inLog_Q7 >> 7);
  int32_t frac_Q7 = inLog_Q7 & 0x7F;
  int32_t corr = SMLAWB(frac_Q7, SMULBB(frac_Q7, 128 - frac_Q7), -174);
  if (inLog_Q7 < 2048)
    out += (out * corr) >> 7;
  else
    out += (out >> 7) * corr;
  return out;
}

// ----------------------------------------------------- gains (gain_quant.c)
static constexpr int N_LEVELS_QGAIN = 64;
static constexpr int MIN_DELTA_GAIN_QUANT = -4;
static constexpr int MAX_DELTA_GAIN_QUANT = 36;
static constexpr int GAIN_OFFSET = (2 * 128) / 6 + 16 * 128;  // 2090
static constexpr int INV_SCALE_Q16 =
    (65536 * (((88 - 2) * 128) / 6)) / (N_LEVELS_QGAIN - 1);

static void gains_dequant(int32_t gain_Q16[], const int8_t ind[],
                          int8_t* prev_ind, int conditional, int nb_subfr) {
  for (int k = 0; k < nb_subfr; k++) {
    if (k == 0 && conditional == 0) {
      *prev_ind = (int8_t)silk_max(ind[k], *prev_ind - 16);
    } else {
      int ind_tmp = ind[k] + MIN_DELTA_GAIN_QUANT;
      int double_step = 2 * MAX_DELTA_GAIN_QUANT - N_LEVELS_QGAIN + *prev_ind;
      if (ind_tmp > double_step)
        *prev_ind = (int8_t)(*prev_ind + (ind_tmp << 1) - double_step);
      else
        *prev_ind = (int8_t)(*prev_ind + ind_tmp);
    }
    *prev_ind = (int8_t)LIMIT(*prev_ind, 0, N_LEVELS_QGAIN - 1);
    gain_Q16[k] = silk_log2lin(
        silk_min(SMULWB(INV_SCALE_Q16, *prev_ind) + GAIN_OFFSET, 3967));
  }
}

// ------------------------------------------------------------ NLSF layer
struct NlsfCb {
  int nVectors, order;
  int32_t quantStepSize_Q16, invQuantStepSize_Q6;
  const unsigned char* CB1_NLSF_Q8;
  const short* CB1_Wght_Q9;
  const unsigned char* CB1_iCDF;
  const unsigned char* pred_Q8;
  const unsigned char* ec_sel;
  const unsigned char* ec_iCDF;
  const short* deltaMin_Q15;
};

// SILK_FIX_CONST(0.18, 16) = 11796, (0.15, 16) = 9830;
// invQuantStepSize: (1/0.18, 6) = 355 (unused here), (1/0.15, 6) = 426
static const NlsfCb kNlsfCbNbMb = {
    32, 10, 11796, 355,
    silk_NLSF_CB1_NB_MB_Q8, silk_NLSF_CB1_Wght_Q9, silk_NLSF_CB1_iCDF_NB_MB,
    silk_NLSF_PRED_NB_MB_Q8, silk_NLSF_CB2_SELECT_NB_MB,
    silk_NLSF_CB2_iCDF_NB_MB, silk_NLSF_DELTA_MIN_NB_MB_Q15};
static const NlsfCb kNlsfCbWb = {
    32, 16, 9830, 426,
    silk_NLSF_CB1_WB_Q8, silk_NLSF_CB1_WB_Wght_Q9, silk_NLSF_CB1_iCDF_WB,
    silk_NLSF_PRED_WB_Q8, silk_NLSF_CB2_SELECT_WB, silk_NLSF_CB2_iCDF_WB,
    silk_NLSF_DELTA_MIN_WB_Q15};

static constexpr int NLSF_QUANT_MAX_AMPLITUDE = 4;

// silk/NLSF_unpack.c
static void nlsf_unpack(int16_t ec_ix[], uint8_t pred_Q8[], const NlsfCb& cb,
                        int CB1_index) {
  const unsigned char* ec_sel = cb.ec_sel + CB1_index * cb.order / 2;
  for (int i = 0; i < cb.order; i += 2) {
    int entry = *ec_sel++;
    ec_ix[i] = (int16_t)(((entry >> 1) & 7) *
                         (2 * NLSF_QUANT_MAX_AMPLITUDE + 1));
    pred_Q8[i] = cb.pred_Q8[i + (entry & 1) * (cb.order - 1)];
    ec_ix[i + 1] = (int16_t)(((entry >> 5) & 7) *
                             (2 * NLSF_QUANT_MAX_AMPLITUDE + 1));
    pred_Q8[i + 1] = cb.pred_Q8[i + ((entry >> 4) & 1) * (cb.order - 1) + 1];
  }
}

// silk/NLSF_stabilize.c
static void nlsf_stabilize(int16_t* NLSF_Q15, const short* NDeltaMin_Q15,
                           int L) {
  for (int loops = 0; loops < 20; loops++) {
    int32_t min_diff = NLSF_Q15[0] - NDeltaMin_Q15[0];
    int I = 0;
    for (int i = 1; i <= L - 1; i++) {
      int32_t diff = NLSF_Q15[i] - (NLSF_Q15[i - 1] + NDeltaMin_Q15[i]);
      if (diff < min_diff) {
        min_diff = diff;
        I = i;
      }
    }
    int32_t diff = (1 << 15) - (NLSF_Q15[L - 1] + NDeltaMin_Q15[L]);
    if (diff < min_diff) {
      min_diff = diff;
      I = L;
    }
    if (min_diff >= 0) return;
    if (I == 0) {
      NLSF_Q15[0] = (int16_t)NDeltaMin_Q15[0];
    } else if (I == L) {
      NLSF_Q15[L - 1] = (int16_t)((1 << 15) - NDeltaMin_Q15[L]);
    } else {
      int32_t min_center_Q15 = 0;
      for (int k = 0; k < I; k++) min_center_Q15 += NDeltaMin_Q15[k];
      min_center_Q15 += NDeltaMin_Q15[I] >> 1;
      int32_t max_center_Q15 = 1 << 15;
      for (int k = L; k > I; k--) max_center_Q15 -= NDeltaMin_Q15[k];
      max_center_Q15 -= NDeltaMin_Q15[I] >> 1;
      int32_t center =
          LIMIT(RSHIFT_ROUND(NLSF_Q15[I - 1] + NLSF_Q15[I], 1),
                min_center_Q15, max_center_Q15);
      NLSF_Q15[I - 1] = (int16_t)(center - (NDeltaMin_Q15[I] >> 1));
      NLSF_Q15[I] = (int16_t)(NLSF_Q15[I - 1] + NDeltaMin_Q15[I]);
    }
  }
  // fallback: sort and enforce margins
  for (int i = 1; i < L; i++) {  // insertion sort, increasing
    int16_t v = NLSF_Q15[i];
    int j = i - 1;
    while (j >= 0 && NLSF_Q15[j] > v) {
      NLSF_Q15[j + 1] = NLSF_Q15[j];
      j--;
    }
    NLSF_Q15[j + 1] = v;
  }
  NLSF_Q15[0] = (int16_t)silk_max(NLSF_Q15[0], NDeltaMin_Q15[0]);
  for (int i = 1; i < L; i++)
    NLSF_Q15[i] = (int16_t)silk_max(
        NLSF_Q15[i], ADD_SAT16(NLSF_Q15[i - 1], (int16_t)NDeltaMin_Q15[i]));
  NLSF_Q15[L - 1] =
      (int16_t)silk_min(NLSF_Q15[L - 1], (1 << 15) - NDeltaMin_Q15[L]);
  for (int i = L - 2; i >= 0; i--)
    NLSF_Q15[i] = (int16_t)silk_min(
        NLSF_Q15[i], NLSF_Q15[i + 1] - NDeltaMin_Q15[i + 1]);
}

// silk/NLSF_decode.c
static void nlsf_decode(int16_t* pNLSF_Q15, const int8_t* NLSFIndices,
                        const NlsfCb& cb) {
  int16_t ec_ix[MAX_LPC_ORDER];
  uint8_t pred_Q8[MAX_LPC_ORDER];
  int16_t res_Q10[MAX_LPC_ORDER];
  nlsf_unpack(ec_ix, pred_Q8, cb, NLSFIndices[0]);
  // residual dequant, backwards with prediction
  int32_t out_Q10 = 0;
  for (int i = cb.order - 1; i >= 0; i--) {
    int32_t pred_Q10 = SMULBB(out_Q10, (int16_t)pred_Q8[i]) >> 8;
    out_Q10 = (int32_t)NLSFIndices[i + 1] << 10;
    if (out_Q10 > 0)
      out_Q10 -= 102;  // SILK_FIX_CONST(0.1, 10)
    else if (out_Q10 < 0)
      out_Q10 += 102;
    out_Q10 = SMLAWB(pred_Q10, out_Q10, cb.quantStepSize_Q16);
    res_Q10[i] = (int16_t)out_Q10;
  }
  const unsigned char* cb1 = cb.CB1_NLSF_Q8 + NLSFIndices[0] * cb.order;
  const short* wght = cb.CB1_Wght_Q9 + NLSFIndices[0] * cb.order;
  for (int i = 0; i < cb.order; i++) {
    int32_t NLSF_Q15_tmp =
        ((int32_t)cb1[i] << 7) + ((int32_t)(res_Q10[i] * (1 << 14)) / wght[i]);
    pNLSF_Q15[i] = (int16_t)LIMIT(NLSF_Q15_tmp, 0, 32767);
  }
  nlsf_stabilize(pNLSF_Q15, cb.deltaMin_Q15, cb.order);
}

// silk/bwexpander_32.c / bwexpander.c
static void bwexpander_32(int32_t* ar, int d, int32_t chirp_Q16) {
  int32_t chirp_minus_one_Q16 = chirp_Q16 - 65536;
  for (int i = 0; i < d - 1; i++) {
    ar[i] = SMULWW(chirp_Q16, ar[i]);
    chirp_Q16 += (int32_t)RSHIFT_ROUND64(
        (int64_t)chirp_Q16 * chirp_minus_one_Q16, 16);
  }
  ar[d - 1] = SMULWW(chirp_Q16, ar[d - 1]);
}

static void bwexpander_16(int16_t* ar, int d, int32_t chirp_Q16) {
  int32_t chirp_minus_one_Q16 = chirp_Q16 - 65536;
  for (int i = 0; i < d - 1; i++) {
    ar[i] = (int16_t)RSHIFT_ROUND((int32_t)((int64_t)chirp_Q16 * ar[i]), 16);
    chirp_Q16 +=
        RSHIFT_ROUND((int32_t)((int64_t)chirp_Q16 * chirp_minus_one_Q16), 16);
  }
  ar[d - 1] =
      (int16_t)RSHIFT_ROUND((int32_t)((int64_t)chirp_Q16 * ar[d - 1]), 16);
}

// silk/LPC_inv_pred_gain.c (QA = 24): in-place symmetric pairwise
// Levinson-down with rounded fractional multiplies
static int32_t lpc_inverse_pred_gain(const int16_t* A_Q12, int order) {
  constexpr int QA = 24;
  constexpr int32_t A_LIMIT = 16773022;  // SILK_FIX_CONST(0.99975, 24)
  constexpr int32_t MIN_INV_GAIN_Q30 = 107374;  // 1/1e4 in Q30
  int32_t A_QA[MAX_LPC_ORDER];
  int32_t DC_resp = 0;
  for (int k = 0; k < order; k++) {
    DC_resp += A_Q12[k];
    A_QA[k] = (int32_t)A_Q12[k] << (QA - 12);
  }
  if (DC_resp >= 4096) return 0;
  int32_t invGain_Q30 = 1 << 30;
  for (int k = order - 1; k > 0; k--) {
    if (A_QA[k] > A_LIMIT || A_QA[k] < -A_LIMIT) return 0;
    int32_t rc_Q31 = -(int32_t)((uint32_t)A_QA[k] << (31 - QA));
    int32_t rc_mult1_Q30 = (1 << 30) - SMMUL(rc_Q31, rc_Q31);
    invGain_Q30 = (int32_t)((uint32_t)SMMUL(invGain_Q30, rc_mult1_Q30) << 2);
    if (invGain_Q30 < MIN_INV_GAIN_Q30) return 0;
    int mult2Q = 32 - CLZ32(silk_abs(rc_mult1_Q30));
    int32_t rc_mult2 = INVERSE32_varQ(rc_mult1_Q30, mult2Q + 30);
    for (int n = 0; n < (k + 1) >> 1; n++) {
      int32_t tmp1 = A_QA[n];
      int32_t tmp2 = A_QA[k - n - 1];
      int64_t tmp64 = RSHIFT_ROUND64(
          (int64_t)SUB_SAT32(tmp1, (int32_t)RSHIFT_ROUND64(
                                       (int64_t)tmp2 * rc_Q31, 31)) *
              rc_mult2,
          mult2Q);
      if (tmp64 > INT32_MAX || tmp64 < INT32_MIN) return 0;
      A_QA[n] = (int32_t)tmp64;
      tmp64 = RSHIFT_ROUND64(
          (int64_t)SUB_SAT32(tmp2, (int32_t)RSHIFT_ROUND64(
                                       (int64_t)tmp1 * rc_Q31, 31)) *
              rc_mult2,
          mult2Q);
      if (tmp64 > INT32_MAX || tmp64 < INT32_MIN) return 0;
      A_QA[k - n - 1] = (int32_t)tmp64;
    }
  }
  if (A_QA[0] > A_LIMIT || A_QA[0] < -A_LIMIT) return 0;
  int32_t rc_Q31 = -(int32_t)((uint32_t)A_QA[0] << (31 - QA));
  int32_t rc_mult1_Q30 = (1 << 30) - SMMUL(rc_Q31, rc_Q31);
  invGain_Q30 = (int32_t)((uint32_t)SMMUL(invGain_Q30, rc_mult1_Q30) << 2);
  if (invGain_Q30 < MIN_INV_GAIN_Q30) return 0;
  return invGain_Q30;
}

// silk/LPC_fit.c
static void lpc_fit(int16_t* a_QOUT, int32_t* a_QIN, int QOUT, int QIN,
                    int d) {
  int i;
  for (i = 0; i < 10; i++) {
    int32_t maxabs = 0;
    int idx = 0;
    for (int k = 0; k < d; k++) {
      int32_t absval = silk_abs(a_QIN[k]);
      if (absval > maxabs) {
        maxabs = absval;
        idx = k;
      }
    }
    maxabs = (maxabs + (1 << (QIN - QOUT - 1))) >> (QIN - QOUT);
    if (maxabs > 32767) {
      maxabs = silk_min(maxabs, 163838);
      int32_t chirp_Q16 =
          ((int32_t)(0.999 * 65536.0 + 0.5)) -
          ((int32_t)((maxabs - 32767) * (1 << 14)) /
           ((int32_t)((int64_t)maxabs * (idx + 1)) >> 2));
      bwexpander_32(a_QIN, d, chirp_Q16);
    } else {
      break;
    }
  }
  if (i == 10) {
    for (int k = 0; k < d; k++) {
      a_QOUT[k] = (int16_t)SAT16(RSHIFT_ROUND(a_QIN[k], QIN - QOUT));
      a_QIN[k] = (int32_t)a_QOUT[k] << (QIN - QOUT);
    }
  } else {
    for (int k = 0; k < d; k++)
      a_QOUT[k] = (int16_t)RSHIFT_ROUND(a_QIN[k], QIN - QOUT);
  }
}

// silk/NLSF2A.c (QA = 16)
static void nlsf2a_find_poly(int32_t* out, const int32_t* cLSF, int dd) {
  out[0] = 1 << 16;
  out[1] = -cLSF[0];
  for (int k = 1; k < dd; k++) {
    int32_t ftmp = cLSF[2 * k];
    out[k + 1] = (out[k - 1] * 2) -
                 (int32_t)RSHIFT_ROUND64((int64_t)ftmp * out[k], 16);
    for (int n = k; n > 1; n--)
      out[n] += out[n - 2] -
                (int32_t)RSHIFT_ROUND64((int64_t)ftmp * out[n - 1], 16);
    out[1] -= ftmp;
  }
}

static void nlsf2a(int16_t* a_Q12, const int16_t* NLSF, int d) {
  constexpr int QA = 16;
  const unsigned char* ordering =
      d == 16 ? silk_nlsf2a_ordering16 : silk_nlsf2a_ordering10;
  int32_t cos_LSF_QA[MAX_LPC_ORDER];
  for (int k = 0; k < d; k++) {
    int f_int = NLSF[k] >> (15 - 7);
    int f_frac = NLSF[k] - (f_int << (15 - 7));
    int32_t cos_val = silk_LSFCosTab_FIX_Q12[f_int];
    int32_t delta = silk_LSFCosTab_FIX_Q12[f_int + 1] - cos_val;
    cos_LSF_QA[ordering[k]] =
        RSHIFT_ROUND((cos_val * 256) + (delta * f_frac), 20 - QA);
  }
  int dd = d >> 1;
  int32_t P[MAX_LPC_ORDER / 2 + 1], Q[MAX_LPC_ORDER / 2 + 1];
  nlsf2a_find_poly(P, &cos_LSF_QA[0], dd);
  nlsf2a_find_poly(Q, &cos_LSF_QA[1], dd);
  int32_t a32_QA1[MAX_LPC_ORDER];
  for (int k = 0; k < dd; k++) {
    int32_t Ptmp = P[k + 1] + P[k];
    int32_t Qtmp = Q[k + 1] - Q[k];
    a32_QA1[k] = -Qtmp - Ptmp;
    a32_QA1[d - k - 1] = Qtmp - Ptmp;
  }
  lpc_fit(a_Q12, a32_QA1, 12, QA + 1, d);
  // stabilize with increasing bandwidth expansion on the Q17 coefficients
  for (int i = 0; lpc_inverse_pred_gain(a_Q12, d) < 107374 && i < 16; i++) {
    bwexpander_32(a32_QA1, d, 65536 - (2 << i));
    for (int k = 0; k < d; k++)
      a_Q12[k] = (int16_t)RSHIFT_ROUND(a32_QA1[k], QA + 1 - 12);
  }
}

// ------------------------------------------------------- pitch / LTP decode
static void decode_pitch(int lagIndex, int contourIndex, int pitch_lags[],
                         int Fs_kHz, int nb_subfr) {
  const signed char* Lag_CB_ptr;
  int cbk_size;
  if (Fs_kHz == 8) {
    if (nb_subfr == 4) {
      Lag_CB_ptr = silk_CB_lags_stage2;
      cbk_size = 11;
    } else {
      Lag_CB_ptr = silk_CB_lags_stage2_10_ms;
      cbk_size = 3;
    }
  } else {
    if (nb_subfr == 4) {
      Lag_CB_ptr = silk_CB_lags_stage3;
      cbk_size = 34;
    } else {
      Lag_CB_ptr = silk_CB_lags_stage3_10_ms;
      cbk_size = 12;
    }
  }
  int min_lag = 2 * Fs_kHz;
  int max_lag = 18 * Fs_kHz;
  int lag = min_lag + lagIndex;
  for (int k = 0; k < nb_subfr; k++) {
    pitch_lags[k] = lag + Lag_CB_ptr[k * cbk_size + contourIndex];
    pitch_lags[k] = LIMIT(pitch_lags[k], min_lag, max_lag);
  }
}

// ------------------------------------------------------- indices decoding
void SilkChannel::decode_indices(EntDec& ec, int frameIndex, int decode_LBRR,
                                 int condCoding) {
  int Ix;
  if (decode_LBRR || VAD_flags[frameIndex])
    Ix = ec.icdf(silk_type_offset_VAD_iCDF, 8) + 2;
  else
    Ix = ec.icdf(silk_type_offset_no_VAD_iCDF, 8);
  indices.signalType = (int8_t)(Ix >> 1);
  indices.quantOffsetType = (int8_t)(Ix & 1);

  if (condCoding == CODE_CONDITIONALLY) {
    indices.GainsIndices[0] = (int8_t)ec.icdf(silk_delta_gain_iCDF, 8);
  } else {
    indices.GainsIndices[0] =
        (int8_t)(ec.icdf(&silk_gain_iCDF[indices.signalType * 8], 8) << 3);
    indices.GainsIndices[0] =
        (int8_t)(indices.GainsIndices[0] + ec.icdf(silk_uniform8_iCDF, 8));
  }
  for (int i = 1; i < nb_subfr; i++)
    indices.GainsIndices[i] = (int8_t)ec.icdf(silk_delta_gain_iCDF, 8);

  const NlsfCb& cb = LPC_order == 16 ? kNlsfCbWb : kNlsfCbNbMb;
  indices.NLSFIndices[0] = (int8_t)ec.icdf(
      &cb.CB1_iCDF[(indices.signalType >> 1) * cb.nVectors], 8);
  int16_t ec_ix[MAX_LPC_ORDER];
  uint8_t pred_Q8[MAX_LPC_ORDER];
  nlsf_unpack(ec_ix, pred_Q8, cb, indices.NLSFIndices[0]);
  for (int i = 0; i < cb.order; i++) {
    Ix = ec.icdf(&cb.ec_iCDF[ec_ix[i]], 8);
    if (Ix == 0)
      Ix -= ec.icdf(silk_NLSF_EXT_iCDF, 8);
    else if (Ix == 2 * NLSF_QUANT_MAX_AMPLITUDE)
      Ix += ec.icdf(silk_NLSF_EXT_iCDF, 8);
    indices.NLSFIndices[i + 1] = (int8_t)(Ix - NLSF_QUANT_MAX_AMPLITUDE);
  }
  if (nb_subfr == MAX_NB_SUBFR)
    indices.NLSFInterpCoef_Q2 =
        (int8_t)ec.icdf(silk_NLSF_interpolation_factor_iCDF, 8);
  else
    indices.NLSFInterpCoef_Q2 = 4;

  if (indices.signalType == TYPE_VOICED) {
    int decoded = 0;
    if (condCoding == CODE_CONDITIONALLY &&
        ec_prevSignalType == TYPE_VOICED) {
      int delta_lagIndex = ec.icdf(silk_pitch_delta_iCDF, 8);
      if (delta_lagIndex > 0) {
        delta_lagIndex -= 9;
        indices.lagIndex = (int16_t)(ec_prevLagIndex + delta_lagIndex);
        decoded = 1;
      }
    }
    if (!decoded) {
      indices.lagIndex =
          (int16_t)(ec.icdf(silk_pitch_lag_iCDF, 8) * (fs_kHz >> 1));
      const unsigned char* uni;
      if (fs_kHz == 8)
        uni = silk_uniform4_iCDF;
      else if (fs_kHz == 12)
        uni = silk_uniform6_iCDF;
      else
        uni = silk_uniform8_iCDF;
      indices.lagIndex = (int16_t)(indices.lagIndex + ec.icdf(uni, 8));
    }
    ec_prevLagIndex = indices.lagIndex;

    const unsigned char* contour_icdf;
    if (nb_subfr == 2)  // 10 ms
      contour_icdf = fs_kHz == 8 ? silk_pitch_contour_10_ms_NB_iCDF
                                 : silk_pitch_contour_10_ms_iCDF;
    else
      contour_icdf = fs_kHz == 8 ? silk_pitch_contour_NB_iCDF
                                 : silk_pitch_contour_iCDF;
    indices.contourIndex = (int8_t)ec.icdf(contour_icdf, 8);

    indices.PERIndex = (int8_t)ec.icdf(silk_LTP_per_index_iCDF, 8);
    static const unsigned char* const ltp_icdfs[3] = {
        silk_LTP_gain_iCDF_0, silk_LTP_gain_iCDF_1, silk_LTP_gain_iCDF_2};
    for (int k = 0; k < nb_subfr; k++)
      indices.LTPIndex[k] = (int8_t)ec.icdf(ltp_icdfs[indices.PERIndex], 8);

    if (condCoding == CODE_INDEPENDENTLY)
      indices.LTP_scaleIndex = (int8_t)ec.icdf(silk_LTPscale_iCDF, 8);
    else
      indices.LTP_scaleIndex = 0;
  }
  ec_prevSignalType = indices.signalType;
  indices.Seed = (int8_t)ec.icdf(silk_uniform4_iCDF, 8);
}

// ------------------------------------------------ pulses (shell decoding)
static void shell_split(EntDec& ec, int16_t* child1, int16_t* child2, int p,
                        const unsigned char* shell_table) {
  if (p > 0) {
    child1[0] =
        (int16_t)ec.icdf(&shell_table[silk_shell_code_table_offsets[p]], 8);
    child2[0] = (int16_t)(p - child1[0]);
  } else {
    child1[0] = 0;
    child2[0] = 0;
  }
}

static void shell_decoder(int16_t* pulses0, EntDec& ec, int pulses4) {
  // depth-first split order (silk/shell_coder.c)
  int16_t pulses3[2], pulses2[4], pulses1[8];
  shell_split(ec, &pulses3[0], &pulses3[1], pulses4, silk_shell_code_table3);
  for (int i = 0; i < 2; i++) {
    shell_split(ec, &pulses2[2 * i], &pulses2[2 * i + 1], pulses3[i],
                silk_shell_code_table2);
    for (int j = 0; j < 2; j++) {
      int q = 2 * i + j;
      shell_split(ec, &pulses1[2 * q], &pulses1[2 * q + 1], pulses2[q],
                  silk_shell_code_table1);
      for (int m = 0; m < 2; m++) {
        int r = 2 * q + m;
        shell_split(ec, &pulses0[2 * r], &pulses0[2 * r + 1], pulses1[r],
                    silk_shell_code_table0);
      }
    }
  }
}

static constexpr int SILK_MAX_PULSES = 16;

static void decode_pulses(EntDec& ec, int16_t* pulses, int signalType,
                          int quantOffsetType, int frame_length) {
  int RateLevelIndex =
      ec.icdf(&silk_rate_levels_iCDF[(signalType >> 1) * 9], 8);
  int iter = frame_length >> 4;
  if (iter * 16 < frame_length) iter++;  // 12 kHz, 10 ms -> 120 samples

  int sum_pulses[30], nLshifts[30];
  const unsigned char* cdf_ptr =
      &silk_pulses_per_block_iCDF[RateLevelIndex * 18];
  for (int i = 0; i < iter; i++) {
    nLshifts[i] = 0;
    sum_pulses[i] = ec.icdf(cdf_ptr, 8);
    while (sum_pulses[i] == SILK_MAX_PULSES + 1) {
      nLshifts[i]++;
      sum_pulses[i] = ec.icdf(
          &silk_pulses_per_block_iCDF[9 * 18] + (nLshifts[i] == 10 ? 1 : 0),
          8);
    }
  }
  for (int i = 0; i < iter; i++) {
    if (sum_pulses[i] > 0)
      shell_decoder(&pulses[16 * i], ec, sum_pulses[i]);
    else
      memset(&pulses[16 * i], 0, 16 * sizeof(int16_t));
  }
  for (int i = 0; i < iter; i++) {
    if (nLshifts[i] > 0) {
      int nLS = nLshifts[i];
      for (int k = 0; k < 16; k++) {
        int abs_q = pulses[16 * i + k];
        for (int j = 0; j < nLS; j++) {
          abs_q = abs_q << 1;
          abs_q += ec.icdf(silk_lsb_iCDF, 8);
        }
        pulses[16 * i + k] = (int16_t)abs_q;
      }
      sum_pulses[i] |= nLS << 5;  // marks block as having pulses for signs
    }
  }
  // signs (silk/code_signs.c)
  const unsigned char* sign_base =
      &silk_sign_iCDF[7 * (quantOffsetType + (signalType << 1))];
  unsigned char icdf[2] = {0, 0};
  for (int i = 0; i < iter; i++) {
    if (sum_pulses[i] > 0) {
      icdf[0] = sign_base[silk_min(sum_pulses[i] & 0x1F, 6)];
      for (int j = 16 * i; j < 16 * i + 16; j++) {
        if (pulses[j] > 0) {
          if (ec.icdf(icdf, 8) == 0) pulses[j] = (int16_t)-pulses[j];
        }
      }
    }
  }
}

// -------------------------------------------------------------- core synth
// silk/LPC_analysis_filter.c (for LTP rewhitening)
static void lpc_analysis_filter(int16_t* out, const int16_t* in,
                                const int16_t* B, int len, int d) {
  for (int ix = d; ix < len; ix++) {
    const int16_t* in_ptr = &in[ix - 1];
    int32_t out32_Q12 = SMULBB(in_ptr[0], B[0]);
    for (int j = 1; j < d; j++)
      out32_Q12 = SMLABB(out32_Q12, in_ptr[-j], B[j]);
    out32_Q12 =
        (int32_t)((uint32_t)((int32_t)in_ptr[1] << 12) - (uint32_t)out32_Q12);
    out[ix] = (int16_t)SAT16(RSHIFT_ROUND(out32_Q12, 12));
  }
  memset(out, 0, d * sizeof(int16_t));
}

struct DecoderControl {
  int pitchL[MAX_NB_SUBFR];
  int32_t Gains_Q16[MAX_NB_SUBFR];
  int16_t PredCoef_Q12[2][MAX_LPC_ORDER];
  int16_t LTPCoef_Q14[LTP_ORDER * MAX_NB_SUBFR];
  int LTP_scale_Q14;
};

static constexpr int QUANT_LEVEL_ADJUST_Q10 = 80;

static void decode_core(SilkChannel& d, DecoderControl& ctrl, int16_t* xq,
                        const int16_t* pulses) {
  int32_t sLTP_Q15[2 * MAX_FRAME_LEN];
  int16_t sLTP[MAX_FRAME_LEN];
  int32_t res_Q14[MAX_SUBFR_LEN];
  int32_t sLPC_Q14[MAX_SUBFR_LEN + MAX_LPC_ORDER];

  int offset_Q10 =
      silk_Quantization_Offsets_Q10[(d.indices.signalType >> 1) * 2 +
                                    d.indices.quantOffsetType];
  int NLSF_interpolation_flag = d.indices.NLSFInterpCoef_Q2 < 4 ? 1 : 0;

  // excitation
  int32_t rand_seed = d.indices.Seed;
  for (int i = 0; i < d.frame_length; i++) {
    rand_seed = silk_RAND(rand_seed);
    int32_t e = (int32_t)pulses[i] << 14;
    if (e > 0)
      e -= QUANT_LEVEL_ADJUST_Q10 << 4;
    else if (e < 0)
      e += QUANT_LEVEL_ADJUST_Q10 << 4;
    e += offset_Q10 << 4;
    if (rand_seed < 0) e = -e;
    d.exc_Q14[i] = e;
    rand_seed = ADD32_ovflw(rand_seed, pulses[i]);
  }

  memcpy(sLPC_Q14, d.sLPC_Q14_buf, MAX_LPC_ORDER * sizeof(int32_t));
  const int32_t* pexc_Q14 = d.exc_Q14;
  int16_t* pxq = xq;
  int sLTP_buf_idx = d.ltp_mem_length;
  for (int k = 0; k < d.nb_subfr; k++) {
    int32_t* pres_Q14 = res_Q14;
    const int16_t* A_Q12 = ctrl.PredCoef_Q12[k >> 1];
    const int16_t* B_Q14 = &ctrl.LTPCoef_Q14[k * LTP_ORDER];
    int signalType = d.indices.signalType;
    int32_t Gain_Q10 = ctrl.Gains_Q16[k] >> 6;
    int32_t inv_gain_Q31 = INVERSE32_varQ(ctrl.Gains_Q16[k], 47);

    int32_t gain_adj_Q16 = 1 << 16;
    if (ctrl.Gains_Q16[k] != d.prev_gain_Q16) {
      gain_adj_Q16 = DIV32_varQ(d.prev_gain_Q16, ctrl.Gains_Q16[k], 16);
      for (int i = 0; i < MAX_LPC_ORDER; i++)
        sLPC_Q14[i] = SMULWW(gain_adj_Q16, sLPC_Q14[i]);
    }
    d.prev_gain_Q16 = ctrl.Gains_Q16[k];

    if (signalType == TYPE_VOICED) {
      int lag = ctrl.pitchL[k];
      if (k == 0 || (k == 2 && NLSF_interpolation_flag)) {
        // rewhiten the LTP state with the (new) LPC coefficients
        int start_idx = d.ltp_mem_length - lag - d.LPC_order - LTP_ORDER / 2;
        if (start_idx < 0) start_idx = 0;  // guard (cannot happen per spec)
        if (k == 2)
          memcpy(&d.outBuf[d.ltp_mem_length], xq,
                 2 * d.subfr_length * sizeof(int16_t));
        lpc_analysis_filter(&sLTP[start_idx],
                            &d.outBuf[start_idx + k * d.subfr_length], A_Q12,
                            d.ltp_mem_length - start_idx, d.LPC_order);
        if (k == 0)
          inv_gain_Q31 =
              SMULWB(inv_gain_Q31, ctrl.LTP_scale_Q14) * (1 << 2);
        for (int i = 0; i < lag + LTP_ORDER / 2; i++)
          sLTP_Q15[sLTP_buf_idx - i - 1] =
              SMULWB(inv_gain_Q31, sLTP[d.ltp_mem_length - i - 1]);
      } else {
        if (gain_adj_Q16 != 1 << 16) {
          for (int i = 0; i < lag + LTP_ORDER / 2; i++)
            sLTP_Q15[sLTP_buf_idx - i - 1] =
                SMULWW(gain_adj_Q16, sLTP_Q15[sLTP_buf_idx - i - 1]);
        }
      }
    }

    if (signalType == TYPE_VOICED) {
      int lag = ctrl.pitchL[k];
      const int32_t* pred_lag_ptr =
          &sLTP_Q15[sLTP_buf_idx - lag + LTP_ORDER / 2];
      for (int i = 0; i < d.subfr_length; i++) {
        int32_t LTP_pred_Q13 = 2;
        LTP_pred_Q13 = SMLAWB(LTP_pred_Q13, pred_lag_ptr[0], B_Q14[0]);
        LTP_pred_Q13 = SMLAWB(LTP_pred_Q13, pred_lag_ptr[-1], B_Q14[1]);
        LTP_pred_Q13 = SMLAWB(LTP_pred_Q13, pred_lag_ptr[-2], B_Q14[2]);
        LTP_pred_Q13 = SMLAWB(LTP_pred_Q13, pred_lag_ptr[-3], B_Q14[3]);
        LTP_pred_Q13 = SMLAWB(LTP_pred_Q13, pred_lag_ptr[-4], B_Q14[4]);
        pred_lag_ptr++;
        pres_Q14[i] = ADD32_ovflw(pexc_Q14[i],
                                  (int32_t)((uint32_t)LTP_pred_Q13 << 1));
        sLTP_Q15[sLTP_buf_idx] = (int32_t)((uint32_t)pres_Q14[i] << 1);
        sLTP_buf_idx++;
      }
    } else {
      pres_Q14 = const_cast<int32_t*>(pexc_Q14);
    }

    for (int i = 0; i < d.subfr_length; i++) {
      int32_t LPC_pred_Q10 = d.LPC_order >> 1;
      for (int j = 0; j < d.LPC_order; j++)
        LPC_pred_Q10 = SMLAWB(LPC_pred_Q10,
                              sLPC_Q14[MAX_LPC_ORDER + i - j - 1], A_Q12[j]);
      sLPC_Q14[MAX_LPC_ORDER + i] =
          ADD_SAT32(pres_Q14[i], LSHIFT_SAT32(LPC_pred_Q10, 4));
      pxq[i] = (int16_t)SAT16(
          RSHIFT_ROUND(SMULWW(sLPC_Q14[MAX_LPC_ORDER + i], Gain_Q10), 8));
    }
    memmove(sLPC_Q14, &sLPC_Q14[d.subfr_length],
            MAX_LPC_ORDER * sizeof(int32_t));
    pexc_Q14 += d.subfr_length;
    pxq += d.subfr_length;
  }
  memcpy(d.sLPC_Q14_buf, sLPC_Q14, MAX_LPC_ORDER * sizeof(int32_t));
}

// ----------------------------------------------------- parameters decoding
static void decode_parameters(SilkChannel& d, DecoderControl& ctrl,
                              int condCoding) {
  int16_t pNLSF_Q15[MAX_LPC_ORDER], pNLSF0_Q15[MAX_LPC_ORDER];
  gains_dequant(ctrl.Gains_Q16, d.indices.GainsIndices, &d.LastGainIndex,
                condCoding == CODE_CONDITIONALLY, d.nb_subfr);
  const NlsfCb& cb = d.LPC_order == 16 ? kNlsfCbWb : kNlsfCbNbMb;
  nlsf_decode(pNLSF_Q15, d.indices.NLSFIndices, cb);
  nlsf2a(ctrl.PredCoef_Q12[1], pNLSF_Q15, d.LPC_order);
  if (d.first_frame_after_reset) d.indices.NLSFInterpCoef_Q2 = 4;
  if (d.indices.NLSFInterpCoef_Q2 < 4) {
    for (int i = 0; i < d.LPC_order; i++)
      pNLSF0_Q15[i] = (int16_t)(d.prevNLSF_Q15[i] +
                                ((d.indices.NLSFInterpCoef_Q2 *
                                  (pNLSF_Q15[i] - d.prevNLSF_Q15[i])) >> 2));
    nlsf2a(ctrl.PredCoef_Q12[0], pNLSF0_Q15, d.LPC_order);
  } else {
    memcpy(ctrl.PredCoef_Q12[0], ctrl.PredCoef_Q12[1],
           d.LPC_order * sizeof(int16_t));
  }
  memcpy(d.prevNLSF_Q15, pNLSF_Q15, d.LPC_order * sizeof(int16_t));

  if (d.indices.signalType == TYPE_VOICED) {
    decode_pitch(d.indices.lagIndex, d.indices.contourIndex, ctrl.pitchL,
                 d.fs_kHz, d.nb_subfr);
    static const signed char* const cbk_ptrs[3] = {
        silk_LTP_gain_vq_0, silk_LTP_gain_vq_1, silk_LTP_gain_vq_2};
    const signed char* cbk_ptr_Q7 = cbk_ptrs[d.indices.PERIndex];
    for (int k = 0; k < d.nb_subfr; k++) {
      int Ix = d.indices.LTPIndex[k];
      for (int i = 0; i < LTP_ORDER; i++)
        ctrl.LTPCoef_Q14[k * LTP_ORDER + i] =
            (int16_t)((int32_t)cbk_ptr_Q7[Ix * LTP_ORDER + i] << 7);
    }
    if (condCoding == CODE_INDEPENDENTLY)
      ctrl.LTP_scale_Q14 = silk_LTPScales_table_Q14[d.indices.LTP_scaleIndex];
    else
      ctrl.LTP_scale_Q14 = 15565;
  } else {
    memset(ctrl.pitchL, 0, sizeof(ctrl.pitchL));
    memset(ctrl.LTPCoef_Q14, 0, sizeof(ctrl.LTPCoef_Q14));
    d.indices.PERIndex = 0;
    ctrl.LTP_scale_Q14 = 0;
  }
}

// ------------------------------------------------ packet loss concealment
// libopus silk/PLC.c semantics, fixed-point: LTP extrapolation of the last
// pitch cycle over a randomized excitation, LPC synthesis with
// bandwidth-expanded previous coefficients, per-frame attenuation; plus
// the energy-matched fade-in on recovery (silk_PLC_glue_frames). The
// reference's file player never loses packets (opus_multistream2_decoder.c
// feeds every packet); this matches the depth of the libopus binary it
// links.

static constexpr int NB_ATT = 2;
static const int16_t HARM_ATT_Q15[NB_ATT] = {32440, 31130};  // 0.99 0.95
static const int16_t PLC_RAND_AT_V_Q15[NB_ATT] = {31130, 26214};  // .95 .8
static const int16_t PLC_RAND_AT_UV_Q15[NB_ATT] = {32440, 29491};  // .99 .9
static constexpr int RAND_BUF_SIZE = 128;
static constexpr int RAND_BUF_MASK = RAND_BUF_SIZE - 1;
static constexpr int V_PITCH_GAIN_START_MIN_Q14 = 11469;  // 0.7
static constexpr int V_PITCH_GAIN_START_MAX_Q14 = 15565;  // 0.95
static constexpr int MAX_PITCH_LAG_MS = 18;
static constexpr int PITCH_DRIFT_FAC_Q16 = 655;  // 0.01

// silk/sum_sqr_shift.c: energy with a shift keeping 2 headroom bits
static void sum_sqr_shift(int32_t* energy, int* shift, const int16_t* x,
                          int len) {
  int shft = 31 - CLZ32(len);
  int32_t nrg = len;
  uint32_t nrg_tmp;
  int i;
  for (i = 0; i < len - 1; i += 2) {
    nrg_tmp = (uint32_t)SMULBB(x[i], x[i]);
    nrg_tmp = (uint32_t)((int32_t)nrg_tmp + SMULBB(x[i + 1], x[i + 1]));
    nrg = (int32_t)((uint32_t)nrg + (nrg_tmp >> shft));
  }
  if (i < len) {
    nrg_tmp = (uint32_t)SMULBB(x[i], x[i]);
    nrg = (int32_t)((uint32_t)nrg + (nrg_tmp >> shft));
  }
  shft = silk_max(0, shft + 3 - CLZ32(nrg));
  nrg = 0;
  for (i = 0; i < len - 1; i += 2) {
    nrg_tmp = (uint32_t)SMULBB(x[i], x[i]);
    nrg_tmp = (uint32_t)((int32_t)nrg_tmp + SMULBB(x[i + 1], x[i + 1]));
    nrg = (int32_t)((uint32_t)nrg + (nrg_tmp >> shft));
  }
  if (i < len) {
    nrg_tmp = (uint32_t)SMULBB(x[i], x[i]);
    nrg = (int32_t)((uint32_t)nrg + (nrg_tmp >> shft));
  }
  *shift = shft;
  *energy = nrg;
}

static inline uint32_t ROR32(uint32_t a, int rot) {
  if (rot == 0) return a;
  if (rot < 0) {
    int m = -rot;
    return (a << m) | (a >> (32 - m));
  }
  return (a << (32 - rot)) | (a >> rot);
}

// SigProc_FIX.h silk_SQRT_APPROX
static inline int32_t SQRT_APPROX(int32_t x) {
  if (x <= 0) return 0;
  int lz = CLZ32(x);
  int32_t frac_Q7 = (int32_t)(ROR32((uint32_t)x, 24 - lz) & 0x7f);
  int32_t y = (lz & 1) ? 32768 : 46214;  // 46214 = sqrt(2)*32768
  y >>= (lz >> 1);
  y = SMLAWB(y, y, SMULBB(213, frac_Q7));
  return y;
}

static void plc_reset(SilkChannel& d) {
  d.plc.pitchL_Q8 = (int32_t)d.frame_length << 7;
  d.plc.prevGain_Q16[0] = 1 << 16;
  d.plc.prevGain_Q16[1] = 1 << 16;
  d.plc.subfr_length = 20;
  d.plc.nb_subfr = 2;
}

// silk_PLC_update: save the LTP/LPC parameters of the last good frame
static void plc_update(SilkChannel& d, DecoderControl& ctrl) {
  SilkPlcState* p = &d.plc;
  int32_t LTP_Gain_Q14 = 0;
  if (d.indices.signalType == TYPE_VOICED) {
    // the last subframe containing a full pitch pulse
    for (int j = 0; j * d.subfr_length < ctrl.pitchL[d.nb_subfr - 1]; j++) {
      if (j == d.nb_subfr) break;
      int32_t temp = 0;
      for (int i = 0; i < LTP_ORDER; i++)
        temp += ctrl.LTPCoef_Q14[(d.nb_subfr - 1 - j) * LTP_ORDER + i];
      if (temp > LTP_Gain_Q14) {
        LTP_Gain_Q14 = temp;
        memcpy(p->LTPCoef_Q14,
               &ctrl.LTPCoef_Q14[(d.nb_subfr - 1 - j) * LTP_ORDER],
               LTP_ORDER * sizeof(int16_t));
        p->pitchL_Q8 = ctrl.pitchL[d.nb_subfr - 1 - j] << 8;
      }
    }
    memset(p->LTPCoef_Q14, 0, LTP_ORDER * sizeof(int16_t));
    p->LTPCoef_Q14[LTP_ORDER / 2] = (int16_t)LTP_Gain_Q14;
    // limit the LTP gain into [0.7, 0.95] at concealment start
    if (LTP_Gain_Q14 < V_PITCH_GAIN_START_MIN_Q14) {
      int32_t tmp = V_PITCH_GAIN_START_MIN_Q14 << 10;
      int32_t scale_Q10 = tmp / silk_max(LTP_Gain_Q14, 1);
      for (int i = 0; i < LTP_ORDER; i++)
        p->LTPCoef_Q14[i] =
            (int16_t)(SMULBB(p->LTPCoef_Q14[i], scale_Q10) >> 10);
    } else if (LTP_Gain_Q14 > V_PITCH_GAIN_START_MAX_Q14) {
      int32_t tmp = V_PITCH_GAIN_START_MAX_Q14 << 14;
      int32_t scale_Q14 = tmp / silk_max(LTP_Gain_Q14, 1);
      for (int i = 0; i < LTP_ORDER; i++)
        p->LTPCoef_Q14[i] =
            (int16_t)(SMULBB(p->LTPCoef_Q14[i], scale_Q14) >> 14);
    }
  } else {
    p->pitchL_Q8 = SMULBB(d.fs_kHz, 18) << 8;
    memset(p->LTPCoef_Q14, 0, LTP_ORDER * sizeof(int16_t));
  }
  memcpy(p->prevLPC_Q12, ctrl.PredCoef_Q12[1],
         d.LPC_order * sizeof(int16_t));
  p->prevLTP_scale_Q14 = (int16_t)ctrl.LTP_scale_Q14;
  memcpy(p->prevGain_Q16, &ctrl.Gains_Q16[d.nb_subfr - 2],
         2 * sizeof(int32_t));
  p->subfr_length = d.subfr_length;
  p->nb_subfr = d.nb_subfr;
}

// energies of the last two excitation subframes (scaled by their gains)
static void plc_energy(int32_t* e1, int* s1, int32_t* e2, int* s2,
                       const int32_t* exc_Q14, const int32_t* prevGain_Q10,
                       int subfr_length, int nb_subfr) {
  int16_t exc_buf[2 * MAX_SUBFR_LEN];
  int16_t* ptr = exc_buf;
  for (int k = 0; k < 2; k++) {
    for (int i = 0; i < subfr_length; i++)
      ptr[i] = (int16_t)SAT16(
          SMULWW(exc_Q14[i + (k + nb_subfr - 2) * subfr_length],
                 prevGain_Q10[k]) >> 8);
    ptr += subfr_length;
  }
  sum_sqr_shift(e1, s1, exc_buf, subfr_length);
  sum_sqr_shift(e2, s2, &exc_buf[subfr_length], subfr_length);
}

// silk_PLC_conceal: extrapolate one frame into `frame` (internal rate)
// and roll the decoder history forward as if it had been decoded
void SilkChannel::conceal_frame(int16_t* frame) {
  SilkChannel& d = *this;
  SilkPlcState* p = &d.plc;
  if (d.fs_kHz != p->fs_kHz) {
    plc_reset(d);
    p->fs_kHz = d.fs_kHz;
  }
  int32_t sLTP_Q14[LTP_MEM_LEN + MAX_FRAME_LEN];
  int16_t sLTP[LTP_MEM_LEN];
  int16_t A_Q12[MAX_LPC_ORDER];

  int32_t prevGain_Q10[2] = {p->prevGain_Q16[0] >> 6,
                             p->prevGain_Q16[1] >> 6};
  if (d.first_frame_after_reset)
    memset(p->prevLPC_Q12, 0, sizeof(p->prevLPC_Q12));
  int32_t energy1, energy2;
  int shift1, shift2;
  plc_energy(&energy1, &shift1, &energy2, &shift2, d.exc_Q14, prevGain_Q10,
             d.subfr_length, d.nb_subfr);
  // source the random excitation from the quieter of the two subframes
  const int32_t* rand_ptr;
  if ((energy1 >> shift2) < (energy2 >> shift1)) {
    rand_ptr = &d.exc_Q14[silk_max(
        0, (p->nb_subfr - 1) * p->subfr_length - RAND_BUF_SIZE)];
  } else {
    rand_ptr = &d.exc_Q14[silk_max(
        0, p->nb_subfr * p->subfr_length - RAND_BUF_SIZE)];
  }
  int16_t* B_Q14 = p->LTPCoef_Q14;
  int16_t rand_scale_Q14 = p->randScale_Q14;

  int32_t harm_Gain_Q15 = HARM_ATT_Q15[silk_min(NB_ATT - 1, d.lossCnt)];
  int32_t rand_Gain_Q15 =
      d.prevSignalType == TYPE_VOICED
          ? PLC_RAND_AT_V_Q15[silk_min(NB_ATT - 1, d.lossCnt)]
          : PLC_RAND_AT_UV_Q15[silk_min(NB_ATT - 1, d.lossCnt)];

  bwexpander_16(p->prevLPC_Q12, d.LPC_order, 64881);  // BWE 0.99 in Q16
  memcpy(A_Q12, p->prevLPC_Q12, d.LPC_order * sizeof(int16_t));

  if (d.lossCnt == 0) {
    rand_scale_Q14 = 1 << 14;
    if (d.prevSignalType == TYPE_VOICED) {
      // voiced: noise level = what the LTP doesn't predict
      for (int i = 0; i < LTP_ORDER; i++) rand_scale_Q14 -= B_Q14[i];
      rand_scale_Q14 = (int16_t)silk_max(3277, rand_scale_Q14);  // 0.2
      rand_scale_Q14 =
          (int16_t)(SMULBB(rand_scale_Q14, p->prevLTP_scale_Q14) >> 14);
    } else {
      // unvoiced: back off the noise for high-LPC-gain frames
      int32_t invGain_Q30 =
          lpc_inverse_pred_gain(p->prevLPC_Q12, d.LPC_order);
      int32_t down_scale_Q30 = silk_min((int32_t)1 << (30 - 3), invGain_Q30);
      down_scale_Q30 = silk_max((int32_t)1 << (30 - 8), down_scale_Q30);
      down_scale_Q30 = (int32_t)((uint32_t)down_scale_Q30 << 3);
      rand_Gain_Q15 = SMULWB(down_scale_Q30, rand_Gain_Q15) >> 14;
    }
  }

  int32_t rand_seed = p->rand_seed;
  int lag = RSHIFT_ROUND(p->pitchL_Q8, 8);
  int sLTP_buf_idx = d.ltp_mem_length;

  // rewhiten the LTP state with the expanded LPC
  int idx = d.ltp_mem_length - lag - d.LPC_order - LTP_ORDER / 2;
  if (idx < 0) idx = 0;  // cannot happen for legal lag per spec
  lpc_analysis_filter(&sLTP[idx], &d.outBuf[idx], A_Q12,
                      d.ltp_mem_length - idx, d.LPC_order);
  int32_t inv_gain_Q30 = INVERSE32_varQ(p->prevGain_Q16[1], 46);
  inv_gain_Q30 = silk_min(inv_gain_Q30, INT32_MAX >> 1);
  for (int i = idx + d.LPC_order; i < d.ltp_mem_length; i++)
    sLTP_Q14[i] = SMULWB(inv_gain_Q30, sLTP[i]);

  // LTP synthesis: periodic extrapolation with decaying gains
  for (int k = 0; k < d.nb_subfr; k++) {
    const int32_t* pred_lag_ptr =
        &sLTP_Q14[sLTP_buf_idx - lag + LTP_ORDER / 2];
    for (int i = 0; i < d.subfr_length; i++) {
      int32_t LTP_pred_Q12 = 2;
      LTP_pred_Q12 = SMLAWB(LTP_pred_Q12, pred_lag_ptr[0], B_Q14[0]);
      LTP_pred_Q12 = SMLAWB(LTP_pred_Q12, pred_lag_ptr[-1], B_Q14[1]);
      LTP_pred_Q12 = SMLAWB(LTP_pred_Q12, pred_lag_ptr[-2], B_Q14[2]);
      LTP_pred_Q12 = SMLAWB(LTP_pred_Q12, pred_lag_ptr[-3], B_Q14[3]);
      LTP_pred_Q12 = SMLAWB(LTP_pred_Q12, pred_lag_ptr[-4], B_Q14[4]);
      pred_lag_ptr++;
      rand_seed = silk_RAND(rand_seed);
      int ridx = (rand_seed >> 25) & RAND_BUF_MASK;
      sLTP_Q14[sLTP_buf_idx] = (int32_t)(
          (uint32_t)SMLAWB(LTP_pred_Q12, rand_ptr[ridx], rand_scale_Q14)
          << 2);
      sLTP_buf_idx++;
    }
    // decay the harmonic and noise parts each subframe
    for (int j = 0; j < LTP_ORDER; j++)
      B_Q14[j] = (int16_t)(SMULBB(harm_Gain_Q15, B_Q14[j]) >> 15);
    rand_scale_Q14 = (int16_t)(SMULBB(rand_scale_Q14, rand_Gain_Q15) >> 15);
    // drift the pitch 1%/subframe toward longer periods
    p->pitchL_Q8 = SMLAWB(p->pitchL_Q8, p->pitchL_Q8, PITCH_DRIFT_FAC_Q16);
    p->pitchL_Q8 = silk_min(p->pitchL_Q8,
                            SMULBB(MAX_PITCH_LAG_MS, d.fs_kHz) << 8);
    lag = RSHIFT_ROUND(p->pitchL_Q8, 8);
  }

  // LPC synthesis over the extrapolated excitation
  int32_t* sLPC_Q14_ptr = &sLTP_Q14[d.ltp_mem_length - MAX_LPC_ORDER];
  memcpy(sLPC_Q14_ptr, d.sLPC_Q14_buf, MAX_LPC_ORDER * sizeof(int32_t));
  for (int i = 0; i < d.frame_length; i++) {
    int32_t LPC_pred_Q10 = d.LPC_order >> 1;
    for (int j = 0; j < d.LPC_order; j++)
      LPC_pred_Q10 = SMLAWB(LPC_pred_Q10,
                            sLPC_Q14_ptr[MAX_LPC_ORDER + i - j - 1],
                            A_Q12[j]);
    sLPC_Q14_ptr[MAX_LPC_ORDER + i] = ADD_SAT32(
        sLPC_Q14_ptr[MAX_LPC_ORDER + i], LSHIFT_SAT32(LPC_pred_Q10, 4));
    frame[i] = (int16_t)SAT16(RSHIFT_ROUND(
        SMULWW(sLPC_Q14_ptr[MAX_LPC_ORDER + i], prevGain_Q10[1]), 8));
  }
  memcpy(d.sLPC_Q14_buf, &sLPC_Q14_ptr[d.frame_length],
         MAX_LPC_ORDER * sizeof(int32_t));

  p->rand_seed = rand_seed;
  p->randScale_Q14 = rand_scale_Q14;
  d.indices.signalType = d.prevSignalType;
  d.lagPrev = lag;
  // roll the output history forward (decode_frame's tail)
  int mv_len = d.ltp_mem_length - d.frame_length;
  if (mv_len > 0)
    memmove(d.outBuf, &d.outBuf[d.frame_length], mv_len * sizeof(int16_t));
  memcpy(&d.outBuf[mv_len < 0 ? 0 : mv_len], frame,
         d.frame_length * sizeof(int16_t));
  d.lossCnt++;
}

// silk_PLC_glue_frames
void SilkChannel::plc_glue(int16_t* frame, int length) {
  SilkPlcState* p = &plc;
  if (lossCnt) {
    sum_sqr_shift(&p->conc_energy, &p->conc_energy_shift, frame, length);
    p->last_frame_lost = 1;
  } else {
    if (p->last_frame_lost) {
      int32_t energy;
      int energy_shift;
      sum_sqr_shift(&energy, &energy_shift, frame, length);
      if (energy_shift > p->conc_energy_shift)
        p->conc_energy >>= (energy_shift - p->conc_energy_shift);
      else if (energy_shift < p->conc_energy_shift)
        energy >>= (p->conc_energy_shift - energy_shift);
      // fade in the energy difference so the first good frame doesn't jump
      if (energy > p->conc_energy) {
        int LZ = CLZ32(p->conc_energy) - 1;
        p->conc_energy = (int32_t)((uint32_t)p->conc_energy << LZ);
        energy >>= silk_max(24 - LZ, 0);
        int32_t frac_Q24 = p->conc_energy / silk_max(energy, 1);
        int32_t gain_Q16 = (int32_t)((uint32_t)SQRT_APPROX(frac_Q24) << 4);
        int32_t slope_Q16 = (((int32_t)1 << 16) - gain_Q16) / length;
        // 4x steeper slope to avoid missing onsets after DTX
        slope_Q16 = (int32_t)((uint32_t)slope_Q16 << 2);
        for (int i = 0; i < length; i++) {
          frame[i] = (int16_t)SMULWB(gain_Q16, frame[i]);
          gain_Q16 += slope_Q16;
          if (gain_Q16 > (int32_t)1 << 16) break;
        }
      }
    }
    p->last_frame_lost = 0;
  }
}

// --------------------------------------------------------------- channel
void SilkChannel::set_fs(int fs_khz) {
  nb_subfr = nFramesPerPacket == 0 ? MAX_NB_SUBFR : nb_subfr;
  if (fs_kHz != fs_khz) {
    fs_kHz = fs_khz;
    subfr_length = 5 * fs_khz;
    ltp_mem_length = 20 * fs_khz;
    LPC_order = fs_khz == 16 ? 16 : 10;  // NB and MB: 10, WB: 16
    memset(prevNLSF_Q15, 0, sizeof(prevNLSF_Q15));
    memset(outBuf, 0, sizeof(outBuf));
    memset(sLPC_Q14_buf, 0, sizeof(sLPC_Q14_buf));
    lagPrev = 100;
    LastGainIndex = 10;
    prevSignalType = TYPE_NO_VAD;
    prev_gain_Q16 = 65536;
    first_frame_after_reset = 1;
    ec_prevSignalType = 0;
    ec_prevLagIndex = 0;
    resampler.init(fs_khz * 1000, 48000);
  }
  frame_length = 20 * fs_khz * (nb_subfr == 2 ? 1 : 2) / 2;
}

void SilkChannel::decode_frame(EntDec& ec, int16_t* out, int condCoding) {
  DecoderControl ctrl;
  int16_t pulses[(MAX_FRAME_LEN + 16 - 1) & ~(16 - 1)];
  decode_indices(ec, nFramesDecoded, 0, condCoding);
  decode_pulses(ec, pulses, indices.signalType, indices.quantOffsetType,
                frame_length);
  decode_parameters(*this, ctrl, condCoding);
#ifdef IAMF_SILK_DEBUG
  fprintf(stderr,
          "frame type=%d qoff=%d gains=[%d %d %d %d] interp=%d seed=%d "
          "lags=[%d %d %d %d] ltpscale=%d per=%d cond=%d\n",
          indices.signalType, indices.quantOffsetType, ctrl.Gains_Q16[0],
          ctrl.Gains_Q16[1], ctrl.Gains_Q16[2], ctrl.Gains_Q16[3],
          indices.NLSFInterpCoef_Q2, indices.Seed, ctrl.pitchL[0],
          ctrl.pitchL[1], ctrl.pitchL[2], ctrl.pitchL[3],
          ctrl.LTP_scale_Q14, indices.PERIndex, condCoding);
#endif
  decode_core(*this, ctrl, out, pulses);
  // PLC bookkeeping (silk_PLC with lost=0): save this frame's LTP/LPC
  // parameters so a following lost packet can extrapolate from them
  if (fs_kHz != plc.fs_kHz) {
    plc_reset(*this);
    plc.fs_kHz = fs_kHz;
  }
  plc_update(*this, ctrl);
  lossCnt = 0;
  // update output buffer for LTP rewhitening in next frames
  int mv_len = ltp_mem_length - frame_length;
  if (mv_len > 0)
    memmove(outBuf, &outBuf[frame_length], mv_len * sizeof(int16_t));
  memcpy(&outBuf[mv_len < 0 ? 0 : mv_len], out,
         frame_length * sizeof(int16_t));
  lagPrev = ctrl.pitchL[nb_subfr - 1];
  prevSignalType = indices.signalType;
  first_frame_after_reset = 0;
}

// ------------------------------------------------------------- resampler
void ResamplerState::init(int Fs_Hz_in, int Fs_Hz_out) {
  // delay_matrix_dec (resampler.c .rodata, recovered from disassembly)
  static const signed char delay_matrix_dec[3][5] = {
      {4, 0, 2, 0, 0}, {0, 9, 4, 7, 4}, {0, 3, 12, 7, 7}};
  auto rate_id = [](int r) {
    return ((((r >> 12) - (r > 16000)) >> (r > 24000)) - 1);
  };
  memset(sIIR, 0, sizeof(sIIR));
  memset(sFIR, 0, sizeof(sFIR));
  memset(delayBuf, 0, sizeof(delayBuf));
  inputDelay = delay_matrix_dec[rate_id(Fs_Hz_in)][rate_id(Fs_Hz_out)];
  Fs_in_kHz = Fs_Hz_in / 1000;
  Fs_out_kHz = Fs_Hz_out / 1000;
  batchSize = Fs_in_kHz * 10;
  // decoder path is always a fractional upsample (8/12/16 -> 48)
  invRatio_Q16 = ((Fs_Hz_in << 15) / Fs_Hz_out) << 2;
  while (SMULWW(invRatio_Q16, Fs_Hz_out) < (Fs_Hz_in << 1)) invRatio_Q16++;
}

// silk/resampler_private_up2_HQ.c: coefficients recovered from disassembly
static void up2_hq(int32_t* S, int16_t* out, const int16_t* in, int len) {
  for (int k = 0; k < len; k++) {
    int32_t in32 = (int32_t)in[k] << 10;
    int32_t Y = in32 - S[0];
    int32_t X = SMULWB(Y, silk_resampler_up2_hq_0[0]);
    int32_t out32_1 = S[0] + X;
    S[0] = in32 + X;
    Y = out32_1 - S[1];
    X = SMULWB(Y, silk_resampler_up2_hq_0[1]);
    int32_t out32_2 = S[1] + X;
    S[1] = out32_1 + X;
    Y = out32_2 - S[2];
    X = SMLAWB(Y, Y, silk_resampler_up2_hq_0[2]);
    int32_t out32 = S[2] + X;
    S[2] = out32_2 + X;
    out[2 * k] = (int16_t)SAT16(RSHIFT_ROUND(out32, 10));

    Y = in32 - S[3];
    X = SMULWB(Y, silk_resampler_up2_hq_1[0]);
    out32_1 = S[3] + X;
    S[3] = in32 + X;
    Y = out32_1 - S[4];
    X = SMULWB(Y, silk_resampler_up2_hq_1[1]);
    out32_2 = S[4] + X;
    S[4] = out32_1 + X;
    Y = out32_2 - S[5];
    X = SMLAWB(Y, Y, silk_resampler_up2_hq_1[2]);
    out32 = S[5] + X;
    S[5] = out32_2 + X;
    out[2 * k + 1] = (int16_t)SAT16(RSHIFT_ROUND(out32, 10));
  }
}

// silk/resampler_private_IIR_FIR.c
static int16_t* iir_fir_interpol(int16_t* out, const int16_t* buf,
                                 int32_t max_index_Q16,
                                 int32_t index_increment_Q16) {
  for (int32_t index_Q16 = 0; index_Q16 < max_index_Q16;
       index_Q16 += index_increment_Q16) {
    int table_index = SMULWB(index_Q16 & 0xFFFF, 12);
    const int16_t* buf_ptr = &buf[index_Q16 >> 16];
    int32_t res_Q15 =
        SMULBB(buf_ptr[0], silk_resampler_frac_FIR_12[table_index * 4]);
    res_Q15 = SMLABB(res_Q15, buf_ptr[1],
                     silk_resampler_frac_FIR_12[table_index * 4 + 1]);
    res_Q15 = SMLABB(res_Q15, buf_ptr[2],
                     silk_resampler_frac_FIR_12[table_index * 4 + 2]);
    res_Q15 = SMLABB(res_Q15, buf_ptr[3],
                     silk_resampler_frac_FIR_12[table_index * 4 + 3]);
    res_Q15 = SMLABB(res_Q15, buf_ptr[4],
                     silk_resampler_frac_FIR_12[(11 - table_index) * 4 + 3]);
    res_Q15 = SMLABB(res_Q15, buf_ptr[5],
                     silk_resampler_frac_FIR_12[(11 - table_index) * 4 + 2]);
    res_Q15 = SMLABB(res_Q15, buf_ptr[6],
                     silk_resampler_frac_FIR_12[(11 - table_index) * 4 + 1]);
    res_Q15 = SMLABB(res_Q15, buf_ptr[7],
                     silk_resampler_frac_FIR_12[(11 - table_index) * 4]);
    *out++ = (int16_t)SAT16(RSHIFT_ROUND(res_Q15, 15));
  }
  return out;
}

static void iir_fir(ResamplerState& S, int16_t* out, const int16_t* in,
                    int inLen) {
  constexpr int ORDER_FIR = 8;
  int16_t buf[2 * 10 * MAX_FS_KHZ + ORDER_FIR];
  memcpy(buf, S.sFIR, ORDER_FIR * sizeof(int16_t));
  int32_t index_increment_Q16 = S.invRatio_Q16;
  int nSamplesIn = 0;
  for (;;) {
    nSamplesIn = silk_min(inLen, S.batchSize);
    up2_hq(S.sIIR, &buf[ORDER_FIR], in, nSamplesIn);
    int32_t max_index_Q16 = (int32_t)nSamplesIn << 17;
    out = iir_fir_interpol(out, buf, max_index_Q16, index_increment_Q16);
    in += nSamplesIn;
    inLen -= nSamplesIn;
    if (inLen > 0)
      memcpy(buf, &buf[nSamplesIn << 1], ORDER_FIR * sizeof(int16_t));
    else
      break;
  }
  memcpy(S.sFIR, &buf[nSamplesIn << 1], ORDER_FIR * sizeof(int16_t));
}

void ResamplerState::process(int16_t* out, const int16_t* in, int inLen) {
  // silk/resampler.c: 1 ms delay-buffer prefix, then the remainder
  int nSamples = Fs_in_kHz - inputDelay;
  memcpy(&delayBuf[inputDelay], in, nSamples * sizeof(int16_t));
  iir_fir(*this, out, delayBuf, Fs_in_kHz);
  iir_fir(*this, out + Fs_out_kHz, in + nSamples, inLen - Fs_in_kHz);
  memcpy(delayBuf, &in[inLen - inputDelay], inputDelay * sizeof(int16_t));
}

// ----------------------------------------------------------------- stereo
// silk/stereo_decode_pred.c
static void stereo_decode_pred(EntDec& ec, int32_t pred_Q13[2]) {
  int ix[2][3];
  int n = ec.icdf(silk_stereo_pred_joint_iCDF, 8);
  ix[0][2] = n / 5;
  ix[1][2] = n - 5 * ix[0][2];
  for (int i = 0; i < 2; i++) {
    ix[i][0] = ec.icdf(silk_uniform3_iCDF, 8);
    ix[i][1] = ec.icdf(silk_uniform5_iCDF, 8);
  }
  for (int i = 0; i < 2; i++) {
    ix[i][0] += 3 * ix[i][2];
    int32_t low_Q13 = silk_stereo_pred_quant_Q13[ix[i][0]];
    int32_t step_Q13 =
        SMULWB(silk_stereo_pred_quant_Q13[ix[i][0] + 1] - low_Q13,
               6554);  // SILK_FIX_CONST(0.5/5, 16)
    pred_Q13[i] = SMLABB(low_Q13, step_Q13, 2 * ix[i][1] + 1);
  }
  pred_Q13[0] -= pred_Q13[1];
}

// silk/stereo_MS_to_LR.c
static void stereo_ms_to_lr(SilkDecoder& st, int16_t* x1, int16_t* x2,
                            const int32_t pred_Q13[2], int fs_kHz,
                            int frame_length) {
  memcpy(x1, st.sMid, 2 * sizeof(int16_t));
  memcpy(x2, st.sSide, 2 * sizeof(int16_t));
  memcpy(st.sMid, &x1[frame_length], 2 * sizeof(int16_t));
  memcpy(st.sSide, &x2[frame_length], 2 * sizeof(int16_t));

  int32_t pred0_Q13 = st.stereo_pred_prev_Q13[0];
  int32_t pred1_Q13 = st.stereo_pred_prev_Q13[1];
  int32_t denom_Q16 = (1 << 16) / (8 * fs_kHz);
  int32_t delta0_Q13 =
      RSHIFT_ROUND(SMULBB(pred_Q13[0] - st.stereo_pred_prev_Q13[0],
                          denom_Q16), 16);
  int32_t delta1_Q13 =
      RSHIFT_ROUND(SMULBB(pred_Q13[1] - st.stereo_pred_prev_Q13[1],
                          denom_Q16), 16);
  for (int n = 0; n < 8 * fs_kHz; n++) {
    pred0_Q13 += delta0_Q13;
    pred1_Q13 += delta1_Q13;
    int32_t sum =
        (int32_t)((uint32_t)((x1[n] + x1[n + 2]) + ((int32_t)x1[n + 1] << 1))
                  << 9);
    sum = SMLAWB((int32_t)((uint32_t)x2[n + 1] << 8), sum, pred0_Q13);
    sum = SMLAWB(sum, (int32_t)((uint32_t)x1[n + 1] << 11), pred1_Q13);
    x2[n + 1] = (int16_t)SAT16(RSHIFT_ROUND(sum, 8));
  }
  pred0_Q13 = pred_Q13[0];
  pred1_Q13 = pred_Q13[1];
  for (int n = 8 * fs_kHz; n < frame_length; n++) {
    int32_t sum =
        (int32_t)((uint32_t)((x1[n] + x1[n + 2]) + ((int32_t)x1[n + 1] << 1))
                  << 9);
    sum = SMLAWB((int32_t)((uint32_t)x2[n + 1] << 8), sum, pred0_Q13);
    sum = SMLAWB(sum, (int32_t)((uint32_t)x1[n + 1] << 11), pred1_Q13);
    x2[n + 1] = (int16_t)SAT16(RSHIFT_ROUND(sum, 8));
  }
  st.stereo_pred_prev_Q13[0] = (int16_t)pred_Q13[0];
  st.stereo_pred_prev_Q13[1] = (int16_t)pred_Q13[1];

  for (int n = 0; n < frame_length; n++) {
    int32_t sum = x1[n + 1] + (int32_t)x2[n + 1];
    int32_t diff = x1[n + 1] - (int32_t)x2[n + 1];
    x1[n + 1] = (int16_t)SAT16(sum);
    x2[n + 1] = (int16_t)SAT16(diff);
  }
}

// ------------------------------------------------------------ top level
void SilkDecoder::reset() {
  for (int c = 0; c < 2; c++) {
    ch[c] = SilkChannel();
  }
  stereo_pred_prev_Q13[0] = stereo_pred_prev_Q13[1] = 0;
  sMid[0] = sMid[1] = 0;
  sSide[0] = sSide[1] = 0;
  prev_decode_only_middle = 0;
  nChannelsInternal = 1;
}

int SilkDecoder::decode(EntDec& ec, int fs_kHz, int nChannelsIntern,
                        int nChannelsOut, int frame_ms, int newPacketFlag,
                        int16_t* out48) {
  // frame_ms is the full opus-frame duration (10..60); 40/60 ms packets
  // carry 2/3 20 ms SILK frames, all decoded by this call.
  int nb_subfr = frame_ms == 10 ? 2 : 4;
  int nFramesPerPacket = frame_ms <= 20 ? 1 : frame_ms / 20;
  if (nChannelsIntern > nChannelsInternal) {
    // new side channel: reset its state
    ch[1] = SilkChannel();
  }
  nChannelsInternal = nChannelsIntern;
  for (int n = 0; n < nChannelsIntern; n++) {
    ch[n].nb_subfr = nb_subfr;
    ch[n].nFramesPerPacket = nFramesPerPacket;
    ch[n].set_fs(fs_kHz);
    ch[n].frame_length = (frame_ms == 10 ? 10 : 20) * fs_kHz;
  }
  int frame_length = ch[0].frame_length;

  if (newPacketFlag) {
    for (int n = 0; n < nChannelsIntern; n++) ch[n].nFramesDecoded = 0;
    // VAD + LBRR flags
    for (int n = 0; n < nChannelsIntern; n++) {
      for (int i = 0; i < nFramesPerPacket; i++)
        ch[n].VAD_flags[i] = ec.bit_logp(1);
      ch[n].LBRR_flag = ec.bit_logp(1);
      ch[n].LBRR_flags[0] = ch[n].LBRR_flags[1] = ch[n].LBRR_flags[2] = 0;
    }
    for (int n = 0; n < nChannelsIntern; n++) {
      if (ch[n].LBRR_flag) {
        if (nFramesPerPacket == 1) {
          ch[n].LBRR_flags[0] = 1;
        } else {
          int sym = ec.icdf(nFramesPerPacket == 2 ? silk_LBRR_flags_2_iCDF
                                                  : silk_LBRR_flags_3_iCDF,
                            8) + 1;
          for (int i = 0; i < nFramesPerPacket; i++)
            ch[n].LBRR_flags[i] = (sym >> i) & 1;
        }
      }
    }
    // parse (and discard) LBRR frames so the range decoder stays in sync
    for (int i = 0; i < nFramesPerPacket; i++) {
      for (int n = 0; n < nChannelsIntern; n++) {
        if (!ch[n].LBRR_flags[i]) continue;
        int16_t pulses[(MAX_FRAME_LEN + 15) & ~15];
        if (nChannelsIntern == 2 && n == 0) {
          int32_t trash_pred[2];
          stereo_decode_pred(ec, trash_pred);
          if (ch[1].LBRR_flags[i] == 0) {
            (void)ec.icdf(silk_stereo_only_code_mid_iCDF, 8);
          }
        }
        int condCoding = (i > 0 && ch[n].LBRR_flags[i - 1])
                             ? CODE_CONDITIONALLY
                             : CODE_INDEPENDENTLY;
        ch[n].decode_indices(ec, i, 1, condCoding);
        decode_pulses(ec, pulses, ch[n].indices.signalType,
                      ch[n].indices.quantOffsetType, ch[n].frame_length);
      }
    }
  }

  // regular frames
  int out_total = 0;
  for (int fi = 0; fi < nFramesPerPacket; fi++) {
  int32_t MS_pred_Q13[2] = {0, 0};
  int decode_only_middle = 0;
  int nFramesDecoded = ch[0].nFramesDecoded;
  if (nChannelsIntern == 2) {
    stereo_decode_pred(ec, MS_pred_Q13);
    if (ch[1].VAD_flags[nFramesDecoded] == 0 &&
        ch[1].LBRR_flags[nFramesDecoded] == 0) {
      decode_only_middle = ec.icdf(silk_stereo_only_code_mid_iCDF, 8);
    }
    if (decode_only_middle == 0 && prev_decode_only_middle == 1) {
      memset(ch[1].outBuf, 0, sizeof(ch[1].outBuf));
      memset(ch[1].sLPC_Q14_buf, 0, sizeof(ch[1].sLPC_Q14_buf));
      ch[1].lagPrev = 100;
      ch[1].LastGainIndex = 10;
      ch[1].prevSignalType = TYPE_NO_VAD;
      ch[1].first_frame_after_reset = 1;
    }
  }

  // decoded at internal rate, with 2-sample history prefix for stereo/delay
  int16_t samplesOut1[2][2 + MAX_FRAME_LEN];
  for (int n = 0; n < nChannelsIntern; n++) {
    if (n == 0 || !decode_only_middle) {
      int condCoding;
      if (nFramesDecoded == 0)
        condCoding = CODE_INDEPENDENTLY;
      else
        condCoding = CODE_CONDITIONALLY;
      ch[n].decode_frame(ec, &samplesOut1[n][2], condCoding);
    } else {
      memset(&samplesOut1[n][2], 0, frame_length * sizeof(int16_t));
    }
    ch[n].nFramesDecoded++;
  }

  // PLC glue: energy-matched fade-in on the first good frame after a loss
  // run (no-op when no packets were lost); on the mid/side domain signal,
  // before the stereo unmix (dec_API.c call order)
  for (int n = 0; n < nChannelsIntern; n++)
    ch[n].plc_glue(&samplesOut1[n][2], frame_length);

  if (nChannelsIntern == 2) {
    stereo_ms_to_lr(*this, samplesOut1[0], samplesOut1[1], MS_pred_Q13,
                    fs_kHz, frame_length);
  } else {
    memcpy(samplesOut1[0], sMid, 2 * sizeof(int16_t));
    memcpy(sMid, &samplesOut1[0][frame_length], 2 * sizeof(int16_t));
  }
  prev_decode_only_middle = decode_only_middle;

  // resample each channel to 48 kHz (1-sample-delayed view)
  int out_len = frame_length * 48 / fs_kHz;
  int16_t resamp_out[2][MAX_FRAME_LEN * 6];
  int nOut = nChannelsIntern < nChannelsOut ? nChannelsIntern : nChannelsOut;
  for (int n = 0; n < nOut; n++)
    ch[n].resampler.process(resamp_out[n], &samplesOut1[n][1], frame_length);
  // interleave to the API channel count
  int16_t* dst = out48 + out_total * nChannelsOut;
  if (nChannelsOut == 2 && nChannelsIntern == 1) {
    for (int i = 0; i < out_len; i++) {
      dst[2 * i] = resamp_out[0][i];
      dst[2 * i + 1] = resamp_out[0][i];
    }
  } else if (nChannelsOut == 2) {
    for (int i = 0; i < out_len; i++) {
      dst[2 * i] = resamp_out[0][i];
      dst[2 * i + 1] = resamp_out[1][i];
    }
  } else {
    // mono out; if internal stereo, mid/left only (matches libopus when
    // API channels < internal: it averages — not used by IAMF wrapping)
    memcpy(dst, resamp_out[0], out_len * sizeof(int16_t));
  }
  out_total += out_len;
  }  // for fi
  return out_total;
}

int SilkDecoder::conceal(int nChannelsOut, int frame_ms, int16_t* out48) {
  // silk_Decode with lostFlag=FLAG_PACKET_LOST: conceal per 20 ms (or one
  // 10 ms) frame, stereo unmix with the PREVIOUS prediction weights (no
  // side info arrives on loss), then the normal resample/interleave tail.
  int nFrames = frame_ms <= 20 ? 1 : frame_ms / 20;
  int frame_length = ch[0].frame_length;
  int fs_kHz = ch[0].fs_kHz;
  if (frame_length <= 0 || fs_kHz <= 0) return -1;  // nothing decoded yet
  int out_total = 0;
  for (int fi = 0; fi < nFrames; fi++) {
    int16_t samplesOut1[2][2 + MAX_FRAME_LEN];
    // the side channel is concealed only when the previous frame actually
    // carried side coding; a mid-only stream's side stays silent and its
    // state untouched (dec_API.c has_side on the lost path)
    int has_side = !prev_decode_only_middle;
    for (int n = 0; n < nChannelsInternal; n++) {
      if (n == 0 || has_side) {
        ch[n].conceal_frame(&samplesOut1[n][2]);
        ch[n].plc_glue(&samplesOut1[n][2], frame_length);
      } else {
        memset(&samplesOut1[n][2], 0, frame_length * sizeof(int16_t));
      }
    }
    int32_t MS_pred_Q13[2] = {stereo_pred_prev_Q13[0],
                              stereo_pred_prev_Q13[1]};
    if (nChannelsInternal == 2) {
      stereo_ms_to_lr(*this, samplesOut1[0], samplesOut1[1], MS_pred_Q13,
                      fs_kHz, frame_length);
    } else {
      memcpy(samplesOut1[0], sMid, 2 * sizeof(int16_t));
      memcpy(sMid, &samplesOut1[0][frame_length], 2 * sizeof(int16_t));
    }
    int out_len = frame_length * 48 / fs_kHz;
    int16_t resamp_out[2][MAX_FRAME_LEN * 6];
    int nOut =
        nChannelsInternal < nChannelsOut ? nChannelsInternal : nChannelsOut;
    for (int n = 0; n < nOut; n++)
      ch[n].resampler.process(resamp_out[n], &samplesOut1[n][1],
                              frame_length);
    int16_t* dst = out48 + out_total * nChannelsOut;
    if (nChannelsOut == 2 && nChannelsInternal == 1) {
      for (int i = 0; i < out_len; i++) {
        dst[2 * i] = resamp_out[0][i];
        dst[2 * i + 1] = resamp_out[0][i];
      }
    } else if (nChannelsOut == 2) {
      for (int i = 0; i < out_len; i++) {
        dst[2 * i] = resamp_out[0][i];
        dst[2 * i + 1] = resamp_out[1][i];
      }
    } else {
      memcpy(dst, resamp_out[0], out_len * sizeof(int16_t));
    }
    out_total += out_len;
  }
  return out_total;
}

}  // namespace iamf_silk

// ---- stage-test exports (fuzzed against libopus internals in tests) ----
extern "C" {
int32_t iamf_silk_log2lin(int32_t x) { return iamf_silk::silk_log2lin(x); }
void iamf_silk_gains_dequant(int32_t* gains, const int8_t* ind,
                             int8_t* prev_ind, int conditional,
                             int nb_subfr) {
  iamf_silk::gains_dequant(gains, ind, prev_ind, conditional, nb_subfr);
}
void iamf_silk_nlsf_decode(int16_t* nlsf, const int8_t* indices, int wb) {
  iamf_silk::nlsf_decode(nlsf, indices,
                         wb ? iamf_silk::kNlsfCbWb : iamf_silk::kNlsfCbNbMb);
}
void iamf_silk_nlsf2a(int16_t* a_Q12, const int16_t* nlsf, int d) {
  iamf_silk::nlsf2a(a_Q12, nlsf, d);
}
void* iamf_silk_resampler_create(int fs_in, int fs_out) {
  auto* r = new iamf_silk::ResamplerState();
  r->init(fs_in, fs_out);
  return r;
}
void iamf_silk_resampler_process(void* h, int16_t* out, const int16_t* in,
                                 int n) {
  ((iamf_silk::ResamplerState*)h)->process(out, in, n);
}
void iamf_silk_resampler_destroy(void* h) {
  delete (iamf_silk::ResamplerState*)h;
}
void iamf_silk_decode_pitch(int lagIndex, int contourIndex, int* pitch_lags,
                            int fs_khz, int nb_subfr) {
  iamf_silk::decode_pitch(lagIndex, contourIndex, pitch_lags, fs_khz,
                          nb_subfr);
}
// Decode one SILK-only packet at the internal rate (no resampling): test
// hook isolating the LP core from the rate converter. Returns samples at
// fs_khz per channel (mono only).
void* iamf_silk_test_create() { return new iamf_silk::SilkDecoder(); }
void iamf_silk_test_destroy(void* h) { delete (iamf_silk::SilkDecoder*)h; }
int iamf_silk_test_decode(void* h, const unsigned char* data, int len,
                          int fs_khz, int frame_ms, int16_t* out) {
  auto* d = (iamf_silk::SilkDecoder*)h;
  iamf_opus::EntDec ec;
  ec.init(data + 1, (uint32_t)(len - 1));  // skip TOC (code-0 packet)
  d->ch[0].nb_subfr = frame_ms == 10 ? 2 : 4;
  d->ch[0].nFramesPerPacket = frame_ms <= 20 ? 1 : frame_ms / 20;
  d->ch[0].set_fs(fs_khz);
  d->ch[0].frame_length = (frame_ms == 10 ? 10 : 20) * fs_khz;
  d->nChannelsInternal = 1;
  int n20 = frame_ms <= 20 ? 1 : frame_ms / 20;
  int sub_ms = frame_ms <= 20 ? frame_ms : 20;
  int total = 0;
  for (int k = 0; k < n20; k++) {
    if (k == 0) {
      d->ch[0].nFramesDecoded = 0;
      for (int i = 0; i < d->ch[0].nFramesPerPacket; i++)
        d->ch[0].VAD_flags[i] = ec.bit_logp(1);
      d->ch[0].LBRR_flag = ec.bit_logp(1);
      // (assumes no LBRR in test content)
    }
    int cond = d->ch[0].nFramesDecoded == 0 ? iamf_silk::CODE_INDEPENDENTLY
                                            : iamf_silk::CODE_CONDITIONALLY;
    d->ch[0].decode_frame(ec, out + total, cond);
    d->ch[0].nFramesDecoded++;
    total += d->ch[0].frame_length;
    (void)sub_ms;
  }
  return ec.error ? -1 : total;
}
}
