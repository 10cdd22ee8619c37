// CELT packet-loss concealment (RFC 6716 §4.3.5 "Packet Loss Concealment",
// libopus celt_decode_lost semantics): for fresh losses, a pitch-based
// extrapolator — pitch search over the decode history, order-24 LPC
// analysis, excitation-domain periodic extrapolation with energy decay,
// and simulated TDAC so the next real frame's MDCT overlap blends cleanly;
// for long losses (>=100 ms) or band-restricted streams, noise filling
// from the tracked background band energies (comfort noise).
//
// The reference decoder itself never invokes loss paths (its file player
// feeds every packet, opus_multistream2_decoder.c:125-165); this matches
// the depth of the libopus library the reference links against. Float
// arithmetic throughout (the reference links the float libopus build).

#include <cmath>
#include <cstring>

#include "celt.h"
#include "celt_tables.h"

namespace iamf_opus {

namespace {

constexpr int CELT_LPC_ORDER = 24;
constexpr int MAX_PERIOD = 1024;
constexpr int PLC_PITCH_LAG_MAX = 720;
constexpr int PLC_PITCH_LAG_MIN = 100;

inline int imin(int a, int b) { return a < b ? a : b; }
inline int imax(int a, int b) { return a > b ? a : b; }

// xcorr[i] = <x, y+i> for i in [0, max_pitch)
void pitch_xcorr(const float* x, const float* y, float* xcorr, int len,
                 int max_pitch) {
  for (int i = 0; i < max_pitch; ++i) {
    float sum = 0;
    for (int j = 0; j < len; ++j) sum += x[j] * y[i + j];
    xcorr[i] = sum;
  }
}

// autocorrelation with optional symmetric lag window (celt_lpc.c
// _celt_autocorr, float build)
void celt_autocorr(const float* x, float* ac, const float* window,
                   int overlap, int lag, int n) {
  float xx[DECODE_BUFFER_SIZE];
  const float* xptr = x;
  if (overlap) {
    memcpy(xx, x, n * sizeof(float));
    for (int i = 0; i < overlap; ++i) {
      xx[i] = x[i] * window[i];
      xx[n - i - 1] = x[n - i - 1] * window[i];
    }
    xptr = xx;
  }
  int fastN = n - lag;
  pitch_xcorr(xptr, xptr, ac, fastN, lag + 1);
  for (int k = 0; k <= lag; ++k) {
    float d = 0;
    for (int i = k + fastN; i < n; ++i) d += xptr[i] * xptr[i - k];
    ac[k] += d;
  }
}

// Levinson-Durbin (celt_lpc.c _celt_lpc, float build)
void celt_lpc(float* lpc, const float* ac, int p) {
  float error = ac[0];
  for (int i = 0; i < p; ++i) lpc[i] = 0;
  if (ac[0] != 0) {
    for (int i = 0; i < p; ++i) {
      float rr = 0;
      for (int j = 0; j < i; ++j) rr += lpc[j] * ac[i - j];
      rr += ac[i + 1];
      float r = -rr / error;
      lpc[i] = r;
      for (int j = 0; j < (i + 1) >> 1; ++j) {
        float tmp1 = lpc[j];
        float tmp2 = lpc[i - 1 - j];
        lpc[j] = tmp1 + r * tmp2;
        lpc[i - 1 - j] = tmp2 + r * tmp1;
      }
      error = error - r * r * error;
      if (error < .001f * ac[0]) break;  // bail at 30 dB prediction gain
    }
  }
}

// analysis filter: y[i] = x[i] + sum_j num[j] * x[i-j-1]
void celt_fir(const float* x, const float* num, float* y, int N, int ord) {
  for (int i = 0; i < N; ++i) {
    float sum = x[i];
    for (int j = 0; j < ord; ++j) sum += num[j] * x[i - j - 1];
    y[i] = sum;
  }
}

// synthesis filter with explicit memory: y[i] = x[i] - sum_j den[j]*mem[j]
void celt_iir(const float* x, const float* den, float* y, int N, int ord,
              float* mem) {
  for (int i = 0; i < N; ++i) {
    float sum = x[i];
    for (int j = 0; j < ord; ++j) sum -= den[j] * mem[j];
    for (int j = ord - 1; j >= 1; --j) mem[j] = mem[j - 1];
    mem[0] = sum;
    y[i] = sum;
  }
}

// 5-tap in-place FIR used by pitch_downsample (pitch.c celt_fir5)
void celt_fir5(float* x, const float* num, int N) {
  float m0 = 0, m1 = 0, m2 = 0, m3 = 0, m4 = 0;
  for (int i = 0; i < N; ++i) {
    float sum = x[i] + num[0] * m0 + num[1] * m1 + num[2] * m2 +
                num[3] * m3 + num[4] * m4;
    m4 = m3;
    m3 = m2;
    m2 = m1;
    m1 = m0;
    m0 = x[i];
    x[i] = sum;
  }
}

// 2x downsample + downmix + 4th-order whitening with an added zero
// (pitch.c pitch_downsample, float build)
void pitch_downsample(float* const x[2], float* x_lp, int len, int C) {
  float ac[5];
  float lpc[4], lpc2[5];
  const float c1 = .8f;
  for (int i = 1; i < len >> 1; ++i)
    x_lp[i] = .25f * (.5f * (x[0][2 * i - 1] + x[0][2 * i + 1]) + x[0][2 * i]);
  x_lp[0] = .25f * (.5f * x[0][1] + x[0][0]);
  if (C == 2) {
    for (int i = 1; i < len >> 1; ++i)
      x_lp[i] +=
          .25f * (.5f * (x[1][2 * i - 1] + x[1][2 * i + 1]) + x[1][2 * i]);
    x_lp[0] += .25f * (.5f * x[1][1] + x[1][0]);
  }
  celt_autocorr(x_lp, ac, nullptr, 0, 4, len >> 1);
  ac[0] *= 1.0001f;  // -40 dB noise floor
  for (int i = 1; i <= 4; ++i)
    ac[i] -= ac[i] * (.008f * i) * (.008f * i);  // lag windowing
  celt_lpc(lpc, ac, 4);
  float tmp = 1.f;
  for (int i = 0; i < 4; ++i) {
    tmp = .9f * tmp;
    lpc[i] = lpc[i] * tmp;
  }
  lpc2[0] = lpc[0] + .8f;
  lpc2[1] = lpc[1] + c1 * lpc[0];
  lpc2[2] = lpc[2] + c1 * lpc[1];
  lpc2[3] = lpc[3] + c1 * lpc[2];
  lpc2[4] = c1 * lpc[3];
  celt_fir5(x_lp, lpc2, len >> 1);
}

// normalized-correlation argmax with a two-candidate shortlist
// (pitch.c find_best_pitch, float build)
void find_best_pitch(const float* xcorr, const float* y, int len,
                     int max_pitch, int* best_pitch) {
  float Syy = 1;
  float best_num[2] = {-1, -1};
  float best_den[2] = {0, 0};
  best_pitch[0] = 0;
  best_pitch[1] = 1;
  for (int j = 0; j < len; ++j) Syy += y[j] * y[j];
  for (int i = 0; i < max_pitch; ++i) {
    if (xcorr[i] > 0) {
      float xcorr16 = xcorr[i] * 1e-12f;  // avoid overflow when squaring
      float num = xcorr16 * xcorr16;
      if (num * best_den[1] > best_num[1] * Syy) {
        if (num * best_den[0] > best_num[0] * Syy) {
          best_num[1] = best_num[0];
          best_den[1] = best_den[0];
          best_pitch[1] = best_pitch[0];
          best_num[0] = num;
          best_den[0] = Syy;
          best_pitch[0] = i;
        } else {
          best_num[1] = num;
          best_den[1] = Syy;
          best_pitch[1] = i;
        }
      }
    }
    Syy += y[i + len] * y[i + len] - y[i] * y[i];
    Syy = fmaxf(1.f, Syy);
  }
}

// coarse (4x) then fine (2x) decimated search + pseudo-interpolation
// (pitch.c pitch_search, float build)
void pitch_search(const float* x_lp, const float* y, int len, int max_pitch,
                  int* pitch) {
  int lag = len + max_pitch;
  float x_lp4[DECODE_BUFFER_SIZE / 4];
  float y_lp4[DECODE_BUFFER_SIZE / 4 + PLC_PITCH_LAG_MAX / 4];
  float xcorr[PLC_PITCH_LAG_MAX / 2];
  for (int j = 0; j < len >> 2; ++j) x_lp4[j] = x_lp[2 * j];
  for (int j = 0; j < lag >> 2; ++j) y_lp4[j] = y[2 * j];
  int best_pitch[2] = {0, 0};
  pitch_xcorr(x_lp4, y_lp4, xcorr, len >> 2, max_pitch >> 2);
  find_best_pitch(xcorr, y_lp4, len >> 2, max_pitch >> 2, best_pitch);
  for (int i = 0; i < max_pitch >> 1; ++i) {
    xcorr[i] = 0;
    if (abs(i - 2 * best_pitch[0]) > 2 && abs(i - 2 * best_pitch[1]) > 2)
      continue;
    float sum = 0;
    for (int j = 0; j < len >> 1; ++j) sum += x_lp[j] * y[i + j];
    xcorr[i] = fmaxf(-1.f, sum);
  }
  find_best_pitch(xcorr, y, len >> 1, max_pitch >> 1, best_pitch);
  int offset = 0;
  if (best_pitch[0] > 0 && best_pitch[0] < (max_pitch >> 1) - 1) {
    float a = xcorr[best_pitch[0] - 1];
    float b = xcorr[best_pitch[0]];
    float c = xcorr[best_pitch[0] + 1];
    if (c - a > .7f * (b - a))
      offset = 1;
    else if (a - c > .7f * (b - c))
      offset = -1;
  }
  *pitch = 2 * best_pitch[0] - offset;
}

int celt_plc_pitch_search(float* const decode_mem[2], int C) {
  float lp_pitch_buf[DECODE_BUFFER_SIZE >> 1];
  int pitch_index = 0;
  pitch_downsample(decode_mem, lp_pitch_buf, DECODE_BUFFER_SIZE, C);
  pitch_search(lp_pitch_buf + (PLC_PITCH_LAG_MAX >> 1), lp_pitch_buf,
               DECODE_BUFFER_SIZE - PLC_PITCH_LAG_MAX,
               PLC_PITCH_LAG_MAX - PLC_PITCH_LAG_MIN, &pitch_index);
  return PLC_PITCH_LAG_MAX - pitch_index;
}

}  // namespace

// Conceal one lost CELT frame into the decode history (the float analogue
// of libopus celt_decode_lost); the caller runs de-emphasis afterwards.
void celt_decode_lost(CeltDecoder* st, int N, int LM) {
  const int C = st->channels;
  const short* eBands = mode_eBands();
  const int overlap = OVERLAP;
  float* decode_mem[2];
  for (int c = 0; c < C; ++c) decode_mem[c] = st->decode_mem[c];

  int loss_duration = st->loss_duration;
  int start = st->start_band;
  // noise/CNG after 100 ms of loss, and always for band-restricted
  // (hybrid) streams whose history lacks the low band
  int noise_based = loss_duration >= 40 || start != 0;
  if (noise_based) {
    int end = st->end_band;
    int effEnd = imax(start, imin(end, NB_EBANDS));
    int M = 1 << LM;
    float* oldBandE = st->oldEBands;
    // energy decay: 1.5 dB on the first noise frame, 0.5 dB after,
    // floored at the tracked background (DTX comfort-noise) level
    float decay = loss_duration == 0 ? 1.5f : .5f;
    for (int c = 0; c < C; ++c)
      for (int i = start; i < end; ++i)
        oldBandE[c * NB_EBANDS + i] =
            fmaxf(st->backgroundLogE[c * NB_EBANDS + i],
                  oldBandE[c * NB_EBANDS + i] - decay);
    uint32_t seed = st->rng;
    float X[2][960];
    for (int c = 0; c < C; ++c) {
      memset(X[c], 0, sizeof(X[c]));
      for (int i = start; i < effEnd; ++i) {
        int boffs = eBands[i] << LM;
        int blen = (eBands[i + 1] - eBands[i]) << LM;
        for (int j = 0; j < blen; ++j) {
          seed = celt_lcg_rand(seed);
          X[c][boffs + j] = (float)((int32_t)seed >> 20);
        }
        renormalise_vector(X[c] + boffs, blen, 1.f);
      }
    }
    st->rng = seed;
    for (int c = 0; c < C; ++c) {
      memmove(decode_mem[c], decode_mem[c] + N,
              (DECODE_BUFFER_SIZE - N + (overlap >> 1)) * sizeof(float));
      float freq[960];
      denormalise_bands(X[c], freq, oldBandE + c * NB_EBANDS, start, effEnd,
                        M, 0);
      clt_mdct_backward(freq, decode_mem[c] + DECODE_BUFFER_SIZE - N, 2 * N,
                        1, window120, overlap);
    }
  } else {
    // ---- pitch-based PLC ----
    int pitch_index;
    float fade = 1.f;
    if (loss_duration == 0) {
      st->last_pitch_index = pitch_index = celt_plc_pitch_search(decode_mem, C);
    } else {
      pitch_index = st->last_pitch_index;
      fade = .8f;
    }
    // excitation window: two pitch periods (capped at the history size) to
    // estimate whether the signal was already decaying
    int exc_length = imin(2 * pitch_index, MAX_PERIOD);

    float _exc[MAX_PERIOD + CELT_LPC_ORDER];
    float fir_tmp[MAX_PERIOD];
    float* exc = _exc + CELT_LPC_ORDER;
    const float* window = window120;
    for (int c = 0; c < C; ++c) {
      float* buf = decode_mem[c];
      for (int i = 0; i < MAX_PERIOD + CELT_LPC_ORDER; ++i)
        exc[i - CELT_LPC_ORDER] =
            buf[DECODE_BUFFER_SIZE - MAX_PERIOD - CELT_LPC_ORDER + i];

      if (loss_duration == 0) {
        // LPC over the last MAX_PERIOD pre-loss samples, so extrapolation
        // runs in the excitation-filter domain
        float ac[CELT_LPC_ORDER + 1];
        celt_autocorr(exc, ac, window, overlap, CELT_LPC_ORDER, MAX_PERIOD);
        ac[0] *= 1.0001f;  // -40 dB noise floor
        for (int i = 1; i <= CELT_LPC_ORDER; ++i)
          ac[i] -= ac[i] * (.008f * .008f) * i * i;  // lag window
        celt_lpc(st->lpc_mem[c], ac, CELT_LPC_ORDER);
      }
      const float* lpc = st->lpc_mem[c];
      // excitation for the last exc_length samples (celt_fir is not
      // in-place capable)
      celt_fir(exc + MAX_PERIOD - exc_length, lpc, fir_tmp, exc_length,
               CELT_LPC_ORDER);
      memcpy(exc + MAX_PERIOD - exc_length, fir_tmp,
             exc_length * sizeof(float));

      // measure decay across the two halves of the excitation window so
      // concealment doesn't ADD energy into a fading signal
      float decay;
      {
        float E1 = 1, E2 = 1;
        int decay_length = exc_length >> 1;
        for (int i = 0; i < decay_length; ++i) {
          float e = exc[MAX_PERIOD - decay_length + i];
          E1 += e * e;
          e = exc[MAX_PERIOD - 2 * decay_length + i];
          E2 += e * e;
        }
        E1 = fminf(E1, E2);
        decay = sqrtf(E1 / E2);
      }

      memmove(buf, buf + N, (DECODE_BUFFER_SIZE - N) * sizeof(float));

      // periodic extrapolation of the excitation, each period scaled by a
      // further `decay`; covers the frame plus the full overlap so the
      // pre-filter/TDAC stage below reads defined samples
      int extrapolation_offset = MAX_PERIOD - pitch_index;
      int extrapolation_len = N + overlap;
      float attenuation = fade * decay;
      float S1 = 0;
      for (int i = 0, j = 0; i < extrapolation_len; ++i, ++j) {
        if (j >= pitch_index) {
          j -= pitch_index;
          attenuation = attenuation * decay;
        }
        buf[DECODE_BUFFER_SIZE - N + i] =
            attenuation * exc[extrapolation_offset + j];
        float tmp =
            buf[DECODE_BUFFER_SIZE - MAX_PERIOD - N + extrapolation_offset + j];
        S1 += tmp * tmp;
      }
      {
        float lpc_hist[CELT_LPC_ORDER];
        for (int i = 0; i < CELT_LPC_ORDER; ++i)
          lpc_hist[i] = buf[DECODE_BUFFER_SIZE - N - 1 - i];
        celt_iir(buf + DECODE_BUFFER_SIZE - N, lpc,
                 buf + DECODE_BUFFER_SIZE - N, extrapolation_len,
                 CELT_LPC_ORDER, lpc_hist);
      }

      // attenuate (or zero) if synthesis energy exceeds the source energy
      // — catches filter blow-ups and NaNs
      {
        float S2 = 0;
        for (int i = 0; i < extrapolation_len; ++i) {
          float tmp = buf[DECODE_BUFFER_SIZE - N + i];
          S2 += tmp * tmp;
        }
        if (!(S1 > 0.2f * S2)) {
          for (int i = 0; i < extrapolation_len; ++i)
            buf[DECODE_BUFFER_SIZE - N + i] = 0;
        } else if (S1 < S2) {
          float ratio = sqrtf((S1 * .5f + 1) / (S2 + 1));
          for (int i = 0; i < overlap; ++i) {
            float tmp_g = 1.f - window[i] * (1.f - ratio);
            buf[DECODE_BUFFER_SIZE - N + i] *= tmp_g;
          }
          for (int i = overlap; i < extrapolation_len; ++i)
            buf[DECODE_BUFFER_SIZE - N + i] *= ratio;
        }
      }

      // apply the INVERSE post-filter over the overlap: the next real
      // frame re-applies the post-filter after its MDCT overlap-add, so
      // the concealed overlap must be pre-compensated
      float etmp[OVERLAP];
      comb_filter(etmp, buf + DECODE_BUFFER_SIZE, st->postfilter_period,
                  st->postfilter_period, overlap, -st->postfilter_gain,
                  -st->postfilter_gain, st->postfilter_tapset,
                  st->postfilter_tapset, nullptr, 0);

      // simulate TDAC on the concealed audio so it blends with the next
      // frame's MDCT windowing
      for (int i = 0; i < overlap / 2; ++i) {
        buf[DECODE_BUFFER_SIZE + i] = window[i] * etmp[overlap - 1 - i] +
                                      window[overlap - i - 1] * etmp[i];
      }
    }
  }
  st->loss_duration = imin(10000, loss_duration + (1 << LM));
}

// Public entry: conceal `frame_size` samples to interleaved float pcm at
// [-1,1] scale (de-emphasis included, matching celt_decode_frame's tail).
int celt_conceal_frame(CeltDecoder* st, float* pcm, int frame_size) {
  int LM;
  for (LM = 0; LM <= MAX_LM; ++LM)
    if (SHORT_MDCT_SIZE << LM == frame_size) break;
  if (LM > MAX_LM) return -1;
  celt_decode_lost(st, frame_size, LM);
  const int CC = st->channels;
  for (int c = 0; c < CC; ++c) {
    float m = st->preemph_memD[c];
    const float* x = st->decode_mem[c] + DECODE_BUFFER_SIZE - frame_size;
    float* y = pcm + c;
    for (int j = 0; j < frame_size; ++j) {
      float tmp = x[j] + 1e-30f + m;
      m = 0.85f * tmp;
      y[j * CC] = tmp * (1.f / CELT_SIG_SCALE);
    }
    st->preemph_memD[c] = m;
  }
  return frame_size;
}

}  // namespace iamf_opus
