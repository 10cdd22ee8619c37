// Bit allocation for CELT (RFC 6716 §4.3.3): pulse-cache lookups, caps,
// and the two-stage allocation interpolation with skip/intensity/dual
// decisions decoded from the range coder.

#include <cstdio>
#include <cstdlib>

#include "celt.h"
#include "celt_tables.h"

namespace iamf_opus {

const short* mode_eBands() { return eband5ms; }
const short* mode_logN() { return logN400; }
const unsigned char* mode_alloc_vectors() { return band_allocation; }
const short* mode_cache_index() { return cache_index50; }
const unsigned char* mode_cache_bits() { return cache_bits50; }
const unsigned char* mode_cache_caps() { return cache_caps50; }

static inline int imin(int a, int b) { return a < b ? a : b; }
static inline int imax(int a, int b) { return a > b ? a : b; }

int bits2pulses(int band, int LM, int bits) {
  LM++;
  const unsigned char* cache =
      mode_cache_bits() + mode_cache_index()[LM * NB_EBANDS + band];
  int lo = 0, hi = cache[0];
  bits--;
  for (int i = 0; i < 6; ++i) {
    int mid = (lo + hi + 1) >> 1;
    if ((int)cache[mid] >= bits)
      hi = mid;
    else
      lo = mid;
  }
  if (bits - (lo == 0 ? -1 : (int)cache[lo]) <= (int)cache[hi] - bits)
    return lo;
  return hi;
}

int pulses2bits(int band, int LM, int pulses) {
  LM++;
  const unsigned char* cache =
      mode_cache_bits() + mode_cache_index()[LM * NB_EBANDS + band];
  return pulses == 0 ? 0 : cache[pulses] + 1;
}

void init_caps(int* cap, int LM, int C) {
  const short* eBands = mode_eBands();
  for (int i = 0; i < NB_EBANDS; ++i) {
    int N = (eBands[i + 1] - eBands[i]) << LM;
    cap[i] = (mode_cache_caps()[NB_EBANDS * (2 * LM + C - 1) + i] + 64) * C *
                 N >>
             2;
  }
}

static int interp_bits2pulses(int start, int end, int skip_start,
                              const int* bits1, const int* bits2,
                              const int* thresh, const int* cap, int total,
                              int* _balance, int skip_rsv, int* intensity,
                              int intensity_rsv, int* dual_stereo,
                              int dual_stereo_rsv, int* bits, int* ebits,
                              int* fine_priority, int C, int LM, EntDec* ec) {
  const short* eBands = mode_eBands();
  const short* logN = mode_logN();
  int alloc_floor = C << BITRES;
  int stereo = C > 1 ? 1 : 0;
  int logM = LM << BITRES;
  int lo = 0, hi = 1 << ALLOC_STEPS;
  for (int i = 0; i < ALLOC_STEPS; ++i) {
    int mid = (lo + hi) >> 1;
    int psum = 0, done = 0;
    for (int j = end - 1; j >= start; --j) {
      int tmp = bits1[j] + (mid * bits2[j] >> ALLOC_STEPS);
      if (tmp >= thresh[j] || done) {
        done = 1;
        psum += imin(tmp, cap[j]);
      } else if (tmp >= alloc_floor) {
        psum += alloc_floor;
      }
    }
    if (psum > total)
      hi = mid;
    else
      lo = mid;
  }
  int psum = 0, done = 0;
  for (int j = end - 1; j >= start; --j) {
    int tmp = bits1[j] + (lo * bits2[j] >> ALLOC_STEPS);
    if (tmp < thresh[j] && !done) {
      if (tmp >= alloc_floor)
        tmp = alloc_floor;
      else
        tmp = 0;
    } else {
      done = 1;
    }
    tmp = imin(tmp, cap[j]);
    bits[j] = tmp;
    psum += tmp;
  }

  // skip decision
  const bool dbg = getenv("IAMF_ALLOC_DEBUG") != nullptr;
  int codedBands = end;
  for (;; codedBands--) {
    int j = codedBands - 1;
    if (j <= skip_start) {
      total += skip_rsv;
      break;
    }
    int left = total - psum;
    int percoeff = left / (eBands[codedBands] - eBands[start]);
    left -= (eBands[codedBands] - eBands[start]) * percoeff;
    int rem = imax(left - (eBands[j] - eBands[start]), 0);
    int band_width = eBands[codedBands] - eBands[j];
    int band_bits = bits[j] + percoeff * band_width + rem;
    if (dbg)
      fprintf(stderr,
              "skip j=%d bits=%d percoeff=%d rem=%d band_bits=%d thresh=%d "
              "psum=%d total=%d\n",
              j, bits[j], percoeff, rem, band_bits, thresh[j], psum, total);
    if (band_bits >= imax(thresh[j], alloc_floor + (1 << BITRES))) {
      if (ec->bit_logp(1)) break;
      psum += 1 << BITRES;
      band_bits -= 1 << BITRES;
    }
    psum -= bits[j] + intensity_rsv;
    if (intensity_rsv > 0) {
      intensity_rsv = LOG2_FRAC_TABLE[j - start];
      psum += intensity_rsv;
    }
    if (band_bits >= alloc_floor) {
      psum += alloc_floor;
      bits[j] = alloc_floor;
    } else {
      bits[j] = 0;
    }
  }

  if (intensity_rsv > 0)
    *intensity = start + (int)ec->uint(codedBands + 1 - start);
  else
    *intensity = 0;
  if (*intensity <= start) {
    total += dual_stereo_rsv;
    dual_stereo_rsv = 0;
  }
  if (dual_stereo_rsv > 0)
    *dual_stereo = ec->bit_logp(1);
  else
    *dual_stereo = 0;

  // allocate remaining bits proportionally
  int left = total - psum;
  int percoeff = left / (eBands[codedBands] - eBands[start]);
  left -= (eBands[codedBands] - eBands[start]) * percoeff;
  for (int j = start; j < codedBands; ++j)
    bits[j] += percoeff * (eBands[j + 1] - eBands[j]);
  for (int j = start; j < codedBands; ++j) {
    int tmp = imin(left, eBands[j + 1] - eBands[j]);
    bits[j] += tmp;
    left -= tmp;
  }

  int balance = 0;
  for (int j = start; j < codedBands; ++j) {
    int N0 = eBands[j + 1] - eBands[j];
    int N = N0 << LM;
    int bit = bits[j] + balance;
    int excess = 0;
    if (N > 1) {
      excess = imax(bit - cap[j], 0);
      bits[j] = bit - excess;
      int den = C * N + ((C == 2 && N > 2 && !*dual_stereo && j < *intensity)
                             ? 1
                             : 0);
      int NClogN = den * (logN[j] + logM);
      int offset = (NClogN >> 1) - den * FINE_OFFSET;
      if (N == 2) offset += den << BITRES >> 2;
      if (bits[j] + offset < den * 2 << BITRES)
        offset += NClogN >> 2;
      else if (bits[j] + offset < den * 3 << BITRES)
        offset += NClogN >> 3;
      ebits[j] = imax(0, bits[j] + offset + (den << (BITRES - 1)));
      ebits[j] = (ebits[j] / den) >> BITRES;
      if (C * ebits[j] > (bits[j] >> BITRES)) ebits[j] = bits[j] >> stereo >> BITRES;
      ebits[j] = imin(ebits[j], MAX_FINE_BITS);
      fine_priority[j] = ebits[j] * (den << BITRES) >= bits[j] + offset;
      bits[j] -= C * ebits[j] << BITRES;
    } else {
      excess = imax(0, bit - (C << BITRES));
      bits[j] = bit - excess;
      ebits[j] = 0;
      fine_priority[j] = 1;
    }
    if (excess > 0) {
      int extra_fine = imin(excess >> (stereo + BITRES), MAX_FINE_BITS - ebits[j]);
      ebits[j] += extra_fine;
      int extra_bits = extra_fine * C << BITRES;
      fine_priority[j] = extra_bits >= excess - balance;
      excess -= extra_bits;
    }
    balance = excess;
  }
  *_balance = balance;

  for (int j = codedBands; j < end; ++j) {
    ebits[j] = bits[j] >> stereo >> BITRES;
    bits[j] = 0;
    fine_priority[j] = ebits[j] < 1;
  }
  return codedBands;
}

int compute_allocation(int start, int end, const int* offsets, const int* cap,
                       int alloc_trim, int* intensity, int* dual_stereo,
                       int total, int* balance, int* pulses, int* ebits,
                       int* fine_priority, int C, int LM, EntDec* ec) {
  const short* eBands = mode_eBands();
  int len = NB_EBANDS;
  int skip_start = start;
  total = imax(total, 0);
  int skip_rsv = total >= 1 << BITRES ? 1 << BITRES : 0;
  total -= skip_rsv;
  int intensity_rsv = 0, dual_stereo_rsv = 0;
  if (C == 2) {
    intensity_rsv = LOG2_FRAC_TABLE[end - start];
    if (intensity_rsv > total) {
      intensity_rsv = 0;
    } else {
      total -= intensity_rsv;
      dual_stereo_rsv = total >= 1 << BITRES ? 1 << BITRES : 0;
      total -= dual_stereo_rsv;
    }
  }
  int thresh[NB_EBANDS], trim_offset[NB_EBANDS];
  int bits1[NB_EBANDS], bits2[NB_EBANDS];
  for (int j = start; j < end; ++j) {
    thresh[j] = imax(C << BITRES,
                     (3 * (eBands[j + 1] - eBands[j]) << LM << BITRES) >> 4);
    trim_offset[j] = C * (eBands[j + 1] - eBands[j]) *
                         (alloc_trim - 5 - LM) * (end - j - 1) *
                         (1 << (LM + BITRES)) >>
                     6;
    if (((eBands[j + 1] - eBands[j]) << LM) == 1)
      trim_offset[j] -= C << BITRES;
  }
  int lo = 1, hi = NB_ALLOC_VECTORS - 1;
  do {
    int done = 0, psum = 0;
    int mid = (lo + hi) >> 1;
    for (int j = end - 1; j >= start; --j) {
      int N = eBands[j + 1] - eBands[j];
      int bitsj = (C * N * mode_alloc_vectors()[mid * len + j] << LM) >> 2;
      if (bitsj > 0) bitsj = imax(0, bitsj + trim_offset[j]);
      bitsj += offsets[j];
      if (bitsj >= thresh[j] || done) {
        done = 1;
        psum += imin(bitsj, cap[j]);
      } else if (bitsj >= C << BITRES) {
        psum += C << BITRES;
      }
    }
    if (psum > total)
      hi = mid - 1;
    else
      lo = mid + 1;
  } while (lo <= hi);
  hi = lo--;
  for (int j = start; j < end; ++j) {
    int N = eBands[j + 1] - eBands[j];
    int b1 = (C * N * mode_alloc_vectors()[lo * len + j] << LM) >> 2;
    int b2 = hi >= NB_ALLOC_VECTORS
                 ? cap[j]
                 : (C * N * mode_alloc_vectors()[hi * len + j] << LM) >> 2;
    if (b1 > 0) b1 = imax(0, b1 + trim_offset[j]);
    if (b2 > 0) b2 = imax(0, b2 + trim_offset[j]);
    if (lo > 0) b1 += offsets[j];
    b2 += offsets[j];
    if (offsets[j] > 0) skip_start = j;
    b2 = imax(0, b2 - b1);
    bits1[j] = b1;
    bits2[j] = b2;
  }
  return interp_bits2pulses(start, end, skip_start, bits1, bits2, thresh, cap,
                            total, balance, skip_rsv, intensity, intensity_rsv,
                            dual_stereo, dual_stereo_rsv, pulses, ebits,
                            fine_priority, C, LM, ec);
}

}  // namespace iamf_opus
