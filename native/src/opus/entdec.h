// Range decoder for the Opus entropy coder (RFC 6716 §4.1).
//
// Implemented from the specification: 32-bit lag window, 8-bit renormalize
// with one carry bit held back (EC_CODE_EXTRA=7), raw bits read backwards
// from the end of the frame. Written for the iamf-tpu native Opus decoder;
// validated bit-for-bit against the reference entropy decoder in tests.

#pragma once

#include <cstdint>

namespace iamf_opus {

constexpr uint32_t EC_SYM_BITS = 8;
constexpr uint32_t EC_CODE_BITS = 32;
constexpr uint32_t EC_SYM_MAX = (1u << EC_SYM_BITS) - 1;
constexpr uint32_t EC_CODE_TOP = 1u << (EC_CODE_BITS - 1);
constexpr uint32_t EC_CODE_BOT = EC_CODE_TOP >> EC_SYM_BITS;
constexpr uint32_t EC_CODE_EXTRA = (EC_CODE_BITS - 2) % EC_SYM_BITS + 1;  // 7
constexpr uint32_t EC_WINDOW_SIZE = 32;
constexpr uint32_t EC_UINT_BITS = 8;

inline int ec_ilog(uint32_t v) {
  // position of the highest set bit + 1; hot (tell/tell_frac run per band)
  return v ? 32 - __builtin_clz(v) : 0;
}

struct EntDec {
  const unsigned char* buf;
  uint32_t storage;
  uint32_t offs;       // forward read position
  uint32_t end_offs;   // bytes consumed from the end (raw bits)
  uint32_t end_window;
  int nend_bits;
  int nbits_total;
  uint32_t val;
  uint32_t rng;
  uint32_t ext;
  int error;

  int read_byte() { return offs < storage ? buf[offs++] : 0; }
  int read_byte_from_end() {
    return end_offs < storage ? buf[storage - ++end_offs] : 0;
  }

  void normalize() {
    while (rng <= EC_CODE_BOT) {
      nbits_total += EC_SYM_BITS;
      rng <<= EC_SYM_BITS;
      int sym = rem;
      rem = read_byte();
      sym = (sym << EC_SYM_BITS | rem) >> (EC_SYM_BITS - EC_CODE_EXTRA);
      val = ((val << EC_SYM_BITS) + (EC_SYM_MAX & ~sym)) & (EC_CODE_TOP - 1);
    }
  }

  int rem;

  void init(const unsigned char* _buf, uint32_t _storage) {
    buf = _buf;
    storage = _storage;
    end_offs = 0;
    end_window = 0;
    nend_bits = 0;
    nbits_total = EC_CODE_BITS + 1 -
                  ((EC_CODE_BITS - EC_CODE_EXTRA) / EC_SYM_BITS) * EC_SYM_BITS;
    offs = 0;
    rng = 1u << EC_CODE_EXTRA;
    rem = read_byte();
    val = rng - 1 - (rem >> (EC_SYM_BITS - EC_CODE_EXTRA));
    error = 0;
    normalize();
  }

  unsigned decode(unsigned ft) {
    ext = rng / ft;
    unsigned s = (unsigned)(val / ext);
    return ft - (s + 1 < ft ? s + 1 : ft);
  }

  unsigned decode_bin(unsigned bits) {
    ext = rng >> bits;
    unsigned s = (unsigned)(val / ext);
    unsigned ft = 1u << bits;
    return ft - (s + 1 < ft ? s + 1 : ft);
  }

  void update(unsigned fl, unsigned fh, unsigned ft) {
    uint32_t s = ext * (ft - fh);
    val -= s;
    rng = fl > 0 ? ext * (fh - fl) : rng - s;
    normalize();
  }

  int bit_logp(unsigned logp) {
    uint32_t r = rng;
    uint32_t d = val;
    uint32_t s = r >> logp;
    int ret = d < s;
    if (!ret) val = d - s;
    rng = ret ? s : r - s;
    normalize();
    return ret;
  }

  int icdf(const unsigned char* icdf_tab, unsigned ftb) {
    uint32_t s = rng;
    uint32_t d = val;
    uint32_t r = s >> ftb;
    int ret = -1;
    uint32_t t;
    do {
      t = s;
      s = r * icdf_tab[++ret];
    } while (d < s);
    val = d - s;
    rng = t - s;
    normalize();
    return ret;
  }

  uint32_t bits(int nbits) {
    uint32_t window = end_window;
    int available = nend_bits;
    if (available < nbits) {
      do {
        window |= (uint32_t)read_byte_from_end() << available;
        available += EC_SYM_BITS;
      } while (available <= (int)EC_WINDOW_SIZE - (int)EC_SYM_BITS);
    }
    uint32_t ret = window & ((1u << nbits) - 1);
    window >>= nbits;
    available -= nbits;
    end_window = window;
    nend_bits = available;
    nbits_total += nbits;
    return ret;
  }

  uint32_t uint(uint32_t ft) {
    ft--;
    int ftb = ec_ilog(ft);
    if (ftb > (int)EC_UINT_BITS) {
      ftb -= EC_UINT_BITS;
      uint32_t ft1 = (ft >> ftb) + 1;
      uint32_t s = decode(ft1);
      update(s, s + 1, ft1);
      uint32_t t = (uint32_t)s << ftb | bits(ftb);
      if (t <= ft) return t;
      error = 1;
      return ft;
    }
    ft++;
    uint32_t s = decode((unsigned)ft);
    update(s, s + 1, (unsigned)ft);
    return s;
  }

  int tell() const { return nbits_total - ec_ilog(rng); }

  uint32_t tell_frac() const {
    // log2(rng) to 1/8-bit precision via three squarings (RFC 6716 §4.1)
    uint32_t nbits = (uint32_t)nbits_total << 3;  // BITRES=3
    int l = ec_ilog(rng);
    uint32_t r = rng >> (l - 16);
    for (int i = 3; i-- > 0;) {
      r = (r * r) >> 15;
      int b = (int)(r >> 16);
      l = l << 1 | b;
      r >>= b;
    }
    return nbits - l;
  }
};

// Laplace-distributed value decode (coarse energy; RFC 6716 §4.3.2.1).
inline int ec_laplace_decode(EntDec& dec, unsigned fs, int decay) {
  constexpr int LAPLACE_LOG_MINP = 0;
  constexpr unsigned LAPLACE_MINP = 1u << LAPLACE_LOG_MINP;
  constexpr int LAPLACE_NMIN = 16;
  int val = 0;
  unsigned fl = 0;
  unsigned fm = dec.decode_bin(15);
  if (fm >= fs) {
    val++;
    fl = fs;
    // freq of the first tail symbol
    unsigned ft = 32768 - LAPLACE_MINP * (2 * LAPLACE_NMIN) - fs;
    fs = (unsigned)(((uint64_t)ft * (16384 - decay)) >> 15) + LAPLACE_MINP;
    while (fs > LAPLACE_MINP && fm >= fl + 2 * fs) {
      fs *= 2;
      fl += fs;
      fs = (unsigned)(((uint64_t)(fs - 2 * LAPLACE_MINP) * decay) >> 15);
      fs += LAPLACE_MINP;
      val++;
    }
    if (fs <= LAPLACE_MINP) {
      int di = (fm - fl) >> (LAPLACE_LOG_MINP + 1);
      val += di;
      fl += 2 * di * LAPLACE_MINP;
    }
    if (fm < fl + fs)
      val = -val;
    else
      fl += fs;
  }
  uint32_t fh = fl + fs < 32768 ? fl + fs : 32768;
  dec.update(fl, fh, 32768);
  return val;
}

}  // namespace iamf_opus
