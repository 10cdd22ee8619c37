// FLAC frame decoder — native host component of the iamf-tpu framework.
//
// Decodes one complete FLAC frame (as carried per IAMF audio-frame packet)
// to planar int32 samples: frame header, constant/verbatim/fixed/LPC
// subframes, partitioned Rice residuals (RICE/RICE2 + escape), wasted bits,
// and stereo decorrelation (left/side, right/side, mid/side).
// Written from the FLAC format specification (RFC 9639); functional
// equivalent of the reference's libFLAC usage (flac_multistream_decoder.c),
// bit-exact integer reconstruction.
//
// C ABI (ctypes):
//   int iamf_flac_decode_frame(const uint8_t* data, int size,
//                              int streaminfo_bps, int32_t* out,
//                              int max_samples, int* nch_out, int* bps_out);
// Returns n_samples (>0) or a negative error code. `out` is planar:
// channel-major [nch][n_samples].

#include <cstdint>
#include <cstring>

namespace {

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t pos;  // bit position

  explicit BitReader(const uint8_t* d, size_t n) : data(d), size(n), pos(0) {}

  bool ok() const { return pos <= size * 8; }

  uint64_t load64be(size_t byte) const {
    uint64_t w;
    memcpy(&w, data + byte, 8);
    return __builtin_bswap64(w);
  }

  uint32_t u(int nbits) {
    // fast path: one 64-bit big-endian load covers any <=32-bit read
    // whenever 8 bytes are in range (64 - 7 skipped bits >= 32)
    size_t byte = pos >> 3;
    if (nbits && byte + 8 <= size) {
      uint32_t v =
          (uint32_t)((load64be(byte) << (pos & 7)) >> (64 - nbits));
      pos += nbits;
      return v;
    }
    uint32_t v = 0;
    for (int i = 0; i < nbits; ++i) {
      byte = pos >> 3;
      if (byte >= size) { pos += nbits - i; return v << (nbits - i); }
      int shift = 7 - (pos & 7);
      v = (v << 1) | ((data[byte] >> shift) & 1);
      ++pos;
    }
    return v;
  }

  uint64_t u64(int nbits) {
    uint64_t v = 0;
    if (nbits > 32) {
      v = u(nbits - 32);
      return (v << 32) | u(32);
    }
    return u(nbits);
  }

  int64_t s(int nbits) {
    uint64_t v = u64(nbits);
    uint64_t sign = 1ull << (nbits - 1);
    return (int64_t)((v ^ sign) - sign);
  }

  uint32_t unary() {
    uint32_t q = 0;
    // fast path: count leading zeros on 64-bit windows
    while ((pos >> 3) + 8 <= size) {
      uint64_t w = load64be(pos >> 3) << (pos & 7);
      if (w == 0) {
        int avail = 64 - (int)(pos & 7);
        q += avail;
        pos += avail;
        continue;
      }
      int lz = __builtin_clzll(w);
      pos += lz + 1;
      return q + lz;
    }
    while (pos < size * 8) {
      size_t byte = pos >> 3;
      int shift = 7 - (pos & 7);
      ++pos;
      if ((data[byte] >> shift) & 1) return q;
      ++q;
    }
    return q;
  }

  void align() { pos = (pos + 7) & ~size_t(7); }
};

// UTF-8 style coded number (frame/sample number)
uint64_t read_utf8(BitReader& br) {
  uint32_t b0 = br.u(8);
  if (!(b0 & 0x80)) return b0;
  int n = 0;
  uint32_t mask = 0x40;
  while (b0 & mask) { ++n; mask >>= 1; }
  uint64_t v = b0 & (mask - 1);
  for (int i = 0; i < n; ++i) v = (v << 6) | (br.u(8) & 0x3F);
  return v;
}

const int kBlockSizeTab[16] = {0,   192, 576,  1152, 2304, 4608, -1,   -2,
                               256, 512, 1024, 2048, 4096, 8192, 16384, 32768};

bool decode_residual(BitReader& br, int32_t* res, int blocksize, int pred_order,
                     int method) {
  int porder = br.u(4);
  int parts = 1 << porder;
  int psize = blocksize >> porder;
  int idx = 0;
  int plen_bits = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  for (int p = 0; p < parts; ++p) {
    int n = psize - (p == 0 ? pred_order : 0);
    if (n < 0) return false;
    uint32_t param = br.u(plen_bits);
    if (param == escape) {
      int rawbits = br.u(5);
      for (int i = 0; i < n; ++i)
        res[idx++] = rawbits ? (int32_t)br.s(rawbits) : 0;
    } else {
      for (int i = 0; i < n; ++i) {
        uint32_t q = br.unary();
        uint64_t v = ((uint64_t)q << param) | br.u64(param);
        res[idx++] = (int32_t)((v >> 1) ^ (~(v & 1) + 1));
      }
    }
  }
  return true;
}

bool decode_subframe(BitReader& br, int64_t* out, int blocksize, int bps) {
  br.u(1);  // zero padding
  int type = br.u(6);
  int wasted = 0;
  if (br.u(1)) wasted = br.unary() + 1;
  bps -= wasted;

  static thread_local int32_t res[65536];

  if (type == 0) {  // CONSTANT
    int64_t v = br.s(bps);
    for (int i = 0; i < blocksize; ++i) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < blocksize; ++i) out[i] = br.s(bps);
  } else if (type >= 8 && type <= 12) {  // FIXED order 0-4
    int order = type - 8;
    for (int i = 0; i < order; ++i) out[i] = br.s(bps);
    int method = br.u(2);
    if (method > 1) return false;
    if (!decode_residual(br, res, blocksize, order, method)) return false;
    const int32_t* r = res;
    switch (order) {
      case 0:
        for (int i = 0; i < blocksize; ++i) out[i] = r[i];
        break;
      case 1:
        for (int i = 1; i < blocksize; ++i) out[i] = r[i - 1] + out[i - 1];
        break;
      case 2:
        for (int i = 2; i < blocksize; ++i)
          out[i] = r[i - 2] + 2 * out[i - 1] - out[i - 2];
        break;
      case 3:
        for (int i = 3; i < blocksize; ++i)
          out[i] = r[i - 3] + 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3];
        break;
      case 4:
        for (int i = 4; i < blocksize; ++i)
          out[i] = r[i - 4] + 4 * out[i - 1] - 6 * out[i - 2] +
                   4 * out[i - 3] - out[i - 4];
        break;
    }
  } else if (type >= 32) {  // LPC order 1-32
    int order = (type & 31) + 1;
    for (int i = 0; i < order; ++i) out[i] = br.s(bps);
    int precision = br.u(4);
    if (precision == 15) return false;
    precision += 1;
    int shift = (int)br.s(5);
    if (shift < 0) return false;
    int64_t coef[32];
    for (int i = 0; i < order; ++i) coef[i] = br.s(precision);
    int method = br.u(2);
    if (method > 1) return false;
    if (!decode_residual(br, res, blocksize, order, method)) return false;
    const int32_t* r = res;
    for (int i = order; i < blocksize; ++i) {
      int64_t sum = 0;
      for (int j = 0; j < order; ++j) sum += coef[j] * out[i - 1 - j];
      out[i] = r[i - order] + (sum >> shift);
    }
  } else {
    return false;
  }

  if (wasted)
    for (int i = 0; i < blocksize; ++i) out[i] <<= wasted;
  return true;
}

}  // namespace

extern "C" int iamf_flac_decode_frame(const uint8_t* data, int size,
                                      int streaminfo_bps, int32_t* out,
                                      int max_samples, int* nch_out,
                                      int* bps_out) {
  if (size < 5) return -1;
  BitReader br(data, (size_t)size);

  if (br.u(14) != 0x3FFE) return -2;  // sync
  br.u(1);                            // reserved
  br.u(1);                            // blocking strategy
  int bs_code = br.u(4);
  int sr_code = br.u(4);
  int ch_code = br.u(4);
  int ss_code = br.u(3);
  br.u(1);  // reserved
  read_utf8(br);

  int blocksize = kBlockSizeTab[bs_code];
  if (blocksize == 0) return -3;
  if (blocksize == -1) blocksize = (int)br.u(8) + 1;   // code 6
  if (blocksize == -2) blocksize = (int)br.u(16) + 1;  // code 7

  if (sr_code == 12) br.u(8);
  else if (sr_code == 13 || sr_code == 14) br.u(16);

  static const int kBps[8] = {0, 8, 12, 0, 16, 20, 24, 32};
  int bps = kBps[ss_code];
  if (bps == 0) bps = streaminfo_bps;
  if (bps == 0) return -4;

  br.u(8);  // CRC-8 (not verified; payloads come from a validated container)

  int nch;
  int decorr = 0;  // 1: left/side, 2: right/side, 3: mid/side
  if (ch_code < 8) {
    nch = ch_code + 1;
  } else if (ch_code == 8) { nch = 2; decorr = 1; }
  else if (ch_code == 9) { nch = 2; decorr = 2; }
  else if (ch_code == 10) { nch = 2; decorr = 3; }
  else return -5;

  if (blocksize > max_samples || nch > 8) return -6;

  static thread_local int64_t ch_buf[8][65536];
  for (int c = 0; c < nch; ++c) {
    int sub_bps = bps;
    if ((decorr == 1 && c == 1) || (decorr == 2 && c == 0) ||
        (decorr == 3 && c == 1))
      sub_bps += 1;  // side channel
    if (!decode_subframe(br, ch_buf[c], blocksize, sub_bps)) return -7;
  }

  // undo stereo decorrelation
  if (decorr == 1) {  // left/side: R = L - S
    for (int i = 0; i < blocksize; ++i)
      ch_buf[1][i] = ch_buf[0][i] - ch_buf[1][i];
  } else if (decorr == 2) {  // right/side: L = S + R
    for (int i = 0; i < blocksize; ++i)
      ch_buf[0][i] = ch_buf[0][i] + ch_buf[1][i];
  } else if (decorr == 3) {  // mid/side
    for (int i = 0; i < blocksize; ++i) {
      int64_t mid = ch_buf[0][i];
      int64_t side = ch_buf[1][i];
      mid = (mid << 1) | (side & 1);
      ch_buf[0][i] = (mid + side) >> 1;
      ch_buf[1][i] = (mid - side) >> 1;
    }
  }

  for (int c = 0; c < nch; ++c)
    for (int i = 0; i < blocksize; ++i)
      out[c * blocksize + i] = (int32_t)ch_buf[c][i];

  *nch_out = nch;
  *bps_out = bps;
  return blocksize;
}

// Batched form: decode `n_packets` consecutive frames of ONE substream in
// a single GIL-free call (packets concatenated in `data`, per-packet byte
// sizes in `sizes`). out: [n_packets][want_ch][frame_size] int32 planar —
// mono frames fill only lane 0 of a want_ch=1 row; a mono frame in a
// coupled (want_ch=2) stream duplicates into lane 1 (the per-frame
// Python wrapper's row-stack semantics). Returns n_packets, or the
// negative error of the failing packet.
extern "C" int iamf_flac_decode_batch(const uint8_t* data, const int* sizes,
                                      int n_packets, int streaminfo_bps,
                                      int want_ch, int32_t* out,
                                      int frame_size) {
  const uint8_t* p = data;
  static thread_local int32_t tmp[8 * 65536];
  for (int k = 0; k < n_packets; ++k) {
    int nch = 0, bps = 0;
    int n = iamf_flac_decode_frame(p, sizes[k], streaminfo_bps, tmp, 65536,
                                   &nch, &bps);
    if (n <= 0) return n ? n : -1;
    if (n > frame_size) return -3;
    int32_t* row = out + (size_t)k * want_ch * frame_size;
    for (int c = 0; c < want_ch; ++c) {
      const int32_t* src = tmp + (size_t)(c < nch ? c : nch - 1) * n;
      memcpy(row + (size_t)c * frame_size, src, n * sizeof(int32_t));
      if (n < frame_size)
        memset(row + (size_t)c * frame_size + n, 0,
               (frame_size - n) * sizeof(int32_t));
    }
    p += sizes[k];
  }
  return n_packets;
}
