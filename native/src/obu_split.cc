// Native IA-OBU splitter: one pass over a whole in-memory stream.
//
// The Python splitter (iamf_tpu/obu/parser.py split_obu/iter_obus, wire
// format per the reference IAMF_OBU.c:79-138) costs ~0.3 s for a 30 s
// 7.1.4 stream (~10k OBUs) — dominating the host side of the batched
// decode. This walks the same format in C++ and emits one fixed-width
// record per OBU; Python re-parses only the handful of descriptor and
// parameter OBUs it actually constructs objects for.
//
// Record layout (int64 x 8 per OBU):
//   0: obu type (5 bits)
//   1: flags (bit0 redundant, bit1 trimming, bit2 extension)
//   2: obu offset (start of header, relative to `data`)
//   3: payload offset (past trim/extension fields; for AUDIO_FRAME with an
//      explicit id, past the substream id leb128 too)
//   4: payload length
//   5: trim_start (num_samples_to_trim_at_start)
//   6: trim_end   (num_samples_to_trim_at_end)
//   7: substream id for audio-frame OBUs (explicit leb128 or type-implied),
//      -1 otherwise
//
// Returns the number of complete OBUs found (records written up to
// max_out; call again with a larger buffer if the return exceeds it).
// Stops at a truncated tail exactly like the Python iterator.

#include <cstdint>
#include <cstddef>

namespace {

constexpr int kObuAudioFrame = 5;      // explicit substream id
constexpr int kObuAudioFrameId0 = 6;   // implicit ids 0..17 -> types 6..23

// leb128 (IAMF: max 8 bytes, 7 bits each). Returns value, advances *pos;
// sets *ok = false on truncation/overlong.
inline uint64_t read_leb128(const uint8_t* data, int64_t n, int64_t* pos,
                            bool* ok) {
  uint64_t v = 0;
  for (int i = 0; i < 8; ++i) {
    if (*pos >= n) { *ok = false; return 0; }
    uint8_t b = data[(*pos)++];
    v |= static_cast<uint64_t>(b & 0x7f) << (7 * i);
    if (!(b & 0x80)) return v;
  }
  *ok = false;  // >8 bytes: malformed
  return 0;
}

}  // namespace

extern "C" int64_t iamf_obu_split_all(const uint8_t* data, int64_t n,
                                      int64_t* out, int64_t max_out) {
  int64_t count = 0;
  int64_t pos = 0;
  while (pos + 2 <= n) {
    const int64_t obu_off = pos;
    const uint8_t h = data[pos++];
    const int type = h >> 3;
    const int redundant = (h >> 2) & 1;
    const int trimming = (h >> 1) & 1;
    const int extension = h & 1;
    bool ok = true;
    const uint64_t payload_size = read_leb128(data, n, &pos, &ok);
    if (!ok) break;
    const int64_t total_end = pos + static_cast<int64_t>(payload_size);
    if (total_end > n) break;

    int64_t trim_start = 0, trim_end = 0;
    if (trimming) {
      trim_end = static_cast<int64_t>(read_leb128(data, total_end, &pos, &ok));
      trim_start =
          static_cast<int64_t>(read_leb128(data, total_end, &pos, &ok));
    }
    if (extension) {
      const uint64_t ext = read_leb128(data, total_end, &pos, &ok);
      pos += static_cast<int64_t>(ext);
      if (pos > total_end) ok = false;
    }
    int64_t sid = -1;
    if (ok && type == kObuAudioFrame) {
      sid = static_cast<int64_t>(read_leb128(data, total_end, &pos, &ok));
    } else if (type >= kObuAudioFrameId0 && type <= kObuAudioFrameId0 + 17) {
      sid = type - kObuAudioFrameId0;
    }
    if (!ok) break;

    if (count < max_out) {
      int64_t* r = out + count * 8;
      r[0] = type;
      r[1] = redundant | (trimming << 1) | (extension << 2);
      r[2] = obu_off;
      r[3] = pos;
      r[4] = total_end - pos;
      r[5] = trim_start;
      r[6] = trim_end;
      r[7] = sid;
    }
    ++count;
    pos = total_end;
  }
  return count;
}
