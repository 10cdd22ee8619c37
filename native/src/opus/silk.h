// From-scratch SILK decoder (RFC 6716 §4.2) for the iamf-tpu Opus path.
// Fixed-point, matching the reference libopus arithmetic so SILK-mode
// packets decode bit-exactly (validated against the libopus binary in
// tests/test_opus_silk.py). Constant tables in silk_tables.{h,cc}.
#pragma once

#include <cstdint>

#include "entdec.h"

namespace iamf_silk {

constexpr int MAX_LPC_ORDER = 16;
constexpr int MAX_FS_KHZ = 16;
constexpr int MAX_FRAME_LEN = 20 * MAX_FS_KHZ;     // 20 ms
constexpr int MAX_SUBFR_LEN = 5 * MAX_FS_KHZ;      // 5 ms
constexpr int LTP_MEM_LEN = 20 * MAX_FS_KHZ;       // 20 ms
constexpr int LTP_ORDER = 5;
constexpr int MAX_NB_SUBFR = 4;

enum { TYPE_NO_VAD = 0, TYPE_UNVOICED = 1, TYPE_VOICED = 2 };
enum { CODE_INDEPENDENTLY = 0, CODE_CONDITIONALLY = 1 };

struct SideInfoIndices {
  int8_t GainsIndices[MAX_NB_SUBFR];
  int8_t LTPIndex[MAX_NB_SUBFR];
  int8_t NLSFIndices[MAX_LPC_ORDER + 1];
  int16_t lagIndex;
  int8_t contourIndex;
  int8_t signalType;
  int8_t quantOffsetType;
  int8_t NLSFInterpCoef_Q2;
  int8_t PERIndex;
  int8_t LTP_scaleIndex;
  int8_t Seed;
};

struct ResamplerState {
  int32_t sIIR[6] = {0};
  int16_t sFIR[8] = {0};
  int16_t delayBuf[48] = {0};
  int32_t invRatio_Q16 = 0;
  int batchSize = 0;
  int Fs_in_kHz = 0, Fs_out_kHz = 0;
  int inputDelay = 0;
  void init(int Fs_Hz_in, int Fs_Hz_out);
  void process(int16_t* out, const int16_t* in, int inLen);
};

// Packet-loss-concealment state (libopus silk/structs.h silk_PLC_struct):
// LTP/LPC parameters of the last good frame + attenuation state.
struct SilkPlcState {
  int32_t pitchL_Q8 = 0;
  int16_t LTPCoef_Q14[LTP_ORDER] = {0};
  int16_t prevLPC_Q12[MAX_LPC_ORDER] = {0};
  int last_frame_lost = 0;
  int32_t rand_seed = 0;
  int16_t randScale_Q14 = 0;
  int32_t conc_energy = 0;
  int conc_energy_shift = 0;
  int16_t prevLTP_scale_Q14 = 0;
  int32_t prevGain_Q16[2] = {65536, 65536};
  int fs_kHz = 0;
  int nb_subfr = 0;
  int subfr_length = 0;
};

struct SilkChannel {
  int fs_kHz = 0;
  int frame_length = 0;   // samples at fs per SILK frame
  int subfr_length = 0;
  int nb_subfr = 0;
  int ltp_mem_length = 0;
  int LPC_order = 0;
  int nFramesPerPacket = 0;
  int nFramesDecoded = 0;
  // entropy-coder conditional state
  int ec_prevSignalType = 0;
  int16_t ec_prevLagIndex = 0;
  // per-frame flags
  int VAD_flags[3] = {0};
  int LBRR_flag = 0;
  int LBRR_flags[3] = {0};
  // decoder state
  int16_t prevNLSF_Q15[MAX_LPC_ORDER] = {0};
  int first_frame_after_reset = 1;
  int8_t LastGainIndex = 10;
  int lagPrev = 100;
  int prevSignalType = TYPE_NO_VAD;
  int32_t prev_gain_Q16 = 65536;
  int32_t exc_Q14[MAX_FRAME_LEN];
  int32_t sLPC_Q14_buf[MAX_LPC_ORDER] = {0};
  int16_t outBuf[LTP_MEM_LEN + 2 * MAX_SUBFR_LEN] = {0};
  SideInfoIndices indices;
  ResamplerState resampler;
  SilkPlcState plc;
  int lossCnt = 0;

  void set_fs(int fs_khz);
  void decode_indices(iamf_opus::EntDec& ec, int frameIndex, int decode_LBRR,
                      int condCoding);
  void decode_frame(iamf_opus::EntDec& ec, int16_t* out, int condCoding);
  // Conceal one lost frame (LTP extrapolation + LPC synthesis over a
  // randomized excitation, libopus silk/PLC.c) at the internal rate.
  void conceal_frame(int16_t* out);
  // Energy-matching fade-in on the first good frame after a loss run
  // (silk_PLC_glue_frames); records concealed energy on lost frames.
  void plc_glue(int16_t* frame, int length);
};

struct SilkDecoder {
  SilkChannel ch[2];
  int nChannelsInternal = 1;
  // stereo state
  int16_t stereo_pred_prev_Q13[2] = {0, 0};
  int16_t sMid[2] = {0, 0};
  int16_t sSide[2] = {0, 0};
  int prev_decode_only_middle = 0;

  void reset();
  // Decode one SILK frame (20 or 10 ms) from the shared range decoder into
  // out48 (interleaved int16 at 48 kHz, nChannelsOut channels).
  // Returns samples per channel at 48 kHz, or negative error.
  int decode(iamf_opus::EntDec& ec, int fs_kHz, int nChannelsIntern,
             int nChannelsOut, int frame_ms, int newPacketFlag,
             int16_t* out48);
  // Conceal one lost packet (frame_ms of audio) using the channels' PLC
  // state; same output convention as decode(). Returns samples/channel.
  int conceal(int nChannelsOut, int frame_ms, int16_t* out48);
};

}  // namespace iamf_silk
