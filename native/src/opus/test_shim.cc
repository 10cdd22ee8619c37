// C ABI shim exposing the iamf-tpu range decoder for differential testing
// against the reference entropy decoder (tests/test_opus_entdec.py).

#include "entdec.h"

using namespace iamf_opus;

extern "C" {

void* iamf_ec_new(const unsigned char* buf, unsigned storage) {
  EntDec* d = new EntDec();
  d->init(buf, storage);
  return d;
}

void iamf_ec_free(void* p) { delete (EntDec*)p; }

unsigned iamf_ec_decode(void* p, unsigned ft) { return ((EntDec*)p)->decode(ft); }
unsigned iamf_ec_decode_bin(void* p, unsigned b) {
  return ((EntDec*)p)->decode_bin(b);
}
void iamf_ec_update(void* p, unsigned fl, unsigned fh, unsigned ft) {
  ((EntDec*)p)->update(fl, fh, ft);
}
int iamf_ec_bit_logp(void* p, unsigned logp) {
  return ((EntDec*)p)->bit_logp(logp);
}
int iamf_ec_icdf(void* p, const unsigned char* tab, unsigned ftb) {
  return ((EntDec*)p)->icdf(tab, ftb);
}
unsigned iamf_ec_bits(void* p, int n) { return ((EntDec*)p)->bits(n); }
unsigned iamf_ec_uint(void* p, unsigned ft) { return ((EntDec*)p)->uint(ft); }
int iamf_ec_tell(void* p) { return ((EntDec*)p)->tell(); }
unsigned iamf_ec_tell_frac(void* p) { return ((EntDec*)p)->tell_frac(); }
int iamf_ec_laplace(void* p, unsigned fs, int decay) {
  return ec_laplace_decode(*(EntDec*)p, fs, decay);
}
}

extern "C" {
unsigned iamf_ec_get_rng(void* p) { return ((EntDec*)p)->rng; }
int iamf_ec_get_nbits(void* p) { return ((EntDec*)p)->nbits_total; }
}

#include "celt.h"

extern "C" {
void iamf_celt_init_caps(int* cap, int LM, int C) {
  iamf_opus::init_caps(cap, LM, C);
}
void iamf_celt_unquant_coarse(void* p, int start, int end, float* oldE,
                              int intra, int C, int LM) {
  iamf_opus::unquant_coarse_energy(start, end, oldE, intra, *(EntDec*)p, C, LM);
}
void iamf_celt_unquant_fine(void* p, int start, int end, float* oldE,
                            const int* fq, int C) {
  iamf_opus::unquant_fine_energy(start, end, oldE, fq, *(EntDec*)p, C);
}
void iamf_celt_unquant_finalise(void* p, int start, int end, float* oldE,
                                const int* fq, const int* fp, int bits_left,
                                int C) {
  iamf_opus::unquant_energy_finalise(start, end, oldE, fq, fp, bits_left,
                                     *(EntDec*)p, C);
}
int iamf_celt_compute_allocation(void* p, int start, int end,
                                 const int* offsets, const int* cap,
                                 int alloc_trim, int* intensity,
                                 int* dual_stereo, int total, int* balance,
                                 int* pulses, int* ebits, int* fine_priority,
                                 int C, int LM) {
  return iamf_opus::compute_allocation(start, end, offsets, cap, alloc_trim,
                                       intensity, dual_stereo, total, balance,
                                       pulses, ebits, fine_priority, C, LM,
                                       (EntDec*)p);
}
void iamf_celt_tf_decode(void* p, int start, int end, int isTransient,
                         int* tf_res, int LM) {
  iamf_opus::tf_decode(start, end, isTransient, tf_res, LM, *(EntDec*)p);
}
}

extern "C" {
void iamf_mdct_backward(const float* in, float* out, int N, int stride,
                        const float* window, int overlap) {
  iamf_opus::clt_mdct_backward(in, out, N, stride, window, overlap);
}
}

extern "C" {
void iamf_haar1(float* X, int N0, int stride) { iamf_opus::haar1(X, N0, stride); }
// iamf_exp_rotation lives in opus_dec.cc (shared with the main lib)
void iamf_decode_pulses(void* ec, int* y, int N, int K) {
  iamf_opus::decode_pulses(y, N, K, *(EntDec*)ec);
}
unsigned iamf_alg_unquant(void* ec, float* X, int N, int K, int spread, int B, float gain) {
  return iamf_opus::alg_unquant(X, N, K, spread, B, *(EntDec*)ec, gain);
}
}

// ---- stage tap for differential debugging ------------------------------
#include <cstdio>
#include <cstdlib>



extern "C" iamf_opus::BandTap* iamf_get_band_tap() {
  return &iamf_opus::g_band_tap;
}


