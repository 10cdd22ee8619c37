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
