// Generated. See celt_tables.cc.
#pragma once
namespace iamf_opus {
extern const short eband5ms[22];
extern const unsigned char band_allocation[231];
extern const short logN400[21];
extern const float window120[120];
extern const short cache_index50[105];
extern const unsigned char cache_bits50[392];
extern const unsigned char cache_caps50[168];
extern const float fft_twiddles48000_960[960];
extern const short fft_bitrev480[480];
extern const short fft_bitrev240[240];
extern const short fft_bitrev120[120];
extern const short fft_bitrev60[60];
extern const float mdct_twiddles960[1800];
extern const unsigned char e_prob_model[336];
extern const unsigned char small_energy_icdf[3];
extern const unsigned char spread_icdf[4];
extern const unsigned char tapset_icdf[3];
extern const unsigned char trim_icdf[11];
extern const unsigned CELT_PVQ_U_DATA[1272];
extern const unsigned char LOG2_FRAC_TABLE[24];
extern const unsigned char bit_interleave_table[16];
extern const unsigned char bit_deinterleave_table[16];
extern const int SPREAD_FACTOR[3];
extern const unsigned char inv_table[128];
extern const float gains[9];
extern const signed char tf_select_table[32];
extern const float eMeans[25];
extern const float pred_coef[4];
extern const float beta_coef[4];
extern const int ordery_table[30];
}  // namespace iamf_opus
