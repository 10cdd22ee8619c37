// AAC-LC constant tables (ISO/IEC 14496-3 subpart 4 data), extracted from
// the fdk-aac binary — see iamf_tpu/tools/extract_aac_tables.py.
#pragma once

namespace iamf_aac {

// Spectral Huffman codebooks 1..11: canonical (codeword, length) per tuple,
// flat index over [n]^dim with the first spectral value most significant.
extern const unsigned short kBook1Codes[81];
extern const unsigned char kBook1Lens[81];
extern const unsigned short kBook2Codes[81];
extern const unsigned char kBook2Lens[81];
extern const unsigned short kBook3Codes[81];
extern const unsigned char kBook3Lens[81];
extern const unsigned short kBook4Codes[81];
extern const unsigned char kBook4Lens[81];
extern const unsigned short kBook5Codes[81];
extern const unsigned char kBook5Lens[81];
extern const unsigned short kBook6Codes[81];
extern const unsigned char kBook6Lens[81];
extern const unsigned short kBook7Codes[64];
extern const unsigned char kBook7Lens[64];
extern const unsigned short kBook8Codes[64];
extern const unsigned char kBook8Lens[64];
extern const unsigned short kBook9Codes[169];
extern const unsigned char kBook9Lens[169];
extern const unsigned short kBook10Codes[169];
extern const unsigned char kBook10Lens[169];
extern const unsigned short kBook11Codes[289];
extern const unsigned char kBook11Lens[289];

// Scalefactor codebook: 121 entries, flat index = delta + 60.
extern const unsigned kScfCodes[121];
extern const unsigned char kScfLens[121];

// Scalefactor band offsets per sampling-rate index 0..12.
extern const int kSfbNumLong[13];
extern const int kSfbNumShort[13];
extern const short kSfbOffLong[13 * 52];   // [13][52]
extern const short kSfbOffShort[13 * 16];  // [13][16]
extern const unsigned char kTnsMaxBands[13 * 2];  // [13][{long, short}]

}  // namespace iamf_aac
