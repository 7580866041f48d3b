// dnaio — native data-path core for dna_tpu.
//
// The reference framework's input pipeline is pure Python (pyfaidx random
// access + per-sample Python tokenization — its known CPU bottleneck,
// SURVEY §7.3). This library implements the per-byte hot loops in C++:
//
//   * 2-bit DNA corpus codec (wire-compatible with the reference format,
//     `src/dataloaders/datasets/dnabert2.py:166-192`: A=00 T=01 C=10 G=11,
//     big-endian bit packing, zero pad to byte boundary)
//   * character tokenization to the reference id layout
//     (`hg38_char_tokenizer.py`: specials 0-6, A C G T N = 7..11)
//   * reverse complement
//   * batched fixed-length tokenize+pad (one call per batch, no Python loop)
//
// C ABI only; bound via ctypes (no pybind11 in this environment).
// Build: g++ -O3 -march=native -shared -fPIC dnaio.cpp -o libdnaio.so

#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------- 2-bit ----

// Returns the number of bytes written; *pad_bits receives the zero-pad.
int dnaio_encode_2bit(const char* seq, int len, uint8_t* out, int* pad_bits) {
    static int8_t lut[256];
    static bool init = false;
    if (!init) {
        memset(lut, 0, sizeof(lut));  // unknown base -> 00 (A), as reference
        lut[(int)'A'] = 0; lut[(int)'T'] = 1;
        lut[(int)'C'] = 2; lut[(int)'G'] = 3;
        lut[(int)'a'] = 0; lut[(int)'t'] = 1;
        lut[(int)'c'] = 2; lut[(int)'g'] = 3;
        init = true;
    }
    int nbits = len * 2;
    int nbytes = (nbits + 7) / 8;
    *pad_bits = nbytes * 8 - nbits;
    memset(out, 0, nbytes);
    for (int i = 0; i < len; ++i) {
        int code = lut[(uint8_t)seq[i]];
        int bitpos = i * 2;
        out[bitpos >> 3] |= (uint8_t)(code << (6 - (bitpos & 7)));
    }
    return nbytes;
}

// Decodes nbases bases from packed data into out (caller allocates).
void dnaio_decode_2bit(const uint8_t* data, int nbases, char* out) {
    static const char bases[4] = {'A', 'T', 'C', 'G'};
    for (int i = 0; i < nbases; ++i) {
        int bitpos = i * 2;
        int code = (data[bitpos >> 3] >> (6 - (bitpos & 7))) & 3;
        out[i] = bases[code];
    }
}

// ------------------------------------------------------------- tokenize ----

// Character tokenizer with the reference id layout; writes len int32 ids.
void dnaio_char_tokenize(const char* seq, int len, int32_t* out) {
    static int32_t lut[256];
    static bool init = false;
    if (!init) {
        for (int i = 0; i < 256; ++i) lut[i] = 6;  // UNK
        lut[(int)'A'] = 7; lut[(int)'C'] = 8; lut[(int)'G'] = 9;
        lut[(int)'T'] = 10; lut[(int)'N'] = 11;
        lut[(int)'a'] = 7; lut[(int)'c'] = 8; lut[(int)'g'] = 9;
        lut[(int)'t'] = 10; lut[(int)'n'] = 11;
        init = true;
    }
    for (int i = 0; i < len; ++i) out[i] = lut[(uint8_t)seq[i]];
}

// Batched tokenize + left/right pad/truncate to fixed length.
// seqs: concatenated bytes; offsets: n+1 prefix offsets; out: [n, max_len].
void dnaio_char_tokenize_batch(const char* seqs, const int64_t* offsets,
                               int n, int max_len, int pad_id, int pad_left,
                               int32_t* out) {
    for (int row = 0; row < n; ++row) {
        const char* s = seqs + offsets[row];
        int len = (int)(offsets[row + 1] - offsets[row]);
        int keep = len < max_len ? len : max_len;
        int32_t* dst = out + (int64_t)row * max_len;
        int lead = pad_left ? (max_len - keep) : 0;
        for (int i = 0; i < lead; ++i) dst[i] = pad_id;
        dnaio_char_tokenize(s, keep, dst + lead);
        for (int i = lead + keep; i < max_len; ++i) dst[i] = pad_id;
    }
}

// ------------------------------------------------------------ rev comp ----

void dnaio_reverse_complement(const char* seq, int len, char* out) {
    static char lut[256];
    static bool init = false;
    if (!init) {
        for (int i = 0; i < 256; ++i) lut[i] = (char)i;
        lut[(int)'A'] = 'T'; lut[(int)'T'] = 'A';
        lut[(int)'C'] = 'G'; lut[(int)'G'] = 'C';
        lut[(int)'a'] = 't'; lut[(int)'t'] = 'a';
        lut[(int)'c'] = 'g'; lut[(int)'g'] = 'c';
        init = true;
    }
    for (int i = 0; i < len; ++i) out[i] = lut[(uint8_t)seq[len - 1 - i]];
}

}  // extern "C"
