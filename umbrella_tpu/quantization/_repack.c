/* Native AWQ repacker.
 *
 * Converts HF AutoAWQ "GEMM" packed tensors (int32, 8 x int4 per word along the
 * output dim, AWQ interleave order 0,2,4,6,1,3,5,7) into this framework's
 * split-halves uint8 layout (low nibble = row r, high nibble = row r + K/2) in one
 * pass. For a 70B checkpoint this touches ~35GB of weights at load time; the numpy
 * fallback (quantization/awq.py) does the same job ~20x slower through temporary
 * int8 arrays.
 *
 * Exposed via ctypes (no pybind11 in this image): see native.py.
 */
#include <stdint.h>
#include <stddef.h>
#include <string.h>

/* AWQ nibble order: packed slot s holds logical column REVERSE[s]. */
static const int AWQ_REVERSE[8] = {0, 4, 1, 5, 2, 6, 3, 7};

/* Unpack one int32-packed row [N/8] into int4 values [N] (logical column order). */
static void unpack_row(const uint32_t *packed, int n_words, uint8_t *out) {
    for (int w = 0; w < n_words; ++w) {
        uint32_t v = packed[w];
        uint8_t nib[8];
        for (int s = 0; s < 8; ++s) {
            nib[s] = (uint8_t)((v >> (4 * s)) & 0xF);
        }
        uint8_t *dst = out + 8 * w;
        for (int s = 0; s < 8; ++s) {
            dst[s] = nib[AWQ_REVERSE[s]];
        }
    }
}

/* qweight [K, N/8] int32  ->  w8 [K/2, N] uint8 split-halves packed. */
void awq_repack_weights(const uint32_t *qweight, int64_t K, int64_t N, uint8_t *w8,
                        uint8_t *scratch /* >= 2*N bytes */) {
    int64_t n_words = N / 8;
    int64_t K2 = K / 2;
    for (int64_t r = 0; r < K2; ++r) {
        uint8_t *lo = scratch;
        uint8_t *hi = scratch + N;
        unpack_row(qweight + r * n_words, (int)n_words, lo);
        unpack_row(qweight + (r + K2) * n_words, (int)n_words, hi);
        uint8_t *dst = w8 + r * N;
        for (int64_t c = 0; c < N; ++c) {
            dst[c] = (uint8_t)(lo[c] | (hi[c] << 4));
        }
    }
}

/* qzeros [G, N/8] int32 -> zeros [G, N] float32 (logical order, ready to cast). */
void awq_unpack_zeros(const uint32_t *qzeros, int64_t G, int64_t N, float *zeros,
                      uint8_t *scratch /* >= N bytes */) {
    int64_t n_words = N / 8;
    for (int64_t g = 0; g < G; ++g) {
        unpack_row(qzeros + g * n_words, (int)n_words, scratch);
        float *dst = zeros + g * N;
        for (int64_t c = 0; c < N; ++c) {
            dst[c] = (float)scratch[c];
        }
    }
}
