// Test-oracle stub for <liquid/liquid.h>: exact-math stand-ins for the
// three liquid-dsp facilities the reference decoder creates.
//
// - fftplan / fft_execute: liquid wraps an FFTW-convention DFT
//   (FORWARD = sum x[n] e^{-2*pi*i*n*k/N}, unnormalized). Implemented
//   here as an iterative radix-2 FFT (every plan size in the decoder is
//   a power of two: samples_per_symbol and number_of_bins) — the SAME
//   transform up to float rounding, which is what get_shift_fft's
//   argmax consumes (lib/decoder_impl.cc:428-463).
// - fec HAMMING84: the runtime Hamming(8,4) path. The analog oracle
//   never drives fec_decode (the integer chain is pinned separately via
//   utilities.h's hamming_decode_soft_byte, tests/test_oracle.py); the
//   stub still implements it with the reference's own soft decoder so a
//   future decode-chain mode stays honest.
#ifndef ORACLE_STUB_LIQUID_H
#define ORACLE_STUB_LIQUID_H
#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <vector>

typedef std::complex<float> liquid_float_complex;

typedef enum {
    LIQUID_FFT_UNKNOWN = 0,
    LIQUID_FFT_FORWARD = +1,
    LIQUID_FFT_BACKWARD = -1,
} liquid_fft_type;

struct fftplan_s {
    unsigned int n;
    std::complex<float>* in;
    std::complex<float>* out;
    int dir;  // +1 forward (e^{-i}), -1 backward (e^{+i})
};
typedef fftplan_s* fftplan;

inline fftplan fft_create_plan(unsigned int n, std::complex<float>* in,
                               std::complex<float>* out, int dir, int) {
    return new fftplan_s{n, in, out, dir};
}

inline void fft_destroy_plan(fftplan p) { delete p; }

inline void fft_execute(fftplan p) {
    const unsigned int n = p->n;
    std::vector<std::complex<double>> a(p->in, p->in + n);
    // bit-reversal permutation + iterative Cooley-Tukey
    for (unsigned int i = 1, j = 0; i < n; i++) {
        unsigned int bit = n >> 1;
        for (; j & bit; bit >>= 1) j ^= bit;
        j ^= bit;
        if (i < j) std::swap(a[i], a[j]);
    }
    const double sgn = (p->dir == LIQUID_FFT_FORWARD) ? -1.0 : 1.0;
    for (unsigned int len = 2; len <= n; len <<= 1) {
        const double ang = sgn * 2.0 * M_PI / len;
        const std::complex<double> wl(std::cos(ang), std::sin(ang));
        for (unsigned int i = 0; i < n; i += len) {
            std::complex<double> w(1.0, 0.0);
            for (unsigned int k = 0; k < len / 2; k++) {
                const std::complex<double> u = a[i + k];
                const std::complex<double> v = a[i + k + len / 2] * w;
                a[i + k] = u + v;
                a[i + k + len / 2] = u - v;
                w *= wl;
            }
        }
    }
    for (unsigned int i = 0; i < n; i++)
        p->out[i] = std::complex<float>((float)a[i].real(), (float)a[i].imag());
}

typedef enum {
    LIQUID_FEC_UNKNOWN = 0,
    LIQUID_FEC_HAMMING84 = 1,
} fec_scheme;

struct fec_s {
    fec_scheme scheme;
};
typedef fec_s* fec;

inline fec fec_create(fec_scheme fs, void*) { return new fec_s{fs}; }
inline void fec_destroy(fec q) { delete q; }

// the reference's own soft Hamming(8,4) decoder (static inline)
#include <lora/utilities.h>

inline void fec_decode(fec, unsigned int dec_msg_len,
                       unsigned char* msg_enc, unsigned char* msg_dec) {
    for (unsigned int i = 0; i < dec_msg_len; i++) {
        const uint8_t hi = gr::lora::hamming_decode_soft_byte(msg_enc[2 * i]);
        const uint8_t lo =
            gr::lora::hamming_decode_soft_byte(msg_enc[2 * i + 1]);
        msg_dec[i] = (uint8_t)((hi << 4) | lo);
    }
}
#endif
