// Test-oracle stub for <volk/volk.h>: the five kernels the reference
// decoder calls, as their generic (plain-loop) implementations — VOLK's
// SIMD variants compute the same sums; the generic form is the kernel's
// defining semantics.
#ifndef ORACLE_STUB_VOLK_H
#define ORACLE_STUB_VOLK_H
#include <complex>

typedef std::complex<float> lv_32fc_t;

inline void volk_32fc_x2_conjugate_dot_prod_32fc(lv_32fc_t* result,
                                                 const lv_32fc_t* a,
                                                 const lv_32fc_t* b,
                                                 unsigned int n) {
    lv_32fc_t acc(0.0f, 0.0f);
    for (unsigned int i = 0; i < n; i++) acc += a[i] * std::conj(b[i]);
    *result = acc;
}

inline void volk_32fc_magnitude_squared_32f(float* out, const lv_32fc_t* in,
                                            unsigned int n) {
    for (unsigned int i = 0; i < n; i++)
        out[i] = in[i].real() * in[i].real() + in[i].imag() * in[i].imag();
}

inline void volk_32f_accumulator_s32f(float* result, const float* in,
                                      unsigned int n) {
    float acc = 0.0f;
    for (unsigned int i = 0; i < n; i++) acc += in[i];
    *result = acc;
}

inline void volk_32f_x2_dot_prod_32f(float* result, const float* a,
                                     const float* b, unsigned int n) {
    float acc = 0.0f;
    for (unsigned int i = 0; i < n; i++) acc += a[i] * b[i];
    *result = acc;
}

inline void volk_32fc_x2_multiply_32fc(lv_32fc_t* out, const lv_32fc_t* a,
                                       const lv_32fc_t* b, unsigned int n) {
    for (unsigned int i = 0; i < n; i++) out[i] = a[i] * b[i];
}
#endif
