// Native IQ packer: interleaved complex64 -> split real/imag planes.
//
// The host-side analogue of the reference's VOLK deinterleave kernels
// (gr-lora leans on volk for its vectorised sample conversions; this
// framework's wire format is packed planes — see lora_tpu/ops/xfer.py).
// Packing is the host hot path of streaming ingest: at Gsample/s rates
// the numpy expression (two strided copies + dtype cast) runs well below
// memory bandwidth; this single-pass loop vectorises under -O3 and also
// fuses the optional float32 -> bfloat16 conversion (round-to-nearest-
// even, matching ml_dtypes / XLA semantics incl. NaN quieting) so the
// half-width transfer format costs no extra pass.
//
// C ABI for ctypes (no pybind11 in this environment).

#include <cstddef>
#include <cstdint>
#include <cstring>

namespace {

// float32 -> bfloat16 with round-to-nearest-even (XLA/ml_dtypes parity).
static inline uint16_t f32_to_bf16(float f) {
    uint32_t x;
    std::memcpy(&x, &f, sizeof(x));
    if ((x & 0x7fffffffu) > 0x7f800000u) {  // NaN: quiet, keep payload bit
        return static_cast<uint16_t>((x >> 16) | 0x0040u);
    }
    const uint32_t lsb = (x >> 16) & 1u;
    x += 0x7fffu + lsb;  // round to nearest even
    return static_cast<uint16_t>(x >> 16);
}

}  // namespace

extern "C" {

// interleaved [re0 im0 re1 im1 ...] (2n floats) -> planes re[n], im[n]
void lora_pack_iq_f32(const float* interleaved, size_t n,
                      float* re, float* im) {
    for (size_t i = 0; i < n; i++) {
        re[i] = interleaved[2 * i];
        im[i] = interleaved[2 * i + 1];
    }
}

// same, fused with bf16 conversion (outputs are uint16 bit patterns)
void lora_pack_iq_bf16(const float* interleaved, size_t n,
                       uint16_t* re, uint16_t* im) {
    for (size_t i = 0; i < n; i++) {
        re[i] = f32_to_bf16(interleaved[2 * i]);
        im[i] = f32_to_bf16(interleaved[2 * i + 1]);
    }
}

}  // extern "C"
