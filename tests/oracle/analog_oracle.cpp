// Analog-path external oracle: compiles the reference's OWN decoder
// source (/root/reference/lib/decoder_impl.cc, included unmodified at
// build time — no reference code is copied into this repo) against the
// inert dependency stubs in tests/oracle/stubs/ (gnuradio block base,
// volk loop kernels, liquid FFT/FEC, boost circular_buffer), then
// drives its private DSP member functions directly on IQ windows fed
// through stdin. This extends the integer-chain oracle
// (reference_oracle.cpp) to the ANALOG half of the receiver: the chirp
// tables, instantaneous-frequency demod, sync correlators and FFT
// demod the repo's ops/chirp.py + ops/demod.py mirror
// (lib/decoder_impl.cc:140-491).
//
// The decoder members are private; the oracle is a test binary, so the
// classic access hack below is acceptable — nothing links against this
// TU.
//
// Invocation: analog_oracle <mode> <samp_rate> <bw> <sf> [args...]
// IQ windows stream on stdin as whitespace-separated "re im" float
// pairs; one result line per window, prefixed "O " (the reference
// constructor prints its banner to stdout — callers filter on the
// prefix). Modes:
//   chirps           no stdin; 5 lines: downchirp re/im, upchirp re/im,
//                    downchirp_ifreq, upchirp_ifreq, upchirp_ifreq_v
//                    (build_ideal_chirps, :140-175)
//   ifreq            windows of sps -> sps ifreq values (:224-249)
//   autocorr         windows of 2*sps -> detect_preamble_autocorr
//                    (:340-366)
//   detect_upchirp   windows of 2*sps -> "index corr"
//                    (detect_upchirp + sliding_norm_cross_correlate_
//                    upchirp, :392-413)
//   detect_downchirp windows of sps -> Pearson corr (:385-390)
//   max_gradient     windows of sps -> demod bin
//                    (max_frequency_gradient_idx, :466-491)
//   shift_fft        windows of sps -> demod bin (get_shift_fft,
//                    :428-463; liquid FFT stubbed with an exact-math
//                    radix-2 DFT)
//   fine_sync        records "bin search re im ... (sps pairs)" ->
//                    d_fine_sync (:300-338)
#include <algorithm>
#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fstream>
#include <iomanip>
#include <iostream>
#include <memory>
#include <numeric>
#include <sstream>
#include <string>
#include <vector>

#define private public
#define protected public
#include "decoder_impl.cc"  // the reference's source, from /root/reference/lib
#undef private
#undef protected

using gr::lora::decoder_impl;

static bool read_window(std::vector<gr_complex>& w, size_t n) {
    w.resize(n);
    for (size_t i = 0; i < n; i++) {
        float re, im;
        if (!(std::cin >> re >> im)) return false;
        w[i] = gr_complex(re, im);
    }
    return true;
}

static void print_floats(const float* v, size_t n) {
    std::cout << "O";
    for (size_t i = 0; i < n; i++) std::cout << " " << v[i];
    std::cout << "\n";
}

int main(int argc, char** argv) {
    if (argc < 5) {
        std::cerr << "usage: analog_oracle <mode> <samp_rate> <bw> <sf>"
                  << std::endl;
        return 2;
    }
    std::cout << std::setprecision(9);
    const std::string mode = argv[1];
    const float samp_rate = std::stof(argv[2]);
    const uint32_t bw = (uint32_t)std::stoul(argv[3]);
    const uint8_t sf = (uint8_t)std::stoul(argv[4]);
    decoder_impl dec(samp_rate, bw, sf, /*implicit=*/false, /*cr=*/4,
                     /*crc=*/true, /*reduced_rate=*/false,
                     /*disable_drift_correction=*/false);
    const uint32_t sps = dec.d_samples_per_symbol;
    std::vector<gr_complex> w;

    if (mode == "chirps") {
        std::vector<float> re(sps), im(sps);
        for (uint32_t i = 0; i < sps; i++) {
            re[i] = dec.d_downchirp[i].real();
            im[i] = dec.d_downchirp[i].imag();
        }
        print_floats(re.data(), sps);
        print_floats(im.data(), sps);
        for (uint32_t i = 0; i < sps; i++) {
            re[i] = dec.d_upchirp[i].real();
            im[i] = dec.d_upchirp[i].imag();
        }
        print_floats(re.data(), sps);
        print_floats(im.data(), sps);
        print_floats(dec.d_downchirp_ifreq.data(), sps);
        print_floats(dec.d_upchirp_ifreq.data(), sps);
        print_floats(dec.d_upchirp_ifreq_v.data(), 3 * sps);
    } else if (mode == "ifreq") {
        std::vector<float> ifreq(sps);
        while (read_window(w, sps)) {
            dec.instantaneous_frequency(w.data(), ifreq.data(), sps);
            print_floats(ifreq.data(), sps);
        }
    } else if (mode == "autocorr") {
        while (read_window(w, 2 * sps))
            std::cout << "O " << dec.detect_preamble_autocorr(w.data(), sps)
                      << "\n";
    } else if (mode == "detect_upchirp") {
        while (read_window(w, 2 * sps)) {
            int32_t idx = 0;
            const float c = dec.detect_upchirp(w.data(), sps, &idx);
            std::cout << "O " << idx << " " << c << "\n";
        }
    } else if (mode == "detect_downchirp") {
        while (read_window(w, sps))
            std::cout << "O " << dec.detect_downchirp(w.data(), sps) << "\n";
    } else if (mode == "max_gradient") {
        while (read_window(w, sps))
            std::cout << "O " << dec.max_frequency_gradient_idx(w.data())
                      << "\n";
    } else if (mode == "shift_fft") {
        while (read_window(w, sps))
            std::cout << "O " << dec.get_shift_fft(w.data()) << "\n";
    } else if (mode == "fine_sync") {
        int32_t bin, search;
        while (std::cin >> bin >> search) {
            if (!read_window(w, sps)) break;
            dec.d_fine_sync = 0;
            dec.fine_sync(w.data(), bin, search);
            std::cout << "O " << dec.d_fine_sync << "\n";
        }
    } else {
        std::cerr << "unknown mode: " << mode << std::endl;
        return 2;
    }
    return 0;
}
