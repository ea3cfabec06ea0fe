// Test-oracle stub for <gnuradio/expj.h>. GNU Radio's gr_expj(phase)
// returns the unit phasor exp(j*phase); the reference's
// build_ideal_chirps (lib/decoder_impl.cc:150-168) is its only user here.
#ifndef ORACLE_STUB_GR_EXPJ_H
#define ORACLE_STUB_GR_EXPJ_H
#include <cmath>
#include <gnuradio/gr_complex.h>

static inline gr_complex gr_expj(float phase) {
    return gr_complex(std::cos(phase), std::sin(phase));
}
#endif
