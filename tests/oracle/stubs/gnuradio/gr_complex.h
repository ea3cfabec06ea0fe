// Test-oracle stub for <gnuradio/gr_complex.h>: the one typedef the
// reference sources use.
#ifndef ORACLE_STUB_GR_COMPLEX_H
#define ORACLE_STUB_GR_COMPLEX_H
#include <complex>
typedef std::complex<float> gr_complex;
#endif
