// Test-oracle stub for <gnuradio/io_signature.h>: the decoder block's
// constructor passes signatures to the (stub) sync_block base, which
// ignores them — no scheduler exists in the oracle.
#ifndef ORACLE_STUB_GR_IO_SIGNATURE_H
#define ORACLE_STUB_GR_IO_SIGNATURE_H
#include <memory>

namespace gr {
class io_signature {
 public:
    typedef std::shared_ptr<io_signature> sptr;
    static sptr make(int, int, size_t) { return nullptr; }
};
}  // namespace gr
#endif
