// Test-oracle stub for <lora/debugger.h>: the reference's live-scope
// debugger (lib/debugger.cc, a UNIX-socket sample shipper) is pure
// observability and its methods are only invoked under GRLORA_DEBUG —
// the oracle builds without it, so an inert stand-in keeps the decoder
// linkable without compiling the socket code.
#ifndef ORACLE_STUB_LORA_DEBUGGER_H
#define ORACLE_STUB_LORA_DEBUGGER_H
#include <cstdint>
#include <string>

#include <gnuradio/gr_complex.h>

namespace gr {
namespace lora {
class debugger {
 public:
    debugger() {}
    virtual ~debugger() {}
    void attach(std::string = "/tmp/gr_lora.sock") {}
    void detach() {}
    void analyze_samples(bool, bool) {}
    void store_samples(const gr_complex*, uint32_t) {}
};
}  // namespace lora
}  // namespace gr
#endif
