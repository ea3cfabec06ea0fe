// Test-oracle stub for <gnuradio/sync_block.h> + the minimal pmt surface
// the reference decoder touches. The oracle never runs the GNU Radio
// scheduler: the block base is inert (consume_each / message ports are
// no-ops) and the oracle drives the decoder's DSP member functions
// directly (tests/oracle/analog_oracle.cpp).
#ifndef ORACLE_STUB_GR_SYNC_BLOCK_H
#define ORACLE_STUB_GR_SYNC_BLOCK_H
#include <cstddef>
#include <memory>
#include <string>
#include <vector>

#include <gnuradio/io_signature.h>

namespace pmt {
typedef std::shared_ptr<void> pmt_t;
inline pmt_t mp(const std::string&) { return nullptr; }
inline pmt_t intern(const std::string&) { return nullptr; }
inline pmt_t make_blob(const void*, size_t) { return nullptr; }
inline pmt_t from_double(double) { return nullptr; }
inline pmt_t cons(const pmt_t&, const pmt_t&) { return nullptr; }
}  // namespace pmt

typedef std::vector<const void*> gr_vector_const_void_star;
typedef std::vector<void*> gr_vector_void_star;

namespace gr {
class sync_block {
 public:
    sync_block(const std::string&, io_signature::sptr, io_signature::sptr) {}
    virtual ~sync_block() {}
    virtual int work(int noutput_items,
                     gr_vector_const_void_star& input_items,
                     gr_vector_void_star& output_items) = 0;
    void set_output_multiple(int) {}
    void consume_each(int) {}
    void message_port_register_out(pmt::pmt_t) {}
    void message_port_pub(pmt::pmt_t, pmt::pmt_t) {}
};
}  // namespace gr

namespace gnuradio {
template <class T>
std::shared_ptr<T> get_initial_sptr(T* p) {
    return std::shared_ptr<T>(p);
}
}  // namespace gnuradio
#endif
