// Test-oracle stub for boost::circular_buffer — only the surface the
// reference decoder's power queue uses (capacity ctor, push_back with
// overwrite-oldest, size, operator[]).
#ifndef ORACLE_STUB_BOOST_CIRCULAR_BUFFER_HPP
#define ORACLE_STUB_BOOST_CIRCULAR_BUFFER_HPP
#include <cstddef>
#include <deque>

namespace boost {
template <class T>
class circular_buffer {
 public:
    explicit circular_buffer(size_t capacity) : cap_(capacity) {}
    void push_back(const T& v) {
        if (d_.size() == cap_) d_.pop_front();
        d_.push_back(v);
    }
    size_t size() const { return d_.size(); }
    T& operator[](size_t i) { return d_[i]; }
    const T& operator[](size_t i) const { return d_[i]; }

 private:
    size_t cap_;
    std::deque<T> d_;
};
}  // namespace boost
#endif
