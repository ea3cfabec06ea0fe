// External correctness oracle: compiles the reference's OWN self-contained
// headers (include/lora/utilities.h, lib/tables.h) into a small CLI binary so
// the Python decode chain can be cross-validated against the reference's
// compiled code rather than against this repo's own re-implementation.
//
// No reference code is copied into this repo: the headers are included
// directly from /root/reference at build time (see tests/test_oracle.py for
// the g++ invocation). This file only *drives* those inline functions.
//
// Modes (argv[1]) write space-separated decimal ints to stdout:
//   enc_table        16 values: hamming_encode_soft(v) for v in 0..15
//                    (reference include/lora/utilities.h:257-264)
//   dec_table        256 values: hamming_decode_soft_byte(v) for v in 0..255
//                    (utilities.h:288-339 syndrome LUT decoder)
//   swap_table       256 values: swap_nibbles({v}) (utilities.h:274-278)
//   extract_table    256 values: select_bits(v, {1,2,3,5}, 4)
//                    (lib/decoder_impl.cc:693-706 data-bit extraction)
//   deshuffle_table  256 values: select_bits(v, {5,0,1,2,4,3,6,7}, 8)
//                    (== the deshuffle loop, lib/decoder_impl.cc:611-623)
//   gray_table SF    2^SF values: bin ^ (bin >> 1) (decoder_impl.cc:512)
//   prng             3 lines: prng_header / prng_payload_cr56 /
//                    prng_payload_cr78 (lib/tables.h), length-prefixed
//   rotl             stdin triples "bits count size" -> rotl (utilities.h:96)
//   parity           256 values: check_parity(v, even=true) (utilities.h:189)
//   decode_block     stdin: "is_header cr skip_rows n_blocks" then per block
//                    "ppm n_words w0..w{n-1}" (post-gray demodulated words).
//                    Deinterleaves every block (decoder_impl.cc:535-565, via
//                    gr::lora::rotl), accumulates rows like d_demodulated,
//                    drops the first skip_rows rows (the 5 header codewords a
//                    payload decode never sees, :631-637), then deshuffle
//                    (:611-623, via select_bits) + dewhiten (:639-652, via
//                    tables.h) + the soft Hamming path (:677-691 packing,
//                    same codebook as the runtime liquid HAMMING84 path) or
//                    extract_data_only (:693-706). Prints the decoded bytes.
#include <cstdint>
#include <cstring>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include <lora/utilities.h>  // reference include/lora/utilities.h (unmodified)
#include <tables.h>          // reference lib/tables.h (unmodified)

using namespace gr::lora;

static const uint8_t kShufflePattern[8] = {5, 0, 1, 2, 4, 3, 6, 7};
static const uint8_t kDataIndices[4] = {1, 2, 3, 5};

// Reference deinterleave, decoder_impl.cc:535-565: rotate word i left by i,
// then transpose bit columns (MSB column -> row 0 bit i).
static std::vector<uint8_t> deinterleave(const std::vector<uint32_t>& words,
                                         uint32_t ppm) {
    const uint32_t bits_per_word = (uint32_t)words.size();
    const uint32_t offset_start = ppm - 1u;
    std::vector<uint8_t> out(ppm, 0u);
    for (uint32_t i = 0u; i < bits_per_word; i++) {
        const uint32_t word = rotl(words[i], i, ppm);
        for (uint32_t j = (1u << offset_start), x = offset_start; j; j >>= 1u, x--)
            out[x] |= !!(word & j) << i;
    }
    return out;
}

int main(int argc, char** argv) {
    if (argc < 2) {
        std::cerr << "usage: reference_oracle <mode>" << std::endl;
        return 2;
    }
    const std::string mode = argv[1];

    if (mode == "enc_table") {
        for (int v = 0; v < 16; v++)
            std::cout << (int)hamming_encode_soft((uint8_t)v) << " ";
        std::cout << std::endl;
    } else if (mode == "dec_table") {
        for (int v = 0; v < 256; v++)
            std::cout << (int)hamming_decode_soft_byte((uint8_t)v) << " ";
        std::cout << std::endl;
    } else if (mode == "swap_table") {
        for (int v = 0; v < 256; v++) {
            uint8_t b = (uint8_t)v;
            swap_nibbles(&b, 1);
            std::cout << (int)b << " ";
        }
        std::cout << std::endl;
    } else if (mode == "extract_table") {
        for (int v = 0; v < 256; v++)
            std::cout << (int)(select_bits((uint32_t)v, kDataIndices, 4u) & 0xFF)
                      << " ";
        std::cout << std::endl;
    } else if (mode == "deshuffle_table") {
        for (int v = 0; v < 256; v++)
            std::cout << (int)(select_bits((uint32_t)v, kShufflePattern, 8u) & 0xFF)
                      << " ";
        std::cout << std::endl;
    } else if (mode == "gray_table") {
        if (argc < 3) return 2;
        const uint32_t sf = (uint32_t)std::stoul(argv[2]);
        for (uint32_t b = 0; b < (1u << sf); b++)
            std::cout << (b ^ (b >> 1u)) << " ";
        std::cout << std::endl;
    } else if (mode == "prng") {
        auto dump = [](const uint8_t* t, size_t n) {
            std::cout << n;
            for (size_t i = 0; i < n; i++) std::cout << " " << (int)t[i];
            std::cout << std::endl;
        };
        dump(prng_header, sizeof(prng_header));
        dump(prng_payload_cr56, sizeof(prng_payload_cr56));
        dump(prng_payload_cr78, sizeof(prng_payload_cr78));
    } else if (mode == "rotl") {
        uint32_t bits, count, size;
        while (std::cin >> bits >> count >> size)
            std::cout << rotl(bits, count, size) << " ";
        std::cout << std::endl;
    } else if (mode == "parity") {
        for (int v = 0; v < 256; v++)
            std::cout << (check_parity((uint64_t)v, true) ? 1 : 0) << " ";
        std::cout << std::endl;
    } else if (mode == "decode_block") {
        int is_header, cr;
        uint32_t skip_rows, n_blocks;
        if (!(std::cin >> is_header >> cr >> skip_rows >> n_blocks)) return 2;
        // Demodulated words -> deinterleaved rows (accumulated across blocks
        // like d_demodulated, decoder_impl.cc:559-560)
        std::vector<uint8_t> demodulated;
        for (uint32_t b = 0; b < n_blocks; b++) {
            uint32_t ppm, n_words;
            std::cin >> ppm >> n_words;
            std::vector<uint32_t> words(n_words);
            for (uint32_t i = 0; i < n_words; i++) std::cin >> words[i];
            auto rows = deinterleave(words, ppm);
            demodulated.insert(demodulated.end(), rows.begin(), rows.end());
        }
        // payload decode starts after the 5 header codewords (:631-637)
        demodulated.erase(demodulated.begin(), demodulated.begin() + skip_rows);
        // deshuffle (decoder_impl.cc:611-637): header keeps 5 rows + 0 pad
        const uint32_t to_decode =
            is_header ? 5u : (uint32_t)demodulated.size();
        std::vector<uint8_t> deshuffled;
        for (uint32_t i = 0; i < to_decode; i++)
            deshuffled.push_back(
                (uint8_t)(select_bits(demodulated[i], kShufflePattern, 8u) & 0xFF));
        if (is_header) deshuffled.push_back(0);
        // dewhiten (:639-652)
        const uint8_t* prng = is_header ? prng_header
                              : (cr <= 2) ? prng_payload_cr56
                                          : prng_payload_cr78;
        std::vector<uint8_t> dewhitened;
        for (size_t i = 0; i < deshuffled.size(); i++)
            dewhitened.push_back(deshuffled[i] ^ prng[i]);
        // hamming_decode (:654-675): CR 3/4 -> Hamming(8,4) soft path
        // (:677-691; same codebook as the runtime liquid HAMMING84 branch),
        // CR 1/2 -> extract_data_only (:693-706).
        std::vector<uint8_t> decoded;
        const size_t len = dewhitened.size();
        if (cr >= 3) {
            for (size_t i = 0; i < len; i += 2) {
                const uint8_t d2 =
                    (i + 1 < len) ? hamming_decode_soft_byte(dewhitened[i + 1]) : 0u;
                const uint8_t d1 = hamming_decode_soft_byte(dewhitened[i]);
                decoded.push_back(is_header ? (uint8_t)((d1 << 4) | d2)
                                            : (uint8_t)((d2 << 4) | d1));
            }
        } else {
            for (size_t i = 0; i < len; i += 2) {
                const uint8_t d2 =
                    (i + 1 < len)
                        ? (uint8_t)(select_bits(dewhitened[i + 1], kDataIndices, 4u) & 0xFF)
                        : 0u;
                const uint8_t d1 =
                    (uint8_t)(select_bits(dewhitened[i], kDataIndices, 4u) & 0xFF);
                decoded.push_back(is_header ? (uint8_t)((d1 << 4) | d2)
                                            : (uint8_t)((d2 << 4) | d1));
            }
        }
        for (uint8_t b : decoded) std::cout << (int)b << " ";
        std::cout << std::endl;
    } else {
        std::cerr << "unknown mode: " << mode << std::endl;
        return 2;
    }
    return 0;
}
