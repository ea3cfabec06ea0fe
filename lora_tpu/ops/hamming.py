"""Hamming(8,4) FEC as 16/256-entry lookup tables, vectorized.

Replaces liquid-dsp's ``fec_create(LIQUID_FEC_HAMMING84)`` used by the
reference (``lib/decoder_impl.cc:112-117,654-665``).

Codeword bit layout (LSB first): ``p1 d0 d1 d2 p2 d3 p3 p4`` where

- ``p1 = d1^d2^d3``, ``p2 = d0^d1^d2``, ``p3 = d0^d1^d3``, ``p4 = d0^d2^d3``

matching the reference encoder ``hamming_encode_soft``
(``include/lora/utilities.h:257-264``); the first 16 codewords of this
encoder coincide with liquid-dsp's ``hamming84_enc_gentab``, so decode
behaviour on correctable inputs is identical to the reference's
``fec_decode`` path.

Decoding corrects any single bit error via the syndrome LUT of
``hamming_decode_soft_byte`` (``utilities.h:288-339``): syndrome nibble
``(p1err, p2err, p3err, p4err)`` maps to the flipped bit position.

The 256-entry byte->nibble table is built at import time (pure numpy) and
can be wrapped as a jnp array for on-device decode (a 256-gather is a single
VPU-friendly table lookup).
"""

from __future__ import annotations

import numpy as np


def _bit(v, i):
    return (v >> i) & 1


def _encode_nibble(v: int) -> int:
    d0, d1, d2, d3 = _bit(v, 0), _bit(v, 1), _bit(v, 2), _bit(v, 3)
    p1 = d1 ^ d2 ^ d3
    p2 = d0 ^ d1 ^ d2
    p3 = d0 ^ d1 ^ d3
    p4 = d0 ^ d2 ^ d3
    # pack_byte(p1, d0, d1, d2, p2, d3, p3, p4) LSB-first
    return (
        p1 | (d0 << 1) | (d1 << 2) | (d2 << 3) | (p2 << 4) | (d3 << 5) | (p3 << 6) | (p4 << 7)
    )


def _build_tables():
    enc = np.array([_encode_nibble(v) for v in range(16)], dtype=np.uint8)

    # Syndrome -> flipped-bit-position LUT (reference utilities.h:318-319).
    H = np.array([0x0, 0x0, 0x4, 0x0, 0x6, 0x0, 0x0, 0x2,
                  0x7, 0x0, 0x0, 0x3, 0x0, 0x5, 0x1, 0x0], dtype=np.uint8)

    dec = np.zeros(256, dtype=np.uint8)
    for v in range(256):
        p1, p2, p3, p4 = _bit(v, 0), _bit(v, 4), _bit(v, 6), _bit(v, 7)
        p1c = _bit(v, 2) ^ _bit(v, 3) ^ _bit(v, 5)
        p2c = _bit(v, 1) ^ _bit(v, 2) ^ _bit(v, 3)
        p3c = _bit(v, 1) ^ _bit(v, 2) ^ _bit(v, 5)
        p4c = _bit(v, 1) ^ _bit(v, 3) ^ _bit(v, 5)
        syndrome = (
            (p1 != p1c) | ((p2 != p2c) << 1) | ((p3 != p3c) << 2) | ((p4 != p4c) << 3)
        )
        w = v ^ (1 << int(H[syndrome])) if syndrome else v
        dec[v] = _bit(w, 1) | (_bit(w, 2) << 1) | (_bit(w, 3) << 2) | (_bit(w, 5) << 3)
    return enc, dec


HAMMING84_ENCODE_LUT, HAMMING84_DECODE_LUT = _build_tables()


def hamming84_encode(nibbles, xp=np, lut=None):
    """nibble array -> codeword byte array (elementwise LUT gather)."""
    lut = HAMMING84_ENCODE_LUT if lut is None else lut
    if xp is np:
        return lut[np.asarray(nibbles, dtype=np.uint8) & 0x0F]
    return xp.take(lut, xp.bitwise_and(nibbles, 0x0F).astype("int32"))


def hamming84_decode(codewords, xp=np, lut=None):
    """codeword byte array -> corrected data nibble array."""
    lut = HAMMING84_DECODE_LUT if lut is None else lut
    if xp is np:
        return lut[np.asarray(codewords, dtype=np.uint8)]
    return xp.take(lut, codewords.astype("int32"))
