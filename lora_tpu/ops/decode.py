"""Shared jit-friendly integer decode chain (gray -> ... -> payload bytes).

These are the fixed-shape, masked-array forms of the reference decode steps
(lib/decoder_impl.cc:535-706) used inside both the parity state-machine
receiver and the dense throughput receiver. All inputs/outputs are int32
arrays; LUTs are host numpy constants embedded at trace time.
"""

from __future__ import annotations

import numpy as np

from . import bits
from .hamming import HAMMING84_DECODE_LUT
from ..tables import PRNG_PAYLOAD_CR56, PRNG_PAYLOAD_CR78

_HAM_LUT_I32 = HAMMING84_DECODE_LUT.astype(np.int32)


def payload_prng(n: int) -> tuple:
    """Zero-padded whitening tables ``(cr56, cr78)`` as int32[n] numpy."""
    t56 = np.zeros(n, np.int32)
    t78 = np.zeros(n, np.int32)
    m56 = min(n, len(PRNG_PAYLOAD_CR56))
    m78 = min(n, len(PRNG_PAYLOAD_CR78))
    t56[:m56] = PRNG_PAYLOAD_CR56[:m56]
    t78[:m78] = PRNG_PAYLOAD_CR78[:m78]
    return t56, t78


def deinterleave_words(words, n_valid, ppm: int, xp):
    """Diagonal deinterleave of one block (reference :535-565), traced.

    ``words``: int32 ``[..., n_words_max]`` (entries past ``n_valid``
    ignored); returns rows int32 ``[..., ppm]`` where row x bit i =
    bit x of ``rotl(words[i], i, ppm)``.
    """
    n_words_max = words.shape[-1]
    rot = xp.stack(
        [bits.rotl(words[..., i], i, ppm, xp=xp) for i in range(n_words_max)],
        axis=-1,
    )  # [..., n_words_max]
    i_idx = np.arange(n_words_max)
    x_idx = np.arange(ppm)
    bits_mat = (rot[..., :, None] >> x_idx) & 1          # [..., n_words, ppm]
    n_valid = xp.asarray(n_valid)
    in_block = xp.asarray(i_idx)[:, None] < n_valid[..., None, None]
    contrib = xp.where(in_block, bits_mat << i_idx[:, None], 0)
    return xp.sum(contrib, axis=-2).astype("int32")    # [..., ppm]


def decode_header(rows5, xp):
    """decode(true): 5 codeword rows -> 3 header bytes (reference :826-852).

    Returns int32 ``[..., 3]``.
    """
    deshuffled = bits.deshuffle(rows5, xp=xp)
    zeros = xp.zeros(rows5.shape[:-1] + (1,), "int32")
    cw = xp.concatenate([deshuffled, zeros], axis=-1)  # 6 codewords, prng=0
    nib = xp.take(_HAM_LUT_I32, cw)
    return xp.stack(
        [
            (nib[..., 0] << 4) | nib[..., 1],
            (nib[..., 2] << 4) | nib[..., 3],
            (nib[..., 4] << 4) | nib[..., 5],
        ],
        axis=-1,
    ).astype("int32")


def parse_header(hdr_bytes, xp):
    """loraphy bitfields + cr clamp (reference :833-838).

    Returns ``(length, cr, has_mac_crc)`` int32.
    """
    length = hdr_bytes[..., 0]
    cr = xp.minimum((hdr_bytes[..., 1] >> 5) & 0x7, 4)
    has_crc = (hdr_bytes[..., 1] >> 4) & 0x1
    return length, cr, has_crc


def payload_symbol_budget(length_with_crc, cr, sf: int, reduced_rate: bool, xp):
    """reference :842-847 in float32 (matches the C++ float math)."""
    red = np.float32(2.0 if reduced_rate else 0.0)
    spb = (cr + 4).astype("float32")
    bits_needed = length_with_crc.astype("float32") * np.float32(8.0)
    symbols_needed = bits_needed * (spb / np.float32(4.0)) / (np.float32(sf) - red)
    return (xp.ceil(symbols_needed / spb) * spb).astype("int32")


def decode_payload(codewords, n_valid, cr, xp):
    """decode(false) over the full masked codeword buffer.

    ``codewords``: int32 ``[..., CW]``; ``n_valid``, ``cr``: int32 ``[...]``.
    Returns decoded bytes int32 ``[..., CW//2]`` (entries past the payload
    length are meaningless, as in the reference).
    """
    CW = codewords.shape[-1]
    idx = np.arange(CW)
    valid = xp.asarray(idx) < n_valid[..., None]
    deshuffled = bits.deshuffle(codewords, xp=xp) & 0xFF
    t56, t78 = payload_prng(CW)
    prng = xp.where((cr <= 2)[..., None], xp.asarray(t56), xp.asarray(t78))
    dewhitened = xp.where(valid, deshuffled ^ prng, 0)
    if CW % 2:  # pad to an even codeword count for nibble pairing
        pad = [(0, 0)] * (dewhitened.ndim - 1) + [(0, 1)]
        dewhitened = xp.pad(dewhitened, pad)

    # cr 4/3: hamming84 -> nibbles -> (n0<<4|n1) -> swap_nibbles
    nib = xp.take(_HAM_LUT_I32, dewhitened)
    b_ham = (nib[..., 0::2] << 4) | nib[..., 1::2]
    b_ham = ((b_ham & 0x0F) << 4) | ((b_ham & 0xF0) >> 4)
    # cr 2/1: data-bit extraction, payload packing (second<<4 | first)
    data = bits.extract_data_only(dewhitened, xp=xp)
    b_raw = (data[..., 1::2] << 4) | data[..., 0::2]

    crb = cr[..., None]
    return xp.where(crb >= 3, b_ham, xp.where(crb >= 1, b_raw, 0)).astype("int32")
