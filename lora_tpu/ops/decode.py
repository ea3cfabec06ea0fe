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


def header_checksum_valid(hdr_bytes, xp):
    """Verify the PHY header checksum nibbles (rx side).

    The reference documents the checksum bit order but never verifies it
    (``header_checksum`` returns true, reference utilities.h:396-404);
    the tx here computes it, so rx verification is nearly free and
    prunes false frames on noise-driven candidate lanes. The parity
    equations are shared with the tx builder
    (``ops/bits.header_checksum_nibbles``) so the two sides cannot
    diverge. ``hdr_bytes``: int ``[..., 3]``. Returns bool ``[...]``.
    """
    length = hdr_bytes[..., 0]
    b1 = hdr_bytes[..., 1]
    b2 = hdr_bytes[..., 2]
    crc_msn = b1 & 0x0F
    has = (b1 >> 4) & 0x1
    cr = (b1 >> 5) & 0x7
    # On the wire the checksum LSN is byte 2's HIGH nibble (header
    # nibble n4; demo header ``04 90 40``: lsn=4 -> 0x40) — the
    # loraphy.h bitfield named ``crc_lsn`` actually holds the padding
    # nibble n5. Verified against the reference demo trace header.
    crc_lsn = (b2 >> 4) & 0x0F
    c_msn, c_lsn = bits.header_checksum_nibbles(length, cr, has, xp=xp)
    return (crc_msn == c_msn) & (crc_lsn == c_lsn)


def payload_symbol_budget(length_with_crc, cr, sf: int, reduced_rate: bool, xp):
    """reference :842-847 in float32 (matches the C++ float math)."""
    red = np.float32(2.0 if reduced_rate else 0.0)
    spb = (cr + 4).astype("float32")
    bits_needed = length_with_crc.astype("float32") * np.float32(8.0)
    symbols_needed = bits_needed * (spb / np.float32(4.0)) / (np.float32(sf) - red)
    return (xp.ceil(symbols_needed / spb) * spb).astype("int32")


def make_payload_nibble_lut(n_codewords: int) -> np.ndarray:
    """Fused deshuffle+dewhiten+FEC table for :func:`decode_payload_lut`.

    The payload tail (reference lib/decoder_impl.cc:567-706) maps each
    codeword byte through three per-position-constant steps — the
    ``{5,0,1,2,4,3,6,7}`` deshuffle, the whitening XOR, and either the
    Hamming(8,4) syndrome decode (CR 4/7-4/8) or the data-bit extraction
    (CR 4/5-4/6). Composed, that is one 256-entry nibble table per
    (variant, codeword position):

    ``lut[v, k, c] = f_v(deshuffle(c) ^ prng_v[k])``

    with ``v=0`` the raw/CR<=2 variant (prng_cr56 + extract) and ``v=1``
    the Hamming/CR>=3 variant (prng_cr78 + HLUT). Returns int32
    ``[2, n_codewords, 256]`` (512 KB at 256 codewords) — turning the
    decode tail's ~2 dozen tiny int ops into a single gather, which
    matters because the per-lane arrays are small enough that the tail is
    dispatch-bound, not FLOP-bound (docs/perf/NOTES.md headroom #2).
    """
    c = np.arange(256, dtype=np.int32)
    desh = bits.deshuffle(c, xp=np)
    t56, t78 = payload_prng(n_codewords)
    lut = np.zeros((2, n_codewords, 256), np.int32)
    lut[0] = bits.extract_data_only(desh[None, :] ^ t56[:, None], xp=np)
    lut[1] = _HAM_LUT_I32[desh[None, :] ^ t78[:, None]]
    return lut


def decode_payload_lut(codewords, n_valid, cr, lut, xp):
    """:func:`decode_payload` via the fused table — bit-identical output.

    ``lut`` must be ``make_payload_nibble_lut(CW)`` (as a device or host
    constant) for ``CW = codewords.shape[-1]``. Shapes/dtypes as in
    :func:`decode_payload`.
    """
    CW = codewords.shape[-1]
    idx = np.arange(CW, dtype=np.int32)
    v = (cr >= 3).astype("int32")
    flat = (
        v[..., None] * np.int32(CW * 256)
        + xp.asarray(idx * 256)
        + (codewords & 0xFF)
    )
    nib = xp.take(xp.asarray(lut).reshape(-1), flat)
    # positions >= n_valid decode a zero byte (decode_payload zeroes
    # `dewhitened` there): extract(0) = 0, HLUT[0] = hamming nibble of 0
    nib0 = xp.where(cr >= 3, np.int32(_HAM_LUT_I32[0]), np.int32(0))
    nib = xp.where(xp.asarray(idx) < n_valid[..., None], nib, nib0[..., None])
    if CW % 2:
        pad = [(0, 0)] * (nib.ndim - 1) + [(0, 1)]
        nib = xp.pad(nib, pad, constant_values=0)
        nib = xp.where(  # the pad nibble is nib0, as in decode_payload
            xp.asarray(np.arange(CW + 1) == CW), nib0[..., None], nib
        )
    # both variants pack as (odd << 4) | even: the Hamming path's
    # (n0<<4|n1) + swap_nibbles == the raw path's (second<<4 | first)
    b = (nib[..., 1::2] << 4) | nib[..., 0::2]
    return xp.where((cr >= 1)[..., None], b, 0).astype("int32")


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
