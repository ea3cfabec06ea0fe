"""Vectorized bit-twiddling ops for the LoRa integer decode chain.

Replicates the scalar helpers in reference ``include/lora/utilities.h``
(``rotl`` :96, ``select_bits`` :209, ``swap_nibbles`` :274) and the gray /
shuffle steps of ``lib/decoder_impl.cc`` as batched integer array ops.

All functions operate on integer arrays of any shape and accept an ``xp``
backend module (numpy or jax.numpy).
"""

from __future__ import annotations

import numpy as np

from ..tables import SHUFFLE_PATTERN, EXTRACT_DATA_INDICES


def gray_encode(x, xp=np):
    """``word = bin ^ (bin >> 1)`` — reference lib/decoder_impl.cc:512.

    (The reference calls this step "decode" but it is the gray *encode*
    direction; names here follow the math.)
    """
    return xp.bitwise_xor(x, xp.right_shift(x, 1))


def gray_decode(x, nbits: int, xp=np):
    """Inverse of :func:`gray_encode` for ``nbits``-wide values (tx side)."""
    y = x
    shift = 1
    while shift < nbits:
        y = xp.bitwise_xor(y, xp.right_shift(x, shift))
        x = y
        shift *= 2
    return y


def rotl(bits, count, size: int, xp=np):
    """Rotate-left of ``size``-bit values — reference utilities.h:96-103."""
    count = count % size
    mask = (1 << size) - 1
    bits = xp.bitwise_and(bits, mask)
    return xp.bitwise_or(
        xp.bitwise_and(xp.left_shift(bits, count), mask),
        xp.right_shift(bits, size - count),
    )


def rotr(bits, count, size: int, xp=np):
    """Rotate-right (tx-side inverse of :func:`rotl`)."""
    return rotl(bits, (size - count) % size, size, xp=xp)


def select_bits(data, indices, xp=np):
    """Gather bits listed in ``indices`` into a compact LSB-first value
    (reference utilities.h:209-216)."""
    out = xp.zeros_like(data)
    for i, idx in enumerate(indices):
        out = xp.bitwise_or(out, xp.left_shift(xp.bitwise_and(xp.right_shift(data, idx), 1), i))
    return out


def swap_nibbles(x, xp=np):
    """Swap the two nibbles of each byte — reference utilities.h:274-278."""
    return xp.bitwise_or(
        xp.left_shift(xp.bitwise_and(x, 0x0F), 4),
        xp.right_shift(xp.bitwise_and(x, 0xF0), 4),
    )


def deshuffle(words, xp=np):
    """Bit permutation: out bit j = in bit ``SHUFFLE_PATTERN[j]``
    (reference lib/decoder_impl.cc:611-637)."""
    out = xp.zeros_like(words)
    for j, src in enumerate(SHUFFLE_PATTERN):
        out = xp.bitwise_or(out, xp.left_shift(xp.bitwise_and(xp.right_shift(words, src), 1), j))
    return out


def shuffle(words, xp=np):
    """Tx-side inverse of :func:`deshuffle`: out bit ``SHUFFLE_PATTERN[j]`` = in bit j."""
    out = xp.zeros_like(words)
    for j, dst in enumerate(SHUFFLE_PATTERN):
        out = xp.bitwise_or(out, xp.left_shift(xp.bitwise_and(xp.right_shift(words, j), 1), dst))
    return out


def extract_data_only(codewords, xp=np):
    """Pull the 4 data bits {1,2,3,5} out of each codeword byte
    (reference lib/decoder_impl.cc:693-706, uncoded CR 4/5-4/6 path)."""
    return select_bits(codewords, EXTRACT_DATA_INDICES, xp=xp)


def pack_nibbles_to_bytes(nibbles, high_first: bool, xp=np):
    """Pack pairs of nibbles into bytes.

    ``high_first=True``:  byte = (n[2i] << 4) | n[2i+1]   (header order,
    liquid-dsp fec_decode packing). ``high_first=False``: byte =
    (n[2i+1] << 4) | n[2i] (payload order after the reference's
    ``swap_nibbles`` — lib/decoder_impl.cc:662-663).

    The nibble count must be even (pad beforehand).
    """
    n = nibbles.reshape(nibbles.shape[:-1] + (-1, 2))
    if high_first:
        return xp.bitwise_or(xp.left_shift(n[..., 0], 4), n[..., 1]).astype(nibbles.dtype)
    return xp.bitwise_or(xp.left_shift(n[..., 1], 4), n[..., 0]).astype(nibbles.dtype)


def unpack_bytes_to_nibbles(data, high_first: bool, xp=np):
    """Inverse of :func:`pack_nibbles_to_bytes` (tx side)."""
    hi = xp.right_shift(xp.bitwise_and(data, 0xF0), 4)
    lo = xp.bitwise_and(data, 0x0F)
    first, second = (hi, lo) if high_first else (lo, hi)
    out = xp.stack([first, second], axis=-1)
    return out.reshape(data.shape[:-1] + (-1,))


def header_checksum_nibbles(length, cr, has_crc, xp=np):
    """PHY header checksum ``(msn, lsn)`` over the 12 header bits.

    The single source of the five parity equations (bit ordering per
    reference ``utilities.h:396-404``, which documents but never
    verifies them): the tx builder (``io/frames``) and the opt-in rx
    verification (``ops/decode.header_checksum_valid``) both call this,
    so the bit order can never diverge between the two sides. Works on
    scalars or integer arrays (``xp`` in {numpy, jax.numpy}).
    """
    n0 = (length >> 4) & 0x0F
    n1 = length & 0x0F
    n2 = ((cr & 0x7) << 1) | (has_crc & 0x1)

    def b(v, i):
        return (v >> i) & 1

    c4 = b(n0, 3) ^ b(n0, 2) ^ b(n0, 1) ^ b(n0, 0)
    c3 = b(n0, 3) ^ b(n1, 3) ^ b(n1, 2) ^ b(n1, 1) ^ b(n2, 0)
    c2 = b(n0, 2) ^ b(n1, 3) ^ b(n1, 0) ^ b(n2, 3) ^ b(n2, 1)
    c1 = b(n0, 1) ^ b(n1, 2) ^ b(n1, 0) ^ b(n2, 2) ^ b(n2, 1) ^ b(n2, 0)
    c0 = b(n0, 0) ^ b(n1, 1) ^ b(n2, 3) ^ b(n2, 2) ^ b(n2, 1) ^ b(n2, 0)
    return c4, (c3 << 3) | (c2 << 2) | (c1 << 1) | c0
