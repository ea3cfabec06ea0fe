"""Opt-in rx PHY-header checksum verification (round 4).

The reference documents the checksum bit order but stubs the check
(reference utilities.h:396-404 returns true); the tx here computes it
(io/frames.header_checksum_nibbles), so rx verification prunes
noise-born false frames at dense-scan scale. On the wire, byte 1's low
nibble carries the checksum MSN and byte 2's HIGH nibble the LSN (demo
header ``04 90 40``: msn=0, lsn=4).
"""

import numpy as np
import pytest

from lora_tpu import LoRaConfig
from lora_tpu.io.frames import header_checksum_nibbles
from lora_tpu.ops import decode as dec
from lora_tpu.rx.dense import DenseReceiver
from lora_tpu.tx.modulator import modulate_frame


def _wire_header(length, cr, has_crc):
    msn, lsn = header_checksum_nibbles(length, cr, has_crc)
    return np.array([
        length & 0xFF,
        (msn & 0x0F) | ((1 if has_crc else 0) << 4) | ((cr & 0x7) << 5),
        (lsn & 0x0F) << 4,
    ], dtype=np.int32)


@pytest.mark.parametrize("length", [1, 4, 37, 255])
@pytest.mark.parametrize("cr", [1, 2, 3, 4])
@pytest.mark.parametrize("has_crc", [False, True])
def test_checksum_valid_on_wire_headers(length, cr, has_crc):
    hdr = _wire_header(length, cr, has_crc)
    assert bool(dec.header_checksum_valid(hdr, xp=np))


def test_checksum_rejects_corrupted_fields():
    hdr = _wire_header(4, 4, True)
    # the reference demo header: 04 90 40
    assert list(hdr) == [0x04, 0x90, 0x40]
    n_reject = 0
    for byte in range(2):
        for flip in range(8):
            bad = hdr.copy()
            bad[byte] ^= 1 << flip
            n_reject += not bool(dec.header_checksum_valid(bad, xp=np))
    # a 5-bit checksum over 12 header bits: every single-bit corruption
    # of length/cr/crc/msn must be caught (the lsn nibble protects byte 2)
    assert n_reject == 16


@pytest.mark.parametrize("cr", [1, 4])
def test_dense_decode_with_checksum_enabled(cr):
    cfg = LoRaConfig(sf=7, cr=cr, samp_rate=250e3, crc=True)
    sps = cfg.samples_per_symbol
    pkt = modulate_frame(cfg, b"\xde\xad\xbe\xef", pad_before=4 * sps,
                         pad_after=8 * sps, snr_db=40.0)
    rx = DenseReceiver(cfg, max_candidates=2, max_symbols=24,
                       header_checksum=True)
    frames = rx.run(pkt)
    assert len(frames) == 1
    assert frames[0].mac_payload == b"\xde\xad\xbe\xef"
    assert frames[0].crc_ok
