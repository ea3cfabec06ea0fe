"""Implicit-header mode on the dense fft engine.

The reference's implicit mode has no header: the first (reduced-rate)
block is payload and the frame ends when symbol energy drops below half
the preamble energy (lib/decoder_impl.cc:861-866). The dense engine
evaluates the same energy-stop on its static window grid. The gate here
is ground truth (decoded payload must start with the transmitted bytes,
padding nibbles zero) — the golden engine's implicit output can differ
in pad nibbles because its energy-stop interacts with gradient-demod
drift.
"""

import numpy as np
import pytest

from lora_tpu import LoRaConfig
from lora_tpu.rx.dense import DenseReceiver
from lora_tpu.tx.modulator import modulate_frame


@pytest.mark.parametrize("cr", [4, 3, 2, 1])
def test_implicit_dense_roundtrip(cr):
    cfg = LoRaConfig(sf=7, cr=cr, samp_rate=250e3, crc=False, implicit=True)
    sps = cfg.samples_per_symbol
    payload = b"\xca\xfe\x01\x02"
    pkt = modulate_frame(cfg, payload, pad_before=4 * sps, pad_after=8 * sps,
                         snr_db=40.0)
    rx = DenseReceiver(cfg, max_candidates=2, max_symbols=24, sfd_search=12,
                       demod_method="fft")
    frames = rx.run(pkt)
    assert len(frames) == 1
    f = frames[0]
    assert f.payload[: len(payload)] == payload, f.payload.hex()
    # energy-stop length: padded up to whole interleave blocks, zeros after
    assert all(b == 0 for b in f.payload[len(payload):])
    assert f.phy_header.cr == cr


def test_implicit_dense_sf6():
    cfg = LoRaConfig(sf=6, cr=4, samp_rate=250e3, crc=False, implicit=True)
    sps = cfg.samples_per_symbol
    pkt = modulate_frame(cfg, b"\x42\x99", pad_before=4 * sps,
                         pad_after=8 * sps, snr_db=45.0)
    rx = DenseReceiver(cfg, max_candidates=2, max_symbols=24, sfd_search=12,
                       demod_method="fft")
    frames = rx.run(pkt)
    assert len(frames) == 1
    assert frames[0].payload[:2] == b"\x42\x99"


@pytest.mark.parametrize("cr", [4, 1])
def test_implicit_gradient(cr):
    """The gradient engine decodes implicit frames too (round 4): the
    energy-stop runs on its fine-sync-tracked windows (reference
    lib/decoder_impl.cc:861-866 operates identically in both demod
    methods). 1 Msps: the gradient method needs decim >= 4 (module
    docs — at decim 2 a one-sample sync error is half a bin)."""
    cfg = LoRaConfig(sf=7, cr=cr, samp_rate=1e6, crc=False, implicit=True)
    sps = cfg.samples_per_symbol
    payload = b"\xca\xfe\x01\x02"
    pkt = modulate_frame(cfg, payload, pad_before=4 * sps, pad_after=8 * sps,
                         snr_db=40.0)
    rx = DenseReceiver(cfg, max_candidates=2, max_symbols=24, sfd_search=12,
                       demod_method="gradient")
    frames = rx.run(pkt)
    assert len(frames) == 1
    f = frames[0]
    assert f.payload[: len(payload)] == payload, f.payload.hex()
    assert all(b == 0 for b in f.payload[len(payload):])


def test_implicit_auto_routes_fft():
    """``auto`` still selects the fft engine for implicit configs."""
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=False, implicit=True)
    assert DenseReceiver(cfg).method == "fft"
