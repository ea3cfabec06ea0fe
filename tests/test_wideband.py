"""Wideband PFB-fused receiver: whole-band decode in one jit.

The reference cannot decode multiple channels simultaneously
(README.md:10-14); these tests are the acceptance gate for that new
capability: packets transmitted on several channels of one wideband
capture must all decode, labelled with their channel.
"""

import numpy as np
import pytest

from lora_tpu import LoRaConfig
from lora_tpu.channelizer import pfb_channel_freqs
from lora_tpu.tx.modulator import modulate_frame
from lora_tpu.wideband import WidebandReceiver

M = 8  # channels
CHAN_RATE = 250e3


@pytest.fixture(scope="module")
def chan_cfg():
    return LoRaConfig(sf=7, cr=4, samp_rate=CHAN_RATE, crc=True)


def _wideband_capture(chan_cfg, payloads_by_channel, snr_db=45.0, seed=0):
    """Synthesize packets directly at the wideband rate, mixed to their
    channel frequencies."""
    wide_rate = M * CHAN_RATE
    wide_cfg = LoRaConfig(
        sf=chan_cfg.sf, cr=chan_cfg.cr, samp_rate=wide_rate,
        bandwidth=chan_cfg.bandwidth, crc=chan_cfg.crc,
    )
    sps_w = wide_cfg.samples_per_symbol
    L = 160 * sps_w
    x = np.zeros(L, np.complex128)
    freqs = pfb_channel_freqs(wide_rate, M)
    rng = np.random.default_rng(seed)
    for chan, payload in payloads_by_channel.items():
        pkt = modulate_frame(wide_cfg, payload, pad_before=0, pad_after=0,
                             snr_db=None, seed=seed)
        pos = 8 * sps_w + int(rng.integers(0, 4)) * sps_w
        t = np.arange(len(pkt)) + pos
        carrier = np.exp(2j * np.pi * freqs[chan] / wide_rate * t)
        x[pos : pos + len(pkt)] += pkt * carrier
    noise_p = 10 ** (-snr_db / 10.0)
    x += rng.normal(0, np.sqrt(noise_p / 2), (len(x), 2)) @ [1, 1j]
    return x.astype(np.complex64)


def test_wideband_multi_channel_decode(chan_cfg):
    payloads = {1: b"\x11\xaa", 3: b"\x33\xbb", 6: b"\x66\xcc"}
    x = _wideband_capture(chan_cfg, payloads)
    rx = WidebandReceiver(chan_cfg, M, max_candidates=2, max_symbols=16,
                          sfd_search=12)
    frames = rx.run(x)
    got = {f.channel: f.payload[:2] for f in frames}
    assert got == payloads, got
    # loratap metadata carries the channel frequency
    for f in frames:
        assert f.tap_header.frequency == int(
            abs(pfb_channel_freqs(M * CHAN_RATE, M)[f.channel])
        )


def test_wideband_active_subset(chan_cfg):
    payloads = {1: b"\x11\xaa", 3: b"\x33\xbb"}
    x = _wideband_capture(chan_cfg, payloads)
    rx = WidebandReceiver(chan_cfg, M, active_channels=[3, 5],
                          max_candidates=2, max_symbols=16, sfd_search=12)
    frames = rx.run(x)
    assert {f.channel for f in frames} == {3}
    assert frames[0].payload[:2] == b"\x33\xbb"


def test_wideband_same_payload_all_channels(chan_cfg):
    """Simultaneous transmissions on every channel all decode."""
    payloads = {c: bytes([c, 0x5A]) for c in range(M)}
    x = _wideband_capture(chan_cfg, payloads, snr_db=50.0)
    rx = WidebandReceiver(chan_cfg, M, max_candidates=2, max_symbols=16,
                          sfd_search=12)
    frames = rx.run(x)
    got = {f.channel: f.payload[:2] for f in frames}
    assert got == payloads, got
