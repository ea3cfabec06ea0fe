"""Fractional-resampler path (reference fractional_resampler_cc,
python/lora_receiver.py:59-62): decode a capture recorded at a
non-integer multiple of the symbol rate — the RTL-SDR 1.024 Msps case."""

import numpy as np

from lora_tpu import LoRaConfig
from lora_tpu.channelizer import fractional_resampler
from lora_tpu.receiver import LoRaReceiver
from lora_tpu.tx.modulator import modulate_frame

import pytest


def test_resampler_preserves_tone():
    fs = 1.024e6
    t = np.arange(50000) / fs
    x = np.exp(2j * np.pi * 10e3 * t).astype(np.complex64)
    y = fractional_resampler(x, 1.024)
    # resampled tone: same 10 kHz at the new 1 Msps rate
    n = len(y)
    ty = np.arange(n) / 1e6
    ref = np.exp(2j * np.pi * 10e3 * ty)
    # ignore filter edges; compare phase-aligned correlation
    c = np.abs(np.vdot(ref[100:-100], y[100:-100])) / (n - 200)
    assert c > 0.99


def test_rtlsdr_rate_decode():
    # synthesize at 1 Msps, upsample to the RTL-SDR 1.024 Msps capture
    # rate, decode back through the fractional-resampler path
    tx_cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True)
    pkt_1m = modulate_frame(tx_cfg, b"\xde\xad\xbe\xef", pad_before=4000,
                            pad_after=2048, snr_db=30.0, seed=3)
    pkt = fractional_resampler(pkt_1m, 1.0 / 1.024)
    rx = LoRaReceiver(
        samp_rate=1.024e6, center_freq=868.1e6, channel_list=[868.1e6],
        bandwidth=125e3, sf=7, cr=4, crc=True, decimation=1.024,
        disable_channelization=True, engine="golden",
    )
    frames = rx.receive(pkt)
    assert len(frames) == 1
    assert frames[0].mac_payload == b"\xde\xad\xbe\xef"


def test_fractional_without_resampler_path_rejected():
    with pytest.raises(ValueError):
        LoRaReceiver(
            samp_rate=1.024e6, center_freq=868.1e6, channel_list=[868.1e6],
            bandwidth=125e3, sf=7, cr=4, crc=True, decimation=1.024,
        )
