"""Channelizer tests: filter design parity, xlating path, PFB isolation."""

import numpy as np
import pytest

from lora_tpu import LoRaConfig
from lora_tpu.channelizer import (
    PolyphaseChannelizer,
    channelize_list,
    firdes_low_pass,
    freq_xlating_fir,
    lora_channel_taps,
    pfb_channel_freqs,
)
from lora_tpu.rx.golden import GoldenReceiver
from lora_tpu.tx.modulator import modulate_frame

DEADBEEF = bytes.fromhex("deadbeef")


def test_firdes_properties():
    # reference spec: low_pass(1, 1e6, 77.5k, 10k, HAMMING) -> 53/(22*0.01)
    taps = lora_channel_taps(1e6, 125e3)
    assert len(taps) == 241  # odd, attenuation rule
    assert abs(taps.sum() - 1.0) < 1e-6  # unit DC gain
    assert np.all(taps == taps[::-1])  # linear phase
    # stopband: response at 250 kHz well attenuated
    w = np.exp(-2j * np.pi * 250e3 / 1e6 * np.arange(len(taps)))
    assert abs(np.dot(taps, w)) < 0.01


def test_freq_xlating_decode():
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True)
    base = modulate_frame(cfg, DEADBEEF, pad_before=3000, pad_after=3 * 1024, snr_db=40)
    n = np.arange(len(base))
    wide = (base * np.exp(2j * np.pi * 150e3 * n / 1e6)).astype(np.complex64)
    taps = lora_channel_taps(1e6, 125e3)
    chan = freq_xlating_fir(wide, taps, 150e3, 1e6, 1)
    frames = GoldenReceiver(cfg).run(chan)
    assert [f.mac_payload for f in frames] == [DEADBEEF]


def test_channelize_list_matches_single():
    rng = np.random.default_rng(0)
    x = (rng.normal(0, 1, (4096, 2)) @ np.array([1, 1j])).astype(np.complex64)
    taps = lora_channel_taps(1e6, 125e3)
    multi = np.asarray(channelize_list(x, taps, [0.0, 100e3], 1e6, 2))
    single = freq_xlating_fir(x, taps, 100e3, 1e6, 2)
    assert np.allclose(multi[1], single, atol=1e-3)


def test_pfb_isolates_channels():
    fs, M = 2e6, 8
    cfg_wide = LoRaConfig(sf=7, cr=4, samp_rate=fs, crc=True)
    cfg_chan = LoRaConfig(sf=7, cr=4, samp_rate=fs / M, crc=True)
    pkt = modulate_frame(cfg_wide, DEADBEEF, pad_before=8000,
                         pad_after=3 * cfg_wide.samples_per_symbol, snr_db=45)
    freqs = pfb_channel_freqs(fs, M)
    n = np.arange(len(pkt))
    wide = (pkt * np.exp(2j * np.pi * freqs[3] * n / fs)).astype(np.complex64)
    chans = np.asarray(PolyphaseChannelizer.for_lora(fs, M)(wide))
    powers = np.mean(np.abs(chans) ** 2, axis=-1)
    assert np.argmax(powers) == 3
    assert powers[3] > 50 * powers[(np.arange(M) != 3)].max()
    frames = GoldenReceiver(cfg_chan).run(chans[3])
    assert [f.mac_payload for f in frames] == [DEADBEEF]
