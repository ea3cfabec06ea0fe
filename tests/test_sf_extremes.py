"""SF range extremes: SF6 (implicit-only, reference decoder_impl.cc:57)
and SF13 — the full supported range is 6..13."""

import numpy as np
import pytest

from lora_tpu import LoRaConfig
from lora_tpu.rx.golden import GoldenReceiver
from lora_tpu.tx.modulator import modulate_frame


def test_sf6_implicit_roundtrip():
    cfg = LoRaConfig(sf=6, cr=4, samp_rate=250e3, crc=False, implicit=True)
    pkt = modulate_frame(cfg, b"\x42\x99", pad_before=512, pad_after=4096,
                         snr_db=45.0)
    frames = GoldenReceiver(cfg).run(pkt)
    assert len(frames) == 1
    assert frames[0].payload[:2] == b"\x42\x99"


def test_sf6_explicit_rejected():
    with pytest.raises(ValueError):
        LoRaConfig(sf=6, cr=4, samp_rate=250e3, crc=True, implicit=False)


@pytest.mark.slow
def test_sf13_reduced_rate_roundtrip():
    cfg = LoRaConfig(sf=13, cr=4, samp_rate=250e3, crc=True, reduced_rate=True)
    sps = cfg.samples_per_symbol
    pkt = modulate_frame(cfg, b"\x42\x99", pad_before=2 * sps,
                         pad_after=4 * sps, snr_db=45.0)
    frames = GoldenReceiver(cfg).run(pkt)
    assert len(frames) == 1
    assert frames[0].payload[:2] == b"\x42\x99"


def test_sf_out_of_range():
    for sf in (5, 14):
        with pytest.raises(ValueError):
            LoRaConfig(sf=sf, cr=4, samp_rate=250e3, crc=True)
