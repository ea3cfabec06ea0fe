"""LoRaWAN regional-plan gateway (lora_tpu.plans.PlanGateway).

Every in-band plan channel x every SF decoded in one jit, with the
channels on the real 200 kHz LoRaWAN raster (deliberately OFF any
critically-sampled PFB grid — the mixer-bank channelizer handles
arbitrary offsets; see plans.py module docstring).
"""

import numpy as np
import pytest

from lora_tpu.config import LoRaConfig
from lora_tpu.plans import EU868, US915, PLANS, PlanGateway
from lora_tpu.tx.modulator import modulate_frame


def test_plan_constants():
    assert len(EU868) == 8 and len(US915) == 64
    assert 868.1e6 in EU868 and 867.9e6 in EU868
    assert np.allclose(np.diff(sorted(US915)), 0.2e6)
    assert set(PLANS) == {"EU868", "AU915", "US915"}


def test_plan_gateway_decodes_in_band_channels():
    center, rate = 868.3e6, 2e6
    gw = PlanGateway("EU868", center, rate, sfs=(7, 8), pool=8,
                     max_candidates=2, max_symbols=16, sfd_search=10,
                     demod_method="fft")
    # the 2 MHz capture at 868.3 holds the 3 mandatory channels plus
    # the upper 3 extension channels (867.1/867.3 fall outside)
    assert gw.channels == [868.1e6, 868.3e6, 868.5e6,
                           867.5e6, 867.7e6, 867.9e6]
    assert gw.decim == 8

    rng = np.random.default_rng(5)
    sps8 = int(2 ** 8 * rate / 125e3)
    L = 40 * sps8
    x = (rng.normal(0, 1e-4, L) + 1j * rng.normal(0, 1e-4, L)).astype(
        np.complex64)
    t = np.arange(L, dtype=np.float64)
    placements = [(7, 868.1e6, b"\x42"), (8, 868.5e6, b"\x24")]
    for sf, f_abs, payload in placements:
        wcfg = LoRaConfig(sf=sf, cr=4, samp_rate=rate, crc=True,
                          sync_word=0x34)
        pkt = modulate_frame(wcfg, payload, snr_db=None)
        pos = 2 * wcfg.samples_per_symbol
        off = f_abs - center
        x[pos:pos + len(pkt)] += (
            pkt * np.exp(2j * np.pi * off / rate * t[pos:pos + len(pkt)])
        ).astype(np.complex64)

    frames = gw.run(x)
    got = {(f.tap_header.sf, f.tap_header.frequency): f.payload
           for f in frames}
    for sf, f_abs, payload in placements:
        assert (sf, int(f_abs)) in got, (sf, f_abs, sorted(got))
        assert got[(sf, int(f_abs))][: len(payload)] == payload
    # channel indices index the in-band plan list
    assert all(0 <= f.channel < len(gw.channels) for f in frames)


def test_plan_gateway_rejects_bad_geometry():
    with pytest.raises(ValueError):
        PlanGateway("EU868", 868.3e6, 2.1e6)  # not a chan_rate multiple
    with pytest.raises(ValueError):
        PlanGateway("US915", 868.3e6, 2e6)  # no channel in band
    with pytest.raises(ValueError):
        PlanGateway("bogus", 868.3e6, 2e6)


def test_plan_gateway_decodes_with_cfo_and_noise():
    """Impairment robustness through the mixer-bank channelizer: a plan
    channel carrying a packet with carrier offset (the sub-bin range
    the dense receiver corrects standalone; larger offsets ride the
    auto_cfo feedback loop, test_cfo.py) and 10 dB SNR must still
    decode — the channel filter (bw/2 + 15 kHz cutoff, reference
    lib/channelizer_impl.cc:46) passes the offset signal and the
    per-SF receiver's CFO estimate absorbs it."""
    center, rate = 868.3e6, 2e6
    gw = PlanGateway("EU868", center, rate, sfs=(7, 9), pool=8,
                     max_candidates=2, max_symbols=16, sfd_search=10,
                     demod_method="fft")
    rng = np.random.default_rng(11)
    sps9 = int(2 ** 9 * rate / 125e3)
    L = 56 * sps9
    x = (rng.normal(0, 1e-4, L) + 1j * rng.normal(0, 1e-4, L)).astype(
        np.complex64)
    t = np.arange(L, dtype=np.float64)
    placements = [(7, 868.1e6, b"\x42\x43", 450.0, 10.0),
                  (9, 867.9e6, b"\x24", -380.0, 12.0)]
    for i, (sf, f_abs, payload, cfo, snr) in enumerate(placements):
        wcfg = LoRaConfig(sf=sf, cr=4, samp_rate=rate, crc=True,
                          sync_word=0x34)
        pkt = modulate_frame(wcfg, payload, cfo_hz=cfo, snr_db=snr,
                             seed=100 + i)
        pos = (2 + 16 * i) * sps9
        off = f_abs - center
        x[pos:pos + len(pkt)] += (
            pkt * np.exp(2j * np.pi * off / rate * t[pos:pos + len(pkt)])
        ).astype(np.complex64)
    got = {(f.tap_header.sf, f.tap_header.frequency): f.payload
           for f in gw.run(x)}
    for sf, f_abs, payload, _, _ in placements:
        assert (sf, int(f_abs)) in got, (sf, f_abs, sorted(got))
        assert got[(sf, int(f_abs))][: len(payload)] == payload
