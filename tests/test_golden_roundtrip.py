"""TX -> golden RX roundtrip tests (the hermetic analogue of the reference's
SigMF trace suites, SURVEY.md §4).

The fast set covers the canonical SF7 configuration (the reference demo
config: README.md:70-87) plus one case per feature axis; the `slow` marker
covers the full SF x CR matrix mirrored from the reference short_* suites.
"""

import numpy as np
import pytest

from lora_tpu import LoRaConfig
from lora_tpu.rx.golden import GoldenReceiver
from lora_tpu.tx.modulator import modulate_frame

DEADBEEF = bytes.fromhex("deadbeef")


def roundtrip(cfg: LoRaConfig, payload: bytes, snr_db=40.0, cfo_hz=0.0, seed=0):
    sps = cfg.samples_per_symbol
    stream = modulate_frame(
        cfg, payload, pad_before=3000, pad_after=3 * sps,
        snr_db=snr_db, cfo_hz=cfo_hz, seed=seed,
    )
    return GoldenReceiver(cfg).run(stream)


def test_demo_config_sf7():
    """The reference install-check: SF7 CR4/8 BW125 @1Msps, payload deadbeef."""
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True)
    frames = roundtrip(cfg, DEADBEEF)
    assert len(frames) == 1
    f = frames[0]
    assert f.mac_payload == DEADBEEF
    # header bytes must match the reference demo output 04 90 40
    assert f.phy_header.to_bytes() == b"\x04\x90\x40"


def test_multiple_frames_in_stream():
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True)
    sps = cfg.samples_per_symbol
    one = modulate_frame(cfg, DEADBEEF, pad_before=2000, pad_after=2000)
    stream = np.concatenate([one] * 5 + [np.zeros(3 * sps, np.complex64)])
    rng = np.random.default_rng(0)
    noise = (rng.normal(0, 1e-3, (len(stream), 2)) @ np.array([1, 1j])).astype(np.complex64)
    frames = GoldenReceiver(cfg).run(stream + noise)
    assert [f.mac_payload for f in frames] == [DEADBEEF] * 5


@pytest.mark.parametrize("cr", [1, 2, 3, 4])
def test_coding_rates_sf7(cr):
    cfg = LoRaConfig(sf=7, cr=cr, samp_rate=1e6, crc=True)
    frames = roundtrip(cfg, DEADBEEF)
    assert len(frames) == 1 and frames[0].mac_payload == DEADBEEF


def test_reduced_rate_sf11():
    cfg = LoRaConfig(sf=11, cr=4, samp_rate=1e6, crc=True, reduced_rate=True)
    frames = roundtrip(cfg, DEADBEEF)
    assert len(frames) == 1 and frames[0].mac_payload == DEADBEEF


def test_implicit_header():
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True, implicit=True)
    frames = roundtrip(cfg, DEADBEEF)
    assert len(frames) == 1 and frames[0].mac_payload == DEADBEEF


def test_downlink_conjugate():
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True, conj=True)
    frames = roundtrip(cfg, DEADBEEF)
    assert len(frames) == 1 and frames[0].mac_payload == DEADBEEF


def test_drift_correction_disabled():
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True, disable_drift_correction=True)
    frames = roundtrip(cfg, DEADBEEF)
    assert len(frames) == 1 and frames[0].mac_payload == DEADBEEF


def test_cfo_tolerance():
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True)
    for cfo in (200.0, -300.0):
        frames = roundtrip(cfg, DEADBEEF, cfo_hz=cfo)
        assert len(frames) == 1 and frames[0].mac_payload == DEADBEEF


def test_no_crc():
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=False)
    frames = roundtrip(cfg, DEADBEEF)
    assert len(frames) == 1
    assert frames[0].mac_payload == DEADBEEF
    assert frames[0].payload == DEADBEEF  # no CRC appended


def test_sf6_requires_implicit():
    # explicit SF6 is rejected at config construction (README conformance)
    with pytest.raises(ValueError):
        LoRaConfig(sf=6, cr=4, samp_rate=1e6, crc=True)
    cfg_imp = LoRaConfig(sf=6, cr=4, samp_rate=1e6, crc=True, implicit=True)
    frames = roundtrip(cfg_imp, DEADBEEF)
    assert len(frames) == 1 and frames[0].mac_payload.startswith(DEADBEEF)


@pytest.mark.slow
@pytest.mark.parametrize("sf", [8, 9, 10, 12, 13])
@pytest.mark.parametrize("cr", [1, 4])
def test_sf_cr_matrix(sf, cr):
    cfg = LoRaConfig(sf=sf, cr=cr, samp_rate=1e6, crc=True, reduced_rate=sf > 10)
    for seed, payload in enumerate([DEADBEEF, b"\x88", b"\xff\xff"]):
        frames = roundtrip(cfg, payload, seed=seed)
        assert len(frames) == 1 and frames[0].mac_payload == payload, (sf, cr, payload)


@pytest.mark.slow
def test_long_payload_255():
    """decode_long suite analogue: 255-byte payload 00..fe at CR 4/8."""
    payload = bytes(range(255))
    for sf in (7, 12):
        cfg = LoRaConfig(sf=sf, cr=4, samp_rate=1e6, crc=True, reduced_rate=sf > 10)
        frames = roundtrip(cfg, payload)
        assert len(frames) == 1 and frames[0].mac_payload == payload, sf
