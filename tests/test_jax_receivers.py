"""Parity tests: jitted state-machine receiver and dense receiver vs golden."""

import numpy as np
import pytest

from lora_tpu import LoRaConfig
from lora_tpu.rx.dense import DenseReceiver
from lora_tpu.rx.golden import GoldenReceiver
from lora_tpu.rx.receiver import JaxReceiver
from lora_tpu.tx.modulator import modulate_frame

DEADBEEF = bytes.fromhex("deadbeef")


def make_stream(cfg, payload=DEADBEEF, n=1, snr_db=40.0, seed=0):
    sps = cfg.samples_per_symbol
    one = modulate_frame(cfg, payload, pad_before=2500, pad_after=2 * sps,
                         snr_db=snr_db, seed=seed)
    return np.concatenate([one] * n + [np.zeros(3 * sps, np.complex64)])


def frames_sig(frames):
    return [(f.mac_payload.hex(), f.phy_header.to_bytes().hex()) for f in frames]


@pytest.mark.parametrize(
    "kw",
    [
        dict(sf=7, cr=4),
        dict(sf=7, cr=1),
        dict(sf=8, cr=3),
        dict(sf=11, cr=4, reduced_rate=True),
        dict(sf=7, cr=4, implicit=True),
        dict(sf=7, cr=4, conj=True),
        dict(sf=7, cr=4, disable_drift_correction=True),
    ],
)
def test_state_machine_matches_golden(kw):
    cfg = LoRaConfig(samp_rate=1e6, crc=True, **kw)
    stream = make_stream(cfg)
    gold = GoldenReceiver(cfg).run(stream)
    jaxf = JaxReceiver(cfg).run(stream)
    assert frames_sig(jaxf) == frames_sig(gold)
    assert len(gold) == 1


def test_state_machine_multiframe():
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True)
    stream = make_stream(cfg, n=4)
    gold = GoldenReceiver(cfg).run(stream)
    jaxf = JaxReceiver(cfg).run(stream)
    assert frames_sig(jaxf) == frames_sig(gold)
    assert len(gold) == 4


@pytest.mark.parametrize("method", ["gradient", "fft"])
def test_dense_receiver(method):
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True)
    stream = make_stream(cfg, n=3)
    rx = DenseReceiver(cfg, demod_method=method)
    frames = rx.run(stream)
    assert [f.mac_payload for f in frames] == [DEADBEEF] * 3
    assert all(f.phy_header.to_bytes() == b"\x04\x90\x40" for f in frames)


def test_dense_multichannel():
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True)
    stream = make_stream(cfg, n=2)
    rng = np.random.default_rng(0)
    noise = (rng.normal(0, 1e-3, (len(stream), 2)) @ np.array([1, 1j])).astype(np.complex64)
    x = np.stack([stream, np.roll(stream, 3000), noise])
    frames = DenseReceiver(cfg).run(x)
    got = sorted((f.channel, f.mac_payload) for f in frames)
    assert got == [(0, DEADBEEF), (0, DEADBEEF), (1, DEADBEEF), (1, DEADBEEF)]


def test_dense_coding_rates():
    for cr in (1, 2, 3, 4):
        cfg = LoRaConfig(sf=7, cr=cr, samp_rate=1e6, crc=True)
        frames = DenseReceiver(cfg).run(make_stream(cfg))
        assert [f.mac_payload for f in frames] == [DEADBEEF], cr


def test_dense_rejects_noise():
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True)
    rng = np.random.default_rng(1)
    noise = (rng.normal(0, 1.0, (300_000, 2)) @ np.array([1, 1j])).astype(np.complex64)
    frames = DenseReceiver(cfg).run(noise)
    assert frames == []
