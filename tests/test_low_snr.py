"""Coherent low-SNR mode (round 4 — beyond the reference).

``DenseReceiver(low_snr=True)`` replaces the reference's ifreq-domain
detection/SFD gates (which saturate below ~+9 dB in-channel) with
coherent dechirp-fold discriminators riding the fold-DFT matmuls:
detection by folded-power peak/mean with tone-agreement gating, SFD by
up-vs-down dechirp peak comparison. Measured floors
(docs/perf/sensitivity.md): SF7 100% to -4 dB label, SF12 100% to
-20 dB label (~LoRa silicon spec class) vs the parity chain's +6 dB.
"""

import numpy as np
import pytest

from lora_tpu.config import LoRaConfig
from lora_tpu.rx.dense import DenseReceiver
from lora_tpu.tx.modulator import modulate_frame

PAYLOAD = bytes.fromhex("deadbeef")


def _decode_rate(cfg, rx, snr_db, n=6):
    sps = cfg.samples_per_symbol
    ok = 0
    for k in range(n):
        x = modulate_frame(cfg, PAYLOAD, pad_before=2500 + 137 * k,
                           pad_after=3 * sps, snr_db=snr_db, seed=k)
        ok += any(f.mac_payload == PAYLOAD for f in rx.run(x))
    return ok / n


def test_sf7_decodes_at_minus4db():
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    rx = DenseReceiver(cfg, max_candidates=8, max_symbols=24,
                       sfd_search=12, low_snr=True)
    assert rx.method == "fft"
    assert _decode_rate(cfg, rx, -4.0) == 1.0


def test_sf7_low_snr_with_cfo():
    """The dechirp sync absorbs CFO into timing (self-consistent for
    the fft demod), so moderate CFO survives at low SNR."""
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    rx = DenseReceiver(cfg, max_candidates=8, max_symbols=24,
                       sfd_search=12, low_snr=True)
    sps = cfg.samples_per_symbol
    ok = 0
    for k in range(6):
        x = modulate_frame(cfg, PAYLOAD, pad_before=2500 + 137 * k,
                           pad_after=3 * sps, snr_db=0.0, cfo_hz=500.0,
                           seed=k)
        ok += any(f.mac_payload == PAYLOAD for f in rx.run(x))
    assert ok >= 5


def test_parity_chain_fails_where_low_snr_decodes():
    """Documents the gap: the reference-parity gates lose the same
    packets the coherent mode decodes."""
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    par = DenseReceiver(cfg, max_candidates=8, max_symbols=24,
                        sfd_search=12, demod_method="fft")
    assert _decode_rate(cfg, par, -4.0) == 0.0


def test_noise_only_emits_nothing():
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    rx = DenseReceiver(cfg, max_candidates=8, max_symbols=24,
                       sfd_search=12, low_snr=True)
    sps = cfg.samples_per_symbol
    rng = np.random.default_rng(5)
    for _ in range(8):
        x = (rng.normal(size=60 * sps)
             + 1j * rng.normal(size=60 * sps)).astype(np.complex64)
        assert rx.run(x) == []


def test_low_snr_guards():
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    with pytest.raises(ValueError):
        DenseReceiver(cfg, demod_method="gradient", low_snr=True)
    with pytest.raises(ValueError):
        DenseReceiver(LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=False,
                                 implicit=True), low_snr=True)


@pytest.mark.slow
def test_sf12_decodes_at_minus16db():
    cfg = LoRaConfig(sf=12, cr=4, samp_rate=125e3, crc=True,
                     reduced_rate=True)
    rx = DenseReceiver(cfg, max_candidates=8, max_symbols=24,
                       sfd_search=12, low_snr=True)
    assert _decode_rate(cfg, rx, -16.0, n=4) == 1.0


def test_wideband_low_snr_passthrough():
    """WidebandReceiver forwards low_snr to its dense stage: a noisy
    packet on one PFB channel decodes through the full PFB + coherent
    detection program (composition check; per-channel sensitivity is
    covered by the single-channel tests above)."""
    from lora_tpu.channelizer import pfb_channel_freqs
    from lora_tpu.wideband import WidebandReceiver

    M = 8
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    wr = WidebandReceiver(cfg, M, max_candidates=4, max_symbols=24,
                          sfd_search=12, low_snr=True)
    assert wr.rx.low_snr
    wide_rate = M * cfg.samp_rate
    wide_cfg = LoRaConfig(sf=7, cr=4, samp_rate=wide_rate, crc=True)
    L = M * 64 * cfg.samples_per_symbol
    rng = np.random.default_rng(0)
    x = (rng.normal(size=L) + 1j * rng.normal(size=L)).astype(
        np.complex64) * 0.5
    freqs = pfb_channel_freqs(wide_rate, M)
    pkt = modulate_frame(wide_cfg, PAYLOAD, snr_db=None)
    c = 3
    pos = 6 * cfg.samples_per_symbol * M
    t = np.arange(len(pkt))
    x[pos:pos + len(pkt)] += (
        pkt * np.exp(2j * np.pi * freqs[c] / wide_rate * (t + pos))
    ).astype(np.complex64)
    frames = wr.run(x)
    assert any(f.channel == c and f.mac_payload == PAYLOAD for f in frames), \
        [(f.channel, f.payload.hex()) for f in frames]


def test_auto_low_snr_two_pass_policy():
    """LoRaReceiver(low_snr="auto"): parity gates first, coherent retry
    only on empty captures (round 5 — the auto policy VERDICT r4 weak #5
    asked for). A strong packet never builds the coherent receiver; a
    sub-gate-floor packet is recovered by the retry."""
    from lora_tpu.receiver import LoRaReceiver

    def rx():
        return LoRaReceiver(
            samp_rate=250e3, center_freq=868.1e6, channel_list=[868.1e6],
            bandwidth=125e3, sf=7, cr=4, crc=True, engine="dense",
            disable_channelization=True, low_snr="auto",
            max_candidates=8, max_symbols=24, sfd_search=12,
        )
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    sps = cfg.samples_per_symbol

    strong = rx()
    x = modulate_frame(cfg, PAYLOAD, pad_before=2500, pad_after=3 * sps,
                       snr_db=30.0, seed=1)
    frames = strong.receive(x)
    assert any(f.mac_payload == PAYLOAD for f in frames)
    assert strong._coherent is None  # first pass sufficed; no retry built

    weak = rx()
    x = modulate_frame(cfg, PAYLOAD, pad_before=2500, pad_after=3 * sps,
                       snr_db=-4.0, seed=2)
    frames = weak.receive(x)
    assert any(f.mac_payload == PAYLOAD for f in frames), \
        [f.payload.hex() for f in frames]
    assert weak._coherent is not None  # recovered by the coherent retry


def test_auto_low_snr_implicit_stays_single_pass():
    """Implicit-header configs never engage the coherent retry (the
    energy-stop is noise-dominated exactly where the retry would fire —
    see LoRaReceiver.__init__)."""
    from lora_tpu.receiver import LoRaReceiver

    r = LoRaReceiver(
        samp_rate=250e3, center_freq=868.1e6, channel_list=[868.1e6],
        bandwidth=125e3, sf=7, cr=4, crc=True, implicit=True,
        engine="dense", disable_channelization=True, low_snr="auto",
        max_candidates=4, max_symbols=24, sfd_search=12,
    )
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True, implicit=True)
    x = modulate_frame(cfg, PAYLOAD, pad_before=2500, pad_after=1024,
                       snr_db=-4.0, seed=3)
    assert r.receive(x) == []
    assert r._coherent is None
