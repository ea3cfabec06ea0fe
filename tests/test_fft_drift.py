"""fft-engine drift tracking (DenseReceiver fft_drift_pass).

The fft demod reads symbols on a static window grid — a transmitter
clock offset slides that grid by ``sps * ppm * 1e-6`` samples per symbol
with no fine-sync feedback to absorb it (rx/dense.py module docs). At
SF12 / 250 ksps (decim 2: the wideband per-channel regime, where auto
method selection picks fft) a 30 ppm offset slips ~0.25 samples/symbol
— ~3 bins over a packet — and must corrupt the payload without the
two-pass fractional-bin slope correction.
"""

import numpy as np
import pytest

from lora_tpu.channelizer import fractional_resampler
from lora_tpu.config import LoRaConfig
from lora_tpu.rx.dense import DenseReceiver
from lora_tpu.tx.modulator import modulate_frame

PAYLOAD = bytes.fromhex("deadbeef")


def _stream(cfg, ppm, seed=0):
    sps = cfg.samples_per_symbol
    chunk = modulate_frame(cfg, PAYLOAD, pad_before=2500 + 301 * seed,
                           pad_after=sps, snr_db=40.0, seed=seed)
    if ppm:
        chunk = fractional_resampler(chunk, 1.0 + ppm * 1e-6).astype(np.complex64)
    return np.concatenate([chunk, np.zeros(3 * sps, np.complex64)])


@pytest.mark.parametrize("ppm", [-30.0, 30.0])
def test_fft_drift_pass_tracks_30ppm_sf12(ppm):
    cfg = LoRaConfig(sf=12, cr=4, samp_rate=250e3, crc=True, reduced_rate=True)
    stream = _stream(cfg, ppm)
    rx = DenseReceiver(cfg, max_candidates=4, max_symbols=48,
                       demod_method="fft", fft_drift_pass=True)
    frames = rx.run(stream)
    assert len(frames) == 1 and frames[0].mac_payload == PAYLOAD


def test_fft_without_drift_pass_fails_30ppm_sf12():
    # documents WHY the correction exists: the static grid alone cannot
    # track crystal-tolerance drift at high SF (explicit opt-out)
    cfg = LoRaConfig(sf=12, cr=4, samp_rate=250e3, crc=True, reduced_rate=True)
    stream = _stream(cfg, 30.0)
    rx = DenseReceiver(cfg, max_candidates=4, max_symbols=48,
                       demod_method="fft", fft_drift_pass=False)
    frames = rx.run(stream)
    assert not any(f.mac_payload == PAYLOAD for f in frames)


def test_fft_drift_auto_policy():
    """Round 4: the drift correction is ON by default exactly where the
    grid's tolerance is outrun (SF >= 11; the slip/tolerance ratio
    ``2*nsym*n_bins*ppm`` is decim-independent — see DenseReceiver)."""
    hi = LoRaConfig(sf=12, cr=4, samp_rate=250e3, crc=True, reduced_rate=True)
    lo = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    assert DenseReceiver(hi, demod_method="fft").fft_drift_pass
    assert not DenseReceiver(lo, demod_method="fft").fft_drift_pass
    # auto-on decodes a 30 ppm SF12 packet with no user flag
    stream = _stream(hi, 30.0)
    rx = DenseReceiver(hi, max_candidates=4, max_symbols=48,
                       demod_method="fft")
    frames = rx.run(stream)
    assert len(frames) == 1 and frames[0].mac_payload == PAYLOAD


def test_fft_drift_pass_clean_signal_unchanged():
    # zero drift: slope ~ 0, corrected reads match the plain grid
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    stream = _stream(cfg, 0.0)
    for drift_pass in (False, True):
        rx = DenseReceiver(cfg, max_candidates=4, max_symbols=24,
                           demod_method="fft", fft_drift_pass=drift_pass)
        frames = rx.run(stream)
        assert len(frames) == 1 and frames[0].mac_payload == PAYLOAD


@pytest.mark.slow
def test_wideband_forwards_drift_pass():
    """The wideband receiver forwards fft_drift_pass to its dense stage:
    a 30 ppm-drifted SF12 packet on one PFB channel decodes through the
    full PFB + pooled-decode program."""
    from lora_tpu.channelizer import pfb_channel_freqs
    from lora_tpu.wideband import WidebandReceiver

    M = 4
    cfg = LoRaConfig(sf=12, cr=4, samp_rate=250e3, crc=True, reduced_rate=True)
    wide_rate = M * cfg.samp_rate
    wide_cfg = LoRaConfig(sf=12, cr=4, samp_rate=wide_rate, crc=True,
                          reduced_rate=True)
    sps_w = wide_cfg.samples_per_symbol
    pkt = modulate_frame(wide_cfg, PAYLOAD, pad_before=2 * sps_w, snr_db=40.0)
    pkt = fractional_resampler(pkt, 1.0 + 30e-6).astype(np.complex64)
    chan = 2
    freqs = pfb_channel_freqs(wide_rate, M)
    t = np.arange(len(pkt))
    x = (pkt * np.exp(2j * np.pi * freqs[chan] / wide_rate * t)
         ).astype(np.complex64)
    x = np.concatenate([x, np.zeros(4 * sps_w, np.complex64)])

    wr = WidebandReceiver(cfg, M, pool=4, max_candidates=2, max_symbols=48,
                          demod_method="fft", fft_drift_pass=True)
    frames = wr.run(x)
    got = {f.channel: f.mac_payload for f in frames}
    assert got.get(chan) == PAYLOAD, got
