"""Demod-method auto-selection and low-decimation robustness.

The gradient method (the reference's default, lib/decoder_impl.cc:499)
relies on the fine-sync drift loop to hold sample alignment; below
decimation 4 a ±1-sample sync error aliases onto a ±1-bin symbol error
(1 sample = 1/decim bin) and the loop locks onto the wrong
interpretation. ``demod_method="auto"`` therefore resolves to the fft
engine for decim < 4 and to reference-parity gradient at decim >= 4.

The seed-7 packet below is the recorded failure: at 40 dB SNR the sync
xcorr lands 1 sample late and the gradient engine decodes
f792f8... instead of a707f8... (found via tests/test_multiprocess.py).
"""

import numpy as np
import pytest

from lora_tpu import LoRaConfig
from lora_tpu.rx.dense import DenseReceiver
from lora_tpu.tx.modulator import modulate_frame


def test_auto_resolves_by_decim():
    lo = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)   # decim 2
    hi = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True)     # decim 8
    assert DenseReceiver(lo).method == "fft"
    assert DenseReceiver(hi).method == "gradient"
    # explicit requests are honored
    assert DenseReceiver(lo, demod_method="gradient").method == "gradient"
    assert DenseReceiver(hi, demod_method="fft").method == "fft"


def test_auto_resolves_fft_for_implicit():
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=False, implicit=True)
    assert DenseReceiver(cfg).method == "fft"
    # round 4: an explicit gradient request is honored in implicit mode
    # (energy-stop on the fine-sync-tracked windows)
    assert DenseReceiver(cfg, demod_method="gradient").method == "gradient"


@pytest.mark.parametrize("seed", [1, 7])
def test_decim2_noise_tipped_sync_decodes(seed):
    """seed=7 tips the sync argmax +1 sample; auto(fft) must still decode."""
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    sps = cfg.samples_per_symbol
    payload = bytes([0xA7, 0x07, 0xF8])
    stream = np.zeros(64 * sps, np.complex64)
    pkt = modulate_frame(cfg, payload, snr_db=40.0, seed=seed)
    stream[3 * sps: 3 * sps + len(pkt)] = pkt
    rx = DenseReceiver(cfg, max_candidates=4, max_symbols=24, sfd_search=12)
    frames = rx.run(stream)
    assert len(frames) == 1
    assert frames[0].mac_payload == payload


def test_gradient_trims_window_edge_glitch():
    """Exactly symbol-aligned windows carry a pi-wrap glitch in the FINAL
    phase-diff sample (the channel filter's transition into the NEXT
    symbol), whose last-bin gradient can beat the true wrap and misread
    the symbol as bin 0 (observed: SF11 CR4/5 reduced-rate suite trace).
    The last averaging bin excludes that diff (and its duplicate); all
    true wraps sit at/left of the bin's left boundary so nothing genuine
    is hidden (see max_frequency_gradient_idx)."""
    from lora_tpu.ops import demod

    sf, decim = 11, 8
    n_bins, sps = 1 << sf, (1 << sf) * decim

    def chirp(s):
        k = (np.arange(sps) + (s - 1) * decim) % sps
        ph = 2 * np.pi * (k * k / (2.0 * sps * decim) - k / (2.0 * decim))
        return np.exp(1j * ph).astype(np.complex64)

    clean = chirp(1773)
    expected = int(demod.max_frequency_gradient_idx(clean, n_bins, decim))
    assert expected != 0  # a real in-window wrap exists
    # pi-wrap glitch on the final diff (rotate only the last sample, the
    # filter-transition signature: instantaneous_frequency duplicates it)
    glitched = clean.copy()
    glitched[-1] *= np.exp(-3.4j)
    b = int(demod.max_frequency_gradient_idx(glitched, n_bins, decim))
    assert b == expected  # NOT the bin-0 misread
    # sanity: with untrimmed averaging the glitch dominates the scan
    from lora_tpu.ops.chirp import instantaneous_frequency

    ifr = instantaneous_frequency(glitched)
    avg = ifr[: n_bins * decim].reshape(n_bins, decim).sum(-1) / decim
    grad = avg[:-1] - avg[1:]
    assert int(np.argmax(grad)) == n_bins - 2


def test_gradient_bin0_survives_edge_trim():
    """A true bin-0 symbol's wrap lies exactly at the last bin's LEFT
    boundary — the edge trim must not hide it (regression: an earlier
    exclude-the-last-gradient variant broke every `ffff` payload at SF7,
    whose bin-0 symbols then read as the second-best gradient's bin)."""
    from lora_tpu.ops import demod

    sf, decim = 7, 8
    n_bins, sps = 1 << sf, (1 << sf) * decim

    def chirp(s):
        k = (np.arange(sps) + (s - 1) * decim) % sps
        ph = 2 * np.pi * (k * k / (2.0 * sps * decim) - k / (2.0 * decim))
        return np.exp(1j * ph).astype(np.complex64)

    # weak interior ripple above the 0.1 threshold that must NOT win
    ripple = np.exp(0.02j * np.sin(np.arange(sps) / 7.0)).astype(np.complex64)
    for s, want in ((1, 0), (128, 126), (65, 64)):
        w = chirp(s) * ripple
        got = int(demod.max_frequency_gradient_idx(w, n_bins, decim))
        # convention: gradient reads shift s as bin (s-2) mod N except the
        # unshifted chirp; pin against the clean-chirp read instead
        clean = int(demod.max_frequency_gradient_idx(chirp(s), n_bins, decim))
        assert got == clean
        w[-1] *= np.exp(-2.5j)
        assert int(demod.max_frequency_gradient_idx(w, n_bins, decim)) == clean


def test_dense_gradient_tracks_clock_drift():
    """The dense gradient engine's demod scan carries the fine-sync drift
    state (reference fine_sync, decoder_impl.cc:300-338) — a 10 ppm tx
    sample-clock offset (TCXO-class) must decode cleanly."""
    from lora_tpu.channelizer import fractional_resampler

    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True)
    sps = cfg.samples_per_symbol
    payload = bytes([0xA7, 0x07, 0xF8])
    pkt = modulate_frame(cfg, payload, pad_before=3000, pad_after=sps,
                         snr_db=40.0, seed=3)
    drifted = fractional_resampler(pkt, 1.0 + 10e-6).astype(np.complex64)
    rx = DenseReceiver(cfg, max_candidates=4, max_symbols=24,
                       sfd_search=12, demod_method="gradient")
    frames = rx.run(drifted)
    assert len(frames) == 1
    assert frames[0].mac_payload == payload
