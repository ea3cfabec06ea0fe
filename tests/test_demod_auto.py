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
    with pytest.raises(ValueError):
        DenseReceiver(cfg, demod_method="gradient")


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
