"""Non-zero radio sync words (0x12 RN2483 / 0x34 LoRaWAN).

The reference's OTA fixtures all carry sync word 0x12 (its
``apps/generate_test_suites.py`` drives an RN2483); its receiver survives
them at SF<=10 only by burning correlation-fail budget and CORRUPTS every
payload bin at SF>=11 (the FIND_SFD still-upchirp branch,
lib/decoder_impl.cc:801-803, fine-syncs the shifted sync upchirp against
the unshifted ideal). The TPU receivers recognise sync symbols by their
demodulated shift relative to the first FIND_SFD window (CFO-proof,
sync-word-agnostic) and hold alignment through them — see
GoldenReceiver.run FIND_SFD.
"""

import numpy as np
import pytest

from lora_tpu.config import LoRaConfig
from lora_tpu.rx.dense import DenseReceiver
from lora_tpu.rx.golden import GoldenReceiver
from lora_tpu.rx.receiver import JaxReceiver
from lora_tpu.tx.modulator import modulate_frame

PAYLOAD = bytes.fromhex("deadbeef")


def _stream(cfg, seed=0, **kw):
    sps = cfg.samples_per_symbol
    chunk = modulate_frame(cfg, PAYLOAD, pad_before=2500 + 301 * seed,
                           pad_after=sps, snr_db=40.0, seed=seed, **kw)
    return np.concatenate([chunk, np.zeros(3 * sps, np.complex64)])


@pytest.mark.parametrize("sf", [7, 11, 12])
@pytest.mark.parametrize("sync_word", [0x12, 0x34])
def test_golden_sync_word(sf, sync_word):
    cfg = LoRaConfig(sf=sf, cr=4, samp_rate=1e6, crc=True,
                     reduced_rate=sf > 10, sync_word=sync_word)
    frames = GoldenReceiver(cfg).run(_stream(cfg))
    assert len(frames) == 1 and frames[0].mac_payload == PAYLOAD


@pytest.mark.parametrize("sf", [7, 12])
def test_parity_dense_sync12(sf):
    cfg = LoRaConfig(sf=sf, cr=4, samp_rate=1e6, crc=True,
                     reduced_rate=sf > 10, sync_word=0x12)
    stream = _stream(cfg)
    for rx in (JaxReceiver(cfg),
               DenseReceiver(cfg, max_candidates=4, max_symbols=48)):
        frames = rx.run(stream)
        assert len(frames) == 1 and frames[0].mac_payload == PAYLOAD, type(rx)


def test_dense_fft_sync12():
    # the fft engine's static SFD grid: sync symbols must not burn the
    # correlation-fail budget (cumulative-2 recognition in
    # _decode_candidate_static)
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True, sync_word=0x12)
    rx = DenseReceiver(cfg, max_candidates=4, max_symbols=48,
                       demod_method="fft")
    frames = rx.run(_stream(cfg))
    assert len(frames) == 1 and frames[0].mac_payload == PAYLOAD


def test_sync12_with_cfo():
    # recognition is relative to the first walk window, so a CFO that
    # shifts every demodulated bin (16 bins at SF12 / 500 Hz) must not
    # defeat it or trigger false sync classification of the preamble
    cfg = LoRaConfig(sf=12, cr=4, samp_rate=1e6, crc=True,
                     reduced_rate=True, sync_word=0x12)
    frames = GoldenReceiver(cfg).run(_stream(cfg, cfo_hz=500.0))
    assert len(frames) == 1 and frames[0].mac_payload == PAYLOAD


def test_sync12_with_drift():
    # sync word + 30 ppm clock offset together (the real-capture regime)
    from lora_tpu.channelizer import fractional_resampler

    cfg = LoRaConfig(sf=12, cr=4, samp_rate=1e6, crc=True,
                     reduced_rate=True, sync_word=0x12)
    sps = cfg.samples_per_symbol
    chunk = modulate_frame(cfg, PAYLOAD, pad_before=2500, pad_after=sps,
                           snr_db=40.0, seed=0)
    chunk = fractional_resampler(chunk, 1.0 + 30e-6).astype(np.complex64)
    stream = np.concatenate([chunk, np.zeros(3 * sps, np.complex64)])
    frames = GoldenReceiver(cfg).run(stream)
    assert len(frames) == 1 and frames[0].mac_payload == PAYLOAD


def test_sync00_unchanged():
    # plain-preamble traces must not trip the recognition (dist ~ 0)
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True)
    rx = GoldenReceiver(cfg)
    frames = rx.run(_stream(cfg))
    assert len(frames) == 1 and frames[0].mac_payload == PAYLOAD
    assert rx.sync_run == 0
