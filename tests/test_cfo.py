"""CFO estimation: the explicit control-plane path the reference wires but
never drives (decoder publisher disabled, lib/decoder_impl.cc:774-776).

Frames must carry an accurate carrier-frequency-offset estimate, and
LoRaReceiver(auto_cfo=True) must fold it back into the channelizer mixer
(the controller/apply_cfo loop)."""

import numpy as np
import pytest

from lora_tpu import LoRaConfig
from lora_tpu.ops import demod
from lora_tpu.ops.chirp import build_ideal_chirps
from lora_tpu.rx.dense import DenseReceiver
from lora_tpu.tx.modulator import modulate_frame


@pytest.fixture(scope="module")
def cfg():
    return LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)


@pytest.mark.parametrize("cfo_true", [0.0, 120.0, -350.0, 420.0])
def test_preamble_cfo_estimator(cfg, cfo_true):
    up, _ = build_ideal_chirps(cfg)
    sps = cfg.samples_per_symbol
    pre = np.tile(up, 4)
    n = np.arange(len(pre))
    x = pre * np.exp(2j * np.pi * cfo_true * n / cfg.samp_rate)
    rng = np.random.default_rng(0)
    x = (x + rng.normal(0, 0.02, (len(x), 2)) @ [1, 1j]).astype(np.complex64)
    est = float(demod.preamble_cfo(x[: 2 * sps], sps, cfg.samp_rate, xp=np))
    assert abs(est - cfo_true) < 5.0, (est, cfo_true)


@pytest.mark.parametrize("method", ["fft", "gradient"])
def test_dense_frames_carry_cfo(cfg, method):
    sps = cfg.samples_per_symbol
    cfo_true = 300.0
    pkt = modulate_frame(cfg, b"\xde\xad", pad_before=8 * sps, pad_after=8 * sps,
                         snr_db=40.0, cfo_hz=cfo_true)
    rx = DenseReceiver(cfg, max_candidates=2, max_symbols=16, sfd_search=12,
                       demod_method=method)
    frames = rx.run(pkt)
    assert len(frames) == 1
    assert frames[0].payload[:2] == b"\xde\xad"
    assert abs(frames[0].cfo - cfo_true) < 20.0, frames[0].cfo


def test_auto_cfo_feedback(cfg):
    from lora_tpu.receiver import LoRaReceiver

    sps = cfg.samples_per_symbol
    pkt = modulate_frame(cfg, b"\x11", pad_before=8 * sps, pad_after=8 * sps,
                         snr_db=40.0, cfo_hz=-400.0)
    rx = LoRaReceiver(samp_rate=250e3, center_freq=868.1e6,
                      channel_list=[868.1e6], bandwidth=125e3, sf=7, cr=4,
                      crc=True, disable_channelization=True, engine="dense",
                      auto_cfo=True, max_candidates=2, max_symbols=16,
                      sfd_search=12)
    frames = rx.receive(pkt)
    assert len(frames) == 1
    assert abs(rx._cfo - (-400.0)) < 20.0, rx._cfo
