"""Mid-stream CFO closed loop: the channel mixer retunes while the
stream runs (reference controller semantics, lib/controller_impl.cc:52-57
-> channelizer_impl.cc:68-71), keeping decode locked under a carrier
drift that walks the signal out of a fixed mixer's filter passband."""

import numpy as np
import pytest

from lora_tpu.config import LoRaConfig
from lora_tpu.flowgraph import StreamingLoRaReceiver
from lora_tpu.ops import demod
from lora_tpu.ops.chirp import build_ideal_chirps
from lora_tpu.tx.modulator import modulate_frame


CFG = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True)
STEP_HZ = 6000.0   # per-frame drift, well past the one-bin (977 Hz)
                   # range of the fractional estimator alone
N_FRAMES = 10      # final offset 54 kHz: far outside the channel filter
                   # (cutoff bw/2+15k = 77.5 kHz vs signal edge 62.5+54k)


def _ramped_stream():
    sps = CFG.samples_per_symbol
    chunks = []
    for k in range(N_FRAMES):
        chunks.append(
            modulate_frame(
                CFG, b"\xde\xad\xbe\xef",
                pad_before=3000, pad_after=sps,
                snr_db=40.0, cfo_hz=k * STEP_HZ, seed=100 + k,
            )
        )
    chunks.append(np.zeros(4 * sps, np.complex64))
    return np.concatenate(chunks)


def _run(auto_cfo: bool):
    # decimation=2 engages the channel filter in both runs (the
    # pass-through shortcut would otherwise hide the filter rolloff the
    # fixed mixer is supposed to suffer from)
    rx = StreamingLoRaReceiver(
        samp_rate=1e6, center_freq=868.1e6, channel_list=[868.1e6],
        sf=7, cr=4, crc=True, engine="dense", block_symbols=64,
        max_candidates=4, max_symbols=24, decimation=2, auto_cfo=auto_cfo,
    )
    x = _ramped_stream()
    frames = []
    for i in range(0, len(x), 80_000):
        frames += rx.push(x[i : i + 80_000])
    frames += rx.flush()
    good = sum(f.mac_payload == b"\xde\xad\xbe\xef" for f in frames)
    return good, rx


def test_cfo_ramp_tracked_with_loop():
    # a retune landing mid-frame may cost that one frame a phase step
    # (same as the reference's set_center_freq); the rest must hold lock
    good, rx = _run(auto_cfo=True)
    assert good >= N_FRAMES - 1, good
    # the loop accumulated roughly the final ramp value
    assert abs(rx.cfo[0] - (N_FRAMES - 1) * STEP_HZ) < 2.5 * STEP_HZ, rx.cfo


def test_cfo_ramp_lost_without_loop():
    """Same stream, fixed mixer: the late frames walk out of the channel
    filter passband and are lost — the loop above is load-bearing."""
    good, rx = _run(auto_cfo=False)
    assert good <= N_FRAMES - 3, good
    assert rx.cfo[0] == 0.0


def test_full_range_cfo_estimator_exact():
    """chirp_coarse_cfo + preamble_cfo recover multi-kHz offsets exactly
    (the fractional estimator alone wraps at one bin = 977 Hz)."""
    from lora_tpu.rx.dense import DenseReceiver

    sps = CFG.samples_per_symbol
    rx = DenseReceiver(CFG, max_candidates=2, max_symbols=24,
                       demod_method="gradient")
    for cfo in (-8000.0, -300.0, 0.0, 2000.0, 20000.0):
        x = modulate_frame(CFG, b"\xde\xad\xbe\xef", pad_before=3000,
                           pad_after=4 * sps, snr_db=40.0, cfo_hz=cfo, seed=3)
        res = rx.process(x[None])
        v = np.asarray(res.valid)[0]
        assert v.any(), cfo
        est = float(np.asarray(res.cfo)[0][v][0])
        assert abs(est - cfo) < 100.0, (cfo, est)
