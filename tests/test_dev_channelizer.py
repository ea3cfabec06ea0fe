"""Device-side streaming channelizer (StreamingLoRaReceiver._channelize_device).

Multi-channel graphs off the PFB grid used to run one host np.convolve
per channel per chunk (flowgraph.py pre-r3); they now run a single jitted
mixer-bank + FIR program over fixed-size blocks. These tests pin (a)
decode correctness on a 16-channel off-grid graph fed in uneven chunks,
(b) numerical equivalence with the host FIR path, and (c) the flush-time
drain of the sub-block remainder.
"""

import numpy as np
import pytest

from lora_tpu.config import LoRaConfig
from lora_tpu.flowgraph import StreamingLoRaReceiver
from lora_tpu.tx.modulator import modulate_frame


def _multichannel_capture(offsets_hz, samp_rate, payloads, seed=0,
                          pad_before=6000):
    """Packets mixed up to per-channel offsets in one wideband stream."""
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=samp_rate / 8, crc=True)
    wide_cfg = LoRaConfig(sf=7, cr=4, samp_rate=samp_rate, crc=True)
    L = 0
    parts = []
    for ci, off in enumerate(offsets_hz):
        pkt = modulate_frame(wide_cfg, payloads[ci],
                             pad_before=pad_before + 997 * ci, snr_db=None)
        parts.append((off, pkt))
        L = max(L, len(pkt))
    L += 8 * wide_cfg.samples_per_symbol
    x = np.zeros(L, np.complex128)
    for off, pkt in parts:
        t = np.arange(len(pkt))
        x[: len(pkt)] += pkt * np.exp(2j * np.pi * off / samp_rate * t)
    rng = np.random.default_rng(seed)
    x += rng.normal(0, 1e-4, (L, 2)) @ [1, 1j]
    return x.astype(np.complex64), cfg


OFF_GRID = [(-7.5 + c) * 200e3 + 13e3 for c in range(16)]  # 13 kHz off-grid


def test_16ch_off_grid_device_channelizer():
    samp_rate = 8e6
    payloads = [bytes([c, 0xC3]) for c in range(16)]
    x, _ = _multichannel_capture(OFF_GRID, samp_rate, payloads)
    rx = StreamingLoRaReceiver(
        samp_rate=samp_rate, center_freq=868e6,
        channel_list=[868e6 + o for o in OFF_GRID],
        sf=7, cr=4, decimation=8, engine="dense", block_symbols=256,
    )
    assert rx._wb_stream is None          # off-grid: not the PFB path
    assert rx._dev_run is not None        # ... but device-side FIR
    # uneven chunk sizes exercise the bucket/remainder machinery
    frames = []
    pos, sizes = 0, [100_000, 37_123, 250_000, 1_000_000]
    k = 0
    while pos < len(x):
        n = sizes[k % len(sizes)]
        frames += rx.push(x[pos : pos + n])
        pos += n
        k += 1
    frames += rx.flush()
    got = {f.channel: f.payload[:2] for f in frames}
    assert got == {c: payloads[c] for c in range(16)}, got


def test_device_matches_host_fir():
    """Bit-level (1e-3 relative) equivalence of the device mixer-bank +
    FIR with the host np.convolve path, across chunk boundaries."""
    samp_rate = 2e6
    offs = [-260e3, 140e3, 413e3]
    rng = np.random.default_rng(3)
    x = (rng.normal(0, 1.0, (70_000, 2)) @ [1, 1j]).astype(np.complex64)

    def make(dev: bool):
        rx = StreamingLoRaReceiver(
            samp_rate=samp_rate, center_freq=868e6,
            channel_list=[868e6 + o for o in offs],
            sf=7, cr=4, decimation=2, engine="dense",
        )
        if not dev:
            rx._dev_run = None  # force the host FIR path
        return rx

    def run(rx):
        outs = [[] for _ in offs]
        for pos in range(0, len(x), 9_001):
            for ci, ch in enumerate(rx._channelize(x[pos : pos + 9_001])):
                outs[ci].append(ch)
        if rx._dev_run is not None and len(rx._dev_pending):
            for ci, ch in enumerate(
                rx._channelize_device(np.zeros(0, np.complex64), final=True)
            ):
                outs[ci].append(ch)
        return [np.concatenate(o) for o in outs]

    host = run(make(False))
    dev = run(make(True))
    for h, d in zip(host, dev):
        n = min(len(h), len(d))
        assert n > 30_000
        err = np.abs(h[:n] - d[:n]).max()
        assert err < 1e-3 * max(np.abs(h[:n]).max(), 1e-9), err


def test_single_channel_stays_on_host():
    rx = StreamingLoRaReceiver(
        samp_rate=1e6, center_freq=868e6, channel_list=[868.3e6],
        sf=7, cr=4, decimation=8, engine="dense",
    )
    assert rx._dev_run is None
