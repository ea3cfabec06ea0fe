"""StreamingLoRaReceiver's PFB fast path: a dense channel grid routes
through the on-device wideband pipeline (one jitted PFB+decode program)
instead of one host FIR per channel."""

import numpy as np

from lora_tpu.config import LoRaConfig
from lora_tpu.flowgraph import StreamingLoRaReceiver
from lora_tpu.tx.modulator import modulate_frame

M = 16
CHAN_RATE = 250e3
SAMP_RATE = M * CHAN_RATE
CENTER = 868.0e6


def test_flowgraph_channel_grid_uses_pfb():
    spacing = SAMP_RATE / M
    # three active channels on the PFB grid (one at a negative offset)
    chans = [CENTER + 1 * spacing, CENTER + 5 * spacing, CENTER - 2 * spacing]
    rx = StreamingLoRaReceiver(
        samp_rate=SAMP_RATE, center_freq=CENTER, channel_list=chans,
        sf=7, cr=4, crc=True, engine="dense", decimation=M,
        block_symbols=128, max_candidates=2, max_symbols=24,
    )
    assert rx._wb_stream is not None, "PFB fast path not engaged"

    wide_cfg = LoRaConfig(sf=7, cr=4, samp_rate=SAMP_RATE, crc=True)
    sps_w = wide_cfg.samples_per_symbol
    payloads = {0: b"\x0a\x0b", 1: b"\x1c", 2: b"\x2d\x2e\x2f"}
    L = rx._wb_stream.block_len + rx._wb_stream.hop
    x = np.zeros(L, np.complex64)
    for ci, payload in payloads.items():
        pkt = modulate_frame(wide_cfg, payload, snr_db=None)
        pos = (4 + 40 * ci) * sps_w
        off = chans[ci] - CENTER
        t = np.arange(len(pkt)) + pos
        x[pos : pos + len(pkt)] += (
            pkt * np.exp(2j * np.pi * off / SAMP_RATE * t)
        ).astype(np.complex64)

    frames = []
    for i in range(0, len(x), 300_000):
        frames += rx.push(x[i : i + 300_000])
    frames += rx.flush()

    got = {f.channel: f.payload for f in frames}
    assert set(got) == set(payloads), (got.keys(), [f.channel for f in frames])
    for ci, payload in payloads.items():
        assert got[ci][: len(payload)] == payload
        # loratap frequency carries the absolute channel frequency
    freqs = {f.channel: f.tap_header.frequency for f in frames}
    for ci in payloads:
        assert freqs[ci] == int(chans[ci])


def test_flowgraph_off_grid_falls_back_to_fir():
    rx = StreamingLoRaReceiver(
        samp_rate=SAMP_RATE, center_freq=CENTER,
        channel_list=[CENTER + 100e3] * 9,  # not on the samp_rate/M grid
        sf=7, cr=4, crc=True, engine="dense", decimation=M,
        block_symbols=128, max_candidates=2, max_symbols=24,
    )
    assert rx._wb_stream is None
    assert rx._streams is not None
