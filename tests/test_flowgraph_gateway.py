"""lora_gateway flowgraph block: every channel x every SF, streaming.

Both forms — the PFB grid (channels=M) and the LoRaWAN regional plan
(plan=EU868) — run end-to-end through the YAML flowgraph runner with a
file source, matching the reference's realtime topology
(apps/lora_receive_realtime.grc) but with one block per band instead of
one flowgraph per (channel, SF).
"""

import os

import numpy as np

from lora_tpu.config import LoRaConfig
from lora_tpu.flowgraph import BLOCKS, Flowgraph, StreamingGateway
from lora_tpu.tx.modulator import modulate_frame


def test_lora_gateway_block_registered():
    spec = BLOCKS["lora_gateway"]
    assert spec.kind == "receiver"
    ids = {p.id for p in spec.params}
    assert {"plan", "channels", "sfs", "pool", "block_symbols"} <= ids


def test_gateway_block_pfb_grid_two_sfs():
    M = 4
    rate = M * 250e3
    gwb = StreamingGateway(samp_rate=rate, center_freq=868.0e6,
                           channels=M, sfs=(7, 8), pool=8,
                           block_symbols=96)
    from lora_tpu.channelizer import pfb_channel_freqs

    freqs = pfb_channel_freqs(rate, M)
    L = gwb._sr.block_len + gwb._sr.hop
    x = np.zeros(L, np.complex64)
    placements = [(7, 1, b"\x42"), (8, 2, b"\x24\x25")]
    for sf, chan, payload in placements:
        wcfg = LoRaConfig(sf=sf, cr=4, samp_rate=rate, crc=True)
        pkt = modulate_frame(wcfg, payload, snr_db=None)
        pos = 2 * wcfg.samples_per_symbol
        t = np.arange(len(pkt)) + pos
        x[pos:pos + len(pkt)] += (
            pkt * np.exp(2j * np.pi * freqs[chan] / rate * t)
        ).astype(np.complex64)

    frames = []
    for i in range(0, len(x), 200_000):
        frames += gwb.push(x[i : i + 200_000])
    frames += gwb.flush()
    gwb.close()
    got = {(f.tap_header.sf, f.channel): f.payload for f in frames}
    for sf, chan, payload in placements:
        assert (sf, chan) in got, (sorted(got), sf, chan)
        assert got[(sf, chan)][: len(payload)] == payload


def test_gateway_flowgraph_yaml_plan(tmp_path):
    """The example-style YAML end-to-end: file_source -> lora_gateway
    (plan=EU868) -> collect."""
    center, rate = 867.3e6, 1e6
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=rate, crc=True, sync_word=0x34)
    pkt = modulate_frame(cfg, b"\xca\xfe", snr_db=None)
    pos = 2 * cfg.samples_per_symbol
    # place on 867.1 MHz (an in-band EU868 channel)
    L = pos + len(pkt) + 400_000
    x = np.zeros(L, np.complex64)
    t = np.arange(len(pkt)) + pos
    x[pos:pos + len(pkt)] += (
        pkt * np.exp(2j * np.pi * (867.1e6 - center) / rate * t)
    ).astype(np.complex64)
    cap = tmp_path / "band.cf32"
    x.astype(np.complex64).tofile(cap)

    spec = {
        "options": {"id": "t"},
        "variables": {},
        "blocks": [
            {"name": "src", "id": "file_source",
             "parameters": {"file": str(cap)}},
            {"name": "gw", "id": "lora_gateway",
             "parameters": {"samp_rate": rate, "center_freq": center,
                            "plan": "'EU868'", "sfs": [7, 8],
                            "pool": 8, "block_symbols": 96}},
        ],
        "connections": [["src", "0", "gw", "0"]],
    }
    fg = Flowgraph(spec)
    frames = fg.run()
    got = {(f.tap_header.sf, f.tap_header.frequency): f.payload
           for f in frames}
    assert (7, int(867.1e6)) in got, sorted(got)
    assert got[(7, int(867.1e6))][:2] == b"\xca\xfe"
