"""Streaming wideband receiver: on-device PFB + decode over block seams."""

import numpy as np
import pytest

from lora_tpu.channelizer import pfb_channel_freqs
from lora_tpu.config import LoRaConfig
from lora_tpu.stream import WidebandStreamingReceiver
from lora_tpu.tx.modulator import modulate_frame
from lora_tpu.wideband import WidebandReceiver

M = 8
# channel spacing 2x the LoRa bandwidth: a critically-sampled PFB needs
# the signal inside the channel Nyquist zone (the reference's filter
# cutoff bw/2+15k = 77.5 kHz exceeds a 125 kHz channel's 62.5 kHz)
CFG = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
WIDE_RATE = M * CFG.samp_rate


def _wideband_with_packets(placements, total_chan_samples):
    """placements: [(channel, chan_sample_pos, payload)] upconverted into
    one wideband stream of ``total_chan_samples * M`` samples."""
    L = total_chan_samples * M
    x = np.zeros(L, np.complex64)
    freqs = pfb_channel_freqs(WIDE_RATE, M)
    wide_cfg = LoRaConfig(sf=7, cr=4, samp_rate=WIDE_RATE, crc=True)
    for chan, pos_chan, payload in placements:
        pkt = modulate_frame(wide_cfg, payload, snr_db=None)
        pos = pos_chan * M
        t = np.arange(len(pkt)) + pos
        x[pos : pos + len(pkt)] += (
            pkt * np.exp(2j * np.pi * freqs[chan] / WIDE_RATE * t)
        ).astype(np.complex64)
    return x


@pytest.mark.parametrize("pool", [None, 8])
def test_wideband_stream_decodes_across_seams(pool):
    wr = WidebandReceiver(CFG, M, pool=pool, max_candidates=2,
                          max_symbols=24, sfd_search=12, demod_method="fft")
    sr = WidebandStreamingReceiver(wr, block_symbols=256)
    hop_chan = sr.hop // M

    sps = CFG.samples_per_symbol
    placements = [
        (1, 4 * sps, b"\xde\xad\xbe\xef"),          # early, block 0
        (3, hop_chan - 20 * sps, b"\x11\x22\x33"),  # straddles the seam
        (6, hop_chan + 30 * sps, b"\x44\x55"),      # block 1
        (1, 2 * hop_chan + 8 * sps, b"\x66"),       # block 2, same channel
    ]
    total = 3 * hop_chan + 60 * sps
    x = _wideband_with_packets(placements, total)

    frames = []
    chunk = 100_000
    for i in range(0, len(x), chunk):
        frames += sr.push(x[i : i + chunk])
    frames += sr.flush()

    assert len(frames) == len(placements), [
        (f.channel, f.sample_index, f.payload.hex()) for f in frames
    ]
    # every placement decoded exactly once on its channel
    by_key = {}
    for f in frames:
        by_key.setdefault(f.channel, []).append(f.payload)
    for chan, _, payload in placements:
        assert any(p[: len(payload)] == payload for p in by_key.get(chan, [])), (
            chan, payload, by_key)


def test_wideband_stream_no_duplicates_on_overlap():
    """A packet entirely inside the halo region of block k and the owned
    region of block k+1 must be emitted exactly once."""
    wr = WidebandReceiver(CFG, M, pool=4, max_candidates=2,
                          max_symbols=24, sfd_search=12, demod_method="fft")
    sr = WidebandStreamingReceiver(wr, block_symbols=256)
    hop_chan = sr.hop // M
    sps = CFG.samples_per_symbol
    x = _wideband_with_packets(
        [(2, hop_chan + 2 * sps, b"\xab\xcd")], 2 * hop_chan + 50 * sps
    )
    frames = []
    for i in range(0, len(x), 200_000):
        frames += sr.push(x[i : i + 200_000])
    frames += sr.flush()
    assert len(frames) == 1
    assert frames[0].channel == 2
    assert frames[0].payload[:2] == b"\xab\xcd"
