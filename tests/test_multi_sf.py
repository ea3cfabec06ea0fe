"""Gateway-class multi-SF wideband receive.

One PFB pass feeds one DenseReceiver per spreading factor inside a
single jit (wideband.MultiSFWidebandReceiver) — the capability a
LoRaWAN gateway has and the reference approximates by fanning the
stream out to one decoder block per SF (reference
python/lora_receiver.py:30,53; examples/lora_receive_multi_sf.yml).
"""

import numpy as np
import pytest

import jax

from lora_tpu.config import LoRaConfig
from lora_tpu.channelizer import pfb_channel_freqs
from lora_tpu.tx.modulator import modulate_frame
from lora_tpu.wideband import MultiSFWidebandReceiver


def _band_with_packets(cfg, M, placements, L):
    """Wideband capture with one packet per (sf, channel, payload)."""
    wide_rate = M * cfg.samp_rate
    freqs = pfb_channel_freqs(wide_rate, M)
    rng = np.random.default_rng(7)
    x = (rng.normal(0, 1e-4, L) + 1j * rng.normal(0, 1e-4, L)).astype(
        np.complex64)
    t = np.arange(L, dtype=np.float64)
    for sf, chan, payload in placements:
        wide_cfg = LoRaConfig(sf=sf, cr=cfg.cr, samp_rate=wide_rate,
                              crc=cfg.crc, bandwidth=cfg.bandwidth)
        pkt = modulate_frame(wide_cfg, payload, snr_db=None)
        pos = 2 * wide_cfg.samples_per_symbol
        assert pos + len(pkt) <= L, (sf, pos + len(pkt), L)
        x[pos:pos + len(pkt)] += (
            pkt * np.exp(2j * np.pi * freqs[chan] / wide_rate
                         * t[pos:pos + len(pkt)])
        ).astype(np.complex64)
    return x


def test_multi_sf_wideband_decodes_every_sf():
    M = 8
    cfg = LoRaConfig(sf=7, cr=1, samp_rate=250e3, crc=True)
    placements = [(7, 2, b"\x11\x22"), (8, 5, b"\x33\x44"),
                  (9, 6, b"\x55\x66")]
    wr = MultiSFWidebandReceiver(cfg, M, sfs=(7, 8, 9), pool=8,
                                 max_candidates=2, max_symbols=16,
                                 sfd_search=10, demod_method="fft")
    # block long enough for the slowest SF's packet + its decode region
    sps9 = 4 * cfg.samples_per_symbol  # SF9 symbols are 4x SF7's
    L = (2 * sps9 + 30 * sps9 + wr.max_pkt_samples * 2) * M
    x = _band_with_packets(cfg, M, placements, L)
    frames = wr.run(x)

    got = {(f.tap_header.sf, f.channel): f.payload for f in frames}
    for sf, chan, payload in placements:
        assert (sf, chan) in got, (sf, chan, sorted(got))
        assert got[(sf, chan)][: len(payload)] == payload
    # cross-SF rejection: nothing decoded on (sf, channel) pairs that
    # carried a different SF's packet
    for f in frames:
        assert (f.tap_header.sf, f.channel) in {
            (sf, ch) for sf, ch, _ in placements
        }, (f.tap_header.sf, f.channel, f.payload)
    # channel frequency stamped from the PFB grid
    freqs = pfb_channel_freqs(M * cfg.samp_rate, M)
    for f in frames:
        assert f.tap_header.frequency == int(abs(freqs[f.channel]))


def test_multi_sf_requires_sfs():
    cfg = LoRaConfig(sf=7, cr=1, samp_rate=250e3, crc=True)
    with pytest.raises(ValueError):
        MultiSFWidebandReceiver(cfg, 8, sfs=())


def test_multi_sf_process_returns_per_sf_results():
    M = 4
    cfg = LoRaConfig(sf=7, cr=1, samp_rate=250e3, crc=True)
    wr = MultiSFWidebandReceiver(cfg, M, sfs=(7, 8), pool=4,
                                 max_candidates=2, max_symbols=12,
                                 sfd_search=10, demod_method="fft")
    L = (wr.max_pkt_samples * 2 + 40 * cfg.samples_per_symbol) * M
    x = _band_with_packets(cfg, M, [(7, 1, b"\xab")], L)
    res = jax.device_get(wr.process(x))
    assert set(res.keys()) == {7, 8}
    assert np.asarray(res[7].valid).shape == (4,)
    got = np.asarray(res[7].valid)
    assert got.any()
    g = int(np.nonzero(got)[0][0])
    assert bytes(np.asarray(res[7].payload)[g][:1]) == b"\xab"
    assert not np.asarray(res[8].valid).any()


def test_multi_sf_streaming_gateway():
    """WidebandStreamingReceiver accepts a MultiSFWidebandReceiver:
    unbounded wideband stream in, per-SF frames out, seam dedup keyed
    by (sf, channel)."""
    from lora_tpu.stream import WidebandStreamingReceiver

    M = 4
    cfg = LoRaConfig(sf=7, cr=1, samp_rate=250e3, crc=True)
    gw = MultiSFWidebandReceiver(cfg, M, sfs=(7, 8), pool=8,
                                 max_candidates=2, max_symbols=14,
                                 sfd_search=10, demod_method="fft")
    sr = WidebandStreamingReceiver(gw, block_symbols=40)
    wide_rate = M * cfg.samp_rate
    freqs = pfb_channel_freqs(wide_rate, M)
    sps8 = 2 * cfg.samples_per_symbol

    # three packets, the second placed to straddle a block seam
    rng = np.random.default_rng(11)
    L = 3 * sr.hop // 1  # three hops of stream
    x = (rng.normal(0, 1e-4, L) + 1j * rng.normal(0, 1e-4, L)).astype(
        np.complex64)
    t = np.arange(L, dtype=np.float64)
    placements = []
    for i, (sf, chan, payload) in enumerate(
            [(7, 1, b"\x01"), (8, 2, b"\x02"), (7, 3, b"\x03")]):
        wcfg = LoRaConfig(sf=sf, cr=1, samp_rate=wide_rate, crc=True)
        pkt = modulate_frame(wcfg, payload, snr_db=None)
        pos = i * sr.hop + sr.hop - (len(pkt) // 2 if i == 1 else 4 * sps8 * M)
        pos = max(0, min(pos, L - len(pkt)))
        x[pos:pos + len(pkt)] += (
            pkt * np.exp(2j * np.pi * freqs[chan] / wide_rate
                         * t[pos:pos + len(pkt)])
        ).astype(np.complex64)
        placements.append((sf, chan, payload))

    frames = []
    step = sr.hop // 2
    for i in range(0, L, step):
        frames += sr.push(x[i:i + step])
    frames += sr.flush()

    got = {(f.tap_header.sf, f.channel): f.payload for f in frames}
    for sf, chan, payload in placements:
        assert (sf, chan) in got, (sf, chan, sorted(got))
        assert got[(sf, chan)][: len(payload)] == payload
    # exactly one frame per placement (seam dedup held per (sf, chan))
    assert len(frames) == len(placements), [
        (f.tap_header.sf, f.channel, f.sample_index) for f in frames]


def test_multi_sf_streaming_dedup_is_per_sf():
    """Two distinct SF7 packets ~26 SF7 symbols apart must BOTH emit in
    gateway mode: the seam-dedup window is 16 symbols of the decoding
    SF, not of the gateway's slowest SF (16 slowest-SF symbols — here
    SF10, 32k channel samples — would swallow the second packet; at a
    real gateway's SF12 the window would be ~0.5 s)."""
    from lora_tpu.stream import WidebandStreamingReceiver

    M = 4
    cfg = LoRaConfig(sf=7, cr=1, samp_rate=250e3, crc=True)
    gw = MultiSFWidebandReceiver(cfg, M, sfs=(7, 10), pool=8,
                                 max_candidates=4, max_symbols=14,
                                 sfd_search=10, demod_method="fft")
    sr = WidebandStreamingReceiver(gw, block_symbols=44)  # SF10 symbols
    wide_rate = M * cfg.samp_rate
    freqs = pfb_channel_freqs(wide_rate, M)
    sps7w = 2 ** 7 * int(wide_rate / 125e3)  # SF7 symbol at wide rate

    rng = np.random.default_rng(13)
    L = 2 * sr.hop
    x = (rng.normal(0, 1e-4, L) + 1j * rng.normal(0, 1e-4, L)).astype(
        np.complex64)
    t = np.arange(L, dtype=np.float64)
    wcfg = LoRaConfig(sf=7, cr=1, samp_rate=wide_rate, crc=True)
    for i, payload in enumerate([b"\x0a", b"\x0b"]):
        pkt = modulate_frame(wcfg, payload, snr_db=None)
        pos = 2 * sps7w + i * (len(pkt) + 4 * sps7w)
        assert pos + len(pkt) < sr.hop  # both inside the first block
        x[pos:pos + len(pkt)] += (
            pkt * np.exp(2j * np.pi * freqs[1] / wide_rate
                         * t[pos:pos + len(pkt)])
        ).astype(np.complex64)

    frames = sr.push(x)
    frames += sr.flush()
    sf7 = [f for f in frames if f.tap_header.sf == 7 and f.channel == 1]
    assert {f.payload[:1] for f in sf7} == {b"\x0a", b"\x0b"}, [
        (f.sample_index, f.payload.hex()) for f in frames]
