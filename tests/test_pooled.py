"""Global candidate pool: Phase B capacity scales with aggregate load,
not channel count, and energy ranking keeps PFB-sidelobe ghosts from
crowding real packets out of the pool."""

import numpy as np
import pytest

from lora_tpu import LoRaConfig
from lora_tpu.channelizer import pfb_channel_freqs
from lora_tpu.rx.dense import DenseReceiver
from lora_tpu.tx.modulator import modulate_frame
from lora_tpu.wideband import WidebandReceiver

M = 8
CHAN_RATE = 250e3


def _capture(payloads_by_channel, snr_db=60.0):
    wide_rate = M * CHAN_RATE
    wide_cfg = LoRaConfig(sf=7, cr=4, samp_rate=wide_rate, crc=True)
    sps_w = wide_cfg.samples_per_symbol
    L = 120 * sps_w
    x = np.zeros(L, np.complex128)
    freqs = pfb_channel_freqs(wide_rate, M)
    for c, pay in payloads_by_channel.items():
        pkt = modulate_frame(wide_cfg, pay, snr_db=None)
        pos = (8 + c) * sps_w
        t = np.arange(len(pkt)) + pos
        x[pos : pos + len(pkt)] += pkt * np.exp(
            2j * np.pi * freqs[c] / wide_rate * t
        )
    x += np.random.default_rng(0).normal(
        0, 10 ** (-snr_db / 20), (L, 2)
    ) @ [1, 1j]
    return x.astype(np.complex64)


def test_pooled_wideband_matches_per_channel():
    payloads = {1: b"\x11\xaa", 3: b"\x33\xbb", 6: b"\x66\xcc"}
    x = _capture(payloads)
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=CHAN_RATE, crc=True)
    got = {}
    for pool in (None, 8):
        wr = WidebandReceiver(cfg, M, pool=pool, max_candidates=2,
                              max_symbols=16, sfd_search=12)
        frames = wr.run(x)
        got[pool] = sorted((f.channel, f.payload[:2]) for f in frames)
    assert got[8] == got[None]
    assert got[8] == sorted((c, p) for c, p in payloads.items())


def test_pool_overflow_keeps_strongest():
    """With a pool smaller than the candidate count, real packets (high
    energy) win over sidelobe ghosts."""
    payloads = {c: bytes([c, 0x77]) for c in range(4)}
    x = _capture(payloads)
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=CHAN_RATE, crc=True)
    wr = WidebandReceiver(cfg, M, pool=4, max_candidates=2,
                          max_symbols=16, sfd_search=12)
    frames = wr.run(x)
    assert {f.channel: f.payload[:2] for f in frames} == payloads


def test_pooled_direct_multichannel():
    """process_pooled on a plain [C, L] channel batch (no PFB)."""
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=CHAN_RATE, crc=True)
    sps = cfg.samples_per_symbol
    rows = []
    for c in range(4):
        pkt = modulate_frame(cfg, bytes([c]), pad_before=(4 + c) * sps,
                             pad_after=4 * sps, snr_db=40.0, seed=c)
        rows.append(pkt)
    L = max(len(r) for r in rows)
    L = -(-L // sps) * sps
    xs = np.stack([np.pad(r, (0, L - len(r))) for r in rows])

    import jax

    rx = DenseReceiver(cfg, max_candidates=2, max_symbols=16, sfd_search=12)
    # trace-time core: caller provides the tailroom (host entries pad)
    xs = np.pad(xs, ((0, 0), (0, rx.pkt_samples)))
    fn = jax.jit(lambda xc: rx.process_pooled(xc, pool=6))
    res = jax.device_get(fn(jax.numpy.asarray(xs)))
    valid = np.asarray(res.valid)
    got = {
        int(np.asarray(res.channel)[g]): bytes(np.asarray(res.payload)[g][:1])
        for g in np.nonzero(valid)[0]
    }
    assert got == {c: bytes([c]) for c in range(4)}


def test_near_far_weak_packet_decodes():
    """Near/far regime: a genuine packet 25 dB below a CONCURRENT strong
    packet on another channel must decode — the leak-suppression mask may
    only remove signals below the channel filters' >=40 dB sidelobe
    attenuation (rx/frontend.LEAK_RATIO)."""
    wide_rate = M * CHAN_RATE
    wide_cfg = LoRaConfig(sf=7, cr=4, samp_rate=wide_rate, crc=True)
    sps_w = wide_cfg.samples_per_symbol
    L = 120 * sps_w
    x = np.zeros(L, np.complex128)
    freqs = pfb_channel_freqs(wide_rate, M)
    payloads = {1: (b"\x5a\x5a", 1.0), 5: (b"\xa5\xa5", 10 ** (-25 / 20.0))}
    pos = 8 * sps_w  # SAME start: fully concurrent transmissions
    for c, (pay, amp) in payloads.items():
        pkt = modulate_frame(wide_cfg, pay, snr_db=None) * amp
        t = np.arange(len(pkt)) + pos
        x[pos : pos + len(pkt)] += pkt * np.exp(
            2j * np.pi * freqs[c] / wide_rate * t
        )
    x += np.random.default_rng(1).normal(0, 10 ** (-60 / 20), (L, 2)) @ [1, 1j]
    x = x.astype(np.complex64)

    cfg = LoRaConfig(sf=7, cr=4, samp_rate=CHAN_RATE, crc=True)
    wr = WidebandReceiver(cfg, M, pool=8, max_candidates=2,
                          max_symbols=16, sfd_search=12)
    frames = wr.run(x)
    got = {f.channel: f.payload[:2] for f in frames}
    assert got.get(1) == b"\x5a\x5a", got
    assert got.get(5) == b"\xa5\xa5", got  # the weak-but-real packet
    # sidelobe ghosts of the strong packet must not produce frames on
    # idle channels
    assert set(got) == {1, 5}, got
