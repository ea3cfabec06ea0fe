"""Two-stage subband-sharded wideband receive (round 4).

Channel-count scale-out over the mesh: coarse per-time-shard PFB ->
``all_to_all`` band redistribution -> per-device fine PFB + pooled
decode. Runs on the 8-virtual-CPU mesh (tests/conftest.py); the same
program runs unchanged on a TPU slice over ICI.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lora_tpu.config import LoRaConfig
from lora_tpu.ops.xfer import pack_iq
from lora_tpu.parallel import (make_mesh, subband_channel_freq,
                               wideband_subband_sharded_process)
from lora_tpu.tx.modulator import modulate_frame
from lora_tpu.wideband import WidebandReceiver


def test_subband_sharded_decodes_across_bands():
    n_dev = len(jax.devices())
    assert n_dev == 8
    M_fine = 8
    # 250 ksps per fine channel (decim 2): the LoRa bandwidth must sit
    # inside half the channel spacing or the critically-sampled PFB's
    # band-edge alias distorts the chirp (decim 1 puts the signal edge
    # exactly at the fold-over)
    cfg = LoRaConfig(sf=7, cr=1, samp_rate=250e3, crc=True)
    wr = WidebandReceiver(cfg, M_fine, pool=8, max_candidates=2,
                          max_symbols=12, sfd_search=10, demod_method="fft")
    wide_rate = n_dev * M_fine * cfg.samp_rate

    # time shards must hold whole coarse frames: L % (n_dev^2 * M) == 0
    chan_samples = 2 * wr.rx.pkt_samples // cfg.samples_per_symbol * \
        cfg.samples_per_symbol + 16 * cfg.samples_per_symbol
    L = n_dev * M_fine * chan_samples
    step = n_dev * n_dev * M_fine
    L = -(-L // step) * step

    wide_cfg = LoRaConfig(sf=7, cr=1, samp_rate=wide_rate, crc=True,
                          bandwidth=cfg.bandwidth)
    sps_w = wide_cfg.samples_per_symbol
    rng = np.random.default_rng(0)
    x = (rng.normal(0, 1e-4, L) + 1j * rng.normal(0, 1e-4, L)).astype(
        np.complex64)
    # one packet per tested (band, fine channel), centrally placed in
    # frequency (band-edge fine channels sit in the coarse transition)
    placements = [(1, 2, b"\x11"), (5, 3, b"\x22"), (6, 2, b"\x33")]
    t_all = np.arange(L)
    for band, chan, payload in placements:
        f = subband_channel_freq(wide_rate, n_dev, M_fine, band, chan)
        pkt = modulate_frame(wide_cfg, payload, snr_db=None)
        pos = 2 * sps_w * (1 + band)
        x[pos:pos + len(pkt)] += (
            pkt * np.exp(2j * np.pi * f / wide_rate * t_all[pos:pos + len(pkt)])
        ).astype(np.complex64)

    mesh = make_mesh(n_dev)
    fn = wideband_subband_sharded_process(wr, mesh)
    res = jax.device_get(fn(pack_iq(x)))

    got = {}
    valid = np.asarray(res.valid)
    for d, g in zip(*np.nonzero(valid)):
        chan = int(np.asarray(res.channel)[d, g])
        pay = bytes(np.asarray(res.payload)[d, g][
            : int(np.asarray(res.length)[d, g])])
        got[(int(d), chan)] = pay
    for band, chan, payload in placements:
        assert (band, chan) in got, (band, chan, got)
        assert got[(band, chan)][: len(payload)] == payload
    # dropped-candidate accounting surfaces pool pressure per band: a
    # strong packet's PFB sidelobes raise (weak) candidates on idle
    # neighbour channels which overflow the pool by design — they rank
    # below real packets by window energy (rx/dense._pool_lanes) and the
    # drop counter makes the overflow observable for pool sizing
    drops = np.asarray(res.n_dropped)
    assert drops.shape == (n_dev,) and (drops >= 0).all()


def test_subband_sharded_requires_pool():
    cfg = LoRaConfig(sf=7, cr=1, samp_rate=125e3, crc=True)
    wr = WidebandReceiver(cfg, 8, max_candidates=2, max_symbols=12,
                          sfd_search=8)
    with pytest.raises(ValueError):
        wideband_subband_sharded_process(wr, make_mesh(len(jax.devices())))
