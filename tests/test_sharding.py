"""Sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from lora_tpu import LoRaConfig
from lora_tpu.parallel import (
    channel_sharded_process,
    make_mesh,
    time_sharded_process,
)
from lora_tpu.rx.dense import DenseReceiver
from lora_tpu.ops.xfer import pack_iq
from lora_tpu.tx.modulator import modulate_frame

DEADBEEF = bytes.fromhex("deadbeef")


@pytest.fixture(scope="module")
def small_setup():
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    rx = DenseReceiver(cfg, max_candidates=2, max_symbols=16, sfd_search=12)
    pkt = modulate_frame(cfg, DEADBEEF, pad_before=600, pad_after=600, snr_db=40)
    return cfg, rx, pkt


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_channel_sharded(small_setup):
    cfg, rx, pkt = small_setup
    mesh = make_mesh(8)
    stream = np.concatenate([pkt, pkt]).astype(np.complex64)
    # trace-time core contract: pkt_samples of tailroom (host entries pad)
    stream = np.pad(stream, (0, rx.pkt_samples))
    x = np.stack([np.roll(stream, 31 * c) for c in range(8)]).astype(np.complex64)
    fn = channel_sharded_process(rx, mesh)
    res = jax.device_get(fn(pack_iq(x)))
    assert int(res.valid.sum()) == 16
    ok = res.payload[res.valid]
    assert all(bytes(p[:4]) == DEADBEEF for p in ok)


def test_time_sharded_halo(small_setup):
    cfg, rx, pkt = small_setup
    mesh = make_mesh(8)
    # long stream of 12 packets split over 8 devices; some packets
    # straddle block boundaries and must be claimed via the halo
    stream = np.concatenate([pkt] * 12).astype(np.complex64)
    sps = cfg.samples_per_symbol
    block = (len(stream) // 8 // sps) * sps
    stream = stream[: block * 8]
    fn = time_sharded_process(rx, mesh)
    res = jax.device_get(fn(pack_iq(stream)))
    n_expected = sum(
        1 for k in range(12) if k * len(pkt) < block * 8 - len(pkt)
    )
    assert int(res.valid.sum()) >= n_expected - 1
    v = res.valid.reshape(8, -1)
    pay = res.payload.reshape(8, -1, res.payload.shape[-1])
    for b in range(8):
        for k in range(v.shape[1]):
            if v[b, k]:
                assert bytes(pay[b, k][:4]) == DEADBEEF


def test_no_double_claim(small_setup):
    """Each packet is decoded exactly once across time shards."""
    cfg, rx, pkt = small_setup
    mesh = make_mesh(8)
    stream = np.concatenate([pkt] * 16).astype(np.complex64)
    sps = cfg.samples_per_symbol
    block = (len(stream) // 8 // sps) * sps
    stream = stream[: block * 8]
    fn = time_sharded_process(rx, mesh)
    res = jax.device_get(fn(pack_iq(stream)))
    # every complete packet decoded exactly once
    assert int(res.valid.sum()) == 16
