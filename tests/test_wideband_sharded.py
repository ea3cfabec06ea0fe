"""Time-sharded wideband pipeline: per-device PFB + decode with ICI halo.

Runs on the virtual 8-device CPU mesh (conftest). Packets placed on
several channels — including one straddling a device-block seam — must
each decode exactly once across the mesh."""

import numpy as np
import pytest

from lora_tpu import LoRaConfig
from lora_tpu.channelizer import pfb_channel_freqs
from lora_tpu.parallel import make_mesh, wideband_time_sharded_process
from lora_tpu.tx.modulator import modulate_frame
from lora_tpu.wideband import WidebandReceiver

M = 8
CHAN_RATE = 250e3
N_DEV = 8


def test_wideband_time_sharded():
    import jax

    chan_cfg = LoRaConfig(sf=7, cr=4, samp_rate=CHAN_RATE, crc=True)
    wide_rate = M * CHAN_RATE
    wide_cfg = LoRaConfig(sf=7, cr=4, samp_rate=wide_rate, crc=True)
    sps_w = wide_cfg.samples_per_symbol

    wr = WidebandReceiver(chan_cfg, M, max_candidates=2, max_symbols=16,
                          sfd_search=12)
    # per-device block: must exceed the halo
    blk = ((wr.rx.pkt_samples + wr.pfb.K + 2) * M + 96 * sps_w)
    blk = -(-blk // (M * wr.rx.sps)) * (M * wr.rx.sps)
    L = N_DEV * blk

    x = np.zeros(L, np.complex128)
    freqs = pfb_channel_freqs(wide_rate, M)
    payloads = {}
    rng = np.random.default_rng(0)
    # one packet per device block on rotating channels; device 2's packet
    # deliberately straddles into device 3's block
    for d in range(N_DEV):
        chan = d % M
        pkt = modulate_frame(wide_cfg, bytes([d, 0xC3]), snr_db=None)
        pos = d * blk + 8 * sps_w
        if d == 2:
            pos = 3 * blk - len(pkt) // 3  # straddle the seam
        t = np.arange(len(pkt)) + pos
        x[pos : pos + len(pkt)] += pkt * np.exp(
            2j * np.pi * freqs[chan] / wide_rate * t
        )
        payloads.setdefault((chan, d), bytes([d, 0xC3]))
    x += rng.normal(0, 1e-4, (L, 2)) @ [1, 1j]

    from lora_tpu.ops.xfer import pack_iq

    mesh = make_mesh(N_DEV)
    fn = wideband_time_sharded_process(wr, mesh)
    res = jax.device_get(fn(pack_iq(x.astype(np.complex64))))

    valid = np.asarray(res.valid)  # [N_DEV, n_active, P]
    got = []
    for d, c, k in zip(*np.nonzero(valid)):
        pl = bytes(np.asarray(res.payload)[d, c, k][:2])
        got.append((int(c), pl))
    assert len(got) == N_DEV, got
    assert sorted(got) == sorted((d % M, bytes([d, 0xC3])) for d in range(N_DEV)), got
