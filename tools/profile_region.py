#!/usr/bin/env python
"""Does slicing a sub-window from a gathered lane region cost the full
region materialization? Compares sync-from-region vs sync-from-planes.

Usage: python -u tools/profile_region.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from lora_tpu import LoRaConfig
from lora_tpu.ops import demod
from lora_tpu.rx.dense import DenseReceiver
from lora_tpu.rx.frontend import candidate_starts, leak_suppression
from lora_tpu.tx.modulator import modulate_frame
from lora_tpu.ops.xfer import pack_iq


from benchutil import bench_fn  # noqa: E402 (shared barrier)


def main():
    n_channels = 64
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True)
    sps = cfg.samples_per_symbol
    block_len = 2048 * sps
    pkt = modulate_frame(cfg, bytes.fromhex("deadbeef"), pad_before=4096,
                         pad_after=4096, snr_db=40.0)
    reps = block_len // len(pkt)
    chans = []
    for c in range(n_channels):
        s = np.concatenate([np.zeros(997 * c, np.complex64),
                            np.tile(pkt, max(1, reps))])[:block_len]
        chans.append(np.pad(s, (0, block_len - len(s))))
    x = np.stack(chans).astype(np.complex64)

    rx = DenseReceiver(cfg, max_candidates=8, max_symbols=24,
                       sfd_search=12, demod_method="fft")
    xd = jax.device_put(pack_iq(x))
    nsamp = n_channels * block_len

    def lanes(xf):
        corr, e1, e2 = rx._metrics_planes(xf)
        starts, s_valid, _ = candidate_starts(
            corr, 0.90, rx.P, suppress=leak_suppression(e1))
        return starts + 1

    def sync_via_region(xf):
        starts = lanes(xf)

        def per_candidate(planes, sw):
            raw = rx._region_from(planes, sw * sps)
            region = jax.lax.complex(raw[0], raw[1])
            i0, _ = demod.upchirp_sync_parab(
                region[: 2 * sps], rx._fold_mat, sps, rx.decim, xp=jnp)
            return i0

        fn2 = jax.vmap(jax.vmap(per_candidate, in_axes=(None, 0)),
                       in_axes=(0, 0))
        return jnp.sum(fn2(xf, starts))

    def sync_via_planes(xf):
        starts = lanes(xf)

        def per_candidate(planes, sw):
            start = jnp.clip(sw * sps, 0, planes.shape[-1] - 2 * sps)
            raw = jax.lax.dynamic_slice_in_dim(planes, start, 2 * sps,
                                               axis=-1)
            w2 = jax.lax.complex(raw[0], raw[1])
            i0, _ = demod.upchirp_sync_parab(
                w2, rx._fold_mat, sps, rx.decim, xp=jnp)
            return i0

        fn2 = jax.vmap(jax.vmap(per_candidate, in_axes=(None, 0)),
                       in_axes=(0, 0))
        return jnp.sum(fn2(xf, starts))

    base = bench_fn(jax.jit(lambda xf: jnp.sum(lanes(xf))), xd)
    print(f"lanes only:        {base*1e3:7.2f} ms")
    t = bench_fn(jax.jit(sync_via_region), xd)
    print(f"sync via region:   {t*1e3:7.2f} ms  (+{(t-base)*1e3:.2f})")
    t = bench_fn(jax.jit(sync_via_planes), xd)
    print(f"sync via planes:   {t*1e3:7.2f} ms  (+{(t-base)*1e3:.2f})")


if __name__ == "__main__":
    main()
