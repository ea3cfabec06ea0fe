#!/usr/bin/env python
"""Ablation profile of dense Phase B sub-stages (fft engine) on TPU.

Each stage builds a jitted function running a cumulative prefix of the
per-candidate decode on the bench geometry, returning only scalars (so
the host-fetch completion barrier costs nothing). Best-of-rounds.

Usage: python -u tools/profile_phaseb.py [n_channels]
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
    n_channels = int(sys.argv[1]) if len(sys.argv) > 1 else 64
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

    def prefix(stage):
        def fn(xf):
            starts = lanes(xf)

            def per_candidate(planes, sw):
                win = rx._candidate_win(planes, sw * sps)
                if stage == "gather":
                    return jnp.sum(jnp.real(win(0, rx.pkt_samples)))
                i0, _ = demod.upchirp_sync_parab(
                    win(0, 2 * sps), rx._fold_mat, sps, rx.decim, xp=jnp)
                i0 = i0.astype(jnp.int32)
                if stage == "sync":
                    return i0
                sfd_flat = win(i0, rx.F * sps)
                sfd_wins = sfd_flat.reshape(rx.F, sps)
                cs = jax.vmap(lambda w: demod.downchirp_pearson(
                    w, rx._down_ifreq, sps, xp=jnp))(sfd_wins)
                first = jnp.argmax(cs > 0.96).astype(jnp.int32)
                p_found = i0 + first * sps
                if stage == "sfd":
                    return p_found
                frac = demod.preamble_cfo(
                    sfd_flat[: 2 * sps], sps, cfg.samp_rate, xp=jnp)
                coarse = demod.chirp_coarse_cfo(
                    sfd_wins[0], sfd_wins[first], rx._up, rx._down,
                    rx.n_bins, sps, cfg.samp_rate, xp=jnp,
                    fold_down=rx._fold_mat, fold_up=rx._fold_up)
                cfo = demod.combine_cfo(coarse, frac, sps, cfg.samp_rate,
                                        xp=jnp)
                if stage == "cfo":
                    return cfo
                p_data = p_found + 2 * sps + cfg.delay_after_sync
                nsym = 8 + rx.S
                wins = win(p_data, nsym * sps).reshape(nsym, sps)
                b_full = demod.fft_shift_idx_mm(wins, rx._fold_mat, xp=jnp)
                if stage == "demod":
                    return jnp.sum(b_full) + cfo.astype(jnp.int32)
                raise ValueError(stage)

            fn2 = jax.vmap(per_candidate, in_axes=(None, 0))
            fn2 = jax.vmap(fn2, in_axes=(0, 0))
            return jnp.sum(fn2(xf, starts))
        return jax.jit(fn)

    base = bench_fn(jax.jit(lambda xf: jnp.sum(lanes(xf))), xd)
    print(f"phase A (lanes only):   {base*1e3:7.2f} ms  {nsamp/base/1e6:6.0f} Ms/s")
    for stage in ("gather", "sync", "sfd", "cfo", "demod"):
        t = bench_fn(prefix(stage), xd)
        print(f"A + B..{stage:6s}:        {t*1e3:7.2f} ms  "
              f"{nsamp/t/1e6:6.0f} Ms/s  (+{(t-base)*1e3:.2f} ms)",
              flush=True)
        base_prev = t
    tabs = rx._tables_device()
    t = bench_fn(lambda a: rx._process(a, tabs), xd)
    print(f"E2E full process:       {t*1e3:7.2f} ms  {nsamp/t/1e6:6.0f} Ms/s")


if __name__ == "__main__":
    main()
