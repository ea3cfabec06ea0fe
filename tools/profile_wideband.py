#!/usr/bin/env python
"""Per-stage wall-clock profile of the wideband (PFB + dense decode) path.

Cumulative ablation in the style of tools/profile_phaseb.py: each stage
jits a prefix of the WidebandReceiver pipeline and times it on the bench
geometry, so stage deltas attribute the end-to-end cost (VERDICT r3
missing #2: "the channelizer stage has never even been per-stage
profiled"). Remote-tunnel caveats apply (best-of-rounds, fetch as the
completion barrier — see bench.py).

Usage: python tools/profile_wideband.py [n_channels] [--bf16]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from lora_tpu import LoRaConfig
from lora_tpu.wideband import WidebandReceiver
from lora_tpu.channelizer import pfb_channel_freqs
from lora_tpu.tx.modulator import modulate_frame
from lora_tpu.ops.xfer import pack_iq, unpack_iq


def build_input(M, cfg, L):
    rng = np.random.default_rng(0)
    x = (rng.normal(0, 1e-3, (L, 2)).astype(np.float32)
         @ np.array([1, 1j], np.complex64)).astype(np.complex64)
    wide_rate = M * cfg.samp_rate
    wide_cfg = LoRaConfig(sf=cfg.sf, cr=cfg.cr, samp_rate=wide_rate, crc=True)
    freqs = pfb_channel_freqs(wide_rate, M)
    pkt = modulate_frame(wide_cfg, b"\xde\xad\xbe\xef", snr_db=None)
    active = list(range(0, M, max(1, M // 64)))
    tpk = np.arange(len(pkt))
    for c in active:
        pos = min((8 + (c % 7)) * cfg.samples_per_symbol * M // 8,
                  L - len(pkt) - 1)
        x[pos:pos + len(pkt)] += (
            pkt * np.exp(2j * np.pi * freqs[c] / wide_rate * (tpk + pos))
        ).astype(np.complex64)
    return x, active


def timed(fn, xd, rounds=5, iters=5, budget_s=90.0):
    out = fn(xd)
    jax.tree_util.tree_map(lambda a: np.asarray(a), out)  # warm + compile
    best = float("inf")
    t_start = time.perf_counter()
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(xd)
        jax.tree_util.tree_map(
            lambda a: np.asarray(a) if isinstance(a, jax.Array) else a, out)
        best = min(best, (time.perf_counter() - t0) / iters)
        if time.perf_counter() - t_start > budget_s:
            break
    return best


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    M = int(pos[0]) if pos else 1024
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    L = M * 96 * cfg.samples_per_symbol
    x, active = build_input(M, cfg, L)
    xd = jax.device_put(pack_iq(x))
    wr = WidebandReceiver(cfg, M, pool=2 * len(active), max_candidates=2,
                          max_symbols=24, sfd_search=12, demod_method="fft")
    pfb, rx = wr.pfb, wr.rx
    GB = L * 8 / 1e9

    stages = {}

    @jax.jit
    def s_unpack(xf):
        return jnp.sum(jnp.abs(unpack_iq(xf)) ** 2)

    stages["unpack+reduce"] = s_unpack

    @jax.jit
    def s_fir(xf):
        xc = unpack_iq(xf)
        Mv, K = pfb.M, pfb.K
        n_vec = xc.shape[-1] // Mv
        xm = xc[: n_vec * Mv].reshape(n_vec, Mv)
        n_out = n_vec - K + 1
        filtered = jnp.zeros((n_out, Mv), xm.dtype)
        for j in range(K):
            filtered = filtered + pfb.h_poly[j][None, :] * jax.lax.dynamic_slice_in_dim(
                xm, j, n_out, axis=0)
        return jnp.sum(jnp.abs(filtered) ** 2)

    stages["+fir"] = s_fir

    @jax.jit
    def s_pfb(xf):
        chans = pfb(unpack_iq(xf))
        return jnp.sum(jnp.abs(chans) ** 2)

    stages["+fft+transpose (pfb)"] = s_pfb

    @jax.jit
    def s_planes(xf):
        chans = pfb(unpack_iq(xf))
        cp = jnp.stack([jnp.real(chans), jnp.imag(chans)], axis=-2)
        return jnp.sum(cp * cp)

    stages["+planes"] = s_planes

    @jax.jit
    def s_metrics(xf):
        chans = pfb(unpack_iq(xf))
        cp = jnp.stack([jnp.real(chans), jnp.imag(chans)], axis=-2)
        corr, e1, e2 = rx._metrics_planes(cp)
        return jnp.sum(corr) + jnp.sum(e1)

    stages["+detection metrics"] = s_metrics

    # ---- pooled Phase B ablation: cut the static fft lane pipeline ----
    from lora_tpu.ops import demod as dm
    from lora_tpu.rx.frontend import candidate_starts, leak_suppression

    def phaseb_upto(stage: str):
        sps = rx.sps
        pool = wr.pool if wr.pool is not None else 64

        @jax.jit
        def fn(xf):
            chans = pfb(unpack_iq(xf))
            cp = jnp.stack([jnp.real(chans), jnp.imag(chans)], axis=-2)
            metrics = rx._metrics_planes(cp)
            corr, e1, e2 = metrics
            chan, winidx, lane_valid, snr, n_dropped = rx._pool_lanes(
                e1, corr, 4, pool, cp.shape[-1])
            if stage == "pool":
                return chan.sum() + winidx.sum()

            def per_lane(ch, w, cutoff=stage):
                stream = jax.lax.dynamic_slice_in_dim(cp, ch, 1, axis=0)[0]
                win = rx._candidate_win(stream, w * sps)
                w2 = win(0, 2 * sps)
                i0, _ = dm.upchirp_sync_parab(
                    w2, rx._fold_mat, sps, rx.decim, xp=jnp)
                i0 = i0.astype(jnp.int32)
                if cutoff == "sync":
                    return i0.astype(jnp.float32)
                sfd_flat = win(i0, rx.F * sps)
                sfd_wins = sfd_flat.reshape(rx.F, sps)
                frac_cfo = dm.preamble_cfo(
                    sfd_flat[: 2 * sps], sps, cfg.samp_rate, xp=jnp)
                cs = jax.vmap(lambda w_: dm.downchirp_pearson(
                    w_, rx._down_ifreq, sps, xp=jnp))(sfd_wins)
                hit = cs > 0.96
                found = hit.any()
                first = jnp.argmax(hit).astype(jnp.int32)
                if cutoff == "sfd_pearson":
                    return frac_cfo + first.astype(jnp.float32)
                sbins = dm.fft_shift_idx_mm(sfd_wins, rx._fold_mat, xp=jnp)
                rel = (sbins - sbins[0]) % rx.n_bins
                dist = jnp.minimum(rel, rx.n_bins - rel)
                likeness = dm.upchirp_likeness(
                    sfd_wins, sbins - 1, rx._up_ifreq_v, sps, rx.decim, xp=jnp)
                sync_like = (dist > 3) & (likeness > dm.SYNC_LIKENESS_MIN)
                recognised = sync_like & (jnp.cumsum(sync_like) <= 2)
                before = jnp.arange(rx.F) < first
                fails = jnp.sum(before & ~(cs < -0.97) & ~hit & ~recognised)
                if cutoff == "sfd_rec":
                    return fails.astype(jnp.float32)
                coarse = dm.chirp_coarse_cfo(
                    sfd_wins[0], sfd_wins[first], rx._up, rx._down,
                    rx.n_bins, sps, cfg.samp_rate, xp=jnp,
                    fold_down=rx._fold_mat, fold_up=rx._fold_up)
                cfo = dm.combine_cfo(coarse, frac_cfo, sps, cfg.samp_rate, xp=jnp)
                if cutoff == "cfo":
                    return cfo
                p_data = i0 + first * sps + 2 * sps + rx.cfg.delay_after_sync
                nsym = 8 + rx.S
                wins = win(p_data, nsym * sps).reshape(nsym, sps)
                b_full = dm.fft_shift_idx_mm(wins, rx._fold_mat, xp=jnp)
                if cutoff == "demod":
                    return b_full.sum().astype(jnp.float32)
                return b_full.sum().astype(jnp.float32)

            out = jax.vmap(per_lane)(chan, winidx)
            return out.sum()

        return fn

    for st in ("pool", "sync", "sfd_pearson", "sfd_rec", "cfo", "demod"):
        stages[f"phaseB:{st}"] = phaseb_upto(st)

    # scalar-reduced e2e: fetching the full result struct costs one
    # tunnel round-trip PER ARRAY (~4.5 ms each on a degraded day) and
    # swamps the compute signal — reduce on-device, fetch one scalar
    @jax.jit
    def s_e2e(xf):
        r = wr.process_fn(xf)
        return (r.valid.sum().astype(jnp.float32)
                + r.payload.sum().astype(jnp.float32))

    stages["e2e (pooled phase B)"] = s_e2e

    print(f"M={M} L={L/1e6:.1f} Ms ({GB:.2f} GB c64) "
          f"K={pfb.K} ntaps~{pfb.K*pfb.M}")
    prev = 0.0
    for name, fn in stages.items():
        try:
            dt = timed(fn, xd)
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}")
            continue
        rate = L / dt / 1e6
        print(f"{name:28s} {dt*1e3:8.2f} ms  delta {((dt-prev)*1e3):7.2f} ms"
              f"  ({rate:8.0f} Ms/s)")
        prev = dt


if __name__ == "__main__":
    main()
