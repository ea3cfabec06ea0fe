#!/usr/bin/env python
"""Interleaved A/B: gateway with shared multi-lag detection vs per-SF passes.

The ambient HBM bandwidth of the shared chip swings across minutes
(docs/perf/NOTES.md), so only same-session interleaved best-of-rounds
comparisons are meaningful. Builds the same 256-channel x 6-SF gateway
twice — shared_detection on/off — on one packet-bearing capture, checks
both decode identically, and alternates timing rounds.

Usage: python tools/profile_gateway_multilag.py [n_channels] [rounds]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from lora_tpu import LoRaConfig
    from lora_tpu.wideband import MultiSFWidebandReceiver
    from lora_tpu.channelizer import pfb_channel_freqs
    from lora_tpu.tx.modulator import modulate_frame
    from lora_tpu.ops.xfer import pack_iq

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sfs = (7, 8, 9, 10, 11, 12)
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    wide_rate = M * cfg.samp_rate
    kw = dict(sfs=sfs, pool=48, max_candidates=2, max_symbols=24,
              sfd_search=12, demod_method="fft", plane_dtype=jnp.bfloat16)
    gw_a = MultiSFWidebandReceiver(cfg, M, shared_detection=True, **kw)
    gw_b = MultiSFWidebandReceiver(cfg, M, shared_detection=False, **kw)

    max_sps = max(rx.sps for rx in gw_a.rxs.values())
    L = M * (gw_a.max_pkt_samples + 6 * max_sps)
    rng = np.random.default_rng(0)
    x = (rng.normal(0, 1e-3, (L, 2)).astype(np.float32)
         @ np.array([1, 1j], np.complex64)).astype(np.complex64)
    freqs = pfb_channel_freqs(wide_rate, M)
    active = list(range(0, M, max(1, M // 24)))
    expect = set()
    for i, c in enumerate(active):
        sf = sfs[i % len(sfs)]
        wcfg = LoRaConfig(sf=sf, cr=4, samp_rate=wide_rate, crc=True)
        pkt = modulate_frame(wcfg, b"\xde\xad\xbe\xef", snr_db=None)
        pos = 2 * wcfg.samples_per_symbol
        if pos + len(pkt) > L:
            continue
        t = np.arange(len(pkt)) + pos
        x[pos:pos + len(pkt)] += (
            pkt * np.exp(2j * np.pi * freqs[c] / wide_rate * t)
        ).astype(np.complex64)
        expect.add((sf, c))
    xd = jax.device_put(pack_iq(x))
    del x

    def decoded(gw):
        res = gw.process(xd)
        got = set()
        for sf in sfs:
            r = res[sf]
            v = np.asarray(jax.device_get(r.valid))
            pay = np.asarray(jax.device_get(r.payload))
            ch = np.asarray(jax.device_get(r.channel))
            for g in np.nonzero(v)[0]:
                if bytes(pay[g][:4]) == b"\xde\xad\xbe\xef":
                    got.add((sf, int(ch[g])))
        return got

    got_a = decoded(gw_a)
    got_b = decoded(gw_b)
    print(f"decode A(shared)={len(got_a & expect)}/{len(expect)} "
          f"B(per-SF)={len(got_b & expect)}/{len(expect)}", flush=True)
    if got_a != got_b:
        print(f"MISMATCH: A-B={sorted(got_a - got_b)} "
              f"B-A={sorted(got_b - got_a)}", flush=True)

    iters = 5
    best = {"A": float("inf"), "B": float("inf")}
    for r in range(rounds):
        for name, gw in (("A", gw_a), ("B", gw_b)):
            t0 = time.perf_counter()
            for _ in range(iters):
                res = gw.process(xd)
            np.asarray(res[sfs[0]].valid)
            dt = (time.perf_counter() - t0) / iters
            best[name] = min(best[name], dt)
            print(f"round {r} {name}: {dt * 1e3:.2f} ms "
                  f"({L / dt / 1e6:.0f} Ms/s)", flush=True)
    print(f"best A(shared): {L / best['A'] / 1e6:.0f} Ms/s   "
          f"best B(per-SF): {L / best['B'] / 1e6:.0f} Ms/s   "
          f"speedup {best['B'] / best['A']:.2f}x")


if __name__ == "__main__":
    main()
