#!/usr/bin/env python
"""Interleaved same-session A/B: 1024-channel vs 4096-channel wideband.

VERDICT r4 weak #3: `wideband_4096ch` benched below `wideband_1024ch`
per sample (2,858 vs 3,281 Ms/s) across different bench *sessions* —
ambient-bound or structural? This tool settles it: both receivers run
in ONE process on one ambient window, timing rounds strictly
interleaved (A, B, A, B, ...), best-of-rounds per arm. It also times
the planes stage alone for both M (the two-stage Cooley-Tukey DFT is
the only structural difference; 1024 takes the single-matmul path,
4096 the two-stage split at max_dft_matmul=2048).

Usage: python tools/profile_wideband_ab.py [rounds]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build(M):
    import jax
    import jax.numpy as jnp
    from lora_tpu import LoRaConfig
    from lora_tpu.wideband import WidebandReceiver
    from lora_tpu.channelizer import pfb_channel_freqs
    from lora_tpu.tx.modulator import modulate_frame
    from lora_tpu.ops.xfer import pack_iq

    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    wide_rate = M * cfg.samp_rate
    wide_cfg = LoRaConfig(sf=7, cr=4, samp_rate=wide_rate, crc=True)
    L = M * 96 * cfg.samples_per_symbol
    rng = np.random.default_rng(0)
    x = (rng.normal(0, 1e-3, (L, 2)).astype(np.float32)
         @ np.array([1, 1j], np.complex64)).astype(np.complex64)
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
    xd = jax.device_put(pack_iq(x))
    del x
    wr = WidebandReceiver(cfg, M, pool=2 * len(active), max_candidates=2,
                          max_symbols=24, sfd_search=12, demod_method="fft",
                          plane_dtype=jnp.bfloat16)
    planes = jax.jit(
        lambda xf: jnp.sum(
            wr.pfb.planes(xf, out_dtype=jnp.bfloat16).astype(jnp.float32)
        )
    )
    return wr, planes, xd, L


def main():
    import jax

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    arms = {}
    for M in (1024, 4096):
        wr, planes, xd, L = build(M)
        # warm compile + correctness touch
        np.asarray(wr.process(xd).valid)
        np.asarray(planes(xd))
        arms[M] = dict(wr=wr, planes=planes, xd=xd, L=L,
                       full=float("inf"), pl=float("inf"))
        print(f"M={M}: compiled, L={L}", flush=True)

    iters = 5
    for r in range(rounds):
        for M, a in arms.items():
            t0 = time.perf_counter()
            for _ in range(iters):
                res = a["wr"].process(a["xd"])
            np.asarray(res.valid)
            dt = (time.perf_counter() - t0) / iters
            a["full"] = min(a["full"], dt)
            t0 = time.perf_counter()
            for _ in range(iters):
                s = a["planes"](a["xd"])
            np.asarray(s)
            dp = (time.perf_counter() - t0) / iters
            a["pl"] = min(a["pl"], dp)
            print(f"round {r} M={M}: full {dt * 1e3:7.2f} ms "
                  f"({a['L'] / dt / 1e6:5.0f} Ms/s)  planes "
                  f"{dp * 1e3:7.2f} ms", flush=True)
    print()
    for M, a in arms.items():
        print(f"best M={M}: full {a['L'] / a['full'] / 1e6:.0f} Ms/s "
              f"({a['full'] * 1e3:.2f} ms)  planes {a['pl'] * 1e3:.2f} ms "
              f"({a['L'] / a['pl'] / 1e6:.0f} Ms/s)")
    r41 = (arms[4096]["L"] / arms[4096]["full"]) / (
        arms[1024]["L"] / arms[1024]["full"])
    print(f"4096/1024 per-sample rate ratio: {r41:.3f} (>=0.9 = parity)")


if __name__ == "__main__":
    main()
