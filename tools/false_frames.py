#!/usr/bin/env python
"""Noise-floor false-frame characterization (VERDICT r3 missing item).

The dense receiver scans every window of every channel — at 1024
channels the false-alarm surface is ~3 orders of magnitude larger than
the reference's sequential single-channel scan ever faced. This tool
measures the detection funnel and the emitted-frame rate on signal-free
input, with and without the opt-in rx header-checksum gate:

  blocks of (a) pure complex AWGN, (b) AWGN + strong CW carriers on a
  quarter of the channels, (c) AWGN + a full-band frequency sweep ->
  WidebandReceiver(pool) -> count candidates and valid frames.

Writes the measured rates to stdout (markdown); paste into
docs/perf/false_frames.md. Run: python tools/false_frames.py [blocks]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from lora_tpu import LoRaConfig
from lora_tpu.ops.xfer import pack_iq
from lora_tpu.rx.frontend import candidate_starts, leak_suppression
from lora_tpu.wideband import WidebandReceiver


def make_block(kind: str, L: int, M: int, rng) -> np.ndarray:
    x = (rng.standard_normal(L) + 1j * rng.standard_normal(L)).astype(
        np.complex64) * np.sqrt(0.5)
    n = np.arange(L)
    if kind == "cw":
        # strong carriers centered on 8 random channels (host exp over
        # the full block is ~0.3 s each; 8 carriers keeps generation
        # seconds-scale while exercising the strong-tone funnel)
        for c in rng.choice(M, 8, replace=False):
            f = (c / M) % 1.0
            ph = rng.uniform(0, 2 * np.pi)
            x += (3.0 * np.exp(2j * np.pi * f * n + 1j * ph)).astype(
                np.complex64)
    elif kind == "sweep":
        # full-band linear sweep, 10x the noise amplitude (chirp-like
        # interferer — the adversarial case for a chirp receiver)
        f = (n / L) - 0.5
        x += (10.0 * np.exp(2j * np.pi * np.cumsum(f))).astype(np.complex64)
    return x


def main():
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    M = 1024
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    L = M * 96 * cfg.samples_per_symbol
    rng = np.random.default_rng(0)

    # one funnel per checksum setting; noise blocks are generated and
    # transferred once (bf16-packed halves the 1024ch transfer) and
    # reused by both — the tunnel transfer is the wall-clock cost here
    funnels = {}
    for checksum in (False, True):
        wr = WidebandReceiver(cfg, M, pool=128, max_candidates=2,
                              max_symbols=24, sfd_search=12,
                              demod_method="fft",
                              plane_dtype=jnp.bfloat16,
                              header_checksum=checksum)
        pfb, rx = wr.pfb, wr.rx

        @jax.jit
        def funnel(xf, pfb=pfb, rx=rx, wr=wr):
            cp = pfb.planes(xf, out_dtype=jnp.bfloat16)
            corr, e1, e2 = rx._metrics_planes(cp)
            starts, s_valid, dropped = candidate_starts(
                corr, 0.90, 2, suppress=leak_suppression(e1))
            res = wr.process_fn(xf)
            return (s_valid.sum().astype(jnp.int32),
                    res.valid.sum().astype(jnp.int32))

        funnels[checksum] = funnel

    rows = []
    totals = {(k, c): [0, 0, 0] for k in ("noise", "cw", "sweep")
              for c in (False, True)}
    for b in range(n_blocks):
        for kind in ("noise", "cw", "sweep"):
            x = make_block(kind, L, M, rng)
            xd = jax.device_put(pack_iq(x, dtype=jnp.bfloat16))
            for checksum in (False, True):
                c, f = jax.device_get(funnels[checksum](xd))
                t = totals[(kind, checksum)]
                t[0] += L
                t[1] += int(c)
                t[2] += int(f)
            del xd
        print(f"# block {b + 1}/{n_blocks} done", flush=True)
    for (kind, checksum), (samples, cands, frames) in totals.items():
        ch_hours = samples / cfg.samp_rate / 3600.0  # channel-hours
        rows.append((kind, checksum, samples, cands, frames, ch_hours))

    print("\n| input | hdr checksum | Msamples | candidates | frames | "
          "frames / channel-hour |")
    print("|---|---|---|---|---|---|")
    for kind, ck, samples, cands, frames, ch_hours in rows:
        rate = frames / ch_hours if ch_hours else 0.0
        print(f"| {kind} | {'on' if ck else 'off'} | {samples/1e6:.0f} | "
              f"{cands} | {frames} | {rate:.2f} |")


if __name__ == "__main__":
    main()
