#!/usr/bin/env python
"""Stage timing of the CURRENT wideband pipeline (Pallas PFB planes ->
detection -> pooled Phase B) at bench geometry.

Cumulative ablation on the planes path (the round-4 pipeline; the older
tools/profile_wideband.py profiles the superseded complex-PFB path).
Remote-tunnel caveats apply: best-of-rounds, one scalar-reduced fetch as
the completion barrier (see bench.py).

Usage: python tools/profile_wideband_planes.py [n_channels] [--f32]
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
from lora_tpu.ops.xfer import pack_iq
from tools.profile_wideband import build_input


def timed(fn, xd, rounds=4, iters=5, budget_s=75.0):
    out = fn(xd)
    jax.tree_util.tree_map(lambda a: np.asarray(a), out)
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
    M = int(pos[0]) if pos else 4096
    dt_planes = jnp.float32 if "--f32" in sys.argv else jnp.bfloat16
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    L = M * 96 * cfg.samples_per_symbol
    x, active = build_input(M, cfg, L)
    xd = jax.device_put(pack_iq(x))
    del x
    wr = WidebandReceiver(cfg, M, pool=2 * len(active), max_candidates=2,
                          max_symbols=24, sfd_search=12, demod_method="fft",
                          plane_dtype=dt_planes)
    pfb, rx = wr.pfb, wr.rx
    GB = L * 8 / 1e9

    stages = {}

    @jax.jit
    def s_planes(xf):
        cp = pfb.planes(xf, out_dtype=dt_planes)
        return jnp.sum(cp.astype(jnp.float32) ** 2)

    stages["pfb.planes"] = s_planes

    @jax.jit
    def s_metrics(xf):
        cp = pfb.planes(xf, out_dtype=dt_planes)
        corr, e1, e2 = rx._metrics_planes(cp)
        return jnp.sum(corr) + jnp.sum(e1)

    stages["+detection metrics"] = s_metrics

    @jax.jit
    def s_full(xf):
        return wr.process_fn(xf)

    stages["+pooled Phase B (full)"] = s_full

    print(f"M={M} L={L} ({GB:.2f} GB/s per ms-call) planes={dt_planes.__name__}")
    prev = 0.0
    for name, fn in stages.items():
        t = timed(fn, xd)
        print(f"{name:28s} {t*1e3:8.2f} ms  (+{(t-prev)*1e3:7.2f})  "
              f"{L/t/1e9:6.2f} Gs/s")
        prev = t


if __name__ == "__main__":
    main()
