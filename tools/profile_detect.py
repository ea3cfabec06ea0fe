#!/usr/bin/env python
"""Interleaved A/B timing of the Pallas detection-kernel variants.

The shared CI chip's effective HBM bandwidth swings 2-4x between runs
(docs/perf/NOTES.md), so variants are compared with interleaved
best-of-rounds: each round times both kernels back to back and the
minimum per variant over all rounds is reported.

Usage: python tools/profile_detect.py [channels] [symbols]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from lora_tpu.ops.pallas_kernels import _det_call, _det_call_pp


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    K1 = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    sps = 1024
    T = 256
    rng = np.random.default_rng(0)
    x = rng.normal(size=(C, 2, K1, sps)).astype(np.float32)
    xd = jax.device_put(x)
    nbytes = x.nbytes
    print(f"input {nbytes/1e6:.0f} MB, grid ({C},{K1//T}) T={T}")

    variants = {"tile": _det_call, "pp": _det_call_pp}
    # warmup/compile + cross-check
    outs = {}
    for name, fn in variants.items():
        t0 = time.perf_counter()
        c, e = fn(xd, T, False)
        outs[name] = (np.asarray(c), np.asarray(e))
        print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s")
    np.testing.assert_allclose(outs["pp"][0], outs["tile"][0], atol=2e-5)
    np.testing.assert_allclose(outs["pp"][1], outs["tile"][1], rtol=1e-5)
    print("outputs match")

    iters = 20
    best = {k: float("inf") for k in variants}
    for _ in range(8):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            for _ in range(iters):
                c, e = fn(xd, T, False)
            # completion barrier on BOTH outputs: a fetch is the reliable
            # barrier through the remote tunnel (see bench.py note), and
            # syncing only one output would rely on same-kernel
            # completion semantics
            np.asarray(c[0, :4]), np.asarray(e[0, :4])
            dt = (time.perf_counter() - t0) / iters
            best[name] = min(best[name], dt)
    for name, dt in best.items():
        print(f"{name}: best {dt*1e3:.2f} ms  {nbytes/dt/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
