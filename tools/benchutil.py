"""Shared profiler timing helpers.

Through the remote-TPU tunnel ``jax.block_until_ready`` is not a
completion barrier and ``np.asarray(whole_leaf)`` pulls the entire
array through the tunnel (hundreds of MB / dozens of round trips for a
result tree — the docs/perf/NOTES.md fetch trap, which produced 992 ms
readings for 6 ms computations before being centralized here). The
correct barrier is a ONE-ELEMENT device-side index of one leaf, then a
host fetch of that scalar. TPU executes dispatches in order, so the
fetch waits for every queued iteration.
"""

import time

import jax
import numpy as np


def fetch_one(out):
    """Completion barrier: device-side index one element of the first
    leaf of ``out``, fetch it to host."""
    lf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(lf[tuple(0 for _ in lf.shape)] if lf.shape else lf)


def bench_fn(fn, x, iters=10, rounds=4, quiet=False):
    """Best-of-rounds per-call seconds for ``fn(x)`` (compiles first;
    best-of because the shared chip's ambient bandwidth swings 2-4x —
    see docs/perf/NOTES.md)."""
    t0 = time.perf_counter()
    fetch_one(fn(x))
    if not quiet:
        print(f"  [compile+warmup {time.perf_counter() - t0:.0f}s]",
              flush=True)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        fetch_one(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best
