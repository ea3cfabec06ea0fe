#!/usr/bin/env python
"""Phase A layout experiment: plane-major [2, L] vs window-major [K1, 2, sps].

docs/perf/NOTES.md headroom #1 projects the contiguous-DMA tier for a
window-major wire format whose Pallas blocks (T, 2, sps) cover full
trailing dims. This times the detection-metrics kernel against:

  a) current: packed [C, 2, L], per-plane-contiguous blocks (pp variant)
  b) window-major [C, K1, 2, sps], one (1, T, 2, sps) block per program
  c) the XLA planes path (fusion baseline)

Run on the bench chip:  python tools/profile_packing.py [n_channels]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lora_tpu.ops.pallas_kernels import detection_metrics_pallas
from lora_tpu.rx.frontend import detection_metrics_planes


def _det_kernel_wm(a_ref, b_ref, corr_ref, ener_ref):
    r = a_ref[0, :, 0, :]    # [T, sps]
    im = a_ref[0, :, 1, :]
    rn = jnp.concatenate([r[1:], b_ref[0, :, 0, :]], axis=0)
    imn = jnp.concatenate([im[1:], b_ref[0, :, 1, :]], axis=0)
    dot_re = jnp.sum(r * rn + im * imn, axis=1)
    dot_im = jnp.sum(im * rn - r * imn, axis=1)
    e = jnp.sum(r * r + im * im, axis=1)
    en = jnp.sum(rn * rn + imn * imn, axis=1)
    denom = jnp.sqrt(e * en)
    mag = jnp.sqrt(dot_re * dot_re + dot_im * dot_im)
    corr_ref[0, 0, 0, :] = jnp.where(denom > 0, mag / jnp.where(denom > 0, denom, 1.0), 0.0)
    ener_ref[0, 0, 0, :] = e


@functools.partial(jax.jit, static_argnums=(1,))
def det_wm(xw, T: int):
    C, K1, _, sps = xw.shape
    nb = K1 // T
    kernel = pl.pallas_call(
        _det_kernel_wm,
        grid=(C, nb),
        in_specs=[
            pl.BlockSpec((1, T, 2, sps), lambda c, i: (c, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, sps),
                         lambda c, i: (c, jnp.minimum((i + 1) * T, K1 - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, T), lambda c, i: (c, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, T), lambda c, i: (c, i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, nb, 1, T), jnp.float32),
            jax.ShapeDtypeStruct((C, nb, 1, T), jnp.float32),
        ],
    )
    corr, ener = kernel(xw, xw)
    return corr.reshape(C, K1), ener.reshape(C, K1)


def timeit(fn, *args, iters=10, rounds=5, budget=60.0):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    t_start = time.perf_counter()
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
        if time.perf_counter() - t_start > budget:
            break
    return best


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sps = 1024
    K1 = 2048
    L = K1 * sps
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (C, 2, L)).astype(np.float32)
    gb = x.nbytes / 1e9
    xd = jax.device_put(x)
    xw = jax.device_put(
        np.ascontiguousarray(x.reshape(C, 2, K1, sps).transpose(0, 2, 1, 3))
    )

    t_pp = timeit(lambda a: detection_metrics_pallas(a, sps), xd)
    print(f"pp   [2,L]        : {t_pp*1e3:8.2f} ms  {gb/t_pp:7.1f} GB/s")
    for T in (64, 128, 256):
        if (K1 % T) == 0:
            try:
                t_wm = timeit(lambda a, T=T: det_wm(a, T), xw)
                print(f"wm T={T:<4} [K1,2,sps]: {t_wm*1e3:8.2f} ms  {gb/t_wm:7.1f} GB/s")
            except Exception as e:
                print(f"wm T={T}: FAILED {type(e).__name__}: {e}")
    t_xla = timeit(lambda a: detection_metrics_planes(a, sps), xd)
    print(f"xla planes        : {t_xla*1e3:8.2f} ms  {gb/t_xla:7.1f} GB/s")

    # correctness cross-check
    c0, e0, _ = jax.device_get(detection_metrics_pallas(xd, sps))
    cw, ew = jax.device_get(det_wm(xw, 128))
    print("match:", np.allclose(c0, cw[:, : c0.shape[-1]], atol=1e-4),
          np.allclose(e0, ew[:, : e0.shape[-1]], rtol=1e-5))


if __name__ == "__main__":
    main()
