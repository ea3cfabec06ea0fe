#!/usr/bin/env python
"""Per-stage profile of the dense receiver on the bench geometry.

Times each pipeline phase in isolation on the TPU (Phase A detection
metrics, candidate extraction, lane gather, full Phase B, end-to-end)
using the same device-fetch completion barrier as bench.py (through the
remote tunnel ``block_until_ready`` can return early; a host fetch of the
output is the reliable barrier). Best-of-rounds for the same
shared-chip-variance reason documented in docs/perf/NOTES.md.

Usage: python tools/profile_dense.py [n_channels]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from lora_tpu import LoRaConfig
from lora_tpu.rx.dense import DenseReceiver
from lora_tpu.rx.frontend import candidate_starts, leak_suppression
from lora_tpu.tx.modulator import modulate_frame
from lora_tpu.ops.xfer import pack_iq


from benchutil import bench_fn  # noqa: E402 (shared barrier)


def main():
    n_channels = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True)
    sps = cfg.samples_per_symbol
    block_symbols = 2048
    block_len = block_symbols * sps

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
    nbytes = nsamp * 8

    print(f"geometry: {n_channels} ch x {block_len} = {nsamp/1e6:.1f} Ms, "
          f"{nbytes/1e6:.0f} MB packed")

    # --- Phase A: detection metrics only ---
    metricsf = jax.jit(lambda xf: rx._metrics_planes(xf))
    t = bench_fn(metricsf, xd)
    print(f"A  metrics (pallas):      {t*1e3:7.2f} ms  {nbytes/t/1e9:6.0f} GB/s  "
          f"{nsamp/t/1e6:6.0f} Ms/s")

    # --- Phase A': metrics + candidate extraction ---
    def a2(xf):
        corr, e1, e2 = rx._metrics_planes(xf)
        starts, s_valid, n_drop = candidate_starts(
            corr, 0.90, rx.P, suppress=leak_suppression(e1))
        return starts, s_valid
    t = bench_fn(jax.jit(a2), xd)
    print(f"A+ metrics+candidates:    {t*1e3:7.2f} ms  {nsamp/t/1e6:6.0f} Ms/s")

    # --- lane gather only (region slice for P*C lanes) ---
    def gather(xf):
        starts = jnp.tile(jnp.arange(rx.P, dtype=jnp.int32)[None] * 31 + 2,
                          (n_channels, 1))
        def per_c(planes, sw):
            return rx._region_from(planes, sw * sps)
        fn = jax.vmap(jax.vmap(per_c, in_axes=(None, 0)), in_axes=(0, 0))
        return fn(xf, starts)
    t = bench_fn(jax.jit(gather), xd)
    print(f"B  lane gather only:      {t*1e3:7.2f} ms  {nsamp/t/1e6:6.0f} Ms/s")

    # --- full pipeline (tables ride as jit args; see rx/dense.py) ---
    tabs = rx._tables_device()
    t = bench_fn(lambda a: rx._process(a, tabs), xd)
    print(f"E2E full process:         {t*1e3:7.2f} ms  {nsamp/t/1e6:6.0f} Ms/s")

    # --- Phase B alone (metrics precomputed) ---
    m = jax.block_until_ready(metricsf(xd))
    t = bench_fn(jax.jit(lambda xf: rx.process_planes(xf, metrics=m)), xd)
    print(f"B  phase B (pre-metrics): {t*1e3:7.2f} ms  {nsamp/t/1e6:6.0f} Ms/s")


if __name__ == "__main__":
    main()
