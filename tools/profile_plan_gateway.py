#!/usr/bin/env python
"""Cumulative ablation of the PlanGateway pipeline on the real chip.

Stages (each jitted from the same packed wideband input, per
docs/perf/NOTES.md: profile by cumulative ablation, never by feeding an
internal array as a jit input):
  mix       factored mixer multiply only ([C, L] mixed planes, summed)
  chan      + decimating FIR (channelize_list_planes_factored)
  fchan     the fused Pallas mix+FIR+decimate kernel (one HBM pass)
  det1      + one SF's detection metrics
  det6      + all six SFs' shared multi-lag metrics
  full      the whole gateway (fused kernel on TPU; one result leaf is
            fetched — fetching the whole 6-SF result tree costs ~60
            small device->host reads over the remote tunnel and
            swamps the compute being measured)
Usage: python tools/profile_plan_gateway.py [plan] [rounds]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from lora_tpu.plans import PlanGateway
    from lora_tpu.channelizer import (channelize_list_planes_factored,
                                      make_mixer_factors)
    from lora_tpu.ops.xfer import pack_iq
    from lora_tpu.rx.frontend import multi_sf_detection_metrics

    plan = sys.argv[1] if len(sys.argv) > 1 else "EU868"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    # per-plan capture geometry (same map as bench.main_plan_gateway)
    center, rate = {"US915": (903.0e6, 8e6),
                    "AU915": (919.0e6, 8e6)}.get(plan.upper(),
                                                 (868.0e6, 2e6))
    gw = PlanGateway(plan, center, rate, sfs=(7, 8, 9, 10, 11, 12),
                     pool=24, max_candidates=2, max_symbols=24,
                     sfd_search=12, demod_method="fft")
    max_sps = max(rx.sps for rx in gw.rxs.values())
    L = gw.decim * (gw.max_pkt_samples + 6 * max_sps)
    rng = np.random.default_rng(0)
    x = (rng.normal(0, 1.0, (L, 2)).astype(np.float32)
         @ np.array([1, 1j], np.complex64)).astype(np.complex64)
    xd = jax.device_put(pack_iq(x))
    del x
    outer, inner = make_mixer_factors(gw.offsets, gw.samp_rate, L)
    taps = gw.taps
    decim = gw.decim
    print(f"plan={plan} C={len(gw.channels)} L={L} taps={len(taps)} "
          f"decim={decim}", flush=True)

    o = jnp.asarray(outer)
    inr = jnp.asarray(inner)

    @jax.jit
    def mix_only(xf):
        C, _, nI = o.shape
        T = inr.shape[-1]
        pad = nI * T - xf.shape[-1]
        if pad:
            xf = jnp.pad(xf, ((0, 0), (0, pad)))
        xr = xf[0].reshape(nI, T)
        xi = xf[1].reshape(nI, T)
        mr = (o[:, 0, :, None] * inr[:, 0, None, :]
              - o[:, 1, :, None] * inr[:, 1, None, :])
        mi = (o[:, 0, :, None] * inr[:, 1, None, :]
              + o[:, 1, :, None] * inr[:, 0, None, :])
        mixed_r = mr * xr[None] - mi * xi[None]
        mixed_i = mr * xi[None] + mi * xr[None]
        return jnp.sum(mixed_r) + jnp.sum(mixed_i)

    @jax.jit
    def chan_only(xf):
        cp = channelize_list_planes_factored(xf, taps, o, inr, decim)
        return jnp.sum(cp)

    from lora_tpu.channelizer import channelize_list_planes_fused

    @jax.jit
    def fchan_only(xf):
        cp = channelize_list_planes_fused(xf, taps, gw.offsets,
                                          gw.samp_rate, decim)
        return jnp.sum(cp)

    sps_by_sf = {sf: rx.sps for sf, rx in gw.rxs.items()}

    @jax.jit
    def det1(xf):
        cp = channelize_list_planes_factored(xf, taps, o, inr, decim)
        m = multi_sf_detection_metrics(cp, {7: sps_by_sf[7]})
        return jnp.sum(m[7][0])

    @jax.jit
    def det6(xf):
        cp = channelize_list_planes_factored(xf, taps, o, inr, decim)
        m = multi_sf_detection_metrics(cp, sps_by_sf)
        return sum(jnp.sum(v[0]) for v in m.values())

    def full(xf):
        # one leaf fetched as the completion barrier (TPU executes in
        # order); tree_map(asarray) here would measure ~60 remote
        # fetches, not the gateway
        return gw.process(xf)[min(sps_by_sf)].valid

    stages = [("mix", mix_only), ("chan", chan_only),
              ("fchan", fchan_only), ("det1", det1), ("det6", det6),
              ("full", full)]
    for name, fn in stages:
        np.asarray(fn(xd))
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(3):
                r = fn(xd)
            np.asarray(r)
            best = min(best, (time.perf_counter() - t0) / 3)
        print(f"{name:5s}: {best * 1e3:8.2f} ms  ({L / best / 1e6:7.0f} Ms/s)",
              flush=True)


if __name__ == "__main__":
    main()
