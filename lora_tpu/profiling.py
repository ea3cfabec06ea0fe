"""Per-stage timing harness — the TPU equivalent of the reference's
``DBGR_CHRONO`` tracing subsystem.

The reference wraps its state-machine sections in ``std::chrono`` timers
(``lib/dbugr.hpp:99-165``, used from ``lib/decoder_impl.cc:494-504``),
dumps per-state millisecond samples to ``/tmp/lora-time_SF*_{grad_idx,fft}_<STATE>``
files and aggregates them with ``examples/lora-timings/avg_sd.py`` into
``examples/lora-timings/timing-results.txt``. This module reproduces that
study natively: each receiver stage (DETECT / SYNC / SFD / demod / integer
decode) is timed as the *batched jitted kernel* the TPU pipeline actually
runs, and normalised to the reference's per-window / per-symbol units so
the two tables are directly comparable (see ``BASELINE.md`` "Decoder
timing").

Methodology notes:

- Every stage is timed under ``jax.jit`` with a device-fetch completion
  barrier (through the remote-TPU tunnel ``block_until_ready`` is not a
  barrier; an output fetch is).
- Batched stages report ``batch_time / batch_size``: the per-unit cost at
  the throughput operating point, which is the number that matters on a
  SIMD machine (a single-window launch would measure dispatch latency,
  not the kernel).
- Best-of-rounds: shared-chip effective bandwidth varies between runs;
  the minimum reflects hardware capability (same policy as ``bench.py``).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .config import LoRaConfig
from .ops import demod
from .ops.chirp import build_ideal_chirps, instantaneous_frequency, tiled_upchirp_ifreq
from .ops.xfer import pack_iq


def _time_fn(fn: Callable, args, batch: int, iters: int = 5, rounds: int = 3) -> float:
    """Best-of-rounds per-unit seconds for a jitted ``fn(*args)``."""
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile + barrier
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best / batch


def stage_timings(
    sf: int = 7,
    method: str = "gradient",
    samp_rate: float = 1e6,
    batch_windows: int = 2048,
    batch_symbols: int = 512,
    batch_frames: int = 64,
    iters: int = 5,
    seed: int = 0,
) -> Dict[str, float]:
    """Measure per-stage times for one (sf, demod method) config.

    Returns ``{stage: seconds_per_unit}`` with the reference's stage
    names: ``detect`` (per 2-symbol window, `detect_preamble_autocorr`),
    ``sync`` (per event, `detect_upchirp`), ``sfd`` (per window,
    `detect_downchirp`), ``demod`` (per symbol, gradient or fft method),
    ``decode`` (per frame, full integer chain), plus ``samples_per_symbol``
    for rate conversions.
    """
    cfg = LoRaConfig(sf=sf, cr=4, samp_rate=samp_rate, crc=True,
                     reduced_rate=sf > 10)
    sps = cfg.samples_per_symbol
    rng = np.random.default_rng(seed)

    def noise(*shape):
        return (
            rng.normal(0, 1.0, shape + (2,)).astype(np.float32)
            @ np.array([1, 1j], np.complex64)
        ).astype(np.complex64)

    up, down = build_ideal_chirps(cfg)
    down_ifreq = instantaneous_frequency(down)
    up_ifreq = instantaneous_frequency(up)
    up_ifreq_v = tiled_upchirp_ifreq(cfg)
    # fold-DFT matmul only within the dense engine's own size budget
    # (rx/dense.py): at SF12 full rate the matrix would be 134M entries
    # (~1 GB) built by a host loop — this unconditional build is what
    # made SF12 timings runs hang before ever compiling anything
    fold = (
        demod.make_fold_dft(down, sps, cfg.number_of_bins)
        if method == "fft" and sps * cfg.number_of_bins <= 16 * 1024 * 1024
        else None
    )

    timings: Dict[str, float] = {"samples_per_symbol": float(sps)}

    # --- DETECT: dense autocorrelation metrics, per 2-symbol window ---
    from .rx.frontend import detection_metrics_planes

    stream = pack_iq(noise((batch_windows + 1) * sps))
    if jax.default_backend() == "tpu":
        from .ops.pallas_kernels import detection_metrics_pallas

        det = jax.jit(lambda x: detection_metrics_pallas(x, sps)[0])
    else:
        det = jax.jit(lambda x: detection_metrics_planes(x, sps)[0])
    timings["detect"] = _time_fn(det, (jax.device_put(stream),),
                                 batch_windows, iters)

    def _cplx(wf):
        # packed float32 planes [..., 2, n] -> complex inside the jitted fn
        # (complex64 cannot cross the host<->device boundary; ops/xfer)
        return jax.lax.complex(wf[..., 0, :], wf[..., 1, :])

    # --- SYNC: upchirp alignment search over a 2-symbol window ---
    nsync = max(16, batch_symbols // 8)
    wins2 = jax.device_put(pack_iq(noise(nsync, 2 * sps)))
    if method == "fft":
        sync = jax.jit(
            lambda wf: demod.upchirp_sync_coarse_fine(
                _cplx(wf), jnp.asarray(down), up_ifreq, sps,
                cfg.number_of_bins, cfg.decim_factor, xp=jnp,
                fold_mat=fold)[0]
        )
    else:
        # the engine default since round 4: CFO-invariant ifreq-wrap
        # coarse + refine (demod.upchirp_sync_grad). The reference-parity
        # O(sps^2) sliding search remains opt-in (fast_sync=False) and is
        # reported as ``sync_parity``.
        sync = jax.jit(
            lambda wf: demod.upchirp_sync_grad(
                _cplx(wf), up_ifreq, sps, cfg.number_of_bins,
                cfg.decim_factor, xp=jnp)[0]
        )
        sync_p = jax.jit(
            lambda wf: demod.upchirp_sync_xcorr(_cplx(wf), up_ifreq, sps,
                                                xp=jnp)[0]
        )
        timings["sync_parity"] = _time_fn(sync_p, (wins2,), nsync, iters)
    timings["sync"] = _time_fn(sync, (wins2,), nsync, iters)

    # --- SFD: downchirp Pearson correlation per window ---
    wins1 = jax.device_put(pack_iq(noise(batch_symbols, sps)))
    sfd = jax.jit(
        lambda wf: demod.downchirp_pearson(
            _cplx(wf), jnp.asarray(down_ifreq), sps, xp=jnp)
    )
    timings["sfd"] = _time_fn(sfd, (wins1,), batch_symbols, iters)

    # --- demod: per symbol (the reference's per-symbol table rows) ---
    if method == "fft":
        if fold is not None:
            dm = jax.jit(
                lambda wf: demod.fft_shift_idx_mm(_cplx(wf), fold, xp=jnp))
        else:  # batched-FFT fallback (the engine's own large-SF path)
            dm = jax.jit(
                lambda wf: demod.fft_shift_idx(
                    _cplx(wf), jnp.asarray(down), cfg.number_of_bins, sps,
                    xp=jnp))
    else:
        def dm_fn(wf):
            w = _cplx(wf)
            b = demod.max_frequency_gradient_idx(
                w, cfg.number_of_bins, cfg.decim_factor, xp=jnp)
            fine = demod.fine_sync_lag(
                w, b, up_ifreq_v, sps, cfg.decim_factor,
                max(cfg.decim_factor // 4, 2), xp=jnp)
            return b, fine
        dm = jax.jit(dm_fn)
    timings["demod"] = _time_fn(dm, (wins1,), batch_symbols, iters)

    # --- decode: full integer chain per frame (gray .. payload bytes) ---
    from .rx.dense import DenseReceiver

    drx = DenseReceiver(cfg, max_candidates=1, max_symbols=24,
                        sfd_search=12, demod_method="fft")
    words = jax.device_put(
        rng.integers(0, cfg.number_of_bins, (batch_frames, 8 + 24)).astype(np.int32))
    dec = jax.jit(
        jax.vmap(lambda w: drx._finish_decode(w, jnp.bool_(True))[0])
    )
    timings["decode"] = _time_fn(dec, (words,), batch_frames, iters)

    return timings


def timing_table(
    sfs=(7, 12),
    methods=("gradient", "fft"),
    samp_rate: float = 1e6,
    iters: int = 5,
) -> str:
    """Reproduce the shape of ``examples/lora-timings/timing-results.txt``:
    per-state timings for each (SF, demod method), in ms, plus the
    reference's CPU numbers for comparison where published."""
    REF_MS = {  # examples/lora-timings/timing-results.txt
        (7, "gradient", "demod"): 0.1189,
        (7, "fft", "demod"): 0.0706,
        (12, "gradient", "demod"): 3.7576,
        (12, "fft", "demod"): 2.2099,
        (7, "gradient", "detect"): 0.0112,
        (12, "gradient", "detect"): 16.70,
        (7, "gradient", "sync"): 0.137,
    }
    dev = jax.devices()[0].platform
    lines: List[str] = [
        f"# Per-stage receiver timings ({dev})",
        "",
        "Per-unit stage timings of the batched jitted kernels, directly",
        "comparable to the reference's DBGR_CHRONO study",
        "(`examples/lora-timings/timing-results.txt`; methodology in",
        "`lora_tpu/profiling.py`). `ref CPU` columns are the reference's",
        "published numbers.",
        "",
        "| SF | method | stage | unit | this (ms) | ref CPU (ms) | speedup |",
        "|---|---|---|---|---|---|---|",
    ]
    units = {
        "detect": "window",
        "sync": "event",
        "sync_parity": "event",
        "sfd": "window",
        "demod": "symbol",
        "decode": "frame",
    }
    for sf in sfs:
        for method in methods:
            t = stage_timings(sf=sf, method=method, samp_rate=samp_rate,
                              iters=iters)
            stages = ("detect", "sync", "sync_parity", "sfd", "demod",
                      "decode")
            for stage in stages:
                if stage not in t:
                    continue
                ms = t[stage] * 1e3
                ref = REF_MS.get((sf, method, stage))
                # the parity sliding search is what the reference's sync
                # row measures
                if stage == "sync_parity":
                    ref = REF_MS.get((sf, method, "sync"))
                ref_s = f"{ref:.4f}" if ref is not None else "—"
                spd = f"{ref / ms:,.0f}x" if ref else "—"
                lines.append(
                    f"| {sf} | {method} | {stage} | {units[stage]} "
                    f"| {ms:.5f} | {ref_s} | {spd} |"
                )
    return "\n".join(lines) + "\n"


def pfb_timings(n_channels: int = 1024, chan_rate: float = 250e3,
                block_symbols: int = 96, iters: int = 5,
                seed: int = 0) -> Dict[str, float]:
    """Channelizer stage timing: the packed-plane PFB (Pallas FIR +
    DFT matmul, :meth:`channelizer.PolyphaseChannelizer.planes`) in
    seconds per wideband Msample, f32 and bf16 plane variants. The
    reference channelizes ONE channel in ~1 s/Msample (real-time at
    1 Msps, reference README.md:91)."""
    from .channelizer import PolyphaseChannelizer

    cfg = LoRaConfig(sf=7, cr=4, samp_rate=chan_rate, crc=True)
    M = int(n_channels)
    L = M * block_symbols * cfg.samples_per_symbol
    pfb = PolyphaseChannelizer.for_lora(M * chan_rate, M, cfg.bandwidth)
    rng = np.random.default_rng(seed)
    x = (rng.normal(0, 1.0, (L, 2)).astype(np.float32)
         @ np.array([1, 1j], np.complex64)).astype(np.complex64)
    xd = jax.device_put(pack_iq(x))
    out: Dict[str, float] = {}
    for name, dt in (("pfb_f32", jnp.float32), ("pfb_bf16", jnp.bfloat16)):
        fn = jax.jit(
            lambda xf, dt=dt: pfb.planes(xf, out_dtype=dt)
            .astype(jnp.float32).sum()
        )
        per_call = _time_fn(fn, (xd,), 1, iters)
        out[name] = per_call / (L / 1e6)  # seconds per Msample
    return out


def main(argv: Optional[list] = None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="per-stage timing study")
    p.add_argument("--sfs", type=int, nargs="+", default=[7, 12])
    p.add_argument("--methods", nargs="+", default=["gradient", "fft"])
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--pfb", type=int, default=0, metavar="M",
                   help="also time the M-channel PFB planes stage")
    p.add_argument("--out", default=None, help="write markdown here")
    args = p.parse_args(argv)
    table = timing_table(tuple(args.sfs), tuple(args.methods), iters=args.iters)
    if args.pfb:
        t = pfb_timings(args.pfb, iters=args.iters)
        table += (
            f"\nPFB ({args.pfb} ch): "
            f"f32 {t['pfb_f32'] * 1e3:.4f} ms/Msample, "
            f"bf16 {t['pfb_bf16'] * 1e3:.4f} ms/Msample\n"
        )
    print(table)
    if args.out:
        with open(args.out, "w") as f:
            f.write(table)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
