"""Dense two-phase receiver — the TPU throughput path.

Replaces the reference's sequential window-by-window state machine with the
SIMD-natural decomposition (SURVEY.md §7 architecture sketch):

Phase A (dense, batched): preamble metrics for ALL symbol-stride windows of
a block at once (:mod:`lora_tpu.rx.frontend`), then fixed-capacity
rising-edge candidate extraction. O(1) work/sample, no transcendentals,
HBM-bandwidth bound.

Phase B (per candidate, vmapped): chirp-align (SYNC), SFD search, then a
``lax.scan`` over symbol windows carrying the fine-sync drift state — the
inherently sequential part of LoRa demod stays inside a per-packet scan
while packets and channels are the parallel axes.

Demod methods:

- ``gradient``: reference-parity ifreq-gradient demod incl. fine-sync
  drift correction (lib/decoder_impl.cc:466-491,300-338).
- ``fft``: dechirp-multiply + FFT argmax (lib/decoder_impl.cc:430-464) —
  no transcendentals, MXU/FFT-friendly; bin convention shifted by +1 vs the
  gradient method (compensated here), no drift correction.
- ``auto`` (default): ``gradient`` at decimation >= 4 (the reference's
  operating regime — its canonical config is decim 8), ``fft`` below.
  The gradient+fine-sync loop needs sample-alignment margin to converge:
  its empirical basin of attraction is ~±3 samples at decim 8 but only
  {-1, 0} at decim 2, where a late-by-1-sample window is *mathematically
  indistinguishable* from a +1 bin error (1 sample = half a bin) — noise
  tips the sync argmax by ±1 and the drift feedback then locks onto the
  wrong interpretation. The fft demod reads the dechirped tone argmax and
  is insensitive to ±decim/2 misalignment, so it is the sound choice for
  low-decimation rates the reference never exercises.

Scope notes: both engines support explicit and implicit headers (the
fft engine evaluates the implicit energy-stop on the static window grid;
the gradient engine on its fine-sync-tracked windows). ``auto`` still
routes implicit configs to the fft engine (the throughput-sane choice);
request ``demod_method="gradient"`` explicitly for the reference's
default demod in implicit mode. Packets starting within the last
``max_packet_samples`` of a block need the following (overlapping) block
— halo handling lives in :mod:`lora_tpu.parallel` / `lora_tpu.stream`.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LoRaConfig, MAC_CRC_SIZE
from ..io.frames import Frame, PhyHeader
from ..ops import bits, decode as dec, demod, xfer
from ..ops.chirp import build_ideal_chirps, instantaneous_frequency, tiled_upchirp_ifreq
from .frontend import (detection_metrics, detection_metrics_planes,
                       candidate_starts, leak_suppression)

MAX_PAYLOAD = 260


class DenseResult(NamedTuple):
    """Struct-of-arrays decode result for a block: ``[..., P]`` leading dims."""

    valid: jnp.ndarray        # bool[..., P] frame decoded
    payload: jnp.ndarray      # uint8[..., P, MAX_PAYLOAD]
    length: jnp.ndarray       # int32[..., P] payload bytes incl. CRC
    hdr: jnp.ndarray          # uint8[..., P, 3] phy header bytes
    snr: jnp.ndarray          # f32[..., P]
    start: jnp.ndarray        # int32[..., P] packet start sample in block
    cfo: jnp.ndarray          # f32[..., P] carrier frequency offset (Hz)
    n_dropped: jnp.ndarray    # int32[...] rising-edge candidates past capacity


class PooledResult(NamedTuple):
    """Global-candidate-pool result: flat ``[G]`` arrays + channel index.

    For many-channel blocks, Phase B capacity should scale with the
    *aggregate* packet load, not ``channels x per-channel capacity`` —
    candidates from all channels are compacted into one fixed pool of
    ``G`` decode lanes (SURVEY.md §7: gather-to-fixed-capacity)."""

    valid: jnp.ndarray        # bool[G]
    channel: jnp.ndarray      # int32[G] source channel of each lane
    payload: jnp.ndarray      # uint8[G, MAX_PAYLOAD]
    length: jnp.ndarray       # int32[G]
    hdr: jnp.ndarray          # uint8[G, 3]
    snr: jnp.ndarray          # f32[G]
    start: jnp.ndarray        # int32[G] start sample within the channel
    cfo: jnp.ndarray          # f32[G]
    n_dropped: jnp.ndarray    # int32 candidates past per-channel or pool capacity


class DenseReceiver:
    """Block-based multi-packet receiver for one static config.

    ``max_symbols`` bounds the demodulated payload symbols per packet
    (header block's 8 symbols are separate); size it for the longest
    expected packet: ``8 + payload_symbol_count(max_payload)``.
    """

    def __init__(
        self,
        config: LoRaConfig,
        max_candidates: int = 8,
        max_symbols: int = 48,
        sfd_search: int = 12,
        demod_method: str = "auto",
        fft_drift_pass=None,
        fast_sync=None,
        header_checksum: bool = False,
        detect_threshold: float = 0.90,
        low_snr: bool = False,
        low_snr_threshold=None,
    ):
        if demod_method == "auto":
            demod_method = (
                "fft"
                if config.implicit or config.decim_factor < 4 or low_snr
                else "gradient"
            )
        self.cfg = config
        self.P = max_candidates
        self.S = max_symbols
        self.F = sfd_search
        self.method = demod_method
        # fft engine sample-clock drift tracking (two-pass): the static
        # window grid slips ~sps*ppm*1e-6 per symbol against a drifting
        # transmitter clock — fatal at SF11/12 where a packet outruns the
        # demod's ±decim/2 alignment tolerance. The fractional part of
        # each symbol's dechirped-tone position is data-independent
        # (data shifts are whole bins), so its symbol-to-symbol slope
        # measures the slip; a second demod pass then reads each symbol
        # at a drift-corrected offset. Costs one extra gather + fold per
        # symbol (the gradient engine tracks drift via fine_sync
        # instead; see docs/test-results/short_sim_drift*.md).
        # Default (None) = auto: ON for the fft engine exactly where the
        # static grid's tolerance is outrun at crystal-tolerance clock
        # offsets. The total per-packet slip over nsym symbols is
        # ``nsym * sps * ppm`` samples against a ``decim/2`` tolerance —
        # their ratio ``2 * nsym * n_bins * ppm`` is decim-independent
        # and crosses 1.0 around n_bins ~ 1500 at 30 ppm / 46 symbols:
        # SF >= 11. Below that the grid never slips far enough to
        # matter, and the correction's rounding noise on clean signals
        # is all cost and no benefit (at decim 2 a half-sample
        # mis-correction is half a bin).
        if fft_drift_pass is None:
            fft_drift_pass = demod_method == "fft" and config.sf >= 11
        self.fft_drift_pass = bool(fft_drift_pass)
        # Gradient-engine Phase B sync selector. Default (None) = the
        # CFO-invariant ifreq-wrap coarse + ±2*decim refine
        # (demod.upchirp_sync_grad, O(sps) vs the O(sps^2) sliding
        # search; ~0.14 ms/event at SF12): its residual sits inside the
        # gradient demod's alignment basin, and the FIND_SFD walk's
        # resync branch absorbs the rest — validated across the full
        # 12-suite matrix (round 4, docs/test-results). NOTE the fft
        # engine's dechirp-tone sync is NOT usable here: it absorbs
        # integer-bin CFO into timing, which the CFO-blind gradient
        # demod turns into a uniform bin error. ``fast_sync=False``
        # opts back into the reference-parity sliding ifreq search
        # (upchirp_sync_xcorr) — 4.3 ms/event at SF12 and its sps-tap
        # convolution is the one slow-compiling op on the remote
        # toolchain (docs/perf/timings.md).
        self.fast_sync = True if fast_sync is None else bool(fast_sync)
        # Opt-in rx PHY-header checksum verification (the reference stubs
        # this check, utilities.h:396-404; the tx here computes it). At
        # dense-scan scale — thousands of channels × noise-driven
        # candidate lanes — the 5-bit check structurally rejects 31/32
        # of garbage headers and every single-bit header corruption
        # (tests/test_header_checksum.py); measured noise-floor rates in
        # docs/perf/false_frames.md. Off by default for parity with the
        # reference (whose OTA traces *do* carry valid checksums, but
        # third-party captures may not).
        self.header_checksum = bool(header_checksum)
        # DETECT preamble-autocorrelation threshold (reference :377 uses
        # 0.90 — the parity default). The receiver's sensitivity floor is
        # detection-limited: a preamble at SNR s has expected adjacent-
        # window autocorrelation ~ s/(s+1), so 0.90 stops detecting
        # below ~+10 dB. Lowering it buys sensitivity at the cost of
        # more noise candidates (bounded by max_candidates/pool; see
        # docs/perf/sensitivity.md for the measured trade).
        self.detect_threshold = float(detect_threshold)
        self.sps = config.samples_per_symbol
        self.n_bins = config.number_of_bins
        self.decim = config.decim_factor

        up, down = build_ideal_chirps(config)
        self._up = up
        self._down = down
        self._up_ifreq = instantaneous_frequency(up)
        self._down_ifreq = instantaneous_frequency(down)
        self._up_ifreq_v = tiled_upchirp_ifreq(config)
        # fold-DFT matmul replaces the per-window FFT when the matrix fits
        # comfortably in HBM (the MXU path; see demod.make_fold_dft)
        # 16M entries = 128 MB of fold matrix (fine in HBM); covers SF10 @
        # decim 8, whose batched-FFT fallback otherwise compiles ~4 min on
        # the remote TPU toolchain. SF11+ full-rate stays on the FFT path.
        self._fold_mat = (
            demod.make_fold_dft(down, self.sps, self.n_bins)
            if self.sps * self.n_bins <= 16 * 1024 * 1024
            else None
        )
        # upchirp fold (SFD downchirp dechirped by the upchirp) for the
        # coarse-CFO matmul path; same size budget as _fold_mat
        self._fold_up = (
            demod.make_fold_dft(up, self.sps, self.n_bins)
            if self._fold_mat is not None
            else None
        )
        # precomputed sync-likeness rows: the static (fft) SFD block
        # scores all F windows via one one-hot MXU matmul instead of F
        # vmapped table slices per lane (a measured Phase B hotspot);
        # the gradient walk keeps the per-window slice (its scan batches
        # only the lanes). Same size budget as the fold matrix.
        self._likeness_rows = (
            demod.make_likeness_rows(self._up_ifreq_v, self.sps,
                                     self.decim, self.n_bins)
            if self.sps * self.n_bins <= 16 * 1024 * 1024
            else None
        )
        # Coherent low-SNR mode (beyond the reference): detection by
        # dechirp-fold peak/mean with tone-agreement gating
        # (frontend.detection_metrics_dechirp) and SFD by up-vs-down
        # dechirp peak comparison — both accumulate the full symbol
        # coherently (10*log10(sps) processing gain) instead of the
        # reference's ifreq-domain correlations, whose Pearson gates
        # saturate below ~+9 dB in-channel (docs/perf/sensitivity.md).
        # fft engine only (the gradient demod is itself ifreq-based);
        # explicit headers only (the implicit energy-stop threshold is
        # noise-dominated exactly where this mode matters).
        self.low_snr = bool(low_snr)
        if self.low_snr:
            if self.method != "fft":
                raise ValueError("low_snr mode requires the fft engine")
            if self._fold_mat is None and \
                    self.sps * self.n_bins <= 64 * 1024 * 1024:
                # the mode REQUIRES the fold matrices; accept a larger
                # footprint than the throughput path's 16M default
                # (64M entries = 512 MB of f32 planes — SF12 at 250 ksps.
                # Long-range = low-SNR reception IS the SF11/12 regime,
                # and decimating toward critical sampling first is what a
                # deployment does anyway.)
                self._fold_mat = demod.make_fold_dft(down, self.sps,
                                                     self.n_bins)
                self._fold_up = demod.make_fold_dft(up, self.sps,
                                                    self.n_bins)
            if self._fold_mat is None:
                raise ValueError(
                    "low_snr mode needs the fold-DFT matrices (sps * "
                    "n_bins <= 64M); decimate closer to critical "
                    "sampling first")
            if config.implicit:
                raise ValueError(
                    "low_snr mode is explicit-header only (the implicit "
                    "energy-stop is noise-dominated at low SNR)")
        # candidate threshold on the dechirp peak/mean score: the noise
        # baseline is ln(n_bins) + 0.577 (peak/mean of n_bins exponential
        # bins); 1.6x sits ~4 sigma above it while admitting SF7 preambles
        # to ~-15 dB in-window (measured, docs/perf/sensitivity.md)
        if low_snr_threshold is None:
            low_snr_threshold = 1.6 * (np.log(self.n_bins) + 0.5772)
        self.low_snr_threshold = float(low_snr_threshold)

        # per-packet region: sync(2) + sfd_search + 2.25 + 8 hdr + S payload
        self.pkt_samples = (self.F + 13 + self.S) * self.sps
        self._deint_tables = self._build_deint_tables()
        self._pay_luts = {}  # codeword-count -> fused decode-tail table
        self.process_fn = self._build()   # un-jitted (for shard_map wrapping)
        # The big DSP tables ride as jit ARGUMENTS, not closures: a
        # closed-over array is inlined into the serialized HLO, and the
        # near-critical SF11/12 geometries' fold/likeness tables (up to
        # hundreds of MB) overflow the remote-compile request size
        # (HTTP 413) — as parameters they upload once and the program
        # ships small. The un-jitted process_fn (shard_map wrapping,
        # fused wideband programs) still reads the attributes directly;
        # those geometries gate the tables to <=16M entries anyway.
        self._table_attrs = tuple(
            a for a in ("_fold_mat", "_fold_up", "_likeness_rows")
            if getattr(self, a) is not None
        )
        self._table_host = {a: getattr(self, a) for a in self._table_attrs}
        self._table_dev = None

        def entry(xf, tables):
            return self._with_tables(tables, self.process_fn, xf)

        self._process = jax.jit(entry)

    def _with_tables(self, tables: dict, fn, *args):
        """Trace ``fn`` with the big-table attributes rebound to the
        given (tracer) values; restores the host arrays after."""
        old = {a: getattr(self, a) for a in tables}
        for a, v in tables.items():
            setattr(self, a, v)
        try:
            return fn(*args)
        finally:
            for a, v in old.items():
                setattr(self, a, v)

    def _tables_device(self):
        if self._table_dev is None:
            self._table_dev = jax.device_put(self._table_host)
        return self._table_dev

    @property
    def _cand_threshold(self) -> float:
        """Candidate threshold for the active detection metric."""
        return self.low_snr_threshold if self.low_snr else self.detect_threshold

    # ------------------------------------------------------------------
    def _demod_symbol(self, window):
        """One-symbol demod: returns (bin_idx, fine_sync)."""
        cfg = self.cfg
        if self.method == "fft":
            b = demod.fft_shift_idx(window, self._down, self.n_bins, self.sps, xp=jnp)
            # fft convention reads shift s as s; gradient (the chain's
            # native convention) reads it as s-1 — compensate.
            return (b - 1) % self.n_bins, jnp.int32(0)
        b = demod.max_frequency_gradient_idx(window, self.n_bins, self.decim, xp=jnp)
        if cfg.disable_drift_correction:
            return b, jnp.int32(0)
        fine = demod.fine_sync_lag(
            window, b, self._up_ifreq_v, self.sps, self.decim,
            demod.fine_sync_search_space(self.decim), xp=jnp,
        )
        return b, fine

    def _decode_candidate(self, region, collect: bool = False):
        """Phase B for one packet region ``[pkt_samples]`` complex64.

        Compatibility wrapper: builds a lazy window slicer over the
        materialised region and dispatches to the method-specific path.
        The process entry points skip this and slice from the source
        planes directly (see ``_candidate_win``)."""
        pkt = self.pkt_samples

        def win(off, n):
            off = jnp.clip(off, 0, pkt - n)
            return jax.lax.dynamic_slice(region, (off,), (n,))

        if self.method == "fft":
            return self._decode_candidate_fft(win, collect=collect)
        return self._decode_candidate_grad(win, collect=collect)

    def _decode_candidate_grad(self, win, collect: bool = False):
        """Gradient-engine Phase B on a lazy window slicer (see
        :meth:`_decode_candidate_fft` for the slicer contract and why
        lazy windows beat a materialised per-lane region).

        ``collect=True`` (static) additionally returns a dict of
        intermediate arrays — the jitted-pipeline analogue of the
        reference's GRLORA_DEBUG taps (see :meth:`debug_trace`)."""
        cfg = self.cfg
        sps = self.sps

        # --- SYNC: align to upchirp start (reference :770-783) ---
        if self.fast_sync:
            # CFO-invariant ifreq-wrap coarse + small refine: the
            # gradient demod is timing-sensitive but CFO-blind, so its
            # sync must be timing-true — a dechirp-tone sync would fold
            # integer-bin CFO into the alignment and shift every
            # demodulated bin (see demod.upchirp_sync_grad)
            i0, _ = demod.upchirp_sync_grad(
                win(0, 2 * sps), self._up_ifreq, sps,
                self.n_bins, self.decim, xp=jnp)
        else:
            i0, _ = demod.upchirp_sync_xcorr(
                win(0, 2 * sps), self._up_ifreq, sps, xp=jnp)
        frac_cfo = demod.preamble_cfo(
            win(i0.astype(jnp.int32), 2 * sps), sps, cfg.samp_rate, xp=jnp,
        )

        # --- FIND_SFD walk (reference :785-818) ---
        def sfd_step(carry, k):
            p, fails, found, p_found, d_num, d_den, ref, srun, streak = carry
            w = win(p, sps)
            c = demod.downchirp_pearson(w, self._down_ifreq, sps, xp=jnp)
            hit = (c > 0.96) & (~found)
            # sync-word recognition (see GoldenReceiver FIND_SFD): a run
            # of <= 2 upchirps clearly shifted vs the anchored preamble
            # bin, after >= 2 stable preamble reads, is the sync word —
            # hold alignment, spend no fail budget. Recognition demands
            # signal evidence (demod.upchirp_likeness) so noise windows
            # can't spend the recognition allowance.
            b = demod.max_frequency_gradient_idx(w, self.n_bins, self.decim, xp=jnp)
            first = ref < 0
            ref = jnp.where(first, b, ref)
            streak = jnp.where(first, 1, streak)
            rel = (b - ref) % self.n_bins
            dist = jnp.minimum(rel, self.n_bins - rel)
            likeness = demod.upchirp_likeness(
                w, b, self._up_ifreq_v, sps, self.decim, xp=jnp)
            is_syncw = ((~found) & (~hit) & (dist > 3) & (srun < 2)
                        & (streak >= 2)
                        & (likeness > demod.SYNC_LIKENESS_MIN))
            is_up = (c < -0.97) & ~is_syncw
            re_anchor = is_up & (~found) & (~hit) & (dist > 3)
            ref = jnp.where(re_anchor, b, ref)
            streak = jnp.where(
                is_up & (~found) & (~hit),
                jnp.where(dist <= 3, streak + 1, 1),
                streak,
            ).astype(jnp.int32)
            fine = jnp.where(
                is_up & (~found) & (~hit),
                demod.fine_sync_lag(w, jnp.int32(-1), self._up_ifreq_v,
                                    sps, self.decim, self.decim * 4, xp=jnp),
                0,
            )
            # sample-clock drift estimate from the per-upchirp corrections
            # (large lags are resyncs, not drift); fed forward across the
            # blind 2.25-symbol SFD consume below
            track = is_up & (~found) & (~hit) & (jnp.abs(fine) <= self.decim // 2)
            d_num = d_num + jnp.where(track, fine, 0).astype(jnp.float32)
            d_den = d_den + jnp.where(track, 1, 0)
            fails = jnp.where(found | hit | is_up | is_syncw, fails, fails + 1)
            # total per-walk budget, not a resettable run (see
            # GoldenReceiver FIND_SFD note)
            srun = jnp.where(is_syncw, srun + 1, srun).astype(jnp.int32)
            p_found = jnp.where(hit, p, p_found)
            found = found | hit
            p_new = jnp.where(found, p, p + sps + fine)
            ys = (c, p) if collect else None
            return (p_new, fails, found, p_found, d_num, d_den, ref, srun,
                    streak), ys

        init = (i0.astype(jnp.int32), jnp.int32(0), jnp.bool_(False),
                jnp.int32(0), jnp.float32(0.0), jnp.int32(0),
                jnp.int32(-1), jnp.int32(0), jnp.int32(0))
        (p, fails, found, p_found, d_num, d_den, _, _, _), sfd_ys = jax.lax.scan(
            sfd_step, init, jnp.arange(self.F)
        )
        sfd_ok = found & (fails <= 4)
        # full-range CFO: integer-bin part from the SFD downchirp +
        # fractional part from the preamble phase (see demod.sfd_coarse_cfo)
        sfd_win = win(p_found, sps)
        up_win = win(i0.astype(jnp.int32), sps)
        coarse = demod.chirp_coarse_cfo(
            up_win, sfd_win, self._up, self._down, self.n_bins, sps,
            cfg.samp_rate, xp=jnp, fold_down=self._fold_mat,
            fold_up=self._fold_up,
        )
        cfo = demod.combine_cfo(coarse, frac_cfo, sps, cfg.samp_rate, xp=jnp)
        # data starts 2.25 symbols after SFD start (FIND_SFD consume +
        # PAUSE consume, reference :816,:822), advanced by the measured
        # drift rate (see GoldenReceiver PAUSE / short_sim_drift)
        rate = d_num / jnp.maximum(d_den, 1)
        p_data = (p_found + sps + sps + cfg.delay_after_sync
                  + jnp.round(2.25 * rate).astype(jnp.int32))

        # --- demod scan: 8 header symbols + S payload symbols ---
        # open-loop drift advance (see GoldenReceiver._drift_step): the
        # measured clock-offset slip is applied per symbol so fine_sync
        # only carries the residual
        def dm_step(carry, k):
            p, acc = carry
            w = win(p, sps)
            is_hdr = k < 8
            b_full, fine = self._demod_symbol(w)
            reduced = is_hdr if not cfg.reduced_rate else jnp.bool_(True)
            b_red = jnp.floor(b_full / 4.0 + 0.5).astype(jnp.int32) % cfg.number_of_bins_hdr
            b = jnp.where(reduced, b_red, b_full)
            word = b ^ (b >> 1)
            acc = acc + rate
            dstep = jnp.round(acc).astype(jnp.int32)
            acc = acc - dstep
            if cfg.disable_drift_correction:
                dstep = jnp.int32(0)
            p_next = p + sps + fine + dstep
            ys = (word,)
            if cfg.implicit:
                # implicit end-of-frame is energy-based (reference
                # :861-864); evaluated on the drift-corrected windows
                ys = ys + (jnp.sum(
                    jnp.real(w) ** 2 + jnp.imag(w) ** 2
                ).astype(jnp.float32),)
            if collect:
                # the gradient demod's internal view: bin-averaged ifreq
                ifr = instantaneous_frequency(w, xp=jnp)
                avg = ifr[: self.n_bins * self.decim].reshape(
                    self.n_bins, self.decim
                ).sum(axis=-1) / self.decim
                ys = ys + (b_full, fine, p, avg)
            return (p_next, acc), ys

        _, dm_ys = jax.lax.scan(
            dm_step, (p_data.astype(jnp.int32), jnp.float32(0.0)),
            jnp.arange(8 + self.S),
        )  # [8+S]
        words = dm_ys[0]
        if cfg.implicit:
            # energy-stop end-of-frame: threshold is half the preamble
            # upchirp window's energy (reference :356-357,861-864) —
            # the gradient engine's equivalent of the fft path's
            # static-grid stop, here on the fine-sync-tracked windows
            pre = win(i0.astype(jnp.int32), sps)
            thr = jnp.sum(jnp.real(pre) ** 2 + jnp.imag(pre) ** 2) / 2.0
            e_sym = dm_ys[1]  # [8+S]
            below = e_sym < thr
            ended = below.any()
            nsym = 8 + self.S
            n_data = jnp.where(ended, jnp.argmax(below), nsym).astype(jnp.int32)
            out = self._finish_decode_implicit(
                words, sfd_ok & ended, n_data
            ) + (cfo,)
        else:
            out = self._finish_decode(words, sfd_ok) + (cfo,)
        if collect:
            bins_, fines_, pos_, avg_ = dm_ys[-4:]
            extras = dict(
                i0=i0.astype(jnp.int32), frac_cfo=frac_cfo, coarse_cfo=coarse,
                cfo=cfo, sfd_corr=sfd_ys[0], sfd_pos=sfd_ys[1],
                p_found=p_found, fails=fails, sfd_ok=sfd_ok, p_data=p_data,
                words=words, bins=bins_, fine_syncs=fines_,
                window_pos=pos_, spectra=avg_,
            )
            return out + (extras,)
        return out

    def _decode_candidate_fft(self, win, collect: bool = False):
        """Phase B for the fft engine on a lazy window slicer.

        ``win(offset, n)`` returns the complex window of length ``n`` at
        region-relative sample ``offset`` (clamped to the packet region).
        Slicing each sub-window straight from the source planes — instead
        of materialising one ``pkt_samples`` region per lane — matters on
        TPU: every consumer of a gathered region re-materialises it
        (docs/perf/NOTES.md Phase B ablation), while the lazy windows
        gather only the ~46 symbol windows actually read, once.

        Sync: one fold-DFT matmul + parabolic peak (within the fft
        demod's ±decim/2 alignment tolerance); coarse+fine ifreq refine
        kept as the no-fold-matrix fallback.
        """
        sps = self.sps
        w2 = win(0, 2 * sps)
        if self._fold_mat is not None:
            i0, _ = demod.upchirp_sync_parab(
                w2, self._fold_mat, sps, self.decim, xp=jnp,
            )
        else:
            i0, _ = demod.upchirp_sync_coarse_fine(
                w2, self._down, self._up_ifreq, sps,
                self.n_bins, self.decim, xp=jnp, fold_mat=None,
            )
        return self._decode_candidate_static(
            win, i0.astype(jnp.int32), collect=collect
        )

    def _decode_candidate_static(self, win, i0, collect: bool = False):
        """Batched Phase B for the fft engine: no drift feedback, so SFD
        search and symbol demod run as one-shot batched kernels.

        ``win(offset, n)``: lazy window slicer (see
        :meth:`_decode_candidate_fft`). The SFD block supplies the
        preamble-CFO window (rows 0-1), the coarse-CFO upchirp (row 0),
        the SFD downchirp (row ``first``) and the implicit energy
        threshold window (row 0) — one gather serves all five consumers.
        """
        cfg = self.cfg
        sps = self.sps

        # --- SFD search over F static symbol offsets from the sync point ---
        sfd_flat = win(i0, self.F * sps)
        sfd_wins = sfd_flat.reshape(self.F, sps)
        frac_cfo = demod.preamble_cfo(
            sfd_flat[: 2 * sps], sps, cfg.samp_rate, xp=jnp,
        )
        if self.low_snr:
            # Coherent SFD discrimination: a downchirk window dechirped
            # by the UPCHIRP folds to a single tone while its dechirp by
            # the downchirp stays flat (and vice versa for preamble
            # upchirps) — comparing the two folded peaks separates
            # up/down/noise with the full sps-sample processing gain
            # (usable to ~-15 dB where the ifreq Pearson saturates at
            # ~+9 dB; measured in docs/perf/sensitivity.md).
            def fpow(w_, fm):
                er, ei = fm
                wr, wi = jnp.real(w_), jnp.imag(w_)
                fr = wr @ jnp.asarray(er) - wi @ jnp.asarray(ei)
                fi = wr @ jnp.asarray(ei) + wi @ jnp.asarray(er)
                return fr * fr + fi * fi

            pd = fpow(sfd_wins, self._fold_mat)   # upchirp-tone power
            pu = fpow(sfd_wins, self._fold_up)    # downchirp-tone power
            pd_peak = pd.max(axis=-1)
            pu_peak = pu.max(axis=-1)
            sbins = jnp.argmax(pd, axis=-1).astype(jnp.int32)
            hit = pu_peak > 2.0 * pd_peak         # downchirk-like: SFD
            found = hit.any()
            first = jnp.argmax(hit).astype(jnp.int32)
            up_like = pd_peak > 2.0 * pu_peak     # preamble / sync word
            rel = (sbins - sbins[0]) % self.n_bins
            dist = jnp.minimum(rel, self.n_bins - rel)
            # sync-word symbols ARE upchirp-like in the dechirp domain
            # (a tone at the shifted bin) — no separate likeness gate
            recognised = up_like & (dist > 3) & \
                (jnp.cumsum(up_like & (dist > 3)) <= 2)
            before = jnp.arange(self.F) < first
            fails = jnp.sum(before & ~up_like & ~hit & ~recognised)
            sfd_ok = found & (fails <= 4)
            # debug-tap analogue of the Pearson: +1 = SFD-like
            cs = ((pu_peak - pd_peak)
                  / jnp.maximum(pu_peak + pd_peak, 1e-30))
        else:
            cs = jax.vmap(
                lambda w: demod.downchirp_pearson(w, self._down_ifreq, sps, xp=jnp)
            )(sfd_wins)
            hit = cs > 0.96
            found = hit.any()
            first = jnp.argmax(hit).astype(jnp.int32)  # first hit index
            # fail accounting as in the walk (reference :805-813): a pre-SFD
            # window that is neither SFD nor still-upchirp counts as a miss —
            # except recognised sync-word symbols (<= 2 upchirps clearly
            # shifted vs the first window; see GoldenReceiver FIND_SFD), which
            # spend no fail budget. The static grid needs no alignment hold
            # (there is no drift chase to poison), only the fail arithmetic.
            if self._fold_mat is not None:
                sbins = demod.fft_shift_idx_mm(sfd_wins, self._fold_mat, xp=jnp)
            else:
                sbins = jax.vmap(
                    lambda w: demod.fft_shift_idx(w, self._down, self.n_bins, sps, xp=jnp)
                )(sfd_wins)
            rel = (sbins - sbins[0]) % self.n_bins
            dist = jnp.minimum(rel, self.n_bins - rel)
            # signal-evidence gate (see the gradient walk / upchirp_likeness):
            # fft bins read gradient+1, so the likeness lag uses sbins-1
            if self._likeness_rows is not None:
                likeness = demod.upchirp_likeness_rows(
                    sfd_wins, sbins - 1, self._likeness_rows, xp=jnp)
            else:
                likeness = demod.upchirp_likeness(
                    sfd_wins, sbins - 1, self._up_ifreq_v, sps, self.decim, xp=jnp)
            sync_like = (dist > 3) & (likeness > demod.SYNC_LIKENESS_MIN)
            recognised = sync_like & (jnp.cumsum(sync_like) <= 2)
            before = jnp.arange(self.F) < first
            fails = jnp.sum(before & ~(cs < -0.97) & ~hit & ~recognised)
            sfd_ok = found & (fails <= 4)
        p_found = i0 + first * sps
        # full-range CFO (see the gradient path / demod.sfd_coarse_cfo)
        sfd_win = sfd_wins[first]
        up_win = sfd_wins[0]
        coarse = demod.chirp_coarse_cfo(
            up_win, sfd_win, self._up, self._down, self.n_bins, sps,
            cfg.samp_rate, xp=jnp, fold_down=self._fold_mat,
            fold_up=self._fold_up,
        )
        cfo = demod.combine_cfo(coarse, frac_cfo, sps, cfg.samp_rate, xp=jnp)

        # data starts 2.25 symbols after SFD start (reference :816,:822)
        p_data = p_found + sps + sps + cfg.delay_after_sync

        # --- batched demod: 8 header + S payload symbols, one FFT batch ---
        nsym = 8 + self.S
        wins = win(p_data, nsym * sps).reshape(nsym, sps)
        if self.fft_drift_pass:
            # Single-pass drift correction in tone-position space (round
            # 4; replaces the earlier re-read-at-corrected-offset second
            # pass). A window late by ``l`` samples reads its dechirped
            # tone ``l/decim`` bins high, so correcting the *continuous*
            # tone position (bin + parabolic fraction) by the estimated
            # lateness in bins is equivalent to re-reading the window —
            # without the per-symbol gather, and without the
            # round-to-sample quantization (which at small decim is a
            # half-bin error by itself). Slip estimate: the fractional
            # tone position is data-independent, so its symbol-to-symbol
            # slope is the slip; estimated over the first 13 symbols
            # (the minimum explicit packet: 8 header + cr=1 block of 5 —
            # all guaranteed in-packet) and median-filtered. Lateness is
            # anchored at the sync point: the SFD walk span plus the
            # blind 2.25-symbol consume accumulate slip before the first
            # data symbol does (the handoff the gradient engine's drift
            # feed-forward covers). The clamp bounds a corrupted
            # estimate's damage to the equivalent of ~73 ppm at SF12.
            b_raw, frac = demod.fft_shift_frac(
                wins, self._down, self.n_bins, sps, xp=jnp,
                fold_mat=self._fold_mat,
            )
            n_est = min(13, nsym)
            d = frac[1:n_est] - frac[: n_est - 1]
            d = (d + 0.5) % 1.0 - 0.5
            slip = jnp.clip(jnp.median(d), -0.3, 0.3)  # bins / symbol
            lateness = (first.astype(jnp.float32) + 2.25
                        + jnp.arange(nsym, dtype=jnp.float32)) * slip
            b_full = jnp.round(
                b_raw.astype(jnp.float32) + frac - lateness
            ).astype(jnp.int32) % self.n_bins
        elif self._fold_mat is not None:
            b_full = demod.fft_shift_idx_mm(wins, self._fold_mat, xp=jnp)
        else:
            b_full = jax.vmap(
                lambda w: demod.fft_shift_idx(w, self._down, self.n_bins, sps, xp=jnp)
            )(wins)
        b_full = (b_full - 1) % self.n_bins  # fft->gradient bin convention
        is_hdr = jnp.arange(nsym) < 8
        reduced = is_hdr if not cfg.reduced_rate else jnp.bool_(True)
        b_red = jnp.floor(b_full / 4.0 + 0.5).astype(jnp.int32) % cfg.number_of_bins_hdr
        b = jnp.where(reduced, b_red, b_full)
        words = b ^ (b >> 1)
        extras = None
        if collect:
            extras = dict(
                i0=i0, frac_cfo=frac_cfo, coarse_cfo=coarse, cfo=cfo,
                sfd_corr=cs, sfd_pos=i0 + jnp.arange(self.F) * sps,
                p_found=p_found, fails=fails, sfd_ok=sfd_ok, p_data=p_data,
                words=words, bins=b_full,
                fine_syncs=jnp.zeros(nsym, jnp.int32),
                window_pos=p_data + jnp.arange(nsym) * sps,
                # dechirped folded magnitude spectra (get_shift_fft view)
                spectra=demod.dechirp_fft_mag(
                    wins, self._down, self.n_bins, sps, xp=jnp
                ),
            )
        if cfg.implicit:
            # energy-stop end-of-frame (reference :861-864): threshold is
            # half the preamble-window energy (set in DETECT, :356-357)
            pre = up_win
            thr = jnp.sum(jnp.real(pre) ** 2 + jnp.imag(pre) ** 2) / 2.0
            e_sym = jnp.sum(
                jnp.real(wins) ** 2 + jnp.imag(wins) ** 2, axis=-1
            )  # [nsym]
            below = e_sym < thr
            ended = below.any()
            n_data = jnp.where(ended, jnp.argmax(below), nsym).astype(jnp.int32)
            out = self._finish_decode_implicit(
                words, sfd_ok & ended, n_data
            ) + (cfo,)
            return out + (extras,) if collect else out
        out = self._finish_decode(words, sfd_ok) + (cfo,)
        return out + (extras,) if collect else out

    def _finish_decode_implicit(self, words, ok, n_data):
        """Implicit-header tail: no header parse; the first 8 (reduced)
        symbols are payload; payload length comes from the energy-stop
        symbol count (reference DECODE_PAYLOAD implicit branch :861-866,
        payload_length = demodulated_nibbles/2)."""
        cfg = self.cfg
        cr = cfg.cr
        ppm_hdr = cfg.sf - 2
        ppm_pay = cfg.sf - 2 if cfg.reduced_rate else cfg.sf
        blk = 4 + cr

        hdr_rows = dec.deinterleave_words(
            words[:8].astype(jnp.int32), jnp.int32(8), ppm_hdr, xp=jnp
        )  # [ppm_hdr] — all payload nibble codewords in implicit mode
        n_static = self.S // blk
        w = words[8 : 8 + n_static * blk].astype(jnp.int32).reshape(n_static, blk)
        pay_rows = dec.deinterleave_words(w, jnp.int32(blk), ppm_pay, xp=jnp).reshape(-1)
        codewords = jnp.concatenate([hdr_rows, pay_rows])

        n_blocks = jnp.maximum(n_data - 8, 0) // blk
        n_cw = ppm_hdr + n_blocks * ppm_pay
        paylen = n_cw // 2
        decoded = dec.decode_payload_lut(
            codewords, n_cw, jnp.int32(cr), self._payload_lut(codewords.shape[-1]),
            xp=jnp,
        )
        pay = jnp.zeros(MAX_PAYLOAD, jnp.uint8)
        m = min(MAX_PAYLOAD, decoded.shape[-1])
        pay = pay.at[:m].set(
            jnp.where(jnp.arange(m) < paylen, decoded[:m], 0).astype(jnp.uint8)
        )
        # synthesize the phy header from config (the reference publishes its
        # constructor-initialised d_phdr for implicit frames)
        hdr_bytes = jnp.stack([
            paylen.astype(jnp.uint8),
            jnp.uint8(((1 if cfg.crc else 0) << 4) | ((cr & 0x7) << 5)),
            jnp.uint8(0),
        ])
        ok = ok & (n_data >= 8) & (paylen <= MAX_PAYLOAD)
        return ok, pay, paylen.astype(jnp.int32), hdr_bytes

    def _build_deint_tables(self):
        """Gather tables turning the per-CR diagonal deinterleave
        (reference :535-565) into one bit-gather.

        The deinterleave is a fixed bit permutation per CR: codeword ``k``
        of variant ``cr`` has bit ``i`` = bit ``(x - i) mod ppm`` of
        payload word ``n*(4+cr) + i`` with ``n = k // ppm``, ``x = k %
        ppm``. Encoding it as host-built index tables replaces the 4
        unrolled rotl/transpose chains (dozens of small int ops per CR
        variant) with a single ``[4, CW, 8]`` gather — the decode tail is
        dispatch-bound, not FLOP-bound.
        """
        cfg = self.cfg
        ppm = cfg.sf - 2 if cfg.reduced_rate else cfg.sf
        ppm_hdr = cfg.sf - 2
        CW = ppm_hdr - 5 + (self.S // 5) * ppm  # capacity (see _finish_decode)
        src = np.zeros((4, CW, 8), np.int32)
        shift = np.zeros((4, CW, 8), np.int32)
        mask = np.zeros((4, CW, 8), np.int32)
        for v, cr in enumerate((1, 2, 3, 4)):
            blk = 4 + cr
            nblocks = self.S // blk
            for k in range(min(CW, nblocks * ppm)):
                n, x = divmod(k, ppm)
                for i in range(blk):
                    src[v, k, i] = n * blk + i
                    shift[v, k, i] = (x - i) % ppm
                    mask[v, k, i] = 1
        return src, shift, mask

    def _payload_lut(self, n_codewords: int):
        """Cached fused decode-tail table (see dec.make_payload_nibble_lut)."""
        if n_codewords not in self._pay_luts:
            self._pay_luts[n_codewords] = dec.make_payload_nibble_lut(n_codewords)
        return self._pay_luts[n_codewords]

    def _finish_decode(self, words, sfd_ok):
        """Shared tail: header parse + payload decode from ``[8+S]`` words."""
        cfg = self.cfg

        # --- header decode ---
        ppm_hdr = cfg.sf - 2
        hdr_rows = dec.deinterleave_words(
            words[:8].astype(jnp.int32), jnp.int32(8), ppm_hdr, xp=jnp
        )
        hdr_bytes = dec.decode_header(hdr_rows[:5], xp=jnp)
        length, cr, has_crc = dec.parse_header(hdr_bytes, xp=jnp)
        paylen = length + MAC_CRC_SIZE * has_crc
        budget = dec.payload_symbol_budget(paylen, cr, cfg.sf, cfg.reduced_rate, xp=jnp)
        hdr_ok = (budget <= self.S) & (cr >= 1) & (paylen <= MAX_PAYLOAD)
        if self.header_checksum:
            hdr_ok = hdr_ok & dec.header_checksum_valid(hdr_bytes, xp=jnp)

        # --- payload deinterleave: one bit-gather via the per-CR tables ---
        ppm_pay = cfg.sf - 2 if cfg.reduced_rate else cfg.sf
        CW = ppm_hdr - 5 + (self.S // 5) * ppm_pay  # capacity
        pay_words = words[8:].astype(jnp.int32)
        src, shift, mask = (jnp.asarray(t) for t in self._deint_tables)
        v = jnp.clip(cr - 1, 0, 3)
        src_c, shift_c, mask_c = src[v], shift[v], mask[v]  # [CW, 8]
        bits_ = (jnp.take(pay_words, src_c) >> shift_c) & mask_c
        pay_cw = jnp.sum(bits_ << np.arange(8, dtype=np.int32), axis=-1)
        # prepend the payload codewords carried in the header block
        head_extra = hdr_rows[5:]  # [ppm_hdr - 5]
        codewords = jnp.concatenate([head_extra, pay_cw])[:CW]
        n_blocks = budget // jnp.maximum(cr + 4, 1)
        n_cw = (ppm_hdr - 5) + n_blocks * ppm_pay

        decoded = dec.decode_payload_lut(
            codewords, n_cw, cr, self._payload_lut(codewords.shape[-1]), xp=jnp
        )
        pay = jnp.zeros(MAX_PAYLOAD, jnp.uint8)
        m = min(MAX_PAYLOAD, decoded.shape[-1])
        pay = pay.at[:m].set(
            jnp.where(jnp.arange(m) < paylen, decoded[:m], 0).astype(jnp.uint8)
        )

        return (
            sfd_ok & hdr_ok,
            pay,
            paylen.astype(jnp.int32),
            hdr_bytes.astype(jnp.uint8),
        )

    # ------------------------------------------------------------------
    def _region_from(self, stream, start):
        """Packet region ``[pkt_samples]`` starting at sample ``start``.

        ``stream``: complex ``[L]`` (or packed float32 ``[2, L]``; the
        leading plane axis is carried through). ``start`` is clamped to
        ``L - pkt_samples``: a candidate whose region would cross the
        block end reads a *shifted* region, so callers must mask such
        lanes invalid (see ``_tail_ok``). This keeps the lane gather a
        single contiguous dynamic-slice — the variable-shift roll +
        zero-fill it replaces doubled the gather's HBM cost, to serve
        only tail lanes that the streaming layer's ownership rule
        discards anyway (lora_tpu/stream.py). Host entry points pad
        their input by ``pkt_samples`` zeros instead, so whole-capture
        decodes still see every tail packet.
        """
        pkt = self.pkt_samples
        L = stream.shape[-1]
        if L < pkt:  # block shorter than one packet region: pad up
            cfgp = [(0, 0)] * (stream.ndim - 1) + [(0, pkt - L)]
            stream = jnp.pad(stream, cfgp)
            L = pkt
        start = jnp.clip(start.astype(jnp.int32), 0, L - pkt)
        return jax.lax.dynamic_slice_in_dim(stream, start, pkt, axis=-1)

    def _candidate_win(self, stream, start, conj_sign: float = 1.0):
        """Lazy per-candidate window slicer over the source stream.

        ``stream``: packed float32 ``[2, L]`` or complex ``[L]`` (the
        complex paths conjugate upstream). ``start``: absolute candidate
        sample, clamped exactly like ``_region_from``. Returns
        ``win(off, n)`` slicing ``stream[start+off : start+off+n]`` with
        the region-bounds clamp on ``off``, building complex lazily from
        the packed planes — each Phase B sub-window is one gather from the
        source block, and the ``pkt_samples`` region is never
        materialised (see ``_decode_candidate_fft``).
        """
        pkt = self.pkt_samples
        L = stream.shape[-1]
        if L < pkt:  # block shorter than one packet region: pad up
            padc = [(0, 0)] * (stream.ndim - 1) + [(0, pkt - L)]
            stream = jnp.pad(stream, padc)
            L = pkt
        start = jnp.clip(start.astype(jnp.int32), 0, L - pkt)
        packed = stream.ndim == 2

        def win(off, n):
            pos = start + jnp.clip(off, 0, pkt - n)
            w = jax.lax.dynamic_slice_in_dim(stream, pos, n, axis=-1)
            if packed:
                w = w.astype(jnp.float32)  # planes may be bf16
                return jax.lax.complex(w[0], conj_sign * w[1])
            return w

        return win

    def _decode_lane(self, win, collect: bool = False):
        """Method dispatch for one decode lane on a lazy slicer."""
        if self.method == "fft":
            return self._decode_candidate_fft(win, collect=collect)
        return self._decode_candidate_grad(win, collect=collect)

    def _tail_ok(self, starts, L: int):
        """Lanes whose packet region fits inside the block (see
        ``_region_from``: clamped lanes decode a shifted region and must
        be dropped)."""
        L_eff = max(L, self.pkt_samples)
        return starts * self.sps + self.pkt_samples <= L_eff

    def _metrics_planes(self, xf):
        """Detection metrics on packed planes: the single-pass Pallas
        kernel on TPU, the fused XLA planes path elsewhere. The metric is
        conj-invariant (|dot| and energies are unchanged under x -> x*),
        so downlink (conj) configs use the same kernel. In ``low_snr``
        mode the coherent dechirp-fold metric replaces the
        autocorrelation (one MXU contraction over all windows; see
        frontend.detection_metrics_dechirp)."""
        if self.low_snr:
            from .frontend import detection_metrics_dechirp

            if self.cfg.conj:
                # conj flips the chirp sense: dechirp with the upchirp
                return detection_metrics_dechirp(xf, self.sps, self._fold_up)
            return detection_metrics_dechirp(xf, self.sps, self._fold_mat)
        if jax.default_backend() == "tpu":
            from ..ops.pallas_kernels import detection_metrics_pallas

            return detection_metrics_pallas(xf, self.sps)
        return detection_metrics_planes(xf, self.sps)

    def _snr_from_energy(self, e1, starts):
        """Per-candidate SNR via the reference's power-queue method
        (lib/decoder_impl.cc:360,377-383): ``determine_snr`` divides the
        firing DETECT window's mean power (queue back) by the window
        ``MAX_PWR_QUEUE_SIZE-1 = 3`` DETECT consumes earlier (queue
        front). ``starts`` here is the rising edge + 1 while the
        reference fires on the first >=0.90 window (the edge itself), so
        noise sits at ``starts - 4`` (clamped at the block head, where
        the reference's queue would be equally short)."""
        K = e1.shape[-1]
        sig = jnp.take_along_axis(e1, jnp.minimum(starts, K - 1), axis=-1)
        noise = jnp.take_along_axis(e1, jnp.clip(starts - 4, 0, K - 1), axis=-1)
        return (sig / jnp.maximum(noise, 1e-30)).astype(jnp.float32)

    def process_planes(self, xf, metrics=None):
        """Trace-time core on packed IQ float32 ``[..., 2, L]`` ->
        DenseResult.

        (Packed input keeps complex64 off the host<->device boundary;
        see :mod:`lora_tpu.ops.xfer`.) Lane regions are gathered
        straight from the packed planes — the full-block complex
        array is never materialised. Downlink (``conj``) configs negate
        the imag plane at lane-gather time (zero extra bandwidth).
        ``metrics``: optional precomputed ``(corr, e1, e2)``.
        """
        sps = self.sps
        if metrics is None:
            metrics = self._metrics_planes(xf)
        corr, e1, e2 = metrics
        starts, s_valid, n_dropped = candidate_starts(
            corr, self._cand_threshold, self.P, suppress=leak_suppression(e1)
        )
        starts = starts + 1  # see process_complex
        s_valid = s_valid & self._tail_ok(starts, xf.shape[-1])
        snr = self._snr_from_energy(e1, starts)
        conj_sign = -1.0 if self.cfg.conj else 1.0

        def per_candidate(planes, start_win):
            return self._decode_lane(
                self._candidate_win(planes, start_win * sps, conj_sign)
            )

        fn = jax.vmap(per_candidate, in_axes=(None, 0))
        for _ in range(xf.ndim - 2):
            fn = jax.vmap(fn, in_axes=(0, 0))
        ok, pay, plen, hdr, cfo = fn(xf, starts)
        return DenseResult(
            valid=ok & s_valid,
            payload=pay,
            length=plen,
            hdr=hdr,
            snr=snr,
            start=starts * sps,
            cfo=cfo,
            n_dropped=n_dropped,
        )

    def process_pooled_planes(self, xf, pool: int, per_channel: int = 4,
                              metrics=None) -> PooledResult:
        """:meth:`process_pooled` on packed planes ``[C, 2, L]`` — the
        many-channel scaling path with the Pallas detection kernel."""
        sps = self.sps
        if metrics is None:
            metrics = self._metrics_planes(xf)
        corr, e1, e2 = metrics
        chan, win, lane_valid, snr, n_dropped = self._pool_lanes(
            e1, corr, per_channel, pool, xf.shape[-1]
        )
        conj_sign = -1.0 if self.cfg.conj else 1.0

        def per_lane(ch, w):
            stream = jax.lax.dynamic_slice_in_dim(xf, ch, 1, axis=0)[0]
            return self._decode_lane(
                self._candidate_win(stream, w * sps, conj_sign)
            )

        ok, pay, plen, hdr, cfo = jax.vmap(per_lane)(chan, win)
        return PooledResult(
            valid=ok & lane_valid,
            channel=chan,
            payload=pay,
            length=plen,
            hdr=hdr,
            snr=snr,
            start=win * sps,
            cfo=cfo,
            n_dropped=n_dropped,
        )

    def _pool_lanes(self, e1, corr, per_channel: int, pool: int, L: int):
        """Shared candidate compaction for the pooled paths: strongest
        ``pool`` valid (channel, window) pairs across all channels.
        Returns ``(chan, win, lane_valid, snr, n_dropped)``; the first
        four are ``[pool]``, ``n_dropped`` is a scalar counting candidates
        lost to per-channel capacity plus valid candidates past the pool."""
        starts, s_valid, chan_drop = candidate_starts(
            corr, self._cand_threshold, per_channel, suppress=leak_suppression(e1)
        )
        starts = starts + 1  # see process_complex
        s_valid = s_valid & self._tail_ok(starts, L)

        # Ranking by window energy (not arrival order) matters: the
        # normalized autocorrelation metric is scale-invariant, so a
        # strong packet's PFB-sidelobe leakage raises candidates on
        # neighbouring idle channels too — those leaked copies are tens
        # of dB weaker and must not crowd real packets out of the pool
        # (they also fail to decode: the sidelobe filtering destroys the
        # chirp structure).
        cand_e = jnp.take_along_axis(
            e1, jnp.minimum(starts, e1.shape[-1] - 1), axis=-1
        )  # [C, Pc]
        flat_valid = s_valid.reshape(-1)
        score = jnp.where(flat_valid, cand_e.reshape(-1), -1.0)
        order = jnp.argsort(-score)[:pool]
        chan = (order // per_channel).astype(jnp.int32)
        win = starts.reshape(-1)[order]
        lane_valid = flat_valid[order]
        snr = self._snr_from_energy(e1, starts).reshape(-1)[order]
        # pool overflow: valid candidates that didn't make the pool
        pool_drop = jnp.maximum(
            jnp.sum(flat_valid).astype(jnp.int32) - pool, 0
        )
        n_dropped = jnp.sum(chan_drop).astype(jnp.int32) + pool_drop
        return chan, win, lane_valid, snr, n_dropped

    def _build(self):
        return self.process_planes

    def process_complex(self, x, metrics=None):
        """Trace-time core on complex IQ ``[..., L]`` — call inside jit
        (e.g. fused behind an on-device channelizer). ``metrics``: optional
        precomputed ``(corr, e1, e2)`` detection metrics (the packed-input
        entry uses the single-pass Pallas kernel).

        Tail contract: candidates within the last ``pkt_samples`` are
        invalidated (see ``_region_from``); give the block ``pkt_samples``
        of tailroom (zeros or the next block's halo) to decode packets
        ending near the block edge."""
        sps = self.sps
        if self.cfg.conj:
            x = jnp.conj(x)
            metrics = None
        if metrics is not None:
            corr, e1, e2 = metrics
        elif self.low_snr:
            from .frontend import detection_metrics_dechirp

            corr, e1, e2 = detection_metrics_dechirp(
                jnp.stack([jnp.real(x), jnp.imag(x)], axis=-2), sps,
                self._fold_mat)
        else:
            corr, e1, e2 = detection_metrics(x, sps)
        starts, s_valid, n_dropped = candidate_starts(
            corr, self._cand_threshold, self.P, suppress=leak_suppression(e1)
        )  # [..., P]
        # Decode from one window past the rising edge: the edge window
        # may begin slightly before the preamble (leading silence skews
        # the sync xcorr by a fraction of a symbol and the SFD walk
        # then burns its fail budget on ~-0.8 correlations); one window
        # later is guaranteed fully inside the >=8-symbol preamble and
        # the sfd_search budget covers the extra symbol.
        starts = starts + 1
        s_valid = s_valid & self._tail_ok(starts, x.shape[-1])
        snr = self._snr_from_energy(e1, starts)

        def per_candidate(stream, start_win):
            return self._decode_lane(
                self._candidate_win(stream, start_win * sps)
            )

        fn = per_candidate
        # vmap over candidates, then over any leading stream dims
        fn = jax.vmap(fn, in_axes=(None, 0))
        for _ in range(x.ndim - 1):
            fn = jax.vmap(fn, in_axes=(0, 0))
        ok, pay, plen, hdr, cfo = fn(x, starts)
        return DenseResult(
            valid=ok & s_valid,
            payload=pay,
            length=plen,
            hdr=hdr,
            snr=snr.astype(jnp.float32),
            start=starts * sps,
            cfo=cfo,
            n_dropped=n_dropped,
        )

    def process_pooled(self, x, pool: int, per_channel: int = 4,
                       metrics=None) -> PooledResult:
        """Trace-time many-channel core with a global candidate pool.

        ``x``: complex ``[C, L]``. Per channel, up to ``per_channel``
        rising-edge candidates are extracted; the first ``pool`` valid
        candidates across ALL channels are compacted into ``pool`` decode
        lanes. Phase B cost is O(pool), independent of the channel count —
        the right scaling for thousand-channel blocks where most channels
        are idle at any instant. Overflowing candidates (beyond ``pool``)
        are dropped; size ``pool`` for the worst-case aggregate packet
        arrival rate per block.
        """
        sps = self.sps
        if self.cfg.conj:
            x = jnp.conj(x)
            metrics = None
        if metrics is not None:
            corr, e1, e2 = metrics
        elif self.low_snr:
            from .frontend import detection_metrics_dechirp

            corr, e1, e2 = detection_metrics_dechirp(
                jnp.stack([jnp.real(x), jnp.imag(x)], axis=-2), sps,
                self._fold_mat)
        else:
            corr, e1, e2 = detection_metrics(x, sps)
        chan, win, lane_valid, snr, n_dropped = self._pool_lanes(
            e1, corr, per_channel, pool, x.shape[-1]
        )

        def per_lane(ch, w):
            stream = jax.lax.dynamic_slice_in_dim(x, ch, 1, axis=0)[0]
            return self._decode_lane(self._candidate_win(stream, w * sps))

        ok, pay, plen, hdr, cfo = jax.vmap(per_lane)(chan, win)
        return PooledResult(
            valid=ok & lane_valid,
            channel=chan,
            payload=pay,
            length=plen,
            hdr=hdr,
            snr=snr,
            start=win * sps,
            cfo=cfo,
            n_dropped=n_dropped,
        )

    # ------------------------------------------------------------------
    def debug_trace(self, x):
        """Decode ONE stream with full intermediate taps.

        The jitted-pipeline analogue of the reference's ``GRLORA_DEBUG``
        sample dumps + ``/tmp/grlora_debug_txt`` per-symbol log
        (lib/decoder_impl.cc:63-67,514-516; SURVEY.md §5) and of the
        golden receiver's ``DebugTrace``. ``x``: host complex IQ ``[L]``.
        Returns a dict of host numpy arrays:

        block level
            ``corr``/``e1`` dense detection metrics ``[K]``;
            ``starts``/``cand_valid`` candidate windows ``[P]``.
        per candidate (leading axis ``P``)
            ``i0`` sync offset; ``frac_cfo``/``coarse_cfo``/``cfo``;
            ``sfd_corr``/``sfd_pos`` the FIND_SFD walk ``[F]``;
            ``p_found``/``fails``/``sfd_ok``/``p_data``;
            ``words``/``bins``/``fine_syncs``/``window_pos`` per symbol
            ``[8+S]``; ``spectra`` per-symbol dechirped view
            (fft: folded magnitude ``[8+S, n_bins]``; gradient:
            bin-averaged instantaneous frequency);
            decode results ``ok``/``payload``/``length``/``hdr``.
        """
        import numpy as _np

        x = _np.asarray(x)
        if _np.iscomplexobj(x):
            x = xfer.pack_iq(
                _np.pad(x.astype(_np.complex64), (0, self.pkt_samples))
            )
        if not hasattr(self, "_debug_jit"):
            sps = self.sps
            conj_sign = -1.0 if self.cfg.conj else 1.0

            def fn(xf):
                metrics = self._metrics_planes(xf)
                corr, e1, e2 = metrics
                starts, s_valid, n_dropped = candidate_starts(
                    corr, self._cand_threshold, self.P, suppress=leak_suppression(e1)
                )
                starts = starts + 1
                s_valid = s_valid & self._tail_ok(starts, xf.shape[-1])

                def per_candidate(start_win):
                    return self._decode_lane(
                        self._candidate_win(xf, start_win * sps, conj_sign),
                        collect=True,
                    )

                ok, pay, plen, hdr, cfo, extras = jax.vmap(per_candidate)(starts)
                return dict(
                    corr=corr, e1=e1, starts=starts * sps,
                    cand_valid=s_valid, n_dropped=n_dropped,
                    ok=ok & s_valid, payload=pay, length=plen, hdr=hdr,
                    **extras,
                )

            self._debug_jit = jax.jit(fn)
        out = jax.device_get(self._debug_jit(jnp.asarray(x)))
        return {k: _np.asarray(v) for k, v in out.items()}

    def process(self, x) -> DenseResult:
        """Run the pipeline. ``x`` may be host complex IQ, host packed
        float32 ``[..., 2, L]``, or an already-on-device packed array.

        Host *complex* input is padded by ``pkt_samples`` zeros so
        packets ending at the capture tail keep a full decode region
        (device/packed input is assumed to come from the streaming or
        bench paths, whose blocking already guarantees this — see
        ``_region_from``).
        """
        if not isinstance(x, jax.Array):
            x = np.asarray(x)
            if np.iscomplexobj(x):
                pad = [(0, 0)] * (x.ndim - 1) + [(0, self.pkt_samples)]
                x = xfer.pack_iq(np.pad(x.astype(np.complex64), pad))
        return self._process(x, self._tables_device())

    def run(self, x, channel_offset: int = 0) -> List[Frame]:
        """Decode a block (1-D or [C, L]) into host Frame objects."""
        res = jax.device_get(self.process(x))
        frames: List[Frame] = []
        valid = np.atleast_2d(res.valid)
        pay = res.payload.reshape(valid.shape + (MAX_PAYLOAD,))
        plen = res.length.reshape(valid.shape)
        hdr = res.hdr.reshape(valid.shape + (3,))
        snr = res.snr.reshape(valid.shape)
        start = res.start.reshape(valid.shape)
        cfo = res.cfo.reshape(valid.shape)
        for c in range(valid.shape[0]):
            for k in range(valid.shape[1]):
                if not valid[c, k]:
                    continue
                frames.append(
                    Frame(
                        phy_header=PhyHeader.from_bytes(bytes(hdr[c, k])),
                        payload=bytes(pay[c, k][: plen[c, k]]),
                        snr=float(snr[c, k]),
                        channel=c + channel_offset,
                        sample_index=int(start[c, k]),
                        cfo=float(cfo[c, k]),
                    )
                )
        return frames
