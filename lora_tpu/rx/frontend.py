"""Dense detection frontend: preamble metrics for ALL windows at once.

The reference evaluates ``detect_preamble_autocorr`` one window at a time
inside its DETECT state (lib/decoder_impl.cc:752-768). On TPU the same
metric is computed for every symbol-stride window of a block in one fused
batched pass: elementwise lag products + segmented box sums — O(1) work per
sample, HBM-bandwidth bound, which is what makes Gsample/s detection
possible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def detection_metrics(x, sps: int):
    """Per-window preamble autocorrelation at symbol stride.

    ``x``: complex ``[..., L]``. Windows start at ``k*sps`` for
    ``k = 0 .. K-1`` with ``K = L//sps - 1`` (each window needs ``2*sps``
    samples, mirroring the reference's ``set_output_multiple``).

    Returns ``(corr, energy1, energy2)`` each ``[..., K]``, exactly the
    quantities of ``detect_preamble_autocorr`` (:340-366): normalized
    |conj-dot| of the two symbol halves and their total energies.
    """
    L = x.shape[-1]
    K = L // sps - 1
    lead = x[..., : (K + 1) * sps]
    lag_prod = lead[..., : K * sps] * jnp.conj(lead[..., sps:])
    mag2 = jnp.real(lead) ** 2 + jnp.imag(lead) ** 2

    dots = jnp.sum(lag_prod.reshape(lag_prod.shape[:-1] + (K, sps)), axis=-1)
    eners = jnp.sum(mag2.reshape(mag2.shape[:-1] + (K + 1, sps)), axis=-1)
    e1 = eners[..., :K]
    e2 = eners[..., 1:]
    denom = jnp.sqrt(e1 * e2)
    corr = jnp.where(denom > 0, jnp.abs(dots) / jnp.where(denom > 0, denom, 1.0), 0.0)
    return corr.astype(jnp.float32), e1.astype(jnp.float32), e2.astype(jnp.float32)


def detection_metrics_planes(xf, sps: int):
    """:func:`detection_metrics` on packed float32 IQ ``[..., 2, L]``.

    Operating on the real/imag planes directly (instead of a complex64
    array) keeps the whole computation in float32 elementwise+reduce form
    that XLA fuses into segment reductions without materialising
    complex intermediates — the packed input is read O(1) times.
    """
    L = xf.shape[-1]
    K = L // sps - 1
    xf = xf.astype(jnp.float32)  # bf16 planes: convert fuses into the read
    r = xf[..., 0, : (K + 1) * sps].reshape(xf.shape[:-2] + (K + 1, sps))
    i = xf[..., 1, : (K + 1) * sps].reshape(xf.shape[:-2] + (K + 1, sps))
    # dot[k] = sum_t x[k,t] * conj(x[k+1,t])
    dot_re = jnp.sum(r[..., :-1, :] * r[..., 1:, :] + i[..., :-1, :] * i[..., 1:, :], axis=-1)
    dot_im = jnp.sum(i[..., :-1, :] * r[..., 1:, :] - r[..., :-1, :] * i[..., 1:, :], axis=-1)
    eners = jnp.sum(r * r + i * i, axis=-1)  # [..., K+1]
    e1 = eners[..., :K]
    e2 = eners[..., 1:]
    denom = jnp.sqrt(e1 * e2)
    mag = jnp.sqrt(dot_re * dot_re + dot_im * dot_im)
    corr = jnp.where(denom > 0, mag / jnp.where(denom > 0, denom, 1.0), 0.0)
    return corr.astype(jnp.float32), e1.astype(jnp.float32), e2.astype(jnp.float32)


def detection_metrics_dechirp(xf, sps: int, fold_mat):
    """Coherent low-SNR preamble detection on packed planes.

    The autocorrelation metric (above) loses the preamble below ~+9 dB
    in-channel: its expectation is ``s/(s+1)`` against thresholds near
    0.9, and the reference's ifreq-domain gates saturate even earlier
    (docs/perf/sensitivity.md). This metric instead accumulates the
    preamble COHERENTLY, the way actual LoRa silicon does: each
    symbol-stride window is dechirped and folded through the fold-DFT
    matmul (:func:`lora_tpu.ops.demod.make_fold_dft` — one
    ``[K1, sps] @ [sps, n_bins]`` MXU contraction for the whole block),
    giving a ``10*log10(sps)`` processing gain (24-45 dB); the score is
    the folded-power peak/mean ratio, gated on the tone bin AGREEING
    with the next window's (repeated preamble upchirps read the same
    folded bin; noise argmaxes are uniform). Usable to ~-15 dB
    in-window SNR at SF7 (measured; lower at higher SF).

    Returns ``(score, e1, e2)`` with the :func:`detection_metrics`
    contract (``[..., K]``, K = L//sps - 1); feed ``score`` to
    :func:`candidate_starts` with a peak/mean threshold (noise baseline
    ``ln(n_bins) + 0.577``).
    """
    er, ei = fold_mat
    er = jnp.asarray(er)
    ei = jnp.asarray(ei)
    n_bins = er.shape[-1]
    L = xf.shape[-1]
    K1 = L // sps
    K = K1 - 1
    xf = xf.astype(jnp.float32)
    lead = xf.shape[:-2]
    r = xf[..., 0, : K1 * sps].reshape(lead + (K1, sps))
    i = xf[..., 1, : K1 * sps].reshape(lead + (K1, sps))
    fr = r @ er - i @ ei
    fi = r @ ei + i @ er
    p = fr * fr + fi * fi                      # [..., K1, n_bins]
    peak = p.max(axis=-1)
    mean = p.mean(axis=-1)
    bins = jnp.argmax(p, axis=-1)
    ratio = peak / jnp.maximum(mean, 1e-30)
    d = (bins[..., :-1] - bins[..., 1:]) % n_bins
    dist = jnp.minimum(d, n_bins - d)
    score = jnp.where(
        dist <= 1, jnp.minimum(ratio[..., :-1], ratio[..., 1:]), 0.0
    )
    e = jnp.sum(r * r + i * i, axis=-1)        # [..., K1]
    return (score.astype(jnp.float32), e[..., :K].astype(jnp.float32),
            e[..., 1:].astype(jnp.float32))


def lag_rows_planes(xf, sps_min: int, lags):
    """Fine-granularity lag products + row energies on packed planes.

    The shared substrate of multi-SF detection: every SF's symbol
    length is an integer multiple ``m = sps_sf // sps_min`` of the
    smallest SF's, so its adjacent-window conj-dot decomposes into
    sums of *fine-row* lag products ``q_m[r] = sum_t x[r*sps_min + t]
    * conj(x[(r+m)*sps_min + t])`` — and its window energies into sums
    of fine-row energies. Computing ``q`` for every needed lag in ONE
    pass over the planes replaces the per-SF re-reads of
    :func:`detection_metrics_planes` (the gateway's 6x detection HBM
    cost; docs/perf/NOTES.md "Gateway cost shape").

    ``xf``: packed IQ ``[..., 2, L]``; ``lags``: iterable of ints
    (each SF's ``m``). Returns ``(e, {lag: (q_re, q_im)})`` with
    ``e`` ``[..., R]`` (R = L // sps_min) and each ``q_*`` ``[..., R]``
    zero-padded past its valid range ``R - lag`` (unused by the
    window aggregation, see :func:`metrics_from_lag_rows`).
    """
    L = xf.shape[-1]
    R = L // sps_min
    xf = xf.astype(jnp.float32)
    lead = xf.shape[:-2]
    r = xf[..., 0, : R * sps_min].reshape(lead + (R, sps_min))
    i = xf[..., 1, : R * sps_min].reshape(lead + (R, sps_min))
    e = jnp.sum(r * r + i * i, axis=-1)
    qs = {}
    for l in sorted(set(int(l) for l in lags)):
        if l >= R:
            z = jnp.zeros(lead + (R,), jnp.float32)
            qs[l] = (z, z)
            continue
        q_re = jnp.sum(r[..., :-l, :] * r[..., l:, :]
                       + i[..., :-l, :] * i[..., l:, :], axis=-1)
        q_im = jnp.sum(i[..., :-l, :] * r[..., l:, :]
                       - r[..., :-l, :] * i[..., l:, :], axis=-1)
        pad = [(0, 0)] * len(lead) + [(0, l)]
        qs[l] = (jnp.pad(q_re, pad), jnp.pad(q_im, pad))
    return e, qs


def metrics_from_lag_rows(e, q_re, q_im, m: int):
    """Window detection metrics for one SF from the fine-row substrate.

    ``m``: the SF's fine-row multiple (``sps_sf // sps_min``). Returns
    ``(corr, e1, e2)`` identical to :func:`detection_metrics_planes`
    at stride ``m * sps_min`` (same window grid: windows start at
    ``k * sps_sf`` from sample 0).
    """
    R = e.shape[-1]
    Kw = R // m          # = L // sps_sf
    K = Kw - 1
    lead = e.shape[:-1]
    if K < 1:
        z = jnp.zeros(lead + (0,), jnp.float32)
        return z, z, z
    e_win = jnp.sum(e[..., : Kw * m].reshape(lead + (Kw, m)), axis=-1)
    dot_re = jnp.sum(q_re[..., : Kw * m].reshape(lead + (Kw, m)), axis=-1)
    dot_im = jnp.sum(q_im[..., : Kw * m].reshape(lead + (Kw, m)), axis=-1)
    e1 = e_win[..., :K]
    e2 = e_win[..., 1 : K + 1]
    mag = jnp.sqrt(dot_re[..., :K] ** 2 + dot_im[..., :K] ** 2)
    denom = jnp.sqrt(e1 * e2)
    corr = jnp.where(denom > 0, mag / jnp.where(denom > 0, denom, 1.0), 0.0)
    return corr.astype(jnp.float32), e1, e2


def multi_sf_detection_metrics(xf, sps_by_sf):
    """Detection metrics for several SFs in one pass over the planes.

    ``sps_by_sf``: ``{sf: samples_per_symbol}``; every sps must be an
    integer multiple of the smallest. Returns ``{sf: (corr, e1, e2)}``
    matching :func:`detection_metrics_planes` per SF. On TPU the
    fine-row substrate is computed by the single-pass multi-lag Pallas
    kernel (1x HBM read for all SFs); elsewhere by the fused XLA
    planes math.
    """
    sps_min = min(sps_by_sf.values())
    ms = {sf: sps // sps_min for sf, sps in sps_by_sf.items()}
    if any(sps % sps_min for sps in sps_by_sf.values()):
        raise ValueError("multi-SF metrics need commensurate symbol lengths")
    rows = None
    if jax.default_backend() == "tpu":
        from ..ops.pallas_kernels import lag_rows_pallas

        rows = lag_rows_pallas(xf, sps_min, set(ms.values()))
    if rows is None:
        rows = lag_rows_planes(xf, sps_min, set(ms.values()))
    e, qs = rows
    return {
        sf: metrics_from_lag_rows(e, qs[m][0], qs[m][1], m)
        for sf, m in ms.items()
    }


LEAK_RATIO = 10.0 ** 3.5  # 35 dB: 5 dB guard under the >=40 dB sidelobe
                          # attenuation of the channel filters (53 dB
                          # Hamming designs), so only signals that CANNOT
                          # be genuine in-channel packets are masked


def leak_suppression(e1, xp=jnp):
    """Cross-channel sidelobe-leak mask for per-window energies
    ``[..., K]`` (all leading axes are channel-like).

    The autocorrelation detection metric is scale-invariant, so a strong
    packet's channelizer-sidelobe leakage raises full-strength (but
    undecodable) candidates on neighbouring idle channels, crowding real
    packets out of the fixed candidate capacity. A leaked copy is
    time-aligned with its source and tens of dB weaker (>=40 dB for the
    reference's 53 dB Hamming filter designs), so: suppress a window
    whose energy sits ``LEAK_RATIO`` below the strongest channel's energy
    at the SAME window. The ratio must stay strictly below the filter
    attenuation: LoRa networks live in the near/far regime, and a genuine
    packet 25-35 dB weaker than a concurrent transmission on another
    channel is decodable and MUST survive the mask
    (tests/test_pooled.py::test_near_far_weak_packet_decodes). Single-
    stream inputs (no leading axes) are never suppressed.
    """
    lead = tuple(range(e1.ndim - 1))
    if not lead:
        return xp.zeros(e1.shape, dtype=bool)
    peak = xp.max(e1, axis=lead, keepdims=True)
    return e1 * LEAK_RATIO < peak


def candidate_starts(corr, threshold: float, max_candidates: int,
                     suppress=None):
    """Rising-edge packet-start candidates from the dense metric.

    A candidate is the first window of a run of >= 2 consecutive
    ``corr >= threshold`` windows (a real preamble of >= 3 symbols always
    yields such a run at symbol stride; isolated data-symbol coincidences
    rarely do — this keeps spurious candidates from exhausting the fixed
    candidate capacity). Returns ``(starts, valid, n_dropped)``:
    ``[..., max_candidates]`` window indices (int32, the EARLIEST
    ``max_candidates`` per stream — time order preserves the streaming
    layer's ownership/dedup contract), a validity mask, and the count of
    rising edges past the capacity.

    ``suppress``: optional bool ``[..., K]`` of windows to exclude
    (see :func:`leak_suppression`).
    """
    hit = corr >= threshold
    nxt = jnp.pad(hit[..., 1:], [(0, 0)] * (hit.ndim - 1) + [(0, 1)])
    prev = jnp.pad(hit[..., :-1], [(0, 0)] * (hit.ndim - 1) + [(1, 0)])
    rising = hit & nxt & ~prev
    if suppress is not None:
        rising = rising & ~suppress
    K = corr.shape[-1]
    idx = jnp.where(rising, jnp.arange(K), K)
    starts = jnp.sort(idx, axis=-1)[..., :max_candidates]
    valid = starts < K
    # candidates past the fixed capacity are dropped — surface the count
    # so callers can flag saturation instead of losing packets silently
    n_dropped = jnp.maximum(
        jnp.sum(rising, axis=-1).astype(jnp.int32) - max_candidates, 0
    )
    return starts.astype(jnp.int32), valid, n_dropped
