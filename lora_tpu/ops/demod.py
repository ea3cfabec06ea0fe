"""Demodulation ops: detection metrics, symbol demod, fine sync.

Array-parity implementations of the reference's per-window DSP
(``lib/decoder_impl.cc``):

- :func:`preamble_autocorr`       <- ``detect_preamble_autocorr`` (:340-366)
- :func:`upchirp_sync_xcorr`      <- ``sliding_norm_cross_correlate_upchirp`` (:399-413)
- :func:`downchirp_pearson`       <- ``detect_downchirp`` / ``cross_correlate_ifreq`` (:283-298,385-390)
- :func:`max_frequency_gradient_idx` <- (:466-491), the default demod
- :func:`fft_shift_idx`           <- ``get_shift_fft`` (:430-464), FFT demod
- :func:`fine_sync_lag`           <- ``fine_sync`` (:300-338)
- :func:`symbol_energy`           <- ``determine_energy`` (:368-375)

Every function is batched over arbitrary leading dimensions and
dual-backend (``xp`` in {numpy, jax.numpy}); argmax tie-breaking follows the
reference's strict ``>`` scans (first maximum wins), which numpy/jax argmax
also implement.

Design note (TPU): the sliding correlations are expressed as matmuls over a
stack of lagged reference rows, which XLA maps onto the MXU; the per-symbol
loops of the reference become batched `[..., n_lags, window] @ [window]`
contractions.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .chirp import instantaneous_frequency


def preamble_autocorr(windows, sps: int, xp=np):
    """Normalized autocorrelation of two consecutive symbols.

    ``windows``: complex ``[..., 2*sps]``. Returns ``(autocorr, energy1,
    energy2)`` each ``[...]`` float32. ``energy1/2`` are *total* (not
    per-sample) energies as in the reference; the implicit-mode stop
    threshold is ``energy2 / 2`` and the SNR power-queue entry is
    ``energy1 / sps``.
    """
    c1 = windows[..., :sps]
    c2 = windows[..., sps : 2 * sps]
    # volk conjugate dot: sum(c1 * conj(c2))
    dot = xp.sum(c1 * xp.conj(c2), axis=-1)
    e1 = xp.sum(xp.real(c1) ** 2 + xp.imag(c1) ** 2, axis=-1)
    e2 = xp.sum(xp.real(c2) ** 2 + xp.imag(c2) ** 2, axis=-1)
    denom = xp.sqrt(e1 * e2)
    # zero-energy windows: the reference divides 0/0 -> NaN, which fails
    # its >= 0.90 test; an explicit 0 is behaviourally identical
    autocorr = xp.where(denom > 0, xp.abs(dot) / xp.where(denom > 0, denom, 1.0), 0.0)
    return autocorr.astype("float32"), e1.astype("float32"), e2.astype("float32")


def symbol_energy(window, xp=np):
    """Total |x|^2 over one symbol window (reference :368-375)."""
    return xp.sum(xp.real(window) ** 2 + xp.imag(window) ** 2, axis=-1).astype("float32")


def _sliding_dot(x, ref, n_offsets: int, xp=np, chunk: int = 512):
    """``out[..., i] = sum_k x[..., i+k] * ref[k]`` for i in [0, n_offsets).

    jnp path: the reference row is split into ``chunk``-tap pieces and
    the correlation becomes ONE depthwise (grouped) convolution with a
    ``chunk``-wide kernel plus a channel sum. A direct m-tap XLA conv
    carries the kernel width into compilation — at SF12 a 32k-tap conv
    whose *compile* dominated end-to-end time on the remote TPU
    toolchain (docs/perf/NOTES.md "tunnel compile pathology"); the
    chunked form compiles in seconds at every SF and lowers to the same
    dot products (summation order differs only at float ulp level).
    """
    m = len(ref)
    if xp is np:
        w = np.lib.stride_tricks.sliding_window_view(x, m, axis=-1)[..., :n_offsets, :]
        return w @ ref
    if m <= chunk:
        kernel = xp.asarray(ref[::-1].copy())
        flat = x.reshape((-1, x.shape[-1]))
        out = jax.vmap(lambda row: jnp.convolve(row, kernel, mode="valid"))(flat)
        return out[..., :n_offsets].reshape(x.shape[:-1] + (n_offsets,))
    nc = -(-m // chunk)
    refp = np.zeros(nc * chunk, ref.dtype)
    refp[:m] = ref
    lead = x.shape[:-1]
    # tail zero-pad so every chunk's window fits; zero taps contribute 0
    xpad = jnp.concatenate(
        [x, jnp.zeros(lead + (chunk,), x.dtype)], axis=-1)
    seg = n_offsets + chunk - 1
    rows = jnp.stack(
        [jax.lax.slice_in_dim(xpad, c * chunk, c * chunk + seg, axis=-1)
         for c in range(nc)], axis=-2)  # [..., nc, seg]
    lhs = rows.reshape((-1, nc, seg))
    # correlation (no kernel flip): conv output channel g =
    # corr(lhs channel g, refp chunk g)
    rhs = jnp.asarray(refp.reshape(nc, 1, chunk))
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        feature_group_count=nc,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [B, nc, n_offsets]
    return out.sum(axis=-2).reshape(lead + (n_offsets,))


def upchirp_sync_xcorr(windows2, upchirp_ifreq, sps: int, xp=np):
    """Sliding upchirp alignment search over a 2-symbol window.

    ``windows2``: complex ``[..., 2*sps]``. Returns ``(index, max_corr)``:
    the sample offset in ``[0, sps)`` maximising the (unnormalized) ifreq
    dot-product with the ideal upchirp over ``sps-1`` samples.
    """
    ifr = instantaneous_frequency(windows2, xp=xp)  # [..., 2*sps]
    ref = np.asarray(upchirp_ifreq[: sps - 1])
    corr = _sliding_dot(ifr, ref, sps, xp=xp)  # [..., sps]
    idx = xp.argmax(corr, axis=-1)
    return idx.astype("int32"), xp.max(corr, axis=-1).astype("float32")


def preamble_cfo(x2, sps: int, samp_rate: float, xp=np):
    """Carrier-frequency-offset estimate from two adjacent preamble symbols.

    ``x2``: complex ``[..., 2*sps]`` aligned at an upchirp boundary inside
    the preamble. A CFO of ``f`` rotates symbol ``k+1`` relative to symbol
    ``k`` by ``2*pi*f*sps/fs``, so ``angle(sum x[t+sps]*conj(x[t]))``
    recovers ``f`` exactly within the unambiguous range
    ``+-fs/(2*sps) = +-bw/(2*2^sf)`` — the *residual* CFO tracker for the
    post-channelization control loop (larger offsets are absorbed by the
    demod bin shift / channelizer retune, as in the reference, whose own
    estimator ``experimental_determine_cfo`` (lib/decoder_impl.cc:729-738)
    is a noisy single-sample probe with the same wrap). Feeds the
    ``("cfo", value)`` control path (lib/controller_impl.cc:52-57).
    """
    a = x2[..., :sps]
    b = x2[..., sps : 2 * sps]
    d = xp.sum(b * xp.conj(a), axis=-1)
    ang = xp.arctan2(xp.imag(d), xp.real(d))
    return (ang / (2.0 * np.pi * sps) * samp_rate).astype("float32")


def upchirp_sync_parab(windows2, fold_mat, sps: int, decim: int, xp=np):
    """Upchirp alignment from ONE fold-DFT matmul + parabolic interpolation.

    Same contract as :func:`upchirp_sync_coarse_fine` (``windows2``
    ``[..., 2*sps]`` starting inside a run of repeated upchirps; returns a
    sample offset of an upchirp boundary in ``[0, sps + 2*decim)``) but
    with no ifreq pass, no per-lane segment gather and no sliding search:
    the repeated preamble dechirps to ONE continuous tone (segments before
    and after the chirp boundary carry the same shift, and LoRa chirps
    close an integer cycle so the boundary is phase-continuous), so the
    tone's *fractional* bin — three folded magnitudes around the argmax,
    parabolic vertex — recovers the boundary to ~0.2 bin ≈ ``decim/5``
    samples. That beats the coarse ``decim/2`` quantization of
    :func:`upchirp_sync_coarse_fine`'s first stage and is within the fft
    demod's ``±decim/2`` alignment tolerance, which is the only consumer
    (the gradient engine keeps the exact ifreq search for its fine-sync
    feedback). Used by the dense fft engine's Phase B, where the ifreq
    refine was the single most expensive stage (see docs/perf/NOTES.md).
    """
    er, ei = fold_mat
    w = windows2[..., :sps]
    wr, wi = xp.real(w), xp.imag(w)
    fr = wr @ er - wi @ ei
    fi = wr @ ei + wi @ er
    m = fr * fr + fi * fi                      # [..., n_bins] folded power
    n = m.shape[-1]
    j = xp.argmax(m, axis=-1)
    m0 = xp.take_along_axis(m, j[..., None], axis=-1)[..., 0]
    ml = xp.take_along_axis(m, ((j - 1) % n)[..., None], axis=-1)[..., 0]
    mr = xp.take_along_axis(m, ((j + 1) % n)[..., None], axis=-1)[..., 0]
    denom = ml - 2.0 * m0 + mr
    p = xp.where(xp.abs(denom) > 1e-20, 0.5 * (ml - mr) / denom, 0.0)
    d0 = sps - (j.astype("float32") + p) * decim
    i0 = xp.clip(xp.round(d0), 0, sps + 2 * decim - 1).astype("int32")
    return i0, None


def chirp_coarse_cfo(up_window, sfd_window, upchirp, downchirp,
                     n_bins: int, sps: int, samp_rate: float, xp=np,
                     fold_down=None, fold_up=None):
    """Coarse full-range CFO via chirp CFO/STO separation.

    A carrier offset ``f`` and a timing offset ``tau`` shift the
    dechirped tone of an *up*chirp by ``f + tau*slope`` but of a
    *down*chirp by ``f - tau*slope`` — averaging the dechirped-tone bins
    of a preamble upchirp (dechirped with the ideal downchirp) and the
    SFD downchirp (dechirped with the ideal upchirp) cancels the timing
    term and recovers the integer-bin CFO component that the
    symbol-to-symbol phase estimator (:func:`preamble_cfo`, range
    ``+-fs/(2*sps)``) cannot see. Together they measure CFO over
    ``+-bw/4`` — enough to keep a drifting carrier centered in the
    channel filter, the purpose of the reference's controller loop.
    Works for both sync conventions (the ifreq correlation sync is
    CFO-invariant, ``tau ~= 0``; a dechirp-FFT sync absorbs the CFO
    into ``tau`` — the average is correct either way).

    ``fold_down``/``fold_up``: optional precomputed fold-DFT matrices
    (:func:`make_fold_dft` of the down/up chirp) — same folded-argmax
    result through one MXU matmul instead of an FFT + scatter-fold (the
    ``.at[].add`` straddle bin lowers to a per-lane scatter under vmap,
    measurably slow on the dense hot path).
    """
    if fold_down is not None and fold_up is not None:
        b_up = fft_shift_idx_mm(up_window, fold_down, xp=xp)
        b_dn = fft_shift_idx_mm(sfd_window, fold_up, xp=xp)
    else:
        b_up = fft_shift_idx(up_window, downchirp, n_bins, sps, xp=xp)
        b_dn = fft_shift_idx(sfd_window, upchirp, n_bins, sps, xp=xp)
    s_up = xp.where(b_up > n_bins // 2, b_up - n_bins, b_up)
    s_dn = xp.where(b_dn > n_bins // 2, b_dn - n_bins, b_dn)
    return ((s_up + s_dn).astype("float32") / 2.0) * (samp_rate / sps)


def combine_cfo(coarse_hz, frac_hz, sps: int, samp_rate: float, xp=np):
    """Merge :func:`sfd_coarse_cfo` (full range, half-bin resolution)
    with :func:`preamble_cfo` (one-bin range, fine resolution): the
    fractional estimate is exact modulo one bin, so snap the coarse
    estimate to the nearest consistent total."""
    bin_hz = samp_rate / sps
    n = xp.round((coarse_hz - frac_hz) / bin_hz)
    return (frac_hz + n * bin_hz).astype("float32")


def determine_cfo_dechirp(window, downchirp, samp_rate: float, xp=np):
    """Reference-parity CFO probe: dechirped ifreq sample at index 256
    scaled by ``fs/2pi`` (lib/decoder_impl.cc:729-738, unused publisher)."""
    mult = window * downchirp
    ifr = instantaneous_frequency(mult, xp=xp)
    idx = min(256, ifr.shape[-1] - 1)
    return (ifr[..., idx] / (2.0 * np.pi) * samp_rate).astype("float32")


def make_fold_dft(downchirp, sps: int, n_bins: int):
    """Dechirp+fold+DFT as one ``[sps, n_bins]`` complex matrix.

    :func:`fft_shift_idx` only ever uses ``n_bins`` (+ one straddle) of the
    ``sps`` FFT outputs, so the dechirp multiply, the DFT and the
    reference's bin fold (lib/decoder_impl.cc:443-456) collapse into a
    single matrix ``E`` with ``folded_spectrum(w) = w @ E`` — an MXU
    matmul instead of an FFT. Returns ``(Er, Ei)`` float32 planes.
    """
    k = np.arange(sps)
    h = (n_bins + 1) // 2
    cols = np.empty((sps, n_bins), np.complex128)
    for j in range(n_bins):
        b = j if j < h else sps - n_bins // 2 + (j - h)
        e = np.exp(-2j * np.pi * k * b / sps)
        if j == n_bins // 2:
            e = e + np.exp(-2j * np.pi * k * (n_bins // 2) / sps)
        cols[:, j] = e
    E = np.asarray(downchirp)[:, None] * cols
    return E.real.astype(np.float32), E.imag.astype(np.float32)


def fft_shift_idx_mm(windows, fold_mat, xp=np):
    """:func:`fft_shift_idx` via the precomputed fold-DFT matmul.

    ``windows``: complex ``[..., sps]`` (NOT yet dechirped — the matrix
    carries the downchirp). Returns int32 ``[...]`` bin indices.
    """
    er, ei = fold_mat
    wr, wi = xp.real(windows), xp.imag(windows)
    fr = wr @ er - wi @ ei
    fi = wr @ ei + wi @ er
    return xp.argmax(fr * fr + fi * fi, axis=-1).astype("int32")


def _parab_frac(m, xp=np):
    """Fractional peak offset of the argmax of ``m`` ``[..., n]`` via the
    three-point parabolic vertex, in (-0.5, 0.5) bins."""
    n = m.shape[-1]
    j = xp.argmax(m, axis=-1)
    m0 = xp.take_along_axis(m, j[..., None], axis=-1)[..., 0]
    ml = xp.take_along_axis(m, ((j - 1) % n)[..., None], axis=-1)[..., 0]
    mr = xp.take_along_axis(m, ((j + 1) % n)[..., None], axis=-1)[..., 0]
    denom = ml - 2.0 * m0 + mr
    return (
        j.astype("int32"),
        xp.where(xp.abs(denom) > 1e-20, 0.5 * (ml - mr) / denom, 0.0)
        .astype("float32"),
    )


def fft_shift_frac(windows, downchirp, n_bins: int, sps: int, xp=np,
                   fold_mat=None):
    """Dechirped-tone bin AND fractional offset per window.

    Returns ``(bin int32 [...], frac float32 [...])`` with ``frac`` in
    (-0.5, 0.5) bins. The fractional part of a symbol's tone position is
    data-independent (data shifts are whole bins) — it carries only the
    timing/CFO offset, so its symbol-to-symbol slope measures the sample
    clock drift the fft demod's static window grid cannot otherwise see
    (see DenseReceiver ``fft_drift_pass``).
    """
    if fold_mat is not None:
        er, ei = fold_mat
        wr, wi = xp.real(windows), xp.imag(windows)
        fr = wr @ er - wi @ ei
        fi = wr @ ei + wi @ er
        m = fr * fr + fi * fi
    else:
        m = dechirp_fft_mag(windows, downchirp, n_bins, sps, xp=xp)
    return _parab_frac(m, xp=xp)


def upchirp_sync_grad(windows2, upchirp_ifreq, sps: int, n_bins: int,
                      decim: int, xp=np):
    """CFO-invariant fast upchirp alignment for the GRADIENT engine.

    Same contract as :func:`upchirp_sync_xcorr` (``windows2``
    ``[..., 2*sps]`` inside a run of repeated upchirps) at
    O(sps + decim*sps) instead of the O(sps^2) sliding search — but
    unlike the dechirp-tone syncs (:func:`upchirp_sync_parab` /
    :func:`upchirp_sync_coarse_fine`), the coarse estimate is the ifreq
    WRAP position (via :func:`max_frequency_gradient_idx`), which a
    carrier offset cannot move (CFO adds a constant to the ifreq). This
    matters for pairing: a dechirp sync absorbs integer-bin CFO into
    timing, which the fft demod self-consistently cancels but the
    gradient demod — itself CFO-invariant — turns into a uniform bin
    error on every symbol. Gradient demod therefore needs a
    timing-true sync.

    A window whose wrap sits within half a bin of the window edge reads
    an unreliable gradient (the demod's tail trim), so the wrap is read
    from both the leading window and a half-symbol-shifted one — their
    boundaries differ by exactly ``sps/2``, and the estimate whose wrap
    bin is more central wins. A ±2*decim ifreq cross-correlation then
    recovers the exact offset the full search would have found.
    """
    w_a = windows2[..., :sps]
    w_b = windows2[..., sps // 2 : sps // 2 + sps]
    b_a = max_frequency_gradient_idx(w_a, n_bins, decim, xp=xp)
    b_b = max_frequency_gradient_idx(w_b, n_bins, decim, xp=xp)
    d_a = (sps - (b_a + 1) * decim) % sps
    d_b = (sps - (b_b + 1) * decim + sps // 2) % sps
    cent_a = xp.minimum(b_a + 1, n_bins - 1 - b_a)
    cent_b = xp.minimum(b_b + 1, n_bins - 1 - b_b)
    d0 = xp.where(cent_a >= cent_b, d_a, d_b).astype("int32")

    span = 4 * decim + 1
    ref = xp.asarray(np.asarray(upchirp_ifreq[: sps - 1]))
    ifr = instantaneous_frequency(windows2, xp=xp)  # [..., 2*sps]
    base0 = xp.clip(d0 - 2 * decim, 0, 2 * sps - (span + sps - 2))
    if xp is np:
        base0 = np.atleast_1d(base0)
        ifr2 = ifr.reshape((-1, ifr.shape[-1]))
        outs = []
        for row, bs in zip(ifr2, base0.reshape(-1)):
            seg = row[bs : bs + span + sps - 2]
            wins = np.lib.stride_tricks.sliding_window_view(seg, sps - 1)[:span]
            outs.append(bs + np.argmax(wins @ ref))
        idx = np.asarray(outs, dtype=np.int32).reshape(b_a.shape)
        return idx, None
    flat = ifr.reshape((-1, ifr.shape[-1]))
    bflat = jnp.asarray(base0).reshape(-1)
    seg_len = span + sps - 2
    segs = jax.vmap(
        lambda row, bs: jax.lax.dynamic_slice(row, (bs,), (seg_len,))
    )(flat, bflat)
    rows = jnp.stack(
        [jax.lax.slice_in_dim(segs, l, l + sps - 1, axis=-1)
         for l in range(span)], axis=1,
    )
    c = rows @ ref.astype(segs.dtype)
    idx = (bflat + jnp.argmax(c, axis=-1)).astype(jnp.int32).reshape(b_a.shape)
    return idx, None


def upchirp_sync_coarse_fine(windows2, downchirp, upchirp_ifreq, sps: int,
                             n_bins: int, decim: int, xp=np, fold_mat=None):
    """Fast upchirp alignment: dechirp-FFT coarse + small ifreq refine.

    Same contract as :func:`upchirp_sync_xcorr` (``windows2``
    ``[..., 2*sps]`` starting inside a run of repeated upchirps; returns
    the sample offset of an upchirp boundary) but O(sps log sps +
    decim*sps) instead of the O(sps^2) sliding search.

    A window beginning ``d`` samples after a chirp boundary dechirps to a
    tone at folded bin ``b`` with ``sps - b*decim ~= boundary`` (to within
    ``decim/2`` + leakage); a +-2*decim ifreq cross-correlation then
    recovers the exact offset the full search would have found. The
    returned offset lies in ``[0, sps + 2*decim)`` — an offset past
    ``sps`` simply syncs one preamble symbol later, which the SFD search
    budget absorbs.
    """
    if fold_mat is not None:
        b = fft_shift_idx_mm(windows2[..., :sps], fold_mat, xp=xp)
    else:
        b = fft_shift_idx(windows2[..., :sps], downchirp, n_bins, sps, xp=xp)
    d0 = sps - b.astype("int32") * decim  # in [decim, sps]
    span = 4 * decim + 1
    ref = xp.asarray(np.asarray(upchirp_ifreq[: sps - 1]))
    ifr = instantaneous_frequency(windows2, xp=xp)  # [..., 2*sps]
    base0 = xp.clip(d0 - 2 * decim, 0, 2 * sps - (span + sps - 2))

    if xp is np:
        base0 = np.atleast_1d(base0)
        ifr2 = ifr.reshape((-1, ifr.shape[-1]))
        outs = []
        for row, bs in zip(ifr2, base0.reshape(-1)):
            seg = row[bs : bs + span + sps - 2]
            wins = np.lib.stride_tricks.sliding_window_view(seg, sps - 1)[:span]
            c = wins @ ref
            outs.append(bs + np.argmax(c))
        idx = np.asarray(outs, dtype=np.int32).reshape(b.shape)
        return idx, None

    import jax

    flat = ifr.reshape((-1, ifr.shape[-1]))
    bflat = jnp.asarray(base0).reshape(-1)
    seg_len = span + sps - 2
    segs = jax.vmap(
        lambda row, bs: jax.lax.dynamic_slice(row, (bs,), (seg_len,))
    )(flat, bflat)  # [B, seg_len]
    # all `span` lag dots at once: statically-unrolled lag rows + one
    # [B, span, sps-1] x [sps-1] contraction. (An earlier
    # conv_general_dilated formulation carried an (sps-1)-tap kernel,
    # whose XLA convolution compilation dominated large-SF build times
    # on the remote toolchain — same pathology as fine_sync_lag.)
    rows = jnp.stack(
        [jax.lax.slice_in_dim(segs, l, l + sps - 1, axis=-1)
         for l in range(span)], axis=1,
    )  # [B, span, sps-1]
    c = rows @ ref.astype(segs.dtype)  # [B, span]
    idx = (bflat + jnp.argmax(c, axis=-1)).astype(jnp.int32).reshape(b.shape)
    return idx, None


def downchirp_pearson(window, downchirp_ifreq, sps: int, xp=np):
    """Normalized Pearson correlation with the ideal downchirp ifreq.

    ``window``: complex ``[..., sps]``. Correlation computed over the first
    ``sps-1`` ifreq samples exactly as reference ``cross_correlate_ifreq``
    with ``to_idx = sps-1`` (biased stddevs, divide by sd then by to_idx).
    """
    n = sps - 1
    x = instantaneous_frequency(window, xp=xp)[..., :n]
    y = downchirp_ifreq[:n]
    # single-pass moment form (algebraically identical to the reference's
    # centered two-pass): sum((x-mx)(y-my)) = x . (y-my) since the
    # centered reference sums to zero, and var(x) = E[x^2] - mx^2 — three
    # fused reductions over x instead of materialised centered broadcasts
    # (the SFD walk evaluates this per lane per window on the hot path;
    # the y statistics are compile-time constants there)
    yc = y - xp.mean(y)
    sy = xp.sqrt(xp.mean(yc * yc))
    mx = xp.sum(x, axis=-1) / n
    ex2 = xp.sum(x * x, axis=-1) / n
    var = xp.maximum(ex2 - mx * mx, 0.0)
    sx = xp.sqrt(var)
    num = x @ yc.astype(x.dtype)
    # A zero-variance window (e.g. all-zero padding) makes the reference
    # compute NaN, which fails both the >0.96 and <-0.97 threshold tests;
    # 0.0 fails them identically without the NaN propagating.
    denom = sx * sy
    c = xp.where(denom > 0, num / xp.where(denom > 0, denom, 1.0), 0.0)
    return (c / n).astype("float32")


def make_likeness_rows(upchirp_ifreq_tiled, sps: int, decim: int,
                       n_bins: int):
    """Precompute the centered/normalized reference rows of
    :func:`upchirp_likeness` for every possible bin — turns the
    per-window dynamic table slice into a one-hot MXU matmul (the
    vmapped small-slice gather was a measured Phase B hotspot on TPU).

    Returns ``(rows_c, inv_norm)``: ``[n_bins, sps-1]`` centered rows and
    their inverse norms. Size gate lives with the caller (``n_bins *
    sps`` floats — same budget class as the fold-DFT matrix).
    """
    n = sps - 1
    t = np.asarray(upchirp_ifreq_tiled)
    idx = ((np.arange(n_bins)[:, None] + 1) * decim + sps
           + np.arange(n)[None, :])
    rows = t[idx]
    rows_c = rows - rows.mean(axis=-1, keepdims=True)
    norm = np.sqrt((rows_c * rows_c).sum(axis=-1))
    inv = np.where(norm > 0, 1.0 / np.where(norm > 0, norm, 1.0), 0.0)
    return rows_c.astype(np.float32), inv.astype(np.float32)


def upchirp_likeness_rows(window, bin_idx, rows, xp=np):
    """:func:`upchirp_likeness` via precomputed rows (see
    :func:`make_likeness_rows`). ``bin_idx`` int ``[...]`` selects each
    window's reference row through a one-hot matmul — batched windows
    cost one ``[B, n_bins] @ [n_bins, n]`` MXU contraction instead of B
    serialized table gathers."""
    rows_c, inv = rows
    n_bins, n = rows_c.shape
    ifr = instantaneous_frequency(window, xp=xp)[..., :n]
    b = xp.asarray(bin_idx) % n_bins
    if xp is np:
        ref = rows_c[np.asarray(b)]
        ref_inv = inv[np.asarray(b)]
    else:
        onehot = (b[..., None] == xp.arange(n_bins)).astype(xp.float32)
        ref = onehot @ xp.asarray(rows_c)
        ref_inv = onehot @ xp.asarray(inv)
    x = ifr - xp.mean(ifr, axis=-1, keepdims=True)
    num = xp.sum(x * ref, axis=-1)
    xn = xp.sqrt(xp.sum(x * x, axis=-1))
    c = xp.where(xn > 0, num * ref_inv / xp.where(xn > 0, xn, 1.0), 0.0)
    return c.astype("float32")


def upchirp_likeness(window, bin_idx, upchirp_ifreq_tiled, sps: int,
                     decim: int, xp=np):
    """Pearson of ``ifreq(window)`` against the ideal upchirp ifreq at the
    demodulated bin's own lag — evidence that a window contains a genuine
    (possibly shifted) upchirp at all.

    ``bin_idx`` follows the *gradient* demod convention (a window reading
    gradient bin ``b`` matches the tiled table at offset ``(b+1)*decim``,
    the same row :func:`fine_sync_lag` correlates against). Any true
    upchirp — plain preamble or a sync-word symbol shifted by an arbitrary
    number of bins — scores ~1.0 (>= 0.7 at 10 dB SNR), while noise scores
    ~0 (|c| < 0.05 measured): the separation the raw downchirp Pearson
    cannot provide (a half-rotation SF7 sync symbol reads +0.12, inside
    the noise band). CFO-invariant: a carrier offset adds a constant to
    the ifreq, which Pearson's centering removes. Gates the FIND_SFD
    sync-word recognition so noise windows keep spending correlation-fail
    budget (they would otherwise consume the 2-window recognition
    allowance and delay the corr_fails -> DETECT retry).
    """
    n = sps - 1
    ifr = instantaneous_frequency(window, xp=xp)[..., :n]
    base = (xp.asarray(bin_idx) + 1) * decim + sps
    if xp is np:
        idx = np.asarray(base)[..., None] + np.arange(n)
        ref = np.take(np.asarray(upchirp_ifreq_tiled), idx, axis=-1)
    else:
        table = xp.asarray(np.asarray(upchirp_ifreq_tiled))
        bflat = base.reshape(-1)
        ref = jax.vmap(
            lambda b: jax.lax.dynamic_slice(table, (b,), (n,))
        )(bflat).reshape(base.shape + (n,))
    x = ifr - xp.mean(ifr, axis=-1, keepdims=True)
    y = ref - xp.mean(ref, axis=-1, keepdims=True)
    num = xp.sum(x * y, axis=-1)
    den = xp.sqrt(xp.sum(x * x, axis=-1) * xp.sum(y * y, axis=-1))
    c = xp.where(den > 0, num / xp.where(den > 0, den, 1.0), 0.0)
    return c.astype("float32")


SYNC_LIKENESS_MIN = 0.35  # >= 10-sigma above the noise band, half the
                          # 10 dB-SNR sync-symbol score (see upchirp_likeness)


def max_frequency_gradient_idx(window, n_bins: int, decim: int, xp=np):
    """Default demod: largest negative ifreq gradient between adjacent bins.

    ``window``: complex ``[..., sps]`` -> int32 bin index ``[...]``.

    Parity notes (reference :466-491): gradient threshold 0.1; scan starts
    at bin 1; the stored index is ``i+1``; result is
    ``(N - max_index) % N`` with ``max_index = 0`` when no gradient exceeds
    the threshold.

    Deliberate robustness deviation: the final ``decim//2`` phase-diff
    samples (and the duplicate, see :func:`instantaneous_frequency`) are
    excluded from the LAST bin's average. On a symbol-aligned-or-late
    window the channel filter's transition into the next symbol
    contaminates the tail diffs with a pi-wrap glitch, whose last-bin
    gradient can exceed the true in-window wrap (observed at SF11:
    spurious 0.97 vs true 0.62), misreading the symbol as bin 0. Every
    true wrap sits at or left of the last bin's left boundary
    (``wrap = sps - s*decim <= (N-1)*decim``), so trimming the bin's tail
    never hides a genuine jump — in particular bin-0 symbols (wrap exactly
    at that boundary) still read 0 through the last gradient. The
    reference averages all samples but its sliding-xcorr sync lands a
    sample early in practice, masking the edge. The half-bin trim width
    matches the demod's intrinsic alignment tolerance: a window late by
    ``d <= decim/2`` samples (the steady state when tracking a fast
    transmitter clock at crystal-tolerance drift, where the blind
    2.25-symbol SFD consume accumulates ~2-3 samples at SF12/30 ppm)
    keeps its glitch inside the trimmed region instead of poisoning the
    argmax. No trim at ``decim <= 2`` (the last bin would be empty; auto
    engine selection avoids the gradient method below decim 4 anyway).
    """
    ifr = instantaneous_frequency(window, xp=xp)
    use = ifr[..., : n_bins * decim].reshape(ifr.shape[:-1] + (n_bins, decim))
    sums = use.sum(axis=-1)
    trim = max(decim // 2, 2) if decim > 2 else 0
    if trim:
        tail = use[..., -1, decim - trim :].sum(axis=-1)
        last = (sums[..., -1] - tail) / (decim - trim)
        avg = xp.concatenate(
            [sums[..., :-1] / decim, last[..., None]], axis=-1
        )
    else:
        avg = sums / decim
    grad = avg[..., :-1] - avg[..., 1:]  # grad[i-1] = avg[i-1] - avg[i], i = 1..N-1
    best = xp.argmax(grad, axis=-1)  # first max wins, matches strict > scan
    found = xp.take_along_axis(grad, best[..., None], axis=-1)[..., 0] > 0.1
    max_index = xp.where(found, best + 2, 0)  # reference stores i+1, i = best+1
    return ((n_bins - max_index) % n_bins).astype("int32")


def fft_shift_idx(window, downchirp, n_bins: int, sps: int, xp=np):
    """FFT demod: dechirp, FFT, fold to ``n_bins``, argmax magnitude.

    Parity with reference ``get_shift_fft`` (:430-464): the fold copies
    ``fft[0:(N+1)//2]`` and ``fft[sps-N//2:]`` and adds ``fft[N//2]`` into
    bin ``N//2``.

    NOTE: on clean signals this returns ``gradient_idx + 1`` — the two
    methods use different bin conventions in the reference too (the decoder
    default is the gradient method; see module docs of ``lora_tpu.tx``).
    """
    mult = window * downchirp
    f = xp.fft.fft(mult, axis=-1)
    n_half_hi = (n_bins + 1) // 2
    lo = f[..., :n_half_hi]
    hi = f[..., sps - n_bins // 2 :]
    folded = xp.concatenate([lo, hi], axis=-1)
    # add the straddling bin (reference d_tmp[N/2] += d_fft[N/2])
    corr = xp.zeros(folded.shape, dtype=folded.dtype)
    if xp is np:
        corr[..., n_bins // 2] = f[..., n_bins // 2]
        folded = folded + corr
    else:
        folded = folded.at[..., n_bins // 2].add(f[..., n_bins // 2])
    return xp.argmax(xp.abs(folded), axis=-1).astype("int32")


def dechirp_fft_mag(windows, downchirp, n_bins: int, sps: int, xp=np):
    """Batched dechirp FFT magnitudes ``[..., n_bins]`` (throughput path).

    Same fold as :func:`fft_shift_idx` but returns the folded magnitude
    spectrum for downstream peak detection / soft demod.
    """
    mult = windows * downchirp
    f = xp.fft.fft(mult, axis=-1)
    n_half_hi = (n_bins + 1) // 2
    folded = xp.concatenate([f[..., :n_half_hi], f[..., sps - n_bins // 2 :]], axis=-1)
    if xp is np:
        folded[..., n_bins // 2] += f[..., n_bins // 2]
    else:
        folded = folded.at[..., n_bins // 2].add(f[..., n_bins // 2])
    return xp.abs(folded)


def fine_sync_search_space(decim: int) -> int:
    """Per-symbol drift-search budget for :func:`fine_sync_lag`.

    Reference parity: ``max(decim/4, 2)`` (lib/decoder_impl.cc:502), lags
    up to ±1 at the canonical decimation 8. Wider searches were measured
    to HURT: over a 255-byte packet (~600 symbols) a ±4 search eventually
    wins a wrong large lag (the late-by-``decim``/bin+1 ambiguity — a
    window late by one full bin demodulates as the next bin with equal
    correlation), corrupting full-rate payloads even at 40 dB SNR. The
    drift catch-up problem this was meant to solve lives in the blind
    2.25-symbol SFD handoff instead, fixed by the drift-rate feed-forward
    (see GoldenReceiver PAUSE); with that in place, per-symbol slip at
    crystal-tolerance clock offsets is < 1 sample and ±1 tracking is
    sufficient and stable.
    """
    return max(decim // 4, 2)


def fine_sync_lag(window, bin_idx, upchirp_ifreq_tiled, sps: int, decim: int,
                  search_space: int, xp=np):
    """Clock-drift lag search (reference ``fine_sync`` :300-338).

    ``window``: complex ``[..., sps]``; ``bin_idx``: int ``[...]``.
    Returns ``d_fine_sync = -lag`` (int32) where ``lag`` maximises the ifreq
    dot-product against the 3x-tiled ideal upchirp at
    ``shift_ref = (bin_idx+1)*decim`` over lags ``(-search_space,
    search_space)`` (exclusive), strict ``>`` with zero init (lag stays 0
    when all correlations are <= 0).
    """
    ifr = instantaneous_frequency(window, xp=xp)  # [..., sps]
    lags = np.arange(-search_space + 1, search_space)  # static
    n_lags = len(lags)
    base = (xp.asarray(bin_idx) + 1) * decim + sps  # [...]
    if xp is np:
        # Reference row for lag l: tiled[shift_ref + l + sps : + sps]
        offs = lags[:, None] + np.arange(sps)[None, :]  # [n_lags, sps]
        idx = np.asarray(base)[..., None, None] + offs
        refs = np.take(upchirp_ifreq_tiled, idx, axis=-1)
        corr = np.einsum("...s,...ls->...l", ifr, refs)
    else:
        # corr[l] = sum_k ifr[k] * tiled[base + lags[l] + k]: slice the
        # table section once per lane, then one [n_lags, sps] @ [sps]
        # matmul over statically-unrolled lag rows. An earlier
        # jnp.convolve formulation (kernel size = sps) made XLA compile a
        # full-size convolution — at SF12 a 32768-tap conv whose
        # compilation dominated dense-engine build times on the remote
        # toolchain; the unrolled slices + dot compile in seconds and
        # lower to the same dot products.
        table = xp.asarray(np.asarray(upchirp_ifreq_tiled))
        sec_len = sps + n_lags - 1

        def one(b, f):
            section = jax.lax.dynamic_slice(table, (b + lags[0],), (sec_len,))
            rows = jnp.stack(
                [jax.lax.dynamic_slice(section, (l,), (sps,))
                 for l in range(n_lags)]
            )  # [n_lags, sps]
            return rows @ f

        bflat = base.reshape(-1)
        fflat = ifr.reshape(-1, sps)
        corr = jax.vmap(one)(bflat, fflat).reshape(base.shape + (n_lags,))
    best = xp.argmax(corr, axis=-1)
    pos = xp.take_along_axis(corr, best[..., None], axis=-1)[..., 0] > 0.0
    lag = xp.where(pos, xp.asarray(lags)[best], 0)
    return (-lag).astype("int32")
