"""Pallas TPU kernels for the hot dense-detection path.

The preamble autocorrelation metric (reference ``detect_preamble_autocorr``,
lib/decoder_impl.cc:340-366, evaluated per-window; here dense over all
windows) is pure streaming arithmetic: for every symbol-stride window
``k`` it needs one conj-dot between adjacent windows and per-window
energies. XLA's fusion still materialises large temporaries (~6 ms for a
33M-sample block); this kernel computes everything in one pass over VMEM
tiles — each input element is read once from HBM.

Layout: packed float32 IQ ``[C, 2, L]`` is viewed as ``[C, 2, K1, sps]``
(K1 = L//sps window rows). Grid = (C, K1//T); each program loads a
``[2, T, sps]`` tile plus the next tile's first row, computes T window
dots/energies on the VPU, and writes ``[T]`` outputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _det_kernel(a_ref, b_ref, corr_ref, ener_ref):
    r = a_ref[0, 0, :, :]    # [T, sps]
    im = a_ref[0, 1, :, :]
    rn = jnp.concatenate([r[1:], b_ref[0, 0, 0:1, :]], axis=0)
    imn = jnp.concatenate([im[1:], b_ref[0, 1, 0:1, :]], axis=0)
    dot_re = jnp.sum(r * rn + im * imn, axis=1)
    dot_im = jnp.sum(im * rn - r * imn, axis=1)
    e = jnp.sum(r * r + im * im, axis=1)
    # NOTE: recomputing the shifted-row energies is intentional — deriving
    # them by shifting `e` (concat of reduced vectors) trips a Mosaic
    # layout-inference crash; the extra [T, sps] squares are VPU-cheap.
    en = jnp.sum(rn * rn + imn * imn, axis=1)
    denom = jnp.sqrt(e * en)
    mag = jnp.sqrt(dot_re * dot_re + dot_im * dot_im)
    corr_ref[0, 0, 0, :] = jnp.where(denom > 0, mag / jnp.where(denom > 0, denom, 1.0), 0.0)
    ener_ref[0, 0, 0, :] = e


@functools.partial(jax.jit, static_argnums=(1, 2))
def _det_call(xr, T: int, interpret: bool):
    C, _, K1, sps = xr.shape
    nb = K1 // T
    grid = (C, nb)
    kernel = pl.pallas_call(
        _det_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 2, T, sps), lambda c, i: (c, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            # first row of the next tile (clamped at the last tile) for the
            # tile-crossing window; loaded as an 8-row block to satisfy the
            # (8, 128) f32 tiling constraint
            pl.BlockSpec(
                (1, 2, 8, sps),
                lambda c, i: (c, 0, jnp.minimum((i + 1) * T // 8, K1 // 8 - 1), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            # [C, nb, 1, T] keeps the block's trailing dims equal to the
            # array's trailing dims (Mosaic tiling constraint); reshaped
            # to [C, K1] by the caller
            pl.BlockSpec((1, 1, 1, T), lambda c, i: (c, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, T), lambda c, i: (c, i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, nb, 1, T), jnp.float32),
            jax.ShapeDtypeStruct((C, nb, 1, T), jnp.float32),
        ],
        interpret=interpret,
    )
    corr, ener = kernel(xr, xr)
    return corr.reshape(C, K1), ener.reshape(C, K1)


def _det_kernel_pp(r_ref, i_ref, rn_ref, in_ref, corr_ref, ener_ref):
    # loads may be bf16 (half the HBM traffic); accumulate in f32
    r = r_ref[0, :, :].astype(jnp.float32)       # [T, sps]
    im = i_ref[0, :, :].astype(jnp.float32)
    rn = jnp.concatenate([r[1:], rn_ref[0, 0:1, :].astype(jnp.float32)], axis=0)
    imn = jnp.concatenate([im[1:], in_ref[0, 0:1, :].astype(jnp.float32)], axis=0)
    dot_re = jnp.sum(r * rn + im * imn, axis=1)
    dot_im = jnp.sum(im * rn - r * imn, axis=1)
    e = jnp.sum(r * r + im * im, axis=1)
    en = jnp.sum(rn * rn + imn * imn, axis=1)
    denom = jnp.sqrt(e * en)
    mag = jnp.sqrt(dot_re * dot_re + dot_im * dot_im)
    corr_ref[0, 0, 0, :] = jnp.where(denom > 0, mag / jnp.where(denom > 0, denom, 1.0), 0.0)
    ener_ref[0, 0, 0, :] = e


@functools.partial(jax.jit, static_argnums=(1, 2))
def _det_call_pp(xr, T: int, interpret: bool):
    """Per-plane-block variant: each input block is ONE fully contiguous
    ``[T, sps]`` chunk of a plane row (vs the two-chunk ``[2, T, sps]``
    blocks of ``_det_call``), which reaches the measured contiguous-DMA
    bandwidth tier (docs/perf/NOTES.md: 230 GB/s vs 140 GB/s). Accepts
    float32 or bfloat16 planes (bf16 halves the HBM traffic; the kernel
    accumulates in f32 either way)."""
    C, _, K1, sps = xr.shape
    nb = K1 // T
    grid = (C, nb)
    x3 = xr.reshape(C * 2, K1, sps)  # layout-preserving (K1, T mult. of rows)
    rows = 16 if xr.dtype == jnp.bfloat16 else 8  # (rows, 128) tiling
    kernel = pl.pallas_call(
        _det_kernel_pp,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, sps), lambda c, i: (2 * c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, sps), lambda c, i: (2 * c + 1, i, 0),
                         memory_space=pltpu.VMEM),
            # first row of the next chunk (clamped at the last) for the
            # chunk-crossing window; `rows`-row block for the dtype tiling
            pl.BlockSpec(
                (1, rows, sps),
                lambda c, i: (2 * c, jnp.minimum((i + 1) * T // rows, K1 // rows - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rows, sps),
                lambda c, i: (2 * c + 1, jnp.minimum((i + 1) * T // rows, K1 // rows - 1), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, T), lambda c, i: (c, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, T), lambda c, i: (c, i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, nb, 1, T), jnp.float32),
            jax.ShapeDtypeStruct((C, nb, 1, T), jnp.float32),
        ],
        interpret=interpret,
    )
    corr, ener = kernel(x3, x3, x3, x3)
    return corr.reshape(C, K1), ener.reshape(C, K1)


def _lag_rows_kernel(r_ref, i_ref, rh_ref, ih_ref, out_ref, *, lags):
    """Fine-row energies + lag products for every lag in one VMEM pass.

    ``r_ref``/``i_ref``: ``[1, T, sps]`` plane rows; ``rh_ref``/
    ``ih_ref``: ``[1, H, sps]`` halo rows following the tile
    (H >= max(lags), clamped at the last tile — the poisoned tail rows
    are recomputed by the caller). Output ``[1, 1, S, T]`` with
    ``S = 1 + 2*len(lags)``: row 0 = energies, rows ``1+2s``/``2+2s``
    = lag ``lags[s]``'s dot re/im. Each input element is read ONCE
    from HBM for ALL lags — the multi-SF gateway's detection substrate
    (vs one :func:`detection_metrics_pallas` pass per SF)."""
    r = r_ref[0].astype(jnp.float32)       # [T, sps]
    im = i_ref[0].astype(jnp.float32)
    T = r.shape[0]
    fr = jnp.concatenate([r, rh_ref[0].astype(jnp.float32)], axis=0)
    fi = jnp.concatenate([im, ih_ref[0].astype(jnp.float32)], axis=0)
    out_ref[0, 0, 0, :] = jnp.sum(r * r + im * im, axis=1)
    for s, l in enumerate(lags):
        rl = fr[l : l + T]
        il = fi[l : l + T]
        out_ref[0, 0, 1 + 2 * s, :] = jnp.sum(r * rl + im * il, axis=1)
        out_ref[0, 0, 2 + 2 * s, :] = jnp.sum(im * rl - r * il, axis=1)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _lag_rows_call(xr, lags: tuple, T: int, H: int, interpret: bool):
    C, _, Rk, sps = xr.shape
    nb = Rk // T
    S = 1 + 2 * len(lags)
    x3 = xr.reshape(C * 2, Rk, sps)
    kernel = pl.pallas_call(
        functools.partial(_lag_rows_kernel, lags=lags),
        grid=(C, nb),
        in_specs=[
            pl.BlockSpec((1, T, sps), lambda c, i: (2 * c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, sps), lambda c, i: (2 * c + 1, i, 0),
                         memory_space=pltpu.VMEM),
            # H rows following the tile (clamped at the last tile; the
            # caller recomputes the affected tail rows)
            pl.BlockSpec(
                (1, H, sps),
                lambda c, i: (2 * c, jnp.minimum((i + 1) * T // H,
                                                 Rk // H - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, H, sps),
                lambda c, i: (2 * c + 1, jnp.minimum((i + 1) * T // H,
                                                     Rk // H - 1), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, 1, S, T), lambda c, i: (c, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, nb, S, T), jnp.float32),
        interpret=interpret,
    )
    out = kernel(x3, x3, x3, x3)            # [C, nb, S, T]
    return out.transpose(0, 2, 1, 3).reshape(C, S, nb * T)


def lag_rows_pallas(xf, sps_min: int, lags, interpret: bool = False):
    """Single-pass fine-row lag substrate on packed IQ ``[..., 2, L]``.

    Returns ``(e, {lag: (q_re, q_im)})`` with the
    :func:`lora_tpu.rx.frontend.lag_rows_planes` contract (all arrays
    ``[..., R]``, R = L // sps_min; q rows past ``R - lag`` are
    unspecified — the per-SF window aggregation never reads them).
    ``None`` when the geometry can't tile (caller falls back to the
    XLA planes math).
    """
    lags = tuple(sorted(set(int(l) for l in lags)))
    lead = xf.shape[:-2]
    L = xf.shape[-1]
    R = L // sps_min
    if sps_min % 128 != 0 or not lags or lags[0] < 1:
        return None
    # halo granularity: >= max lag, multiple of the dtype row tiling,
    # and a divisor requirement T % H == 0 for block-aligned halo starts
    rows = 16 if xf.dtype == jnp.bfloat16 else 8
    H = max(rows, -(-max(lags) // rows) * rows)
    if H > 256:
        return None
    # VMEM: 2 double-buffered [T, sps] blocks + 2 [H, sps] halos +
    # ~8 in-kernel [T(+H), sps] f32 temporaries (concats, lag products)
    budget = 12 * 1024 * 1024
    t_max = (budget - 16 * H * sps_min) // (4 * sps_min * 14)
    for T in (256, 128, 64, 32, 16):
        if T <= t_max and T % H == 0 and (R // T) > 0:
            break
    else:
        return None
    Rk = (R // T) * T
    C = int(np.prod(lead)) if lead else 1
    xb = xf[..., : Rk * sps_min].reshape(C, 2, Rk, sps_min)
    out = _lag_rows_call(xb, lags, T, H, interpret)  # [C, S, Rk]
    # rows [Rt, R): the last tile's clamped halo poisons q there, and
    # rows past Rk were never computed — recompute via the XLA planes
    # math on a small tail slice (global row r == slice row r - Rt).
    # The no-tail fast path needs the kernel to have covered EVERY row
    # (Rk == R): a single-tile kernel (Rt == 0) under a ragged row
    # count must still take the tail branch, whose empty kernel prefix
    # concatenates cleanly with the full planes-math recompute.
    Rt = max(Rk - H, 0)
    if Rt == 0 and Rk == R:
        e = out[:, 0, :R]
        qs = {l: (out[:, 1 + 2 * s, :R], out[:, 2 + 2 * s, :R])
              for s, l in enumerate(lags)}
    else:
        from ..rx.frontend import lag_rows_planes

        tail = xf[..., Rt * sps_min :].reshape(C, 2, -1)
        e_t, qs_t = lag_rows_planes(tail, sps_min, lags)
        e = jnp.concatenate([out[:, 0, :Rt], e_t], axis=-1)
        qs = {
            l: (jnp.concatenate([out[:, 1 + 2 * s, :Rt], qs_t[l][0]], axis=-1),
                jnp.concatenate([out[:, 2 + 2 * s, :Rt], qs_t[l][1]], axis=-1))
            for s, l in enumerate(lags)
        }
    e = e.reshape(lead + (R,))
    qs = {l: (qr.reshape(lead + (R,)), qi.reshape(lead + (R,)))
          for l, (qr, qi) in qs.items()}
    return e, qs


def _pfb_fir_kernel(x_ref, halo_ref, taps_ref, out_ref):
    """Polyphase FIR along the frame axis of one plane tile.

    ``x_ref``: ``[1, T, Mt]`` input rows; ``halo_ref``: ``[1, H, Mt]``
    rows following the tile (H >= K-1, clamped at the array end);
    ``taps_ref``: ``[K, Mt]`` per-branch taps. Output row ``t`` is
    ``sum_j taps[j] * rows[t + j]`` — the K-tap sliding dot of every
    polyphase branch, each input element read ONCE from HBM (the jnp
    formulation re-reads the input K times; reference channelizer:
    lib/channelizer_impl.cc:46-48, redesigned as a critically-sampled
    PFB over all M channels)."""
    K = taps_ref.shape[0]
    x = x_ref[0].astype(jnp.float32)          # [T, Mt]
    halo = halo_ref[0].astype(jnp.float32)    # [H, Mt]
    T = x.shape[0]
    rows = jnp.concatenate([x, halo[: K - 1]], axis=0)  # [T+K-1, Mt]
    acc = jnp.zeros_like(x)
    for j in range(K):
        acc = acc + taps_ref[j, :][None, :] * rows[j : j + T]
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _pfb_fir_call(x3, taps, T: int, out_dtype, interpret: bool):
    P, n_vec, M = x3.shape  # P = 2 planes
    K = taps.shape[0]
    nb = n_vec // T  # blocks of output rows (callers trim the tail)
    H = 16  # halo rows (>= K-1, multiple of the 8/16-row tiling)
    grid = (P, nb)
    kernel = pl.pallas_call(
        _pfb_fir_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, M), lambda p, i: (p, i, 0),
                         memory_space=pltpu.VMEM),
            # following rows for the tile-crossing taps; block-index
            # granularity H, clamped at the last block
            pl.BlockSpec(
                (1, H, M),
                lambda p, i: (p, jnp.minimum((i + 1) * T // H,
                                             n_vec // H - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((K, M), lambda p, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, M), lambda p, i: (p, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, nb * T, M), out_dtype),
        interpret=interpret,
    )
    return kernel(x3, x3, taps)


def pfb_fir_pallas(xf, h_poly, out_dtype=jnp.float32, interpret: bool = False):
    """Polyphase-branch FIR over packed wideband planes.

    ``xf``: packed IQ float32 ``[2, L]`` (L a multiple of ``M``), viewed
    as ``[2, n_vec, M]`` without any copy; ``h_poly``: ``[K, M]`` branch
    taps. Returns filtered planes ``[2, n_out, M]`` (``n_out = n_vec -
    K + 1``) in ``out_dtype`` — bf16 halves the bandwidth of every
    downstream pass (DFT matmul, detection, Phase B gathers).

    Single HBM pass vs the jnp shifted-slice formulation's K reads. The
    kernel covers the largest 16-row-aligned prefix; the <= 15 + K - 1
    remainder output rows past it are computed with the jnp math on a
    small tail slice, so misaligned block lengths (the sharded /
    streaming halo geometries) still take the fast path. Falls back to
    ``None`` (caller uses the jnp path) only when the geometry can't
    tile at all (M not a lane multiple, fewer than one tile of rows, or
    K past the halo budget).
    """
    M = h_poly.shape[1]
    K = h_poly.shape[0]
    L = xf.shape[-1]
    n_vec = L // M
    n_out = n_vec - K + 1
    if M % 128 != 0 or K > 16:
        return None  # halo block holds K-1 <= 15 following rows
    nk = (n_vec // 16) * 16  # kernel view: 16-row-aligned prefix
    if nk < 32:
        return None
    x3 = xf[..., : n_vec * M].reshape(2, n_vec, M)
    x3k = x3[:, :nk]
    # VMEM budget: double-buffered [T, M] f32 in + [16, M] halo + out +
    # ~3 temporaries
    budget = 12 * 1024 * 1024
    t_max = budget // (4 * M * 7)
    for T in (512, 256, 128, 64, 32, 16):
        if T <= t_max and nk % T == 0:
            break
    else:
        return None
    taps = jnp.asarray(h_poly, jnp.float32)
    full = _pfb_fir_call(x3k, taps, T, out_dtype, interpret)  # [2, nk, M]
    # kernel rows [0, nk - K + 1) only ever tap true rows (< nk); the
    # last block's clamped halo poisons rows past that — recompute the
    # (tiny) remainder [nk - K + 1, n_out) with the jnp math over the
    # true input rows, which also covers the 16-alignment trim
    k_rows = nk - K + 1
    if k_rows >= n_out:
        return full[:, :n_out]
    tail_in = x3[:, k_rows:]               # [2, n_vec - k_rows, M]
    t_out = n_out - k_rows                 # <= 15 + K - 1 rows
    acc = jnp.zeros((2, t_out, M), jnp.float32)
    for j in range(K):
        acc = acc + taps[j][None, None, :] * jax.lax.dynamic_slice_in_dim(
            tail_in, j, t_out, axis=1)
    return jnp.concatenate([full[:, :k_rows], acc.astype(out_dtype)], axis=1)


def _fused_chan_kernel(x_ref, halo_ref, g2_ref, or_ref, oi_ref, ir_ref,
                       ii_ref, out_ref, *, n_chan, n_shift):
    """Fused mix + decimating-FIR tile: one MXU contraction per tile.

    ``x_ref``: ``[2D, T]`` phase-major input planes (rows 0..D-1 = real
    plane phases, D..2D-1 = imag); ``halo_ref``: the 128 columns
    following the tile; ``g2_ref``: ``[2C, K*2D]`` folded FIR matrix
    (taps x per-phase mixer constants x per-tap ramp, host-built in
    f64 — see channelizer.make_fused_fir_matrix); ``or_ref``/``oi_ref``:
    ``[1, C, 1]`` this tile's outer ramp phasor (SMEM scalars — a
    dynamic lane index in VMEM can't be proven 128-aligned, and the
    block-shape rule wants the last two dims equal to the array's);
    ``ir_ref``/``ii_ref``: ``[C, T]`` inner ramp planes. Output
    ``[2C, T]`` channel planes, rows c-major interleaved (2c = re,
    2c+1 = im) so the caller's ``[C, 2, n_out]`` view is a free
    reshape — a ``(C, 2, T)`` block would pad its 2-sublane middle dim
    4x and amplify the write DMA.

    Each input element is read from HBM ONCE for ALL channels — vs the
    factored-mixer XLA path whose [C, 2, L] mixed intermediate and
    [.., Q, K] matmul give ~20x the input's traffic (docs/perf/NOTES.md
    "Plan-gateway cost shape")."""
    C = n_chan
    T = x_ref.shape[1]
    twoD = x_ref.shape[0]
    full = jnp.concatenate([x_ref[:, :], halo_ref[:, :]], axis=1)
    # K shifted views, one [2C, 2D]@[2D, T] MXU contraction each
    # (stacking the views on sublanes for a single matmul trips a
    # Mosaic concat-layout limitation: the slices carry lane offsets)
    s = jnp.zeros((2 * C, T), jnp.float32)
    for j in range(n_shift):
        s = s + jnp.dot(g2_ref[:, j * twoD : (j + 1) * twoD],
                        full[:, j : j + T],
                        preferred_element_type=jnp.float32)
    for c in range(C):
        o_re = or_ref[0, c, 0]
        o_im = oi_ref[0, c, 0]
        ir = ir_ref[c : c + 1, :]                                   # [1, T]
        ii = ii_ref[c : c + 1, :]
        rr = o_re * ir - o_im * ii
        ri = o_re * ii + o_im * ir
        s_re = s[c : c + 1, :]
        s_im = s[C + c : C + c + 1, :]
        out_ref[2 * c : 2 * c + 1, :] = rr * s_re - ri * s_im
        out_ref[2 * c + 1 : 2 * c + 2, :] = ri * s_re + rr * s_im


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9))
def _fused_chan_call(xp, g2, o_re, o_im, i_re, i_im, D: int,
                     K: int, T: int, interpret: bool):
    twoC, F = g2.shape
    C = twoC // 2
    nb = o_re.shape[-1]
    o_re = o_re.T.reshape(nb, C, 1)
    o_im = o_im.T.reshape(nb, C, 1)
    kernel = pl.pallas_call(
        functools.partial(_fused_chan_kernel, n_chan=C, n_shift=K),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((2 * D, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            # 128 columns following the tile (the input is padded to
            # nb*T + 128 columns, so no clamping and no tail recompute:
            # zero pad columns only feed outputs past n_out)
            pl.BlockSpec((2 * D, 128), lambda i: (0, (i + 1) * T // 128),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((twoC, F), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((C, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((twoC, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((twoC, nb * T), jnp.float32),
        interpret=interpret,
    )
    out = kernel(xp, xp, g2, o_re, o_im, i_re, i_im)
    return out.reshape(C, 2, nb * T)


def fused_channelize_geometry_ok(decimation: int, n_taps: int,
                                 tile: int = 1024) -> bool:
    """Static-geometry predicate for :func:`fused_channelize_pallas` —
    the ONE definition shared with PlanGateway's path choice (a drifted
    duplicate once routed un-tileable geometries into the kernel and
    crashed instead of falling back to the XLA path)."""
    D = int(decimation)
    K = -(-int(n_taps) // D)
    T = int(tile)
    if D < 2 or T % 128 != 0 or K > 128:
        return False
    if 2 * D * K > 1024 or 2 * D * K * T * 4 > 4 * 1024 * 1024:
        return False
    return True


def fused_channelize_pallas(xf, g2, ramp, decimation: int, n_taps: int,
                            tile: int = 1024, interpret: bool = False):
    """Fused mix+FIR+decimate over a LoRaWAN channel raster.

    ``xf``: packed wideband IQ ``[2, L]`` float32; ``g2``: the
    :func:`lora_tpu.channelizer.make_fused_fir_matrix` ``[2C, K*2D]``
    matrix; ``ramp``: ``(o_re, o_im, i_re, i_im)`` output-rate factored
    mixer from :func:`lora_tpu.channelizer.make_output_ramp_factors`
    (built for this L and ``tile``). Returns channel planes
    ``[C, 2, n_out]``, ``n_out = (L - n_taps)//D + 1`` — numerically the
    correlation-form ``freq_xlating_fir`` decimator, identical (to f32
    matmul rounding) to ``channelize_list_planes_factored``. ``None``
    when the geometry can't tile (caller falls back to the XLA path).
    Reference: lib/channelizer_impl.cc:46-48, batched over the plan.
    """
    D = int(decimation)
    K = -(-int(n_taps) // D)
    T = int(tile)
    if not fused_channelize_geometry_ok(D, n_taps, T):
        return None
    L = xf.shape[-1]
    n_out = (L - int(n_taps)) // D + 1
    if n_out < 1:
        return None
    nb = -(-n_out // T)
    o_re, o_im, i_re, i_im = (jnp.asarray(r) for r in ramp)
    if o_re.shape[-1] != nb or i_re.shape[-1] != T:
        raise ValueError(
            f"ramp factors built for nb={o_re.shape[-1]}, tile="
            f"{i_re.shape[-1]}; this call needs nb={nb}, tile={T}")
    Qp = nb * T + 128
    xpad = jnp.pad(xf, ((0, 0), (0, Qp * D - L)))
    # phase-major planes [2D, Qp]: row p*D + d = plane p's phase-d stream
    xp = xpad.reshape(2, Qp, D).transpose(0, 2, 1).reshape(2 * D, Qp)
    out = _fused_chan_call(xp, jnp.asarray(g2), o_re, o_im, i_re, i_im,
                           D, K, T, interpret)
    return out[:, :, :n_out]


def detection_metrics_pallas(xf, sps: int, interpret: bool = False,
                             variant: str = "pp"):
    """Single-pass detection metrics on packed IQ ``[..., 2, L]``.

    Returns ``(corr, e1, e2)`` each ``[..., K]`` with ``K = L//sps - 1`` —
    identical to :func:`lora_tpu.rx.frontend.detection_metrics`.
    Falls back to the XLA planes path when the geometry doesn't tile
    (``sps`` not a lane multiple or no T divides the window count).
    ``variant``: ``"pp"`` per-plane contiguous blocks (default, fastest
    measured), ``"tile"`` the two-chunk ``[2, T, sps]`` block kernel.
    """
    from ..rx.frontend import detection_metrics_planes

    if variant not in ("pp", "tile"):
        raise ValueError(f"unknown detection kernel variant: {variant!r}")
    lead = xf.shape[:-2]
    L = xf.shape[-1]
    K1 = L // sps
    K = K1 - 1
    if sps % 128 != 0 or K < 1:
        return detection_metrics_planes(xf, sps)
    # VMEM budget (16 MB scoped limit): double-buffered main block
    # (2*[2,T,sps] f32) + double-buffered next-row block (2*[2,8,sps])
    # + ~6 in-kernel [T,sps] temporaries (rn/imn copies, products).
    # Conservative model measured against the SF10/SF12 geometries.
    budget = 14 * 1024 * 1024
    t_max = (budget - 128 * sps) // (24 * sps)
    # bf16 blocks tile at (16, 128): T must be a multiple of 16 so the
    # next-chunk row block lands on a block boundary
    t_choices = (256, 128, 64, 32, 16) if xf.dtype == jnp.bfloat16 \
        else (256, 128, 64, 32, 16, 8)
    for T in t_choices:
        if T <= t_max:
            break
    else:
        return detection_metrics_planes(xf, sps)
    # ragged window counts: the kernel covers the largest T-multiple of
    # rows; the <=T-1 remainder windows run through the XLA planes math
    # on a small tail slice (channelizer outputs rarely tile exactly)
    K1r = (K1 // T) * T
    if K1r < 2:
        return detection_metrics_planes(xf, sps)

    C = int(np.prod(lead)) if lead else 1
    xb = xf[..., : K1r * sps].reshape(C, 2, K1r, sps)
    if variant == "tile" and xb.dtype == jnp.bfloat16:
        # the tile kernel was written for f32 blocks (8-row next-tile
        # blocks, no accumulation cast); only the pp variant handles bf16
        xb = xb.astype(jnp.float32)
    call = _det_call_pp if variant == "pp" else _det_call
    corr_b, ener_b = call(xb, T, interpret)  # valid: corr [:K1r-1], ener [:K1r]
    if K1r == K1:
        corr = corr_b[:, :K]
        ener = ener_b
    else:
        tail = xf[..., (K1r - 1) * sps : K1 * sps].reshape(
            C, 2, K1 - K1r + 1, sps
        ).astype(jnp.float32)
        r, i = tail[:, 0], tail[:, 1]
        dot_re = jnp.sum(r[:, :-1] * r[:, 1:] + i[:, :-1] * i[:, 1:], axis=-1)
        dot_im = jnp.sum(i[:, :-1] * r[:, 1:] - r[:, :-1] * i[:, 1:], axis=-1)
        e_rows = jnp.sum(r * r + i * i, axis=-1)  # [C, K1-K1r+1]
        denom = jnp.sqrt(e_rows[:, :-1] * e_rows[:, 1:])
        mag = jnp.sqrt(dot_re * dot_re + dot_im * dot_im)
        corr_t = jnp.where(denom > 0, mag / jnp.where(denom > 0, denom, 1.0), 0.0)
        corr = jnp.concatenate([corr_b[:, : K1r - 1], corr_t], axis=-1)  # [C, K]
        ener = jnp.concatenate([ener_b[:, :K1r], e_rows[:, 1:]], axis=-1)  # [C, K1]
    corr = corr.reshape(lead + (K,))
    e1 = ener[:, :K].reshape(lead + (K,))
    e2 = ener[:, 1 : K + 1].reshape(lead + (K,))
    return corr, e1, e2
