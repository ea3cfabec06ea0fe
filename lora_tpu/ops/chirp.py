"""Ideal chirp synthesis and instantaneous-frequency extraction.

Replicates reference ``lib/decoder_impl.cc``:

- ``build_ideal_chirps`` (:141-175): up/down chirps with the exact reference
  parameterisation ``chirp(t) = (1+1j) * exp(+-j*2*pi*t*(f0 + T*t))`` where
  ``f0 = bw/2`` and ``T = -0.5*bw*symbols_per_second``. Note the reference's
  amplitude factor ``(1+1j)`` (|.| = sqrt(2)) is kept for bit-parity of all
  correlation thresholds.
- ``instantaneous_frequency`` (:224-244): phase-difference with +-pi
  unwrapping; output index ``i`` holds ``phase[i+1]-phase[i]`` and the last
  element repeats the previous one.

All functions are vectorized over arbitrary leading batch dimensions and are
dual-backend (``xp`` = numpy or jax.numpy), so the TPU receiver and the
golden model share one implementation.
"""

from __future__ import annotations

import numpy as np

from ..config import LoRaConfig


def build_ideal_chirps(config: LoRaConfig, xp=np, dtype="complex64"):
    """Return ``(upchirp, downchirp)`` of length ``samples_per_symbol``."""
    sps = config.samples_per_symbol
    fs = config.samp_rate
    T = -0.5 * config.bandwidth * config.symbols_per_second
    f0 = config.bandwidth / 2.0
    i = np.arange(sps, dtype=np.float64)
    t = i / fs
    phase = 2.0 * np.pi * t * (f0 + T * t)
    cmx = 1.0 + 1.0j
    down = (cmx * np.exp(1j * phase)).astype(dtype)
    up = (cmx * np.exp(-1j * phase)).astype(dtype)
    if xp is not np:
        up, down = xp.asarray(up), xp.asarray(down)
    return up, down


def instantaneous_frequency(samples, xp=np):
    """Phase-diff instantaneous frequency, reference-parity.

    ``samples``: complex array ``[..., window]`` -> float32 ``[..., window]``
    with ``out[..., k] = wrap(angle(x[k+1]) - angle(x[k]))`` and
    ``out[..., -1] = out[..., -2]``.
    """
    phase = xp.angle(samples)
    d = phase[..., 1:] - phase[..., :-1]
    d = xp.where(d > np.pi, d - 2.0 * np.pi, d)
    d = xp.where(d < -np.pi, d + 2.0 * np.pi, d)
    return xp.concatenate([d, d[..., -1:]], axis=-1).astype("float32")


def instantaneous_phase(samples, xp=np):
    """Unwrapped phase (reference lib/decoder_impl.cc:246-257)."""
    phase = xp.angle(samples)
    d = phase[..., 1:] - phase[..., :-1]
    d = xp.where(d > np.pi, d - 2.0 * np.pi, d)
    d = xp.where(d < -np.pi, d + 2.0 * np.pi, d)
    return xp.concatenate(
        [phase[..., :1], phase[..., :1] + xp.cumsum(d, axis=-1)], axis=-1
    ).astype("float32")


def tiled_upchirp_ifreq(config: LoRaConfig, xp=np):
    """ifreq of three concatenated upchirps (reference :170-174), used as
    the reference waveform bank for fine sync lag search — tiled with a
    FOURTH symbol appended: ``fine_sync_lag`` at the top bin reads rows
    at ``(bin+1)*decim + sps + lag``, which for ``bin = N-1`` with a
    positive lag runs up to ``3*sps + search - 2`` — past the
    reference's own 3-symbol bank (``lib/decoder_impl.cc:170-174``; its
    C++ silently reads adjacent heap there, our numpy path raised
    IndexError — surfaced by tests/test_lag_search_backends.py). The
    chirp is periodic, so the extra symbol extends the bank with the
    values the search semantically expects."""
    up, _ = build_ideal_chirps(config, xp=np)
    tiled = np.concatenate([up, up, up, up])
    out = instantaneous_frequency(tiled, xp=np)
    return out if xp is np else xp.asarray(out)
