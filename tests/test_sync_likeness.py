"""Signal-evidence gate for FIND_SFD sync-word recognition (round 4).

``demod.upchirp_likeness`` scores a window's ifreq against the ideal
upchirp at the demodulated bin's own lag: ~1.0 for any genuine (shifted)
upchirp, ~0 for noise — the separation the raw downchirp Pearson cannot
provide (an SF7 sync symbol shifted half a rotation reads +0.12, inside
the noise band). Recognition gated on it means noise windows keep
spending correlation-fail budget instead of consuming the 2-window
recognition allowance (advisor finding, round 3).
"""

import numpy as np
import pytest

from lora_tpu.config import LoRaConfig
from lora_tpu.ops import demod
from lora_tpu.ops.chirp import build_ideal_chirps, tiled_upchirp_ifreq


@pytest.mark.parametrize("sf", [7, 10, 12])
def test_likeness_separates_sync_from_noise(sf):
    cfg = LoRaConfig(sf=sf, samp_rate=1e6)
    up, _ = build_ideal_chirps(cfg)
    tiled = tiled_upchirp_ifreq(cfg)
    sps, N, decim = (cfg.samples_per_symbol, cfg.number_of_bins,
                     cfg.decim_factor)
    rng = np.random.default_rng(sf)
    # every sync-word shift (incl. the SF7 dead zone) scores high, with
    # CFO applied (likeness must be CFO-invariant) and 10 dB noise. The
    # bin is read from the clean window: likeness is scored *at the
    # demodulated bin's lag*, and a noise-misread bin correctly yields a
    # low score (fail-safe — recognition then just isn't granted).
    for shift_bins in (0, 8, 16, 32):
        s = shift_bins * decim
        clean = np.concatenate([up[s:], up[:s]])
        b = int(demod.max_frequency_gradient_idx(clean, N, decim))
        w = clean * np.exp(2j * np.pi * 3e3 / 1e6 * np.arange(sps))
        w = w + (rng.normal(size=sps) + 1j * rng.normal(size=sps)) * np.sqrt(0.05)
        c = float(demod.upchirp_likeness(w, np.int64(b), tiled, sps, decim))
        assert c > demod.SYNC_LIKENESS_MIN, (shift_bins, c)
    # noise windows score near zero
    for _ in range(8):
        w = (rng.normal(size=sps) + 1j * rng.normal(size=sps)).astype(np.complex64)
        b = int(demod.max_frequency_gradient_idx(w, N, decim))
        c = float(demod.upchirp_likeness(w, np.int64(b), tiled, sps, decim))
        assert abs(c) < demod.SYNC_LIKENESS_MIN / 2, c


def test_likeness_jnp_matches_numpy():
    import jax.numpy as jnp

    cfg = LoRaConfig(sf=8, samp_rate=1e6)
    up, _ = build_ideal_chirps(cfg)
    tiled = tiled_upchirp_ifreq(cfg)
    sps, N, decim = (cfg.samples_per_symbol, cfg.number_of_bins,
                     cfg.decim_factor)
    rng = np.random.default_rng(0)
    w = np.stack([
        np.concatenate([up[16 * decim:], up[:16 * decim]]),
        (rng.normal(size=sps) + 1j * rng.normal(size=sps)).astype(np.complex64),
    ])
    b = demod.max_frequency_gradient_idx(w, N, decim)
    c_np = demod.upchirp_likeness(w, b, tiled, sps, decim)
    c_j = np.asarray(demod.upchirp_likeness(
        jnp.asarray(w), jnp.asarray(b), tiled, sps, decim, xp=jnp))
    np.testing.assert_allclose(c_np, c_j, atol=2e-3)


def test_likeness_rows_matches_slice_version():
    """The one-hot-matmul likeness (static fft path) must agree with the
    table-slice version across bins and backends."""
    import jax.numpy as jnp

    cfg = LoRaConfig(sf=8, samp_rate=1e6)
    up, _ = build_ideal_chirps(cfg)
    tiled = tiled_upchirp_ifreq(cfg)
    sps, N, decim = (cfg.samples_per_symbol, cfg.number_of_bins,
                     cfg.decim_factor)
    rows = demod.make_likeness_rows(tiled, sps, decim, N)
    rng = np.random.default_rng(1)
    wins = []
    bins = []
    for shift_bins in (0, 3, 100, 255):
        s = shift_bins * decim
        w = np.concatenate([up[s:], up[:s]])
        w = w + (rng.normal(size=sps) + 1j * rng.normal(size=sps)) * 0.1
        wins.append(w)
        bins.append(demod.max_frequency_gradient_idx(w, N, decim))
    wins = np.stack(wins)
    bins = np.asarray(bins)
    ref = demod.upchirp_likeness(wins, bins, tiled, sps, decim)
    got_np = demod.upchirp_likeness_rows(wins, bins, rows)
    got_j = np.asarray(demod.upchirp_likeness_rows(
        jnp.asarray(wins), jnp.asarray(bins), rows, xp=jnp))
    np.testing.assert_allclose(got_np, ref, atol=1e-5)
    np.testing.assert_allclose(got_j, ref, atol=2e-3)
