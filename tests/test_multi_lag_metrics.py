"""Multi-SF shared-substrate detection metrics vs the per-SF reference.

The gateway's fused detection (rx/frontend.multi_sf_detection_metrics +
ops/pallas_kernels.lag_rows_pallas) must reproduce detection_metrics_planes
per SF exactly (same window grid, same corr/e1/e2) — the per-SF pass is
itself validated against the reference's detect_preamble_autocorr
(lib/decoder_impl.cc:340-366) by test_pallas_kernels.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lora_tpu.rx.frontend import (
    detection_metrics_planes,
    lag_rows_planes,
    metrics_from_lag_rows,
    multi_sf_detection_metrics,
)
from lora_tpu.ops.pallas_kernels import lag_rows_pallas


def _planes(C, L, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    return rng.normal(0, 1.0, (C, 2, L)).astype(dtype)


@pytest.mark.parametrize("sps_min,ms", [
    (128, (1, 2, 4, 8, 16, 32)),   # SF7..12 at decim 1
    (256, (1, 2, 4)),              # SF7..9 at decim 2
    (128, (1, 3)),                 # non-power-of-two multiple
])
def test_lag_rows_match_per_sf_planes(sps_min, ms):
    C, R = 3, 37 * max(ms)
    xf = _planes(C, R * sps_min + 17)  # ragged tail past the row grid
    e, qs = lag_rows_planes(jnp.asarray(xf), sps_min, ms)
    for m in ms:
        corr, e1, e2 = metrics_from_lag_rows(e, qs[m][0], qs[m][1], m)
        ref = detection_metrics_planes(jnp.asarray(xf), m * sps_min)
        np.testing.assert_allclose(np.asarray(corr), np.asarray(ref[0]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(e1), np.asarray(ref[1]),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(e2), np.asarray(ref[2]),
                                   rtol=1e-5)


def test_multi_sf_metrics_dict():
    sps_by_sf = {7: 256, 8: 512, 10: 2048}
    xf = jnp.asarray(_planes(2, 2048 * 9 + 5))
    out = multi_sf_detection_metrics(xf, sps_by_sf)
    for sf, sps in sps_by_sf.items():
        ref = detection_metrics_planes(xf, sps)
        for got, want in zip(out[sf], ref):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dtype", [np.float32])
@pytest.mark.parametrize("R_extra", [0, 3])   # exact / ragged row grids
def test_lag_rows_pallas_interpret(dtype, R_extra):
    sps_min = 128
    ms = (1, 2, 4, 8, 16, 32)
    C, R = 2, 96 + R_extra
    xf = jnp.asarray(_planes(C, R * sps_min, seed=1, dtype=dtype))
    got = lag_rows_pallas(xf, sps_min, ms, interpret=True)
    assert got is not None
    e_g, qs_g = got
    e_w, qs_w = lag_rows_planes(xf, sps_min, ms)
    np.testing.assert_allclose(np.asarray(e_g), np.asarray(e_w), rtol=1e-5)
    for m in ms:
        valid = R - m  # q rows past R - lag are unspecified by contract
        for a, b in zip(qs_g[m], qs_w[m]):
            np.testing.assert_allclose(
                np.asarray(a)[..., :valid], np.asarray(b)[..., :valid],
                rtol=1e-4, atol=1e-3,
            )


def test_lag_rows_pallas_single_tile_ragged():
    """Regression (round-5 review): a single-tile kernel (Rt == 0)
    under a ragged row count (R > Rk) must take the tail-recompute
    branch — the fast path used to slice rows the kernel never
    computed and crash on the reshape."""
    sps_min = 128
    ms = (1, 2, 4, 8, 16, 32)
    R = 40                       # T=32=H selected -> Rk=32, Rt=0, R>Rk
    xf = jnp.asarray(_planes(1, R * sps_min, seed=2))
    got = lag_rows_pallas(xf, sps_min, ms, interpret=True)
    assert got is not None
    e_g, qs_g = got
    e_w, qs_w = lag_rows_planes(xf, sps_min, ms)
    np.testing.assert_allclose(np.asarray(e_g), np.asarray(e_w), rtol=1e-5)
    for m in ms:
        valid = R - m
        for a, b in zip(qs_g[m], qs_w[m]):
            np.testing.assert_allclose(
                np.asarray(a)[..., :valid], np.asarray(b)[..., :valid],
                rtol=1e-4, atol=1e-3)


def test_lag_rows_pallas_geometry_fallback():
    # sps not a lane multiple -> None (caller falls back to planes math)
    xf = jnp.asarray(_planes(1, 100 * 100))
    assert lag_rows_pallas(xf, 100, (1, 2)) is None
