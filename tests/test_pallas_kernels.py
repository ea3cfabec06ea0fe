"""Pallas detection kernel vs the XLA planes reference, across the tile
geometries the SF range produces (interpret mode on CPU; the same code
path compiles natively on TPU).

Regression: at SF>=10 (sps >= 8192) the old fixed T=256 tile exceeded
the 16 MB scoped-VMEM limit and broke TPU compilation of the dense
receiver for exactly the configs the test suites exercise."""

import numpy as np
import pytest

from lora_tpu.ops.pallas_kernels import detection_metrics_pallas
from lora_tpu.rx.frontend import detection_metrics_planes


@pytest.mark.parametrize("variant", ["tile", "pp"])
@pytest.mark.parametrize("sps,k1", [(1024, 64), (8192, 16), (32768, 8)])
def test_kernel_matches_planes_across_geometries(sps, k1, variant):
    rng = np.random.default_rng(int(sps))
    xf = rng.normal(size=(2, 2, k1 * sps)).astype(np.float32)
    c0, e10, e20 = detection_metrics_planes(xf, sps)
    c1, e11, e21 = detection_metrics_pallas(xf, sps, interpret=True,
                                            variant=variant)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(e11), np.asarray(e10), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(e21), np.asarray(e20), rtol=1e-5)


def test_vmem_tile_cap():
    # the tile selector must stay within the 14 MB model at big sps
    budget = 14 * 1024 * 1024
    for sps in (1024, 8192, 16384, 32768):
        t_max = (budget - 128 * sps) // (24 * sps)
        chosen = next((t for t in (256, 128, 64, 32, 16, 8) if t <= t_max), None)
        assert chosen is not None
        assert 24 * chosen * sps + 128 * sps <= budget
