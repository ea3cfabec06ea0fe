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


def test_kernel_bf16_planes_close_to_f32():
    """bf16 IQ planes (half the HBM traffic) must agree with the f32
    metrics to bf16 quantization error — far below the 0.90 detection
    threshold margin at the >=10 dB operating floor."""
    import jax.numpy as jnp

    sps, k1 = 1024, 32
    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 2, k1 * sps)).astype(np.float32)
    c0, e10, _ = detection_metrics_planes(x, sps)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    c1, e11, _ = detection_metrics_pallas(xb, sps, interpret=True)
    assert np.asarray(c1).dtype == np.float32
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=2e-2)
    np.testing.assert_allclose(np.asarray(e11), np.asarray(e10), rtol=2e-2)


def test_dense_decodes_bf16_planes():
    """End-to-end: the dense receiver decodes packets from bf16-packed
    planes (pack_iq(dtype=bfloat16)) — the opt-in halved-bandwidth input
    format for the streaming/bench paths."""
    import jax
    import jax.numpy as jnp

    from lora_tpu import LoRaConfig
    from lora_tpu.ops.xfer import pack_iq
    from lora_tpu.rx.dense import DenseReceiver
    from lora_tpu.tx.modulator import modulate_frame

    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    sps = cfg.samples_per_symbol
    payload = bytes([0xA7, 0x07, 0xF8])
    stream = np.zeros(64 * sps, np.complex64)
    pkt = modulate_frame(cfg, payload, snr_db=30.0, seed=1)
    stream[3 * sps: 3 * sps + len(pkt)] = pkt
    rx = DenseReceiver(cfg, max_candidates=4, max_symbols=24, sfd_search=12)
    xb = jnp.asarray(pack_iq(np.pad(stream, (0, rx.pkt_samples)),
                             dtype=jnp.bfloat16))
    frames = rx.run(xb)
    assert len(frames) == 1
    assert frames[0].mac_payload == payload
