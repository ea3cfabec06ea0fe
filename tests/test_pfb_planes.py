"""Packed-plane PFB fast path (round 4): Pallas FIR + DFT-matmul.

``PolyphaseChannelizer.planes`` must produce the same channel streams as
the complex reference path (``__call__``) — same FIR, same M-point DFT,
different data layout and pass structure. The Pallas kernel itself is
exercised on TPU only (interpret mode is exercised via the jnp fallback
equivalence here; kernel-vs-jnp parity runs in CI on the TPU bench).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lora_tpu.channelizer import PolyphaseChannelizer
from lora_tpu.ops.xfer import pack_iq


def _wideband(M, n_vec, seed=0):
    rng = np.random.default_rng(seed)
    L = M * n_vec
    x = (rng.normal(size=L) + 1j * rng.normal(size=L)).astype(np.complex64)
    # add a couple of per-channel tones so the parity check sees
    # structured (not just noise) content
    n = np.arange(L)
    for c in (1, M // 2, M - 3):
        x += 0.5 * np.exp(2j * np.pi * (c / M) * n).astype(np.complex64)
    return x


@pytest.mark.parametrize("M", [8, 64])
def test_planes_matches_complex_path(M):
    x = _wideband(M, 256)
    pfb = PolyphaseChannelizer.for_lora(M * 250e3, M)
    ref = np.asarray(pfb(jnp.asarray(x)))              # [M, n_out] complex
    cp = np.asarray(pfb.planes(jnp.asarray(pack_iq(x))))  # [M, 2, n_out]
    got = cp[:, 0] + 1j * cp[:, 1]
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-4 * scale)


def test_planes_bf16_close():
    M = 64
    x = _wideband(M, 256)
    pfb = PolyphaseChannelizer.for_lora(M * 250e3, M)
    ref = np.asarray(pfb(jnp.asarray(x)))
    cp = np.asarray(
        pfb.planes(jnp.asarray(pack_iq(x)), out_dtype=jnp.bfloat16)
    ).astype(np.float32)
    got = cp[:, 0] + 1j * cp[:, 1]
    scale = np.abs(ref).max()
    # bf16 FIR + bf16 DFT operands, f32 accumulation: ~2 decimal digits
    np.testing.assert_allclose(got, ref, atol=4e-2 * scale)


def test_planes_fft_fallback_above_matmul_cap():
    M = 16
    x = _wideband(M, 128)
    pfb = PolyphaseChannelizer.for_lora(M * 250e3, M)
    a = np.asarray(pfb.planes(jnp.asarray(pack_iq(x))))
    b = np.asarray(pfb.planes(jnp.asarray(pack_iq(x)), max_dft_matmul=8))
    scale = np.abs(a).max()
    np.testing.assert_allclose(a, b, atol=2e-4 * scale)


def test_wideband_receiver_bf16_planes_decode():
    """End-to-end: the bf16 plane path still decodes every packet."""
    from lora_tpu.channelizer import pfb_channel_freqs
    from lora_tpu.config import LoRaConfig
    from lora_tpu.tx.modulator import modulate_frame
    from lora_tpu.wideband import WidebandReceiver

    M = 8
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    wide_rate = M * cfg.samp_rate
    wide_cfg = LoRaConfig(sf=7, cr=4, samp_rate=wide_rate, crc=True)
    L = M * 48 * cfg.samples_per_symbol
    rng = np.random.default_rng(0)
    x = (rng.normal(0, 1e-3, L) + 1j * rng.normal(0, 1e-3, L)).astype(np.complex64)
    freqs = pfb_channel_freqs(wide_rate, M)
    pkt = modulate_frame(wide_cfg, b"\xde\xad\xbe\xef", snr_db=None)
    t = np.arange(len(pkt))
    for c in (1, 5):
        pos = (4 + c) * cfg.samples_per_symbol * M
        x[pos:pos + len(pkt)] += (
            pkt * np.exp(2j * np.pi * freqs[c] / wide_rate * (t + pos))
        ).astype(np.complex64)
    wr = WidebandReceiver(cfg, M, max_candidates=2, max_symbols=24,
                          demod_method="fft", plane_dtype=jnp.bfloat16)
    frames = wr.run(x)
    got = {f.channel for f in frames
           if f.payload[:4] == b"\xde\xad\xbe\xef"}
    assert got == {1, 5}, [(f.channel, f.payload.hex()) for f in frames]


def test_planes_two_stage_matmul_matches():
    """The Cooley-Tukey two-stage DFT matmul (used above the single-
    stage cap) matches the single-stage and FFT paths."""
    M = 64
    x = _wideband(M, 256)
    pfb = PolyphaseChannelizer.for_lora(M * 250e3, M)
    ref = np.asarray(pfb.planes(jnp.asarray(pack_iq(x))))
    # cap 16 forces the two-stage split (8 x 8)
    got = np.asarray(pfb.planes(jnp.asarray(pack_iq(x)), max_dft_matmul=16))
    assert pfb._two_stage_split(M, 16) == (8, 8)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=3e-4 * scale)


def test_planes_two_stage_bf16():
    M = 128
    x = _wideband(M, 128)
    pfb = PolyphaseChannelizer.for_lora(M * 250e3, M)
    ref = np.asarray(pfb.planes(jnp.asarray(pack_iq(x))))
    got = np.asarray(pfb.planes(jnp.asarray(pack_iq(x)), max_dft_matmul=16,
                                out_dtype=jnp.bfloat16)).astype(np.float32)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=5e-2 * scale)


def test_pfb_fir_pallas_misaligned_rows_interpret():
    """The Pallas FIR must engage (not fall back) for the sharded /
    streaming halo geometries where n_vec % 16 == K+1, computing the
    16-alignment + clamped-halo remainder via the jnp tail. Interpret
    mode exercises the kernel on the CPU backend."""
    from lora_tpu.ops.pallas_kernels import pfb_fir_pallas

    M = 128
    pfb = PolyphaseChannelizer.for_lora(M * 250e3, M)
    n_vec = 512 + pfb.K + 1  # the wideband_time_sharded halo residue
    rng = np.random.default_rng(0)
    L = M * n_vec
    x = (rng.normal(size=L) + 1j * rng.normal(size=L)).astype(np.complex64)
    xf = jnp.asarray(pack_iq(x))
    out = pfb_fir_pallas(xf, pfb.h_poly, interpret=True)
    assert out is not None, "kernel fell back on the halo geometry"
    out = np.asarray(out)
    x3 = np.asarray(pack_iq(x)).reshape(2, n_vec, M)
    n_out = n_vec - pfb.K + 1
    acc = np.zeros((2, n_out, M), np.float32)
    for j in range(pfb.K):
        acc += pfb.h_poly[j][None, None, :] * x3[:, j:j + n_out]
    np.testing.assert_allclose(out, acc, atol=1e-5)
