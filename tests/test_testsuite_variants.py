"""Suite-generator variants beyond the reference OTA matrix: implicit
header (energy-stop) and downlink (conjugated chirp) SigMF suites."""

import numpy as np
import pytest

from lora_tpu import LoRaConfig
from lora_tpu.io.sigmf import read_trace, write_trace
from lora_tpu.testsuite import generate_suite, implicit_expected_hex, run_suite


def test_implicit_expected_hex_formula():
    # validated against the dense decoder's emitted lengths
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=False, implicit=True)
    assert implicit_expected_hex(cfg, bytes.fromhex("cafe0102")) == "cafe01020000"
    assert implicit_expected_hex(cfg, bytes.fromhex("88")) == "8800"
    cfg8 = LoRaConfig(sf=8, cr=1, samp_rate=250e3, crc=False, implicit=True)
    assert implicit_expected_hex(cfg8, bytes.fromhex("deadbeef")) == "deadbeef000000"
    cfg72 = LoRaConfig(sf=7, cr=2, samp_rate=250e3, crc=False, implicit=True)
    assert implicit_expected_hex(cfg72, bytes.fromhex("ffff")) == "ffff"


def test_sigmf_conj_key_roundtrip(tmp_path):
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True, conj=True)
    stem = str(tmp_path / "t")
    write_trace(stem, np.zeros(16, np.complex64), 1e6, config=cfg)
    trace = read_trace(stem + ".sigmf-meta")
    assert trace.lora_config.conj is True


@pytest.mark.parametrize("suite,kw", [
    ("mini_implicit", dict(sfs=(7,), crs=(4, 2))),
    ("mini_conj", dict(sfs=(7,), crs=(4,))),
])
def test_suite_variant_full_accuracy(tmp_path, suite, kw):
    d = str(tmp_path)
    generate_suite(d, suite, samp_rate=1e6, **kw)
    res = run_suite(d, (suite,), write_output=False)
    assert res[suite] == 1.0, res


def test_drift_suite_tracked_by_fine_sync(tmp_path):
    """A ``*drift*`` suite applies a tx sample-clock offset; the golden
    receiver's per-symbol fine-sync loop (reference fine_sync,
    lib/decoder_impl.cc:300-338) must track a TCXO-class 10 ppm offset to
    full accuracy at SF7 (committed full-matrix evidence:
    docs/test-results/short_sim_drift10.md 384/384 at 10 ppm;
    short_sim_drift.md shows 30 ppm cracking exactly at the SF11/12
    configs where the reference's own +-30ppm-class hardware (RTL-SDR)
    reports failures)."""
    d = str(tmp_path)
    generate_suite(d, "mini_drift", sfs=(7,), crs=(4, 1), drift_ppm=10.0)
    res = run_suite(d, ("mini_drift",), write_output=False)
    assert res["mini_drift"] == 1.0, res


def test_garbage_header_cr0_does_not_crash_golden():
    """A mis-synced candidate can decode a garbage header with cr=0, whose
    decode branch yields no bytes; the reference then reads 3 bytes from
    an empty vector (decoder_impl.cc:826). Golden must drop sync instead
    of crashing (surfaced by drift suites)."""
    from lora_tpu.rx.golden import GoldenReceiver
    from lora_tpu.io.frames import PhyHeader
    from lora_tpu.tx.modulator import modulate_frame

    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    g = GoldenReceiver(cfg)
    # poison the persistent phdr the way a garbage header would
    g.phdr = PhyHeader(cr=0, has_mac_crc=0)
    pkt = modulate_frame(cfg, b"\xde\xad", pad_before=2048, pad_after=2048,
                         snr_db=40.0)
    frames = g.run(np.asarray(pkt))  # must not raise
    # after the cr=0 header decode fails, the machine resets and the
    # preamble is long gone — no frame expected from this capture
    assert isinstance(frames, list)
