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
