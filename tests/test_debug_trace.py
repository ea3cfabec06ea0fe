"""DenseReceiver.debug_trace: jitted-pipeline intermediate taps
(GRLORA_DEBUG analogue, SURVEY.md §5) cross-checked against the golden
receiver's DebugTrace on the same capture."""

import numpy as np
import pytest

from lora_tpu.config import LoRaConfig
from lora_tpu.rx.dense import DenseReceiver
from lora_tpu.rx.golden import GoldenReceiver
from lora_tpu.tx.modulator import modulate_frame

CFG = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True)


@pytest.fixture(scope="module")
def capture():
    sps = CFG.samples_per_symbol
    return modulate_frame(CFG, b"\xde\xad\xbe\xef", pad_before=3000,
                          pad_after=2 * sps, snr_db=30.0, seed=5)


@pytest.mark.parametrize("method", ["gradient", "fft"])
def test_debug_trace_fields(capture, method):
    rx = DenseReceiver(CFG, max_candidates=2, max_symbols=24,
                       demod_method=method)
    d = rx.debug_trace(capture)
    assert d["ok"].any()
    k = int(np.nonzero(d["ok"])[0][0])
    nsym = 8 + rx.S
    assert d["words"].shape == (rx.P, nsym)
    assert d["bins"].shape == (rx.P, nsym)
    assert d["fine_syncs"].shape == (rx.P, nsym)
    assert d["spectra"].shape[0:2] == (rx.P, nsym)
    assert d["sfd_corr"].shape == (rx.P, rx.F)
    # the SFD walk saw upchirps (~ -1) then the downchirp (> 0.96)
    assert (d["sfd_corr"][k] < -0.9).any()
    assert d["payload"][k][:4].tobytes() == b"\xde\xad\xbe\xef"
    # spectra of the decoded candidate peak at the demodulated bins (fft)
    if method == "fft":
        peaks = d["spectra"][k].argmax(axis=-1)
        # payload symbols (after the 8 reduced-rate header symbols):
        # argmax of the folded spectrum is the pre-convention-shift bin
        assert ((peaks[8:] - 1) % rx.n_bins == d["bins"][k][8:]).all()


def test_debug_trace_matches_golden(capture):
    g = GoldenReceiver(CFG, debug=True)
    frames = g.run(capture)
    assert frames
    rx = DenseReceiver(CFG, max_candidates=2, max_symbols=24,
                       demod_method="gradient")
    d = rx.debug_trace(capture)
    k = int(np.nonzero(d["ok"])[0][0])
    gw = np.asarray(g.debug.words)
    dw = d["words"][k][: len(gw)]
    assert (dw == gw).all(), (dw, gw)
    gb = np.asarray(g.debug.bins)
    # golden logs the post-reduction bin for header symbols; dense logs
    # the full-rate bin — compare the payload region exactly
    assert (d["bins"][k][8 : len(gb)] == gb[8:]).all()
