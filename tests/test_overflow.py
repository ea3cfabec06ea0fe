"""Capacity-overflow semantics (dense candidate capacity, pooled pool,
JaxReceiver frame ring) and low-SNR detection sensitivity of the dense
2-window candidate rule vs golden's reference-parity single-window rule.
"""

import numpy as np
import pytest

from lora_tpu.config import LoRaConfig
from lora_tpu.rx.dense import DenseReceiver
from lora_tpu.rx.golden import GoldenReceiver
from lora_tpu.rx.receiver import JaxReceiver
from lora_tpu.tx.modulator import modulate_frame


CFG = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True)


def _stream(n_packets: int, snr_db=40.0, seed=0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    chunks = [
        modulate_frame(CFG, b"\xde\xad\xbe\xef",
                       pad_before=int(rng.integers(2500, 3500)),
                       pad_after=CFG.samples_per_symbol,
                       snr_db=snr_db, seed=int(rng.integers(0, 2**31)))
        for _ in range(n_packets)
    ]
    chunks.append(np.zeros(4 * CFG.samples_per_symbol, np.complex64))
    return np.concatenate(chunks)


def test_dense_candidate_overflow_counted():
    x = _stream(6)
    rx = DenseReceiver(CFG, max_candidates=3, max_symbols=24,
                       demod_method="fft")
    res = rx.process(x[None])
    assert int(np.asarray(res.valid).sum()) == 3       # capacity honoured
    assert int(np.asarray(res.n_dropped)[0]) == 3      # and overflow visible
    # ample capacity: no drops, all packets decoded
    rx2 = DenseReceiver(CFG, max_candidates=8, max_symbols=24,
                        demod_method="fft")
    res2 = rx2.process(x[None])
    assert int(np.asarray(res2.valid).sum()) == 6
    assert int(np.asarray(res2.n_dropped)[0]) == 0


def test_pooled_overflow_counted():
    import jax

    rx = DenseReceiver(CFG, max_candidates=4, max_symbols=24,
                       demod_method="fft")
    a, b = _stream(3, seed=1), _stream(3, seed=2)
    # tailroom so no candidate is tail-invalidated (jit entry: no host pad)
    n = max(len(a), len(b)) + rx.pkt_samples
    x = np.stack([np.pad(a, (0, n - len(a))), np.pad(b, (0, n - len(b)))])
    fn = jax.jit(lambda xc: rx.process_pooled(xc, pool=4, per_channel=4))
    res = fn(x)
    # 6 candidates into a pool of 4: two dropped, counted
    assert int(np.asarray(res.valid).sum()) == 4
    assert int(np.asarray(res.n_dropped)) == 2


def test_jax_receiver_frame_ring_overflow():
    x = _stream(4)
    rx = JaxReceiver(CFG, max_frames=2)
    frames = rx.run(x)
    assert len(frames) == 2
    assert rx.n_dropped == 2
    rx_big = JaxReceiver(CFG, max_frames=8)
    frames = rx_big.run(x)
    assert len(frames) == 4
    assert rx_big.n_dropped == 0


@pytest.mark.parametrize("snr_db", [20.0, 10.0])
def test_detection_sensitivity_matches_golden(snr_db):
    """The dense detector's >=2-consecutive-window candidate rule
    (rx/frontend.py:candidate_starts) is stricter than the reference's
    single-window fire (lib/decoder_impl.cc:366-377). Down to the SNRs the
    reference's own OTA suites exercise (~10 dB; its HackRF report is
    383/384) the dense engine must decode whatever golden decodes.

    Both engines run behind the channel filter (LoRaReceiver), as the
    reference's decoder always does — the ifreq-based correlations are
    specified for band-limited noise; raw wideband AWGN at the same
    nominal SNR is outside the reference's operating envelope too.
    """
    from lora_tpu.receiver import LoRaReceiver

    x = _stream(2, snr_db=snr_db, seed=int(snr_db))
    kw = dict(samp_rate=1e6, center_freq=868.1e6, channel_list=[868.1e6],
              bandwidth=125e3, sf=7, cr=4, crc=True)
    golden = LoRaReceiver(engine="golden", **kw).receive(x)
    dense = LoRaReceiver(engine="dense", max_candidates=4, max_symbols=24,
                         demod_method="fft", **kw).receive(x)
    assert [f.mac_payload for f in golden] == [b"\xde\xad\xbe\xef"] * 2
    got = sorted(f.mac_payload for f in dense)
    assert got == [f.mac_payload for f in golden]


@pytest.mark.parametrize("snr_db", [30.0, 10.0])
def test_dense_snr_matches_golden(snr_db):
    """Dense SNR now uses the reference's power-queue method
    (lib/decoder_impl.cc:360,377-383): signal = the firing DETECT
    window, noise = 3 DETECT windows earlier — it must agree with
    golden's estimate (which mirrors the reference exactly) to well
    under a dB. Both read ~8 dB above the nominal wideband SNR because
    the channel filter strips out-of-band noise first."""
    from lora_tpu.receiver import LoRaReceiver

    x = modulate_frame(CFG, b"\xde\xad\xbe\xef", pad_before=9000,
                       pad_after=2048, snr_db=snr_db, seed=2)
    kw = dict(samp_rate=1e6, center_freq=868.1e6, channel_list=[868.1e6],
              bandwidth=125e3, sf=7, cr=4, crc=True)
    g = LoRaReceiver(engine="golden", **kw).receive(x)
    d = LoRaReceiver(engine="dense", max_candidates=2, max_symbols=24,
                     **kw).receive(x)
    assert len(g) == len(d) == 1
    db_g = 10 * np.log10(g[0].snr)
    db_d = 10 * np.log10(d[0].snr)
    assert abs(db_g - db_d) < 1.0, (db_g, db_d)
