#!/usr/bin/env python
"""Decode-rate vs SNR sensitivity curves (characterization the
reference never published).

Two receiver modes on near-critically-sampled channels (the deployment
regime — out-of-band noise already removed by channelization):

- ``parity``: the reference's gate chain (autocorr detection >= 0.90,
  ifreq-Pearson SFD at 0.96) on the fft engine.
- ``coherent``: ``DenseReceiver(low_snr=True)`` — dechirp-fold
  detection + up/down-dechirp SFD, full ``10*log10(sps)`` processing
  gain.

SNR convention: ``modulate_frame(snr_db=...)`` defines signal power as
``2*amp^2`` (I+Q), so true per-sample SNR = label - 3 dB. LoRa silicon
sensitivity at BW125 is about -7.5 dB (SF7) / -20 dB (SF12) true SNR.

Writes markdown rows to stdout; paste into docs/perf/sensitivity.md.
Run: python tools/snr_curve.py [n_per_point]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lora_tpu import LoRaConfig
from lora_tpu.rx.dense import DenseReceiver
from lora_tpu.tx.modulator import modulate_frame

PAYLOAD = bytes.fromhex("deadbeef")


def rate(cfg, rx, snr_db, n, seed0=0):
    sps = cfg.samples_per_symbol
    ok = 0
    for k in range(n):
        x = modulate_frame(cfg, PAYLOAD, pad_before=2500 + 137 * k,
                           pad_after=3 * sps, snr_db=snr_db, seed=seed0 + k)
        frames = rx.run(x)
        ok += any(f.mac_payload == PAYLOAD for f in frames)
    return ok / n


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cases = [
        (7, LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True),
         list(range(-14, 9, 2))),
        (12, LoRaConfig(sf=12, cr=4, samp_rate=125e3, crc=True,
                        reduced_rate=True),
         list(range(-26, -3, 2))),
    ]
    for sf, cfg, snrs in cases:
        print(f"\nSF{sf} ({cfg.samp_rate / 1e3:.0f} ksps):\n")
        print("| mode | " + " | ".join(f"{s} dB" for s in snrs) + " |")
        print("|---|" + "---|" * len(snrs))
        for mode, kw in (("parity gates", dict(demod_method="fft")),
                         ("coherent (low_snr)", dict(low_snr=True))):
            rx = DenseReceiver(cfg, max_candidates=8, max_symbols=24,
                               sfd_search=12, **kw)
            row = [f"{100 * rate(cfg, rx, float(s), n):.0f}%" for s in snrs]
            print(f"| {mode} | " + " | ".join(row) + " |", flush=True)


if __name__ == "__main__":
    main()
