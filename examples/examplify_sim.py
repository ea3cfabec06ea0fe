#!/usr/bin/env python
"""Accuracy measurement loop — hermetic analogue of the reference's
``examples/_examplify_live.py``.

The reference drives a real RN2483 transmitter over an osmosdr capture
while collecting decoded frames from ``message_socket_sink`` over UDP,
then writes a per-(SF, CR) pass-rate CSV
(``live_example_results_SF_CR.csv``). This version keeps the exact
measurement loop — random even-length hex payloads of 1–8 bytes, N per
setting, UDP frame collection, per-setting ``TestResultData`` rows and
the same CSV — but replaces the radio hardware with the framework's own
modulator (``lora_tpu.tx``), with SNR/CFO knobs standing in for SDR
gains, so the study runs anywhere:

    python examples/examplify_sim.py --times 20 --snr 15

Unlike the reference's commented-out driver, this one runs end to end by
default.
"""

from __future__ import annotations

import argparse
import collections
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lora_tpu import LoRaConfig
from lora_tpu.io.frames import LORAMAC
from lora_tpu.io.udp import LoRaUDPServer, MessageSocketSink
from lora_tpu.receiver import LoRaReceiver
from lora_tpu.tx.modulator import modulate_frame

TestResultData = collections.namedtuple(
    "TestResultData", ["SF", "CR", "passing", "total", "rate"]
)


class ExamplifySim:
    """One (SF, CR) setting: synthesize-transmit-decode-collect-compare."""

    def __init__(self, spreading_factor: int = 7, coding_rate: str = "4/5",
                 snr_db: float = 30.0, cfo_hz: float = 0.0,
                 samp_rate: float = 1e6, port: int = 40868,
                 engine: str = "golden", seed: int = 0):
        self.sf = spreading_factor
        self.coding_rate = coding_rate
        # reference CR naming: "4/x" with x = 4 + cr, cr in 1..4
        self.cr = int(coding_rate.split("/")[1]) - 4
        self.snr_db = snr_db
        self.cfo_hz = cfo_hz
        self.samp_rate = samp_rate
        self.rng = np.random.default_rng(seed)
        self.test_results: TestResultData | None = None

        target_freq, capture_freq = 868.1e6, 868.0e6
        self.cfg = LoRaConfig(sf=self.sf, cr=self.cr, samp_rate=samp_rate,
                              crc=True, reduced_rate=self.sf > 10)
        self.rx = LoRaReceiver(
            samp_rate=samp_rate, center_freq=capture_freq,
            channel_list=[target_freq], bandwidth=125e3,
            sf=self.sf, cr=self.cr, crc=True,
            reduced_rate=self.sf > 10, engine=engine,
        )
        # decoded frames leave over real UDP, as in the reference graph
        self.server = LoRaUDPServer(port=port)
        self.sink = MessageSocketSink(port=port, layer=LORAMAC)

    def close(self):
        self.sink.close()
        self.server.close()

    # -- the reference's transmitRawData: RN2483 sends; here we synthesize
    def synthesize(self, data_list):
        sps = self.cfg.samples_per_symbol
        chunks = [np.zeros(4 * sps, np.complex64)]
        for hexstr in data_list:
            chunks.append(modulate_frame(
                self.cfg, bytes.fromhex(hexstr),
                pad_before=int(self.rng.integers(2000, 4000)),
                pad_after=sps, snr_db=self.snr_db, cfo_hz=self.cfo_hz,
                seed=int(self.rng.integers(0, 2 ** 31)),
            ))
        chunks.append(np.zeros(4 * sps, np.complex64))
        # the channelizer mixes the 868.1 MHz channel down from the
        # 868.0 MHz capture, as the reference's osmosdr graph does
        stream = np.concatenate(chunks)
        t = np.arange(len(stream))
        shift = (868.1e6 - 868.0e6) / self.samp_rate
        return (stream * np.exp(2j * np.pi * shift * t)).astype(np.complex64)

    def transmit_to_capture(self, data_list):
        frames = self.rx.receive(self.synthesize(data_list))
        self.sink.handle_all(frames)
        # get_payloads returns hexlified payload strings (lorasocket parity)
        received = self.server.get_payloads(len(data_list))
        self.compare_data_sets(data_list, [r.decode() for r in received])

    def compare_data_sets(self, transmitted, received):
        passing = sum(
            1 for idx, val in enumerate(transmitted)
            if idx < len(received) and received[idx] == val
        )
        total = len(transmitted)
        self.test_results = TestResultData(
            self.sf, self.coding_rate, passing, total,
            float(passing) / total * 100.0,
        )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--sfs", type=int, nargs="+", default=[7, 8, 9, 10, 11, 12])
    p.add_argument("--crs", nargs="+", default=["4/5", "4/6", "4/7", "4/8"])
    p.add_argument("--times", type=int, default=10,
                   help="packets per (SF, CR) setting (reference: 100)")
    p.add_argument("--snr", type=float, default=30.0, help="sim SNR (dB)")
    p.add_argument("--cfo", type=float, default=0.0, help="sim CFO (Hz)")
    p.add_argument("--engine", default="golden",
                   choices=["golden", "parity", "dense"])
    p.add_argument("--out", default="live_example_results_SF_CR.csv")
    p.add_argument("--seed", type=int, default=None)
    args = p.parse_args(argv)

    random.seed(args.seed)
    rows = []
    for sf in args.sfs:
        for cr in args.crs:
            # random even-length hex strings, 2..16 nibbles (reference loop)
            rdata = [
                "".join(f"{random.randrange(0x0, 0xF):1x}"
                        for _ in range(random.randrange(2, 17)))
                for _ in range(args.times)
            ]
            rdata = [x if len(x) % 2 == 0 else "0" + x for x in rdata]
            e = ExamplifySim(sf, cr, snr_db=args.snr, cfo_hz=args.cfo,
                             engine=args.engine,
                             seed=0 if args.seed is None else args.seed)
            try:
                e.transmit_to_capture(rdata)
            finally:
                e.close()
            res = e.test_results
            rows.append(res)
            print(f"[SF{res.SF:2d}, CR{res.CR}] : Passed rate: "
                  f"{res.passing:d} out of {res.total:d}  ({res.rate:.2f}%)")

    with open(args.out, "w") as f:
        f.write("SF,CR,PASSED,TOTAL,RATE\n")
        for r in rows:
            f.write(f"{r.SF:d},{r.CR},{r.passing:d},{r.total:d},{r.rate:.2f}\n")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
