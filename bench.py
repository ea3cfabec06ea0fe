#!/usr/bin/env python
"""Benchmark: aggregate IQ throughput of the dense multi-channel receiver.

Measures end-to-end samples/s of the full receive pipeline (dense preamble
detection + sync + demod + decode, fft demod path) on a packet-bearing
multi-channel load, on whatever device JAX provides (TPU in CI).

Baseline: the reference decodes ~1 Msample/s in real time on a desktop CPU
(reference README.md:91,119; BASELINE.md "Real-time operation"), so
``vs_baseline`` is the speedup over 1 Msample/s.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    from lora_tpu import LoRaConfig
    from lora_tpu.rx.dense import DenseReceiver
    from lora_tpu.tx.modulator import modulate_frame

    # Reference demo geometry: SF7 CR4/8 BW125 @ 1 Msps (decim 8)
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True)
    sps = cfg.samples_per_symbol

    n_channels = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    block_symbols = 2048
    block_len = block_symbols * sps  # ~2.1 Msamples/channel

    # load: every channel carries packets (worst-case duty cycle for the
    # candidate pipelines; detection scans everything regardless)
    pkt = modulate_frame(cfg, bytes.fromhex("deadbeef"), pad_before=4096,
                         pad_after=4096, snr_db=40.0)
    reps = block_len // len(pkt)
    stream = np.tile(pkt, max(1, reps))[:block_len]
    if len(stream) < block_len:
        stream = np.pad(stream, (0, block_len - len(stream)))
    x = np.stack([np.roll(stream, 997 * c) for c in range(n_channels)]).astype(np.complex64)

    from lora_tpu.ops.xfer import pack_iq

    rx = DenseReceiver(cfg, max_candidates=8, max_symbols=24,
                       sfd_search=12, demod_method="fft")
    xd = jax.device_put(pack_iq(x))

    # warmup / compile
    res = rx.process(xd)
    jax.block_until_ready(res)
    n_frames = int(np.asarray(res.valid).sum())
    expected = n_channels * min(8, reps)
    if n_frames < expected * 0.9:
        print(f"WARNING: decoded {n_frames}, expected ~{expected}", file=sys.stderr)

    # timed
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        res = rx.process(xd)
    jax.block_until_ready(res)
    dt = time.perf_counter() - t0

    total_samples = n_channels * block_len * iters
    msps = total_samples / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "dense_rx_throughput",
                "value": round(msps, 1),
                "unit": "Msamples/s/chip",
                "vs_baseline": round(msps / 1.0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
