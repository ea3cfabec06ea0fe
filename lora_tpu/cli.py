"""Command-line tools.

- ``lora-decode-file``  — parity with ``apps/lora_receive_file_nogui.py``:
  decode a raw cf32/SigMF capture, print frames as hex, optionally forward
  over UDP.
- ``lora-testsuite``    — parity with ``python/qa_testsuite.py``: run SigMF
  suites, write Markdown accuracy reports.
- ``lora-gen-suite``    — hermetic analogue of
  ``apps/generate_test_suites.py``: synthesise suites with the modulator.
- ``lora-bench``        — per-kernel + end-to-end benchmarks.

Run via ``python -m lora_tpu.cli <command> ...``.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _low_snr_value(s: str):
    """--low-snr optional value: only 'auto' is meaningful — anything
    else (a typo, or a filename swallowed by nargs='?') must be a hard
    error rather than silently forcing full coherent mode."""
    if s == "auto":
        return "auto"
    raise argparse.ArgumentTypeError(
        f"--low-snr takes no value or 'auto', got {s!r}")


def cmd_decode_file(args) -> int:
    from .config import LoRaConfig
    from .receiver import LoRaReceiver
    from .io.udp import MessageSocketSink
    from .io.sigmf import read_trace

    import os

    if not os.path.exists(args.file):
        print(f"error: no such capture file: {args.file}", file=sys.stderr)
        return 2
    if args.file.endswith(".sigmf-meta"):
        trace = read_trace(args.file)
        samples = trace.samples
        samp_rate = trace.sample_rate
        cfg = trace.lora_config
        sf, cr, implicit, crc, reduced = (
            cfg.sf, cfg.cr, cfg.implicit, cfg.crc, cfg.reduced_rate,
        )
        center = trace.capture_freq
        channels = [trace.capture_freq + trace.frequency_offset]
    else:
        samples = np.fromfile(args.file, dtype=np.complex64)
        samp_rate = args.samp_rate
        sf, cr, implicit, crc = args.sf, args.cr, args.implicit, args.crc
        reduced = args.reduced_rate
        center = args.center_freq
        channels = [args.center_freq + args.offset]

    # --low-snr: coherent dechirp-fold detection/SFD on the dense fft
    # engine (docs/perf/sensitivity.md)
    engine = "dense" if args.low_snr else args.engine
    kw = {}
    if args.low_snr:
        kw["low_snr"] = "auto" if args.low_snr == "auto" else True
    rx = LoRaReceiver(
        samp_rate=samp_rate, center_freq=center, channel_list=channels,
        bandwidth=args.bandwidth, sf=sf, implicit=implicit, cr=cr, crc=crc,
        reduced_rate=reduced, conj=args.conj, decimation=args.decimation,
        disable_drift_correction=args.no_drift_correction, engine=engine,
        **kw,
    )
    frames = rx.receive(samples)
    sink = MessageSocketSink(args.udp_ip, args.udp_port, args.layer) if args.udp else None
    for f in frames:
        data = f.to_bytes(1)  # LORAPHY layer, like the demo's printout
        print(" ".join(f"{b:02x}" for b in data))
        if sink:
            sink.handle(f)
    print(f"decoded {len(frames)} frames", file=sys.stderr)
    return 0


def cmd_gateway(args) -> int:
    """Gateway receive: every channel x every SF of a wideband capture.

    The LoRaWAN-gateway listening pattern (all spreading factors on all
    channels concurrently) the reference has no single-block equivalent
    for — see wideband.MultiSFWidebandReceiver.
    """
    import os

    from .config import LoRaConfig
    from .io.udp import MessageSocketSink
    from .wideband import MultiSFWidebandReceiver

    if not os.path.exists(args.file):
        print(f"error: no such capture file: {args.file}", file=sys.stderr)
        return 2
    if args.plan:
        # LoRaWAN regional plan: mixer-bank channelizer on the 200 kHz
        # raster (see lora_tpu.plans); frequencies are absolute
        from .plans import PlanGateway

        kw = {}
        if args.bf16:
            import jax.numpy as jnp

            kw["plane_dtype"] = jnp.bfloat16
        gw = PlanGateway(
            args.plan, args.center_freq, args.samp_rate,
            sfs=tuple(args.sfs), bandwidth=args.bandwidth, cr=args.cr,
            crc=args.crc, implicit=args.implicit,
            # class default 0x34 (public LoRaWAN) unless the user set one
            sync_word=0x34 if args.sync_word is None else args.sync_word,
            pool=args.pool, header_checksum=args.header_checksum,
            demod_method="fft", **kw,
        )
    else:
        M = args.channels
        chan_rate = args.samp_rate / M
        cfg = LoRaConfig(
            sf=args.sfs[0], cr=args.cr, samp_rate=chan_rate,
            bandwidth=args.bandwidth, crc=args.crc, implicit=args.implicit,
            sync_word=0x00 if args.sync_word is None else args.sync_word,
        )
        kw = {}
        if args.bf16:
            import jax.numpy as jnp

            kw["plane_dtype"] = jnp.bfloat16
        gw = MultiSFWidebandReceiver(
            cfg, M, sfs=args.sfs, pool=args.pool, demod_method="fft",
            header_checksum=args.header_checksum, **kw,
        )
    if args.stream:
        # continuous mode: fixed-size overlap-save blocks with seam
        # dedup, file read chunkwise — bounded memory for arbitrarily
        # long captures (the reference's realtime flowgraph semantics,
        # apps/lora_receive_realtime.grc)
        from .stream import WidebandStreamingReceiver, pump_file

        sr = WidebandStreamingReceiver(gw, block_symbols=args.block_symbols)
        frames = pump_file(sr, args.file)
    else:
        frames = gw.run(np.fromfile(args.file, dtype=np.complex64))
    sink = (MessageSocketSink(args.udp_ip, args.udp_port, args.layer)
            if args.udp else None)
    for f in frames:
        data = f.to_bytes(1)  # LORAPHY layer, like decode-file
        print(f"ch{f.channel} sf{f.tap_header.sf} "
              f"{f.tap_header.frequency}Hz "
              + " ".join(f"{b:02x}" for b in data))
        if sink:
            sink.handle(f)
    print(f"decoded {len(frames)} frames on "
          f"{len({f.channel for f in frames})} channels", file=sys.stderr)
    return 0


def cmd_testsuite(args) -> int:
    from .testsuite import run_suite

    results = run_suite(
        args.path, args.suites, reports_path=args.reports,
        engine=args.engine, write_output=not args.nowrite,
        report_suffix="" if args.engine == "golden" else f"_{args.engine}",
    )
    return 0 if all(v >= args.min_accuracy for v in results.values()) else 1


def cmd_gen_suite(args) -> int:
    from .testsuite import generate_suite

    path = generate_suite(
        args.out, args.suite,
        sfs=tuple(args.sfs), crs=tuple(args.crs),
        samp_rate=args.samp_rate, snr_db=args.snr, cfo_hz=args.cfo,
        drift_ppm=args.drift_ppm, sync_word=args.sync_word,
        seed=args.seed,
    )
    print(path)
    return 0


def cmd_bench(args) -> int:
    import bench  # repo-root bench entry

    sys.argv = ["bench.py"] + ([str(args.channels)] if args.channels else [])
    bench.main()
    return 0


def cmd_timings(args) -> int:
    from .profiling import timing_table

    table = timing_table(tuple(args.sfs), tuple(args.methods),
                         iters=args.iters)
    print(table)
    if args.out:
        with open(args.out, "w") as f:
            f.write(table)
    return 0


def cmd_analyze(args) -> int:
    from .debugger import live_analyze

    live_analyze(args.socket, max_buffers=args.max_buffers)
    return 0


def cmd_flowgraph(args) -> int:
    from .flowgraph import run_flowgraph

    frames = run_flowgraph(args.file, max_frames=args.max_frames,
                           max_seconds=args.max_seconds)
    print(f"decoded {len(frames)} frames", file=sys.stderr)
    return 0


def cmd_blocks(args) -> int:
    """Dump the block descriptor set (parity with grc/*.block.yml)."""
    import yaml

    from .flowgraph import block_descriptors

    descs = block_descriptors()
    if args.block:
        descs = [d for d in descs if d["id"] in (args.block, f"lora_{args.block}")]
        if not descs:
            print(f"unknown block {args.block!r}", file=sys.stderr)
            return 2
    print(yaml.safe_dump_all(descs, sort_keys=False), end="")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="lora_tpu", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    d = sub.add_parser("decode-file", help="decode a capture file")
    d.add_argument("file")
    d.add_argument("--samp-rate", type=float, default=1e6)
    d.add_argument("--bandwidth", type=float, default=125e3)
    d.add_argument("--center-freq", type=float, default=868.1e6)
    d.add_argument("--offset", type=float, default=0.0)
    d.add_argument("--sf", type=int, default=7)
    d.add_argument("--cr", type=int, default=4)
    d.add_argument("--implicit", action="store_true")
    d.add_argument("--crc", action=argparse.BooleanOptionalAction, default=True,
                   help="payload carries a MAC CRC (--no-crc for raw cf32 "
                        "captures of crc-less frames)")
    d.add_argument("--reduced-rate", action="store_true")
    d.add_argument("--conj", action="store_true")
    d.add_argument("--decimation", type=int, default=1)
    d.add_argument("--no-drift-correction", action="store_true")
    d.add_argument("--engine", default="golden", choices=["golden", "parity", "dense"])
    d.add_argument("--low-snr", nargs="?", const=True, default=False,
                   type=_low_snr_value, metavar="auto",
                   help="coherent low-SNR mode (dense fft engine; "
                        "LoRa-silicon-class sensitivity, see "
                        "docs/perf/sensitivity.md). '--low-snr auto' "
                        "tries the standard gates first and retries "
                        "empty captures coherently")
    d.add_argument("--udp", action="store_true")
    d.add_argument("--udp-ip", default="127.0.0.1")
    d.add_argument("--udp-port", type=int, default=40868)
    d.add_argument("--layer", type=int, default=2)
    d.set_defaults(fn=cmd_decode_file)

    gw = sub.add_parser(
        "gateway",
        help="decode every channel x every SF of a raw cf32 wideband capture")
    gw.add_argument("file", help="raw complex64 wideband capture")
    gw.add_argument("--samp-rate", type=float, default=2e6,
                    help="wideband capture rate (channel rate = rate/channels)")
    gw.add_argument("--channels", type=int, default=8,
                    help="PFB channel count")
    gw.add_argument("--plan", default=None,
                    help="LoRaWAN regional plan (EU868/US915/AU915) "
                         "instead of a PFB grid; needs --center-freq")
    gw.add_argument("--center-freq", type=float, default=868.3e6)
    gw.add_argument("--sfs", type=int, nargs="+",
                    default=[7, 8, 9, 10, 11, 12])
    gw.add_argument("--cr", type=int, default=4)
    gw.add_argument("--bandwidth", type=float, default=125e3)
    gw.add_argument("--crc", action=argparse.BooleanOptionalAction,
                    default=True)
    gw.add_argument("--implicit", action="store_true")
    gw.add_argument("--sync-word", type=lambda s: int(s, 0), default=None,
                    help="radio sync word (default 0x00; 0x34 in --plan "
                         "mode = public LoRaWAN)")
    gw.add_argument("--pool", type=int, default=16,
                    help="per-SF global candidate pool")
    gw.add_argument("--bf16", action="store_true",
                    help="bfloat16 channel planes (halves on-chip bandwidth)")
    gw.add_argument("--header-checksum", action="store_true",
                    help="verify the PHY header checksum on rx")
    gw.add_argument("--stream", action="store_true",
                    help="continuous mode: overlap-save blocks + seam "
                         "dedup, bounded memory for long captures")
    gw.add_argument("--block-symbols", type=int, default=512,
                    help="--stream owned block length, in slowest-SF "
                         "symbols")
    gw.add_argument("--udp", action="store_true")
    gw.add_argument("--udp-ip", default="127.0.0.1")
    gw.add_argument("--udp-port", type=int, default=40868)
    gw.add_argument("--layer", type=int, default=2)
    gw.set_defaults(fn=cmd_gateway)

    t = sub.add_parser("testsuite", help="run SigMF test suites")
    t.add_argument("path")
    t.add_argument("suites", nargs="*")
    t.add_argument("--reports", default=None)
    t.add_argument("--engine", default="golden", choices=["golden", "parity", "dense"])
    t.add_argument("--nowrite", action="store_true")
    t.add_argument("--min-accuracy", type=float, default=0.0)
    t.set_defaults(fn=cmd_testsuite)

    g = sub.add_parser("gen-suite", help="generate a hermetic SigMF suite")
    g.add_argument("out")
    g.add_argument("--suite", default="short_sim")
    g.add_argument("--sfs", type=int, nargs="+", default=[7, 8, 9, 10, 11, 12])
    g.add_argument("--crs", type=int, nargs="+", default=[4, 3, 2, 1])
    g.add_argument("--samp-rate", type=float, default=1e6)
    g.add_argument("--snr", type=float, default=40.0)
    g.add_argument("--cfo", type=float, default=0.0)
    g.add_argument("--drift-ppm", type=float, default=0.0,
                   help="tx sample-clock offset (auto 30 for *drift* suites)")
    g.add_argument("--sync-word", type=lambda s: int(s, 0), default=0x00,
                   help="radio sync word (auto 0x12 for *sync12* suites)")
    g.add_argument("--seed", type=int, default=0)
    g.set_defaults(fn=cmd_gen_suite)

    b = sub.add_parser("bench", help="run the throughput benchmark")
    b.add_argument("--channels", type=int, default=None)
    b.set_defaults(fn=cmd_bench)

    tm = sub.add_parser(
        "timings",
        help="per-stage timing study (parity with examples/lora-timings)",
    )
    tm.add_argument("--sfs", type=int, nargs="+", default=[7, 12])
    tm.add_argument("--methods", nargs="+", default=["gradient", "fft"])
    tm.add_argument("--iters", type=int, default=5)
    tm.add_argument("--out", default=None)
    tm.set_defaults(fn=cmd_timings)

    fg = sub.add_parser(
        "flowgraph",
        help="run a declarative flowgraph (parity with GRC .grc files)")
    fg.add_argument("file", help="flowgraph YAML")
    fg.add_argument("--max-frames", type=int, default=None)
    fg.add_argument("--max-seconds", type=float, default=None)
    fg.set_defaults(fn=cmd_flowgraph)

    bl = sub.add_parser(
        "blocks",
        help="list flowgraph block descriptors (parity with grc/*.block.yml)")
    bl.add_argument("block", nargs="?", default=None)
    bl.set_defaults(fn=cmd_blocks)

    a = sub.add_parser(
        "analyze", help="live sample scope (parity with grlora_analyze.py)"
    )
    a.add_argument("--socket", default="/tmp/gr_lora.sock")
    a.add_argument("--max-buffers", type=int, default=None)
    a.set_defaults(fn=cmd_analyze)

    args = p.parse_args(argv)
    return args.fn(args)


# console_scripts entry points (pyproject.toml) — one per tool, matching
# the reference's one-app-per-task layout (apps/).
def _entry(command):
    def run() -> int:
        return main([command] + sys.argv[1:])

    return run


main_decode_file = _entry("decode-file")
main_testsuite = _entry("testsuite")
main_gen_suite = _entry("gen-suite")
main_bench = _entry("bench")
main_analyze = _entry("analyze")
main_flowgraph = _entry("flowgraph")
main_timings = _entry("timings")
main_gateway = _entry("gateway")


if __name__ == "__main__":
    raise SystemExit(main())
