"""Sample-debugger bridge: wire-format and scope-loop tests.

The wire format must match the reference's packed header
(include/lora/debugger.h:40-43: uint32 length + bool draw_over, then raw
complex64 samples) so analyzers interoperate across implementations.
"""

import struct
import threading

import numpy as np

from lora_tpu.debugger import (
    AnalyzerServer,
    SampleDebugger,
    dump_samples,
    live_analyze,
)


def test_roundtrip_over_unix_socket(tmp_path):
    sock = str(tmp_path / "scope.sock")
    server = AnalyzerServer(sock)

    dbg = SampleDebugger()
    got = []

    def client():
        dbg.attach(sock)
        assert dbg.attached
        dbg.store_samples(np.arange(8, dtype=np.complex64))
        dbg.store_samples(np.arange(4, dtype=np.complex64) * 1j)
        dbg.analyze_samples(clear=True, draw_over=False)
        dbg.store_samples(np.ones(3, np.complex64))
        dbg.analyze_samples(clear=True, draw_over=True)
        dbg.detach()

    t = threading.Thread(target=client)
    t.start()
    server.accept(timeout=5.0)
    for buf, draw_over in server:
        got.append((buf, draw_over))
    t.join()
    server.close()

    assert len(got) == 2
    np.testing.assert_array_equal(
        got[0][0], np.concatenate([np.arange(8), np.arange(4) * 1j]).astype(np.complex64)
    )
    assert got[0][1] is False
    np.testing.assert_array_equal(got[1][0], np.ones(3, np.complex64))
    assert got[1][1] is True


def test_header_is_reference_compatible(tmp_path):
    """5-byte packed header: network-order uint32 length + 1-byte bool."""
    sock = str(tmp_path / "scope2.sock")
    server = AnalyzerServer(sock)
    dbg = SampleDebugger()

    def client():
        dbg.attach(sock)
        dbg.store_samples(np.zeros(2, np.complex64))
        dbg.analyze_samples(clear=True, draw_over=True)
        dbg.detach()

    t = threading.Thread(target=client)
    t.start()
    server.accept(timeout=5.0)
    raw = server._recv_exact(5 + 16)
    t.join()
    server.close()
    length, draw_over = struct.unpack("!IB", raw[:5])
    assert length == 2 * 8  # two complex64
    assert draw_over == 1


def test_unattached_is_noop():
    dbg = SampleDebugger()
    dbg.store_samples(np.ones(4, np.complex64))
    dbg.analyze_samples()  # no socket: must not raise
    dbg.attach("/nonexistent/path.sock")  # silent failure like the reference
    assert not dbg.attached


def test_live_analyze_loop(tmp_path):
    sock = str(tmp_path / "scope3.sock")
    seen = []

    def client():
        import time

        dbg = SampleDebugger()
        for _ in range(100):
            dbg.attach(sock)
            if dbg.attached:
                break
            time.sleep(0.05)
        dbg.store_samples(np.full(5, 2.0, np.complex64))
        dbg.analyze_samples()
        dbg.detach()

    t = threading.Thread(target=client)
    t.start()
    n = live_analyze(sock, on_buffer=lambda s, d: seen.append((s.copy(), d)),
                     max_buffers=1)
    t.join()
    assert n == 1
    assert len(seen) == 1 and len(seen[0][0]) == 5


def test_dump_samples(tmp_path):
    p = dump_samples("tap", np.arange(4, dtype=np.complex64), str(tmp_path))
    p = dump_samples("tap", np.arange(2, dtype=np.complex64), str(tmp_path))
    back = np.fromfile(p, dtype=np.complex64)
    np.testing.assert_array_equal(back, np.r_[np.arange(4), np.arange(2)])
