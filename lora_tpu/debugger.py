"""Sample-level debugging: live scope bridge + intermediate-array taps.

Host-side equivalent of the reference's debug subsystem:

- :class:`SampleDebugger` <- ``lib/debugger.cc`` /
  ``include/lora/debugger.h``: buffers complex samples and ships them over
  a UNIX stream socket to an analyzer. Wire format is byte-compatible with
  the reference (``debugger.h:40-43``): a packed 5-byte header
  ``{uint32 length_be, uint8 draw_over}`` followed by ``length`` bytes of
  complex64 samples, so the reference's ``apps/grlora_analyze.py`` can be
  pointed at this framework unchanged (and vice versa).
- :class:`AnalyzerServer` <- the listening half of
  ``apps/grlora_analyze.py:48-120``: accepts a debugger connection and
  yields decoded sample buffers.
- :func:`live_analyze` <- the matplotlib scope of ``grlora_analyze.py``
  (amplitude + instantaneous frequency, ``draw_over`` overlays).

Array-level taps (the TPU analogue of the reference's ``GRLORA_DEBUG``
file dumps, ``lib/decoder_impl.cc:63-67,167-168``) live on the receivers
themselves: :class:`lora_tpu.rx.golden.GoldenReceiver` records a
:class:`~lora_tpu.rx.golden.DebugTrace` of per-symbol bins/words and
interleave matrices, and :func:`dump_samples` here reproduces the raw
``/tmp/<name>`` binary dumps for offline inspection.
"""

from __future__ import annotations

import os
import socket
import struct
from typing import Callable, Iterator, Optional

import numpy as np

DEFAULT_SOCK = "/tmp/gr_lora.sock"
_HDR = struct.Struct("!IB")  # uint32 length (network order) + bool draw_over


class SampleDebugger:
    """Client side: buffer samples, send them to an attached analyzer.

    Mirrors the reference API (``attach/detach/store_samples/
    analyze_samples``, include/lora/debugger.h:33-37). Unattached, every
    call is a cheap no-op — same contract as the reference, where the
    whole subsystem only activates under ``GRLORA_DEBUG``.
    """

    def __init__(self) -> None:
        self._sock: Optional[socket.socket] = None
        self._samples: list[np.ndarray] = []

    @property
    def attached(self) -> bool:
        return self._sock is not None

    def attach(self, path: str = DEFAULT_SOCK) -> None:
        s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        try:
            s.connect(path)
        except OSError:
            # reference silently ignores a missing analyzer (debugger.cc:31-35)
            s.close()
            return
        self._sock = s

    def detach(self) -> None:
        if self._sock is not None:
            self._sock.close()
            self._sock = None

    def store_samples(self, samples) -> None:
        if self._sock is not None:
            self._samples.append(np.asarray(samples, dtype=np.complex64))

    def analyze_samples(self, clear: bool = True, draw_over: bool = False) -> None:
        if self._sock is None:
            return
        buf = (
            np.concatenate(self._samples)
            if self._samples
            else np.zeros(0, np.complex64)
        ).tobytes()
        try:
            self._sock.sendall(_HDR.pack(len(buf), int(draw_over)) + buf)
        except OSError:
            self.detach()
            return
        if clear:
            self._samples.clear()


class AnalyzerServer:
    """Listening side: accept one debugger client, iterate sample buffers.

    Yields ``(samples, draw_over)`` tuples. Equivalent to the socket setup
    in ``apps/grlora_analyze.py`` (bind/listen/accept + length-prefixed
    recv loop).
    """

    def __init__(self, path: str = DEFAULT_SOCK):
        self.path = path
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass
        self._server = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._server.bind(path)
        self._server.listen(1)
        self._conn: Optional[socket.socket] = None

    def accept(self, timeout: Optional[float] = None) -> None:
        self._server.settimeout(timeout)
        self._conn, _ = self._server.accept()

    def _recv_exact(self, n: int) -> bytes:
        assert self._conn is not None
        chunks = []
        while n:
            b = self._conn.recv(n)
            if not b:
                raise ConnectionError("debugger disconnected")
            chunks.append(b)
            n -= len(b)
        return b"".join(chunks)

    def __iter__(self) -> Iterator[tuple]:
        while True:
            try:
                length, draw_over = _HDR.unpack(self._recv_exact(_HDR.size))
                payload = self._recv_exact(length)
            except (ConnectionError, OSError):
                return
            yield np.frombuffer(payload, dtype=np.complex64), bool(draw_over)

    def close(self) -> None:
        if self._conn is not None:
            self._conn.close()
        self._server.close()
        try:
            os.unlink(self.path)
        except FileNotFoundError:
            pass


def dump_samples(name: str, samples, directory: str = "/tmp") -> str:
    """Append raw complex64 samples to ``<directory>/<name>`` — the
    reference's binary tap files (lib/decoder_impl.cc:167-168 open
    /tmp/{downchirp,upchirp,data,...}). Returns the path."""
    path = os.path.join(directory, name)
    with open(path, "ab") as f:
        f.write(np.asarray(samples, dtype=np.complex64).tobytes())
    return path


def live_analyze(
    path: str = DEFAULT_SOCK,
    on_buffer: Optional[Callable] = None,
    max_buffers: Optional[int] = None,
) -> int:
    """Run the analyzer scope (parity with ``apps/grlora_analyze.py``).

    With matplotlib present, plots |x| and instantaneous frequency per
    buffer, overlaying when ``draw_over`` is set; otherwise prints buffer
    statistics. ``on_buffer(samples, draw_over)`` overrides both (tests).
    Returns the number of buffers processed.
    """
    try:
        import matplotlib

        matplotlib.use(os.environ.get("MPLBACKEND", "Agg"))
        import matplotlib.pyplot as plt
    except ImportError:
        plt = None

    server = AnalyzerServer(path)
    print(f"listening on {path} ...")
    server.accept()
    n = 0
    try:
        for samples, draw_over in server:
            n += 1
            if on_buffer is not None:
                on_buffer(samples, draw_over)
            elif plt is not None and len(samples):
                ifreq = np.diff(np.unwrap(np.angle(samples)))
                if not draw_over:
                    plt.clf()
                ax1 = plt.subplot(211)
                ax1.plot(np.abs(samples))
                ax1.set_ylabel("|x|")
                ax2 = plt.subplot(212)
                ax2.plot(ifreq)
                ax2.set_ylabel("inst. freq")
                plt.pause(0.001) if matplotlib.get_backend() != "Agg" else None
            else:
                print(
                    f"buffer {n}: {len(samples)} samples, "
                    f"mean |x| = {np.abs(samples).mean() if len(samples) else 0:.4g}, "
                    f"draw_over={draw_over}"
                )
            if max_buffers is not None and n >= max_buffers:
                break
    finally:
        server.close()
    return n
