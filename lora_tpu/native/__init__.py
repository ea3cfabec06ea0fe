"""ctypes bindings for the native host-runtime library.

Builds ``libloratpu_host.so`` from :file:`host_io.cpp` on first use (plain
``make``; no pybind11 — C ABI + ctypes) and exposes the native equivalents
of the reference's C++ runtime blocks:

- :class:`NativeUdpSink`    <- lib/message_socket_sink_impl.cc
- :class:`NativeUdpSource`  <- lib/message_socket_source_impl.cc
- :class:`NativeFileSink`   <- lib/message_file_sink_impl.cc
- :class:`SampleRing`       <- GNU Radio's bounded stream buffers (the
  backpressure primitive between the IQ producer and the TPU dispatcher),
  with peek/advance for overlap-save streaming.

``available()`` reports whether the toolchain produced a library; all
users (``lora_tpu.io``, ``lora_tpu.stream``) fall back to pure-Python
implementations when it is False.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libloratpu_host.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "libloratpu_host.so"],
            cwd=_DIR,
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        f32p = ctypes.POINTER(ctypes.c_float)
        sigs = {
            "lt_udp_sink_open": ([ctypes.c_char_p, ctypes.c_int], ctypes.c_void_p),
            "lt_udp_sink_send": ([ctypes.c_void_p, u8p, ctypes.c_long], ctypes.c_long),
            "lt_udp_sink_close": ([ctypes.c_void_p], None),
            "lt_udp_source_open": ([ctypes.c_char_p, ctypes.c_int], ctypes.c_void_p),
            "lt_udp_source_poll": (
                [ctypes.c_void_p, u8p, ctypes.c_long, ctypes.c_int],
                ctypes.c_long,
            ),
            "lt_udp_source_close": ([ctypes.c_void_p], None),
            "lt_file_sink_open": ([ctypes.c_char_p], ctypes.c_void_p),
            "lt_file_sink_write": ([ctypes.c_void_p, u8p, ctypes.c_long], ctypes.c_long),
            "lt_file_sink_close": ([ctypes.c_void_p], None),
            "lt_ring_create": ([ctypes.c_long], ctypes.c_void_p),
            "lt_ring_capacity": ([ctypes.c_void_p], ctypes.c_long),
            "lt_ring_readable": ([ctypes.c_void_p], ctypes.c_long),
            "lt_ring_write": ([ctypes.c_void_p, u8p, ctypes.c_long], ctypes.c_long),
            "lt_ring_read": ([ctypes.c_void_p, u8p, ctypes.c_long], ctypes.c_long),
            "lt_ring_peek": ([ctypes.c_void_p, u8p, ctypes.c_long], ctypes.c_long),
            "lt_ring_advance": ([ctypes.c_void_p, ctypes.c_long], ctypes.c_long),
            "lt_ring_destroy": ([ctypes.c_void_p], None),
            "lora_pack_iq_f32": (
                [f32p, ctypes.c_size_t, f32p, f32p], None),
            "lora_pack_iq_bf16": (
                [f32p, ctypes.c_size_t, u16p, u16p], None),
        }

        def bind(lib_):
            try:
                for name, (argtypes, restype) in sigs.items():
                    fn = getattr(lib_, name)
                    fn.argtypes = argtypes
                    fn.restype = restype
                return True
            except AttributeError:
                return False  # stale library from an older source tree

        if not bind(lib):
            try:
                os.remove(_LIB_PATH)
            except OSError:
                pass
            if not _build():
                return None
            try:
                lib = ctypes.CDLL(_LIB_PATH)
            except OSError:
                return None
            if not bind(lib):
                return None
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _as_u8p(buf: bytes):
    return ctypes.cast(ctypes.c_char_p(buf), ctypes.POINTER(ctypes.c_uint8))


class NativeUdpSink:
    """UDP datagram-per-frame sink (native sendto path)."""

    def __init__(self, ip: str = "127.0.0.1", port: int = 40868):
        lib = load()
        if lib is None:
            raise RuntimeError("native host library unavailable")
        self._lib = lib
        self._h = lib.lt_udp_sink_open(ip.encode(), port)
        if not self._h:
            raise OSError(f"cannot open UDP sink to {ip}:{port}")

    def send(self, data: bytes) -> int:
        return int(self._lib.lt_udp_sink_send(self._h, _as_u8p(data), len(data)))

    def close(self) -> None:
        if self._h:
            self._lib.lt_udp_sink_close(self._h)
            self._h = None


class NativeUdpSource:
    """Background-thread UDP receiver with a bounded drop-oldest queue."""

    def __init__(self, addr: str = "0.0.0.0", port: int = 40868):
        lib = load()
        if lib is None:
            raise RuntimeError("native host library unavailable")
        self._lib = lib
        self._h = lib.lt_udp_source_open(addr.encode(), port)
        if not self._h:
            raise OSError(f"cannot bind UDP source {addr}:{port}")
        self._buf = (ctypes.c_uint8 * 65536)()

    def poll(self, timeout_ms: int = 200) -> Optional[bytes]:
        n = self._lib.lt_udp_source_poll(self._h, self._buf, 65536, timeout_ms)
        if n == 0:
            return None
        if n == -2:  # empty datagram
            return b""
        return bytes(self._buf[: int(n)])

    def close(self) -> None:
        if self._h:
            self._lib.lt_udp_source_close(self._h)
            self._h = None


class NativeFileSink:
    """Append-only frame file sink, flushed per write."""

    def __init__(self, path: str):
        lib = load()
        if lib is None:
            raise RuntimeError("native host library unavailable")
        self._lib = lib
        self._h = lib.lt_file_sink_open(path.encode())
        if not self._h:
            raise OSError(f"cannot open {path}")

    def write(self, data: bytes) -> int:
        return int(self._lib.lt_file_sink_write(self._h, _as_u8p(data), len(data)))

    def close(self) -> None:
        if self._h:
            self._lib.lt_file_sink_close(self._h)
            self._h = None


class SampleRing:
    """SPSC byte ring carrying packed IQ between producer and dispatcher.

    ``peek``/``advance`` implement overlap-save: the dispatcher peeks
    ``block + halo`` bytes but only advances ``block``, so the next block
    re-reads the halo.
    """

    def __init__(self, capacity_bytes: int):
        lib = load()
        if lib is None:
            raise RuntimeError("native host library unavailable")
        self._lib = lib
        self._h = lib.lt_ring_create(capacity_bytes)

    @property
    def capacity(self) -> int:
        return int(self._lib.lt_ring_capacity(self._h))

    @property
    def readable(self) -> int:
        return int(self._lib.lt_ring_readable(self._h))

    def write(self, data) -> int:
        data = np.asarray(data).tobytes() if not isinstance(data, (bytes, bytearray)) else bytes(data)
        return int(self._lib.lt_ring_write(self._h, _as_u8p(data), len(data)))

    def read(self, n: int) -> bytes:
        buf = (ctypes.c_uint8 * n)()
        got = self._lib.lt_ring_read(self._h, buf, n)
        return bytes(buf[: int(got)])

    def peek(self, n: int) -> bytes:
        buf = (ctypes.c_uint8 * n)()
        got = self._lib.lt_ring_peek(self._h, buf, n)
        return bytes(buf[: int(got)])

    def advance(self, n: int) -> int:
        return int(self._lib.lt_ring_advance(self._h, n))

    def close(self) -> None:
        if self._h:
            self._lib.lt_ring_destroy(self._h)
            self._h = None


def pack_iq_native(x: np.ndarray, dtype=np.float32):
    """Native single-pass IQ packer: complex64 ``[..., L]`` -> planes
    ``[..., 2, L]`` (float32 or bfloat16 bit patterns).

    The host analogue of the reference's VOLK deinterleave kernels; one
    fused pass instead of numpy's two strided copies + cast (see
    native/pack.cpp). Returns None when the native library is
    unavailable or the input isn't contiguous complex64 — callers fall
    back to the numpy path (ops/xfer.pack_iq).
    """
    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x)
    if x.dtype != np.complex64:
        return None
    n = x.size
    flat = x.reshape(-1, x.shape[-1])
    L = x.shape[-1]
    src = flat.view(np.float32)  # [rows, 2*L] interleaved
    dt = np.dtype(dtype)
    if dt.name not in ("float32", "bfloat16"):
        return None
    is_bf16 = dt.name == "bfloat16"
    f32p = ctypes.POINTER(ctypes.c_float)
    if is_bf16:
        out = np.empty(flat.shape[:-1] + (2, L), np.uint16)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        for r in range(flat.shape[0]):
            lib.lora_pack_iq_bf16(
                src[r].ctypes.data_as(f32p), L,
                out[r, 0].ctypes.data_as(u16p),
                out[r, 1].ctypes.data_as(u16p))
        return out.reshape(x.shape[:-1] + (2, L)).view(dtype)
    out = np.empty(flat.shape[:-1] + (2, L), np.float32)
    for r in range(flat.shape[0]):
        lib.lora_pack_iq_f32(
            src[r].ctypes.data_as(f32p), L,
            out[r, 0].ctypes.data_as(f32p),
            out[r, 1].ctypes.data_as(f32p))
    return out.reshape(x.shape[:-1] + (2, L))
