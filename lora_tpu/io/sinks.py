"""File and database frame sinks.

- :class:`MessageFileSink` <- reference ``lib/message_file_sink_impl.cc``
  (append raw frame bytes, flush per message).
- :class:`MessageMongoDBSink` <- reference ``python/message_mongodb_sink.py``
  (optional; stores ``{date, tag, chirp}`` documents; gated on pymongo
  availability like the reference's HAS_MONGODB cmake option).
"""

from __future__ import annotations

import datetime
from typing import Optional

from .frames import Frame, LORATAP


class MessageFileSink:
    """Appends raw frame bytes to a binary file, flushing per message.

    ``backend="auto"`` prefers the native C++ writer
    (:mod:`lora_tpu.native`), falling back to Python file IO.
    """

    def __init__(self, path: str, layer: int = LORATAP, backend: str = "auto"):
        self.path = path
        self.layer = layer
        self._native = None
        self._f = None
        if backend in ("auto", "native"):
            try:
                from ..native import NativeFileSink

                self._native = NativeFileSink(path)
            except Exception:
                if backend == "native":
                    raise
        if self._native is None:
            self._f = open(path, "ab")

    def handle(self, frame: Frame) -> None:
        data = frame.to_bytes(self.layer)
        if self._native is not None:
            self._native.write(data)
        else:
            self._f.write(data)
            self._f.flush()

    def handle_all(self, frames) -> None:
        for f in frames:
            self.handle(f)

    def close(self) -> None:
        if self._native is not None:
            self._native.close()
        if self._f is not None:
            self._f.close()


class MessageMongoDBSink:
    """Stores each frame as a MongoDB document (requires pymongo)."""

    def __init__(self, uri: str = "mongodb://localhost:27017/", db: str = "lora",
                 collection: str = "frames", tag: str = ""):
        try:
            import pymongo  # noqa: F401
            from pymongo import MongoClient
            import bson
        except ImportError as e:  # pragma: no cover - env without pymongo
            raise RuntimeError(
                "MessageMongoDBSink requires pymongo (reference HAS_MONGODB build option)"
            ) from e
        self._bson = bson
        self._coll = MongoClient(uri)[db][collection]
        self.tag = tag

    def handle(self, frame: Frame) -> None:
        self._coll.insert_one(
            {
                "date": datetime.datetime.utcnow(),
                "tag": self.tag,
                "chirp": self._bson.Binary(frame.to_bytes()),
            }
        )

    def handle_all(self, frames) -> None:
        for f in frames:
            self.handle(f)
