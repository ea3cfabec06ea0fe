"""Continuous streaming around the block receiver (the scheduler layer).

The reference runs inside GNU Radio's threaded flowgraph scheduler:
bounded buffers between blocks, backpressure via ``work()``/
``consume_each`` (SURVEY.md §2.5). The TPU equivalent implemented here:

- **overlap-save blocking**: the unbounded IQ stream is cut into
  fixed-size blocks of ``hop + halo`` samples, ``halo >= `` one maximal
  packet region, so every packet is fully contained in at least one block.
- **ownership dedup**: a packet is emitted only by the block whose ``hop``
  region contains its start — packets straddling a seam are decoded by
  the next block, never twice.
- **double buffering**: block ``k+1`` is dispatched to the device before
  block ``k``'s results are fetched, overlapping host IO with device
  compute (XLA async dispatch is the pipeline parallelism here).
- **bounded ring ingestion**: when the native host library is available,
  IQ flows through the lock-free C++ SPSC ring
  (:class:`lora_tpu.native.SampleRing`) with peek/advance overlap-save —
  the GNU Radio bounded-buffer/backpressure primitive.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from .io.frames import Frame
from .ops.xfer import pack_iq
from .rx.dense import DenseReceiver


def _dedup_and_emit(rx, seen, abs_start: int, payload: bytes, make_frame,
                    dedup_distance: int):
    """Seam dedup + CRC-preferenced conflict resolution, shared by the
    streaming receivers.

    A packet whose rising edge is clipped by a block boundary re-detects
    in the next block at a slightly different start — a prior emission
    (``seen`` entry) within ``dedup_distance`` suppresses the
    re-detection (the first block, which saw the unclipped preamble,
    wins). If the suppressed decode's payload DIFFERS it is counted as a
    conflict; and if the later decode passes the MAC CRC while the
    blocker failed it, the clean frame is emitted as a CORRECTION —
    retracted from the pending list when the caller hasn't collected the
    corrupt one yet, otherwise delivered as a second emission flagged
    ``dedup_replacement`` + ``replaces`` (the corrupt frame may already
    be downstream; consumers correlate via the flag rather than silently
    receiving a duplicate).

    ``rx`` provides ``_frames``/``sinks`` and the dedup counters;
    ``seen`` is the mutable recent-emissions list for this
    (sf, channel); returns the emitted Frame or None.
    """
    blocker = next(
        (s for s in seen if abs(abs_start - s[0]) < dedup_distance), None,
    )
    if blocker is not None:
        if blocker[1] != payload:
            rx.n_dedup_conflicts += 1
            f_new = make_frame()
            f_old = blocker[2]
            if f_new.crc_ok and f_old is not None \
                    and f_old.crc_ok is False:
                rx.n_dedup_replaced += 1
                f_new.dedup_replacement = True
                f_new.replaces = f_old.sample_index
                try:
                    rx._frames.remove(f_old)
                except ValueError:
                    pass  # already collected by the caller
                seen[seen.index(blocker)] = (abs_start, payload, f_new)
                rx._frames.append(f_new)
                for s in rx.sinks:
                    s.handle(f_new)
                return f_new
        rx.n_dedup_suppressed += 1
        return None
    f = make_frame()
    seen.append((abs_start, payload, f))
    if len(seen) > 64:
        del seen[:32]
    rx._frames.append(f)
    for s in rx.sinks:
        s.handle(f)
    return f


class _IngestBuffer:
    """Ring-or-numpy IQ ingest shared by the streaming receivers.

    Backed by the lock-free C++ SPSC ring (:class:`lora_tpu.native.
    SampleRing`) when the native library is available — the GNU Radio
    bounded-buffer/backpressure primitive — else a numpy concat buffer.
    ``write`` invokes ``on_full()`` when the ring is full (the caller
    consumes blocks to free space: backpressure).
    """

    def __init__(self, capacity_samples: int, use_native: bool = True):
        self._ring = None
        if use_native:
            try:
                from .native import SampleRing

                self._ring = SampleRing(capacity_samples * 8)
            except Exception:
                self._ring = None
        self._buf = np.zeros(0, np.complex64)

    @property
    def buffered(self) -> int:
        if self._ring is not None:
            return self._ring.readable // 8
        return len(self._buf)

    def write(self, x: np.ndarray, on_full) -> None:
        if self._ring is None:
            self._buf = np.concatenate([self._buf, x])
            return
        raw = x.tobytes()
        off = 0
        while off < len(raw):
            wrote = self._ring.write(raw[off:])
            off += wrote
            if wrote == 0:
                on_full()

    def take(self, n: int, consume: int) -> np.ndarray:
        """Peek ``n`` samples from the head, consuming ``consume``."""
        if self._ring is not None:
            data = np.frombuffer(self._ring.peek(n * 8), dtype=np.complex64)
            self._ring.advance(consume * 8)
            return data
        data = self._buf[:n]
        self._buf = self._buf[consume:]
        return data

    def close(self) -> None:
        if self._ring is not None:
            self._ring.close()
            self._ring = None


class StreamingReceiver:
    """Feed arbitrary-length IQ in, get deduplicated frames out.

    ``block_symbols``: owned (hop) region length per block, in symbols.
    Candidate capacity of ``receiver`` must cover the packets expected in
    one hop region.
    """

    def __init__(
        self,
        receiver: DenseReceiver,
        block_symbols: int = 512,
        sinks: Sequence = (),
        max_in_flight: int = 2,
        use_native_ring: bool = True,
    ):
        self.rx = receiver
        sps = receiver.sps
        self.hop = block_symbols * sps
        # halo: one full packet region + a sync symbol of slack
        self.halo = receiver.pkt_samples + 2 * sps
        if self.hop < self.halo:
            raise ValueError(
                f"block_symbols={block_symbols} gives hop {self.hop} < halo "
                f"{self.halo}; seam packets would outrun the next block's "
                f"owned region — use a larger block"
            )
        self.block_len = self.hop + self.halo
        self.sinks = list(sinks)
        self.max_in_flight = max(1, max_in_flight)

        self._pending: List[tuple] = []  # (device result, abs offset)
        self._abs = 0  # absolute sample index of current buffer head
        self._frames: List[Frame] = []
        self._emitted_starts: List[tuple] = []  # recent (abs start, payload, frame)
        # two decodable packets cannot start closer than preamble+header
        # (~20 symbols); a seam-clipped rising edge shifts the reported
        # start by at most a couple of windows — 16 symbols separates the
        # two cases with a wide margin either way
        self._dedup_distance = 16 * sps
        # observability (no silent frame loss): every dedup suppression is
        # counted; a suppression whose payload DIFFERS from the frame that
        # blocked it is a conflict — the heuristic discarded something
        # that was not a re-detection of the same packet
        self.n_dedup_suppressed = 0
        self.n_dedup_conflicts = 0
        # conflicts resolved in favour of the later decode: the blocker
        # was seam-clipped and failed the MAC CRC while the later clean
        # decode passed it — the clean frame replaces the corrupted one
        self.n_dedup_replaced = 0
        self._eof = False
        # capacity: a few blocks of packed complex64
        self._ingest = _IngestBuffer(8 * self.block_len,
                                     use_native=use_native_ring)

    # ------------------------------------------------------------- ingest
    @property
    def _buffered(self) -> int:
        return self._ingest.buffered

    def push(self, samples) -> List[Frame]:
        """Append IQ samples; returns frames completed by this push."""
        x = np.ascontiguousarray(np.asarray(samples, dtype=np.complex64))
        # ring full -> consume blocks to free space (backpressure)
        self._ingest.write(x, on_full=lambda: self._pump(force=True))
        self._pump()
        return self._collect()

    def flush(self) -> List[Frame]:
        """End of stream: process the tail (zero-padded) and drain.

        A halo of zeros is appended first so a packet ending right at the
        stream tail keeps a full decode region in its owning block
        (candidates whose region crosses the block end are invalid — see
        DenseReceiver._region_from; zeros produce no candidates of their
        own)."""
        self._eof = True
        self._ingest.write(np.zeros(self.halo, np.complex64),
                           on_full=lambda: self._pump(force=True))
        self._pump()
        tail = self._take(self._buffered, consume=self._buffered)
        if len(tail):
            block = np.zeros(self.block_len, np.complex64)
            block[: len(tail)] = tail
            self._dispatch(block, self._abs, own=len(tail))
            self._abs += len(tail)
        self._drain(0)
        return self._collect()

    # ------------------------------------------------------------ blocks
    def _take(self, n: int, consume: int) -> np.ndarray:
        return self._ingest.take(n, consume)

    def _pump(self, force: bool = False) -> None:
        while self._buffered >= self.block_len:
            block = self._take(self.block_len, consume=self.hop)
            self._dispatch(block, self._abs, own=self.hop)
            self._abs += self.hop
            if not force:
                self._drain(self.max_in_flight - 1)
        if force:
            self._drain(0)

    def _dispatch(self, block: np.ndarray, abs_offset: int, own: int) -> None:
        res = self.rx.process(pack_iq(block[None]))
        self._pending.append((res, abs_offset, own))
        self._drain(self.max_in_flight)

    def _drain(self, keep: int) -> None:
        while len(self._pending) > keep:
            res, abs_offset, own = self._pending.pop(0)
            import jax

            r = jax.device_get(res)
            valid = np.asarray(r.valid)[0]
            starts = np.asarray(r.start)[0]
            for k in np.nonzero(valid)[0]:
                if starts[k] >= own:  # owned by a later block
                    continue
                abs_start = int(abs_offset + starts[k])
                payload = bytes(
                    np.asarray(r.payload)[0, k][: np.asarray(r.length)[0, k]]
                )
                # seam dedup: a packet whose rising edge is clipped by the
                # block boundary re-detects in the next block at a slightly
                # different start — suppress near-duplicates (first block,
                # which saw the unclipped preamble, wins)
                from .io.frames import PhyHeader

                def make_frame():
                    return Frame(
                        phy_header=PhyHeader.from_bytes(
                            bytes(np.asarray(r.hdr)[0, k])),
                        payload=payload,
                        snr=float(np.asarray(r.snr)[0, k]),
                        channel=0,
                        sample_index=abs_start,
                        cfo=float(np.asarray(r.cfo)[0, k]),
                    )

                _dedup_and_emit(self, self._emitted_starts, abs_start,
                                payload, make_frame, self._dedup_distance)

    def _collect(self) -> List[Frame]:
        out, self._frames = self._frames, []
        return out

    def close(self) -> None:
        self._ingest.close()


class WidebandStreamingReceiver:
    """Continuous wideband streaming: on-device PFB + dense decode.

    The streaming analogue of :class:`lora_tpu.wideband.WidebandReceiver`
    — arbitrary-length *wideband* IQ goes in (rate ``M * chan_rate``),
    deduplicated frames (stamped with their PFB channel) come out. The
    polyphase filterbank and the decode both run inside one jitted
    program per block, so the host never touches per-channel streams
    (replacing the per-channel host FIR of
    ``flowgraph.StreamingLoRaReceiver`` for dense channel grids).

    Blocking is overlap-save at the wideband rate: ``hop`` owned samples
    plus a halo covering one maximal packet region at channel rate and
    the PFB warmup, so every packet is fully contained in at least one
    block and emitted exactly once (ownership rule + seam dedup as in
    :class:`StreamingReceiver`).
    """

    def __init__(
        self,
        wideband,
        block_symbols: int = 512,
        sinks: Sequence = (),
        max_in_flight: int = 2,
        use_native_ring: bool = True,
    ):
        self.wb = wideband
        # also accepts a MultiSFWidebandReceiver (gateway mode): the
        # block/halo geometry is governed by the slowest SF, and _drain
        # iterates every SF's pooled result (_iter_results)
        rxs = getattr(wideband, "rxs", None)
        if rxs is not None:
            sps = max(r.sps for r in rxs.values())
            pkt_samples = max(r.pkt_samples for r in rxs.values())
        else:
            sps = wideband.rx.sps
            pkt_samples = wideband.rx.pkt_samples
        # ...and a plans.PlanGateway (mixer-bank channelizer on the
        # LoRaWAN raster): wideband-to-channel-rate factor = its
        # decimation (a PFB's is its channel count M) and FIR warmup =
        # the whole-band filter length. Each block's factored mixer
        # restarts at phase 0, i.e. the channel streams carry a
        # CONSTANT phase offset per block — irrelevant to decode (every
        # metric is magnitude- or phase-difference-based), so no
        # cross-block phase bookkeeping is needed.
        pfb = getattr(wideband, "pfb", None)
        if pfb is not None:
            M = wideband.M
            warmup_chan = pfb.K + 1
        else:
            M = wideband.decim
            warmup_chan = -(-len(wideband.taps) // M) + 1
        self.M = M
        self.hop = block_symbols * sps * M
        halo_chan = pkt_samples + 2 * sps
        self.halo = (halo_chan + warmup_chan) * M
        if self.hop < self.halo:
            raise ValueError(
                f"block_symbols={block_symbols} gives hop {self.hop} < halo "
                f"{self.halo} wideband samples; use a larger block"
            )
        self.block_len = self.hop + self.halo
        self.sinks = list(sinks)
        self.max_in_flight = max(1, max_in_flight)
        self._pending: List[tuple] = []
        self._abs = 0
        self._frames: List[Frame] = []
        # (sf, channel) -> recent (abs start, payload, frame)
        self._emitted: dict = {}
        # seam dedup uses a 16-symbol window of the *decoding* SF
        # (computed per result in _emit_result — a gateway's slowest-SF
        # sps here would make the window ~0.5 s at SF12 and swallow
        # legitimate closely-spaced SF7 traffic)
        # dedup observability + conflict resolution (see StreamingReceiver)
        self.n_dedup_suppressed = 0
        self.n_dedup_conflicts = 0
        self.n_dedup_replaced = 0
        # ring-backed ingest (the wideband streamer moves M x the data
        # of the narrowband one — it gets the same native SPSC ring,
        # not a per-push numpy concat)
        self._ingest = _IngestBuffer(8 * self.block_len,
                                     use_native=use_native_ring)

    def push(self, samples) -> List[Frame]:
        x = np.ascontiguousarray(np.asarray(samples, dtype=np.complex64))
        self._ingest.write(x, on_full=lambda: self._pump(force=True))
        self._pump()
        out, self._frames = self._frames, []
        return out

    def _pump(self, force: bool = False) -> None:
        while self._ingest.buffered >= self.block_len:
            block = self._ingest.take(self.block_len, consume=self.hop)
            self._dispatch(block, self._abs, own=self.hop)
            self._abs += self.hop
            if not force:
                self._drain(self.max_in_flight - 1)
        if force:
            self._drain(0)

    def flush(self) -> List[Frame]:
        """End of stream: halo of zeros, pump, then the partial tail
        block (see StreamingReceiver.flush — after the pump the buffer
        holds < block_len samples, so one final block covers it)."""
        self._ingest.write(np.zeros(self.halo, np.complex64),
                           on_full=lambda: self._pump(force=True))
        self._pump()
        n = self._ingest.buffered
        tail = self._ingest.take(n, consume=n)
        if len(tail):
            block = np.zeros(self.block_len, np.complex64)
            block[: len(tail)] = tail
            self._dispatch(block, self._abs, own=len(tail))
            self._abs += len(tail)
        self._drain(0)
        out, self._frames = self._frames, []
        return out

    def close(self) -> None:
        self._ingest.close()

    def _dispatch(self, block: np.ndarray, abs_offset: int, own: int) -> None:
        res = self.wb.process(pack_iq(block))
        self._pending.append((res, abs_offset, own))
        self._drain(self.max_in_flight)

    def _iter_results(self, r):
        """(result, per-SF config) pairs — one for a plain wideband
        receiver, one per SF for a gateway (MultiSFWidebandReceiver)."""
        rxs = getattr(self.wb, "rxs", None)
        if rxs is None:
            return [(r, self.wb.cfg)]
        return [(r[sf], rxs[sf].cfg) for sf in self.wb.sfs]

    def _drain(self, keep: int) -> None:
        import jax

        while len(self._pending) > keep:
            res, abs_offset, own = self._pending.pop(0)
            for r, cfg_sf in self._iter_results(jax.device_get(res)):
                self._emit_result(r, cfg_sf, abs_offset, own)

    def _emit_result(self, r, cfg_sf, abs_offset: int, own: int) -> None:
        """Claim, dedup and emit one (fetched) block result's frames.

        ``cfg_sf`` is the decoding config (it differs per SF in gateway
        mode — the SF stamp and the dedup key come from it)."""
        from .io.frames import PhyHeader

        valid = np.asarray(r.valid)
        own_chan = own // self.M
        pooled = self.wb.pool is not None
        lanes = np.nonzero(valid)[0] if pooled else zip(*np.nonzero(valid))
        for lane in lanes:
            if pooled:
                g = int(lane)
                chan = int(self.wb.active[int(np.asarray(r.channel)[g])])
                start = int(np.asarray(r.start)[g])
                sel = (g,)
            else:
                ci, k = (int(v) for v in lane)
                chan = int(self.wb.active[ci])
                start = int(np.asarray(r.start)[ci, k])
                sel = (ci, k)
            if start >= own_chan:
                continue  # owned by a later block
            abs_start = abs_offset // self.M + start
            payload = bytes(
                np.asarray(r.payload)[sel][: np.asarray(r.length)[sel]]
            )

            def make_frame():
                f = Frame(
                    phy_header=PhyHeader.from_bytes(
                        bytes(np.asarray(r.hdr)[sel])),
                    payload=payload,
                    snr=float(np.asarray(r.snr)[sel]),
                    channel=chan,
                    sample_index=abs_start,
                    cfo=float(np.asarray(r.cfo)[sel]),
                )
                f.tap_header.frequency = int(
                    abs(self.wb.channel_freqs[chan]))
                f.tap_header.sf = cfg_sf.sf
                f.tap_header.sync_word = cfg_sf.sync_word
                return f

            seen = self._emitted.setdefault((cfg_sf.sf, chan), [])
            _dedup_and_emit(self, seen, abs_start, payload, make_frame,
                            16 * cfg_sf.samples_per_symbol)


def pump_file(sr, path: str, chunk_samples: Optional[int] = None,
              close: bool = True) -> List[Frame]:
    """Drive any streaming receiver (narrowband or wideband/gateway)
    from a cf32 capture file: chunked reads, push/flush, close.

    A trailing partial complex64 element (a recorder killed mid-write
    leaves ``size % 8 != 0``) is dropped, matching ``np.fromfile``'s
    whole-capture behavior instead of crashing on the last chunk.
    """
    chunk = chunk_samples or sr.block_len
    frames: List[Frame] = []
    carry = b""
    with open(path, "rb") as f:
        while True:
            raw = carry + f.read(chunk * 8)
            if not raw:
                break
            n = len(raw) // 8 * 8
            carry = raw[n:]
            if not n:
                break
            frames += sr.push(np.frombuffer(raw[:n], dtype=np.complex64))
    frames += sr.flush()
    if close:
        sr.close()
    return frames


def stream_file(
    path: str,
    receiver: DenseReceiver,
    block_symbols: int = 512,
    sinks: Sequence = (),
    chunk_samples: Optional[int] = None,
) -> List[Frame]:
    """Decode a cf32 capture by streaming it through fixed-size blocks —
    the end-to-end analogue of ``file_source -> lora_receiver`` in the
    reference demo flowgraph (apps/lora_receive_file_nogui.py:30-40)."""
    sr = StreamingReceiver(receiver, block_symbols, sinks)
    return pump_file(sr, path, chunk_samples)
