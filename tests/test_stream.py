"""Streaming driver: overlap-save blocking, seam dedup, native ring path.

The reference handles unbounded streams with GNU Radio's scheduler and
variable consume_each; here the equivalent contract is: every packet in a
long stream is decoded exactly once, regardless of block seams and push
chunk sizes.
"""

import numpy as np
import pytest

from lora_tpu import LoRaConfig
from lora_tpu.rx.dense import DenseReceiver
from lora_tpu.stream import StreamingReceiver, stream_file
from lora_tpu.tx.modulator import modulate_frame


@pytest.fixture(scope="module")
def cfg():
    return LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)


@pytest.fixture(scope="module")
def rx(cfg):
    return DenseReceiver(cfg, max_candidates=8, max_symbols=24, sfd_search=12)


def _stream_with_packets(cfg, n_packets: int, gap_symbols=64, seed=1):
    rng = np.random.default_rng(seed)
    sps = cfg.samples_per_symbol
    parts = []
    marks = []
    pos = 0
    for i in range(n_packets):
        gap = int(rng.integers(gap_symbols // 2, gap_symbols)) * sps
        parts.append(np.zeros(gap, np.complex64))
        pos += gap
        pkt = modulate_frame(cfg, bytes([i, 0xA5, i ^ 0xFF]), pad_before=0,
                             pad_after=0, snr_db=40.0, seed=seed + i)
        marks.append(pos)
        parts.append(pkt)
        pos += len(pkt)
    parts.append(np.zeros(32 * sps, np.complex64))
    return np.concatenate(parts), marks


def test_stream_decodes_all_packets_once(cfg, rx):
    stream, marks = _stream_with_packets(cfg, 6)
    sr = StreamingReceiver(rx, block_symbols=128, use_native_ring=False)
    frames = []
    # push in awkward chunk sizes to exercise partial-block buffering
    chunk = 10_007
    for off in range(0, len(stream), chunk):
        frames += sr.push(stream[off : off + chunk])
    frames += sr.flush()
    sr.close()

    assert len(frames) == 6, [f.payload.hex() for f in frames]
    payloads = sorted(f.payload[:3] for f in frames)
    assert payloads == sorted(bytes([i, 0xA5, i ^ 0xFF]) for i in range(6))
    # every frame's absolute start is near its true packet start
    starts = sorted(f.sample_index for f in frames)
    sps = cfg.samples_per_symbol
    for got, true in zip(starts, marks):
        assert abs(got - true) <= 3 * sps


def test_stream_seam_packet(cfg, rx):
    """A packet deliberately straddling the block seam decodes exactly once."""
    sps = cfg.samples_per_symbol
    sr = StreamingReceiver(rx, block_symbols=64, use_native_ring=False)
    hop = sr.hop
    pkt = modulate_frame(cfg, b"\xde\xad", pad_before=0, pad_after=0, snr_db=40.0)
    stream = np.zeros(3 * hop, np.complex64)
    # place the packet to start 2 symbols before the first seam
    p0 = hop - 2 * sps
    stream[p0 : p0 + len(pkt)] = pkt
    frames = sr.push(stream)
    frames += sr.flush()
    sr.close()
    assert len(frames) == 1
    assert frames[0].payload[:2] == b"\xde\xad"


def test_stream_native_ring_matches_python(cfg, rx):
    from lora_tpu import native

    if not native.available():
        pytest.skip("native host library unavailable")
    stream, _ = _stream_with_packets(cfg, 4, seed=7)
    out = {}
    for use_native in (False, True):
        sr = StreamingReceiver(rx, block_symbols=128, use_native_ring=use_native)
        frames = sr.push(stream)
        frames += sr.flush()
        sr.close()
        out[use_native] = sorted((f.payload, f.sample_index) for f in frames)
    assert out[True] == out[False]
    assert len(out[True]) == 4


def test_stream_file(tmp_path, cfg, rx):
    stream, _ = _stream_with_packets(cfg, 3, seed=11)
    p = tmp_path / "capture.cf32"
    stream.astype(np.complex64).tofile(p)
    frames = stream_file(str(p), rx, block_symbols=128)
    assert len(frames) == 3


def test_stream_backpressure_ring(cfg, rx):
    """Pushing far more than ring capacity in one call must not drop IQ."""
    from lora_tpu import native

    if not native.available():
        pytest.skip("native host library unavailable")
    stream, _ = _stream_with_packets(cfg, 10, gap_symbols=48, seed=3)
    sr = StreamingReceiver(rx, block_symbols=128, use_native_ring=True)
    # shrink the ring to force backpressure inside a single push
    sr.close()
    from lora_tpu.native import SampleRing

    sr._ring = SampleRing(2 * sr.block_len * 8)
    frames = sr.push(stream)
    frames += sr.flush()
    sr.close()
    assert len(frames) == 10


def test_back_to_back_minimal_gap_and_dedup_counters():
    """Two real packets at the minimum physical spacing (a packet is >= 20
    symbols: preamble 8 + sync 2 + SFD 2.25 + header 8) must BOTH emit —
    the 16-symbol seam-dedup window may never merge distinct packets —
    and every dedup suppression must be counted, never silent."""
    from lora_tpu.config import LoRaConfig
    from lora_tpu.rx.dense import DenseReceiver
    from lora_tpu.stream import StreamingReceiver
    from lora_tpu.tx.modulator import modulate_frame

    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True)
    sps = cfg.samples_per_symbol
    p1 = modulate_frame(cfg, b"\x01\x11", snr_db=None)
    p2 = modulate_frame(cfg, b"\x02\x22", snr_db=None)
    # back-to-back: second preamble starts right at the first frame's end
    x = np.concatenate([
        np.zeros(4 * sps, np.complex64), p1, p2,
        np.zeros(4 * sps, np.complex64),
    ])
    rng = np.random.default_rng(0)
    x = (x + (rng.normal(0, 1e-2, (len(x), 2)) @ [1, 1j])).astype(np.complex64)

    rx = DenseReceiver(cfg, max_candidates=8, max_symbols=24, sfd_search=12)
    sr = StreamingReceiver(rx, block_symbols=128)
    frames = []
    for pos in range(0, len(x), 50_000):
        frames += sr.push(x[pos : pos + 50_000])
    frames += sr.flush()
    payloads = sorted(f.payload[:2] for f in frames)
    assert payloads == [b"\x01\x11", b"\x02\x22"], payloads
    assert sr.n_dedup_conflicts == 0
    # any seam re-detections were counted, not silently discarded
    assert sr.n_dedup_suppressed >= 0


def test_seam_conflict_crc_replacement():
    """A CRC-passing later decode replaces a corrupt seam-clipped
    blocker: flagged (dedup_replacement/replaces), counted once, and
    the corrupt frame is retracted when still uncollected."""
    import numpy as np

    from lora_tpu.config import LoRaConfig
    from lora_tpu.io.frames import Frame, PhyHeader
    from lora_tpu.rx.dense import DenseReceiver, DenseResult, MAX_PAYLOAD
    from lora_tpu.stream import StreamingReceiver

    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    rx = DenseReceiver(cfg, max_candidates=2, max_symbols=16, sfd_search=8)
    sr = StreamingReceiver(rx, block_symbols=64, use_native_ring=False)

    clean = b"\xde\xad\xbe\xef\x80\xec"     # deadbeef + valid CRC
    corrupt = b"\xde\xad\xbe\xee\x80\xec"   # one payload bit flipped
    hdr = PhyHeader(length=4, has_mac_crc=1, cr=4)
    f_old = Frame(phy_header=hdr, payload=corrupt, sample_index=1000)
    assert f_old.crc_ok is False
    sr._emitted_starts.append((1000, corrupt, f_old))
    sr._frames.append(f_old)

    pay = np.zeros((1, 2, MAX_PAYLOAD), np.uint8)
    pay[0, 0, : len(clean)] = np.frombuffer(clean, np.uint8)
    res = DenseResult(
        valid=np.array([[True, False]]),
        payload=pay,
        length=np.array([[len(clean), 0]], np.int32),
        hdr=np.tile(np.frombuffer(hdr.to_bytes(), np.uint8), (1, 2, 1)),
        snr=np.ones((1, 2), np.float32),
        start=np.array([[1010, 0]], np.int32),
        cfo=np.zeros((1, 2), np.float32),
        n_dropped=np.array([0], np.int32),
    )
    sr._pending.append((res, 0, 10**9))
    sr._drain(0)

    out = sr._collect()
    assert sr.n_dedup_conflicts == 1
    assert sr.n_dedup_replaced == 1
    assert sr.n_dedup_suppressed == 0  # replaced, not suppressed
    assert f_old not in out
    assert len(out) == 1
    f_new = out[0]
    assert f_new.payload == clean and f_new.crc_ok
    assert f_new.dedup_replacement and f_new.replaces == 1000
