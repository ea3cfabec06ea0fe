"""Flowgraph layer (GRC parity): expression eval, descriptors, graph
validation, end-to-end file decode, chunk-continuous channelization."""

import io
import socket
import threading

import numpy as np
import pytest

from lora_tpu import LoRaConfig
from lora_tpu.channelizer import freq_xlating_fir, lora_channel_taps
from lora_tpu.flowgraph import (
    BLOCKS,
    Flowgraph,
    FrameCollectSink,
    StreamingLoRaReceiver,
    block_descriptors,
    safe_eval,
)
from lora_tpu.tx.modulator import modulate_frame

DEADBEEF = bytes.fromhex("deadbeef")


# ---------------------------------------------------------------- safe_eval

def test_safe_eval_arithmetic_and_vars():
    v = {"samp_rate": 1e6, "offset": 100e3}
    assert safe_eval("samp_rate", v) == 1e6
    assert safe_eval("samp_rate + offset", v) == 1.1e6
    assert safe_eval("int(samp_rate // 4)", v) == 250000
    assert safe_eval(["offset", "2 * offset"], v) == [100e3, 200e3]
    assert safe_eval(7, v) == 7
    assert safe_eval(True, v) is True


def test_safe_eval_strings_pass_through():
    assert safe_eval("127.0.0.1", {}) == "127.0.0.1"
    assert safe_eval("frames.bin", {}) == "frames.bin"


def test_safe_eval_never_executes_calls():
    # disallowed expressions fall back to the verbatim string (it is a
    # parameter VALUE then, e.g. a path) — never evaluated
    assert safe_eval("__import__('os')", {}) == "__import__('os')"
    with pytest.raises(NameError):
        safe_eval("nonexistent + 1", {})


# -------------------------------------------------------------- descriptors

def test_block_descriptors_cover_reference_grc_set():
    ids = {d["id"] for d in block_descriptors()}
    # every grc/*.block.yml in the reference has an equivalent here
    for ref in ["lora_lora_receiver", "lora_message_socket_sink",
                "lora_message_file_sink", "lora_message_mongodb_sink"]:
        assert ref.replace("lora_lora", "lora") in ids or ref in ids
    # receiver parameter surface matches grc/lora_receiver.block.yml
    rx = BLOCKS["lora_receiver"].descriptor()
    params = {p["id"] for p in rx["parameters"]}
    for p in ["samp_rate", "center_freq", "channel_list", "bandwidth", "sf",
              "implicit", "cr", "crc", "reduced_rate", "conj", "decimation",
              "disable_channelization", "disable_drift_correction"]:
        assert p in params, p


# ---------------------------------------------------------------- validation

def _minimal_spec(tmp_path, fname="x.cf32"):
    p = tmp_path / fname
    np.zeros(4096, np.complex64).tofile(p)
    return {
        "blocks": [
            {"name": "src", "id": "file_source", "parameters": {"file": str(p)}},
            {"name": "rx", "id": "lora_receiver",
             "parameters": {"samp_rate": 250e3, "center_freq": 868e6,
                            "channel_list": [868e6]}},
        ],
        "connections": [["src", "0", "rx", "0"]],
    }


def test_unknown_block_id_rejected(tmp_path):
    spec = _minimal_spec(tmp_path)
    spec["blocks"][0]["id"] = "warp_drive"
    with pytest.raises(ValueError, match="unknown block id"):
        Flowgraph(spec)


def test_unknown_parameter_rejected(tmp_path):
    spec = _minimal_spec(tmp_path)
    spec["blocks"][1]["parameters"]["warp"] = 9
    with pytest.raises(ValueError, match="unknown parameters"):
        Flowgraph(spec)


def test_missing_stream_path_rejected(tmp_path):
    spec = _minimal_spec(tmp_path)
    spec["connections"] = []
    with pytest.raises(ValueError, match="no stream path"):
        Flowgraph(spec)


# ------------------------------------------------------- end-to-end decode

@pytest.fixture(scope="module")
def cfg():
    return LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)


def test_flowgraph_file_decode(tmp_path, cfg):
    sps = cfg.samples_per_symbol
    pkt = modulate_frame(cfg, DEADBEEF, pad_before=8 * sps,
                         pad_after=40 * sps, snr_db=40.0)
    path = tmp_path / "cap.cf32"
    pkt.astype(np.complex64).tofile(path)

    fg = Flowgraph({
        "variables": {"samp_rate": 250e3, "freq": 868.0e6},
        "blocks": [
            {"name": "src", "id": "file_source",
             "parameters": {"file": str(path), "chunk_samples": 16384}},
            {"name": "thr", "id": "throttle",
             "parameters": {"samp_rate": "samp_rate * 1000"}},
            {"name": "rx", "id": "lora_receiver",
             "parameters": {"samp_rate": "samp_rate", "center_freq": "freq",
                            "channel_list": ["freq"], "sf": 7, "cr": 4,
                            "crc": True, "block_symbols": 128}},
            {"name": "out", "id": "frame_collect_sink"},
        ],
        "connections": [
            ["src", "0", "thr", "0"],
            ["thr", "0", "rx", "0"],
            ["rx", "frames", "out", "in"],
        ],
    })
    frames = fg.run()
    assert [f.mac_payload for f in frames] == [DEADBEEF]
    # the explicitly connected sink saw the same frames
    assert [f.mac_payload for f in fg.blocks["out"].frames] == [DEADBEEF]


def test_flowgraph_yaml_and_udp_sink(tmp_path, cfg):
    sps = cfg.samples_per_symbol
    pkt = modulate_frame(cfg, DEADBEEF, pad_before=8 * sps,
                         pad_after=40 * sps, snr_db=40.0)
    path = tmp_path / "cap.cf32"
    pkt.astype(np.complex64).tofile(path)

    rxsock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rxsock.bind(("127.0.0.1", 0))
    rxsock.settimeout(10.0)
    port = rxsock.getsockname()[1]

    fgy = tmp_path / "fg.yml"
    fgy.write_text(f"""
variables:
  samp_rate: 250e3
  freq: 868.0e6
blocks:
- {{name: src, id: file_source, parameters: {{file: {path}}}}}
- name: rx
  id: lora_receiver
  parameters:
    samp_rate: samp_rate
    center_freq: freq
    channel_list: [freq]
    sf: 7
    block_symbols: 128
- {{name: udp, id: message_socket_sink, parameters: {{port: {port}, layer: 2}}}}
connections:
- [src, '0', rx, '0']
- [rx, frames, udp, in]
""")
    frames = Flowgraph.from_yaml(str(fgy)).run()
    assert [f.mac_payload for f in frames] == [DEADBEEF]
    datagram, _ = rxsock.recvfrom(4096)
    rxsock.close()
    assert datagram == DEADBEEF  # LORAMAC layer strips headers + CRC


def test_flowgraph_channelized_offset_decode(cfg):
    """Channel at +50 kHz in a 1 Msps wideband, decimation 4 -> 250 ksps,
    pushed in chunks: the chunk-continuous FIR must decode seamlessly."""
    wide_cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True)
    sps_w = wide_cfg.samples_per_symbol
    pkt = modulate_frame(wide_cfg, DEADBEEF, pad_before=8 * sps_w,
                         pad_after=40 * sps_w, snr_db=40.0)
    n = np.arange(len(pkt))
    wide = (pkt * np.exp(2j * np.pi * 50e3 * n / 1e6)).astype(np.complex64)

    rx = StreamingLoRaReceiver(
        samp_rate=1e6, center_freq=868.0e6, channel_list=[868.05e6],
        sf=7, cr=4, crc=True, decimation=4, block_symbols=128)
    sink = FrameCollectSink()
    rx.sinks = [sink]
    for i in range(0, len(wide), 10000):  # deliberately awkward chunking
        rx.push(wide[i: i + 10000])
    rx.flush()
    rx.close()
    assert [f.mac_payload for f in sink.frames] == [DEADBEEF]


def test_chunked_channelizer_matches_whole(cfg):
    """Chunk-wise FIR with tail/phase carry == one-shot freq_xlating_fir."""
    rng = np.random.default_rng(3)
    x = (rng.normal(0, 1, (50000, 2)) @ np.array([1, 1j])).astype(np.complex64)
    rx = StreamingLoRaReceiver(
        samp_rate=1e6, center_freq=868e6, channel_list=[868.1e6],
        sf=7, decimation=4, engine="golden")
    outs = []
    for i in range(0, len(x), 7777):
        outs.append(rx._channelize(x[i: i + 7777])[0])
    chunked = np.concatenate(outs)
    taps = lora_channel_taps(1e6, 125e3)
    whole = freq_xlating_fir(x, taps, 100e3, 1e6, 4)
    m = min(len(chunked), len(whole))
    assert m > 12000
    assert np.allclose(chunked[:m], whole[:m], atol=1e-4)


def test_flowgraph_udp_iq_source(tmp_path, cfg):
    """Realtime path: IQ datagrams in -> frames out (lora_receive_realtime)."""
    sps = cfg.samples_per_symbol
    pkt = modulate_frame(cfg, DEADBEEF, pad_before=8 * sps,
                         pad_after=40 * sps, snr_db=40.0).astype(np.complex64)

    fg = Flowgraph({
        "blocks": [
            {"name": "sdr", "id": "udp_iq_source",
             "parameters": {"addr": "127.0.0.1", "port": 0, "timeout": 2.0,
                            "max_samples": len(pkt)}},
            {"name": "rx", "id": "lora_receiver",
             "parameters": {"samp_rate": 250e3, "center_freq": 868e6,
                            "channel_list": [868e6], "sf": 7,
                            "block_symbols": 128}},
            {"name": "out", "id": "frame_collect_sink"},
        ],
        "connections": [["sdr", "0", "rx", "0"],
                        ["rx", "frames", "out", "in"]],
    })
    port = fg.blocks["sdr"].sock.getsockname()[1]

    def sender():
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        raw = pkt.tobytes()
        for i in range(0, len(raw), 8192):
            tx.sendto(raw[i: i + 8192], ("127.0.0.1", port))
        tx.close()

    t = threading.Thread(target=sender)
    t.start()
    frames = fg.run()
    t.join()
    assert [f.mac_payload for f in frames] == [DEADBEEF]


def test_message_only_graph():
    """message_socket_source -> message sink graph (the reference's
    republish topology, lib/message_socket_source_impl.cc:49-97)."""
    import socket
    import threading
    import time as _time

    from lora_tpu.flowgraph import Flowgraph
    from lora_tpu.io.frames import Frame, PhyHeader

    spec = {
        "options": {"id": "msg_graph"},
        "blocks": [
            {"name": "src", "id": "message_socket_source",
             "parameters": {"addr": "127.0.0.1", "port": 40977}},
            {"name": "collect", "id": "frame_collect_sink"},
        ],
        "connections": [["src", "out", "collect", "in"]],
    }
    fg = Flowgraph(spec)
    frame = Frame(phy_header=PhyHeader(length=2, cr=4, has_mac_crc=1),
                  payload=b"\xab\xcd\x01\x02")
    payload = frame.to_bytes(0)  # full loratap datagram

    def send():
        _time.sleep(0.3)
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for _ in range(3):
            s.sendto(payload, ("127.0.0.1", 40977))
            _time.sleep(0.05)
        s.close()

    t = threading.Thread(target=send)
    t.start()
    frames = fg.run(max_frames=3, max_seconds=5.0)
    t.join()
    assert len(frames) == 3
    assert frames[0].payload == b"\xab\xcd\x01\x02"


def test_flowgraph_multi_receiver_multi_sf(tmp_path):
    """GRC lets one source fan out to several lora_receiver blocks — the
    multi-SF monitoring topology. One capture carrying an SF7 and an SF8
    packet; two receivers on the same stream each decode their own."""
    c7 = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    c8 = LoRaConfig(sf=8, cr=4, samp_rate=250e3, crc=True)
    sps8 = c8.samples_per_symbol
    p7 = modulate_frame(c7, b"\x07\x07", pad_before=4096, snr_db=40.0)
    p8 = modulate_frame(c8, b"\x08\x08", pad_before=4096, snr_db=40.0)
    cap = np.concatenate([p7, np.zeros(2 * sps8, np.complex64), p8,
                          np.zeros(48 * sps8, np.complex64)])
    path = tmp_path / "cap.cf32"
    cap.astype(np.complex64).tofile(path)

    def rx_params(sf):
        return {"samp_rate": 250e3, "center_freq": 868e6,
                "channel_list": [868e6], "sf": sf, "cr": 4, "crc": True,
                "block_symbols": 128}

    fg = Flowgraph({
        "blocks": [
            {"name": "src", "id": "file_source",
             "parameters": {"file": str(path), "chunk_samples": 16384}},
            {"name": "rx7", "id": "lora_receiver", "parameters": rx_params(7)},
            {"name": "rx8", "id": "lora_receiver", "parameters": rx_params(8)},
            {"name": "out", "id": "frame_collect_sink"},
        ],
        "connections": [
            ["src", "0", "rx7", "0"],
            ["src", "0", "rx8", "0"],
            ["rx7", "frames", "out", "in"],
            ["rx8", "frames", "out", "in"],
        ],
    })
    frames = fg.run()
    assert sorted(f.mac_payload for f in frames) == [b"\x07\x07", b"\x08\x08"]


def test_flowgraph_midchain_fanout_rejected(tmp_path):
    path = tmp_path / "cap.cf32"
    np.zeros(1024, np.complex64).tofile(path)
    spec = {
        "blocks": [
            {"name": "src", "id": "file_source",
             "parameters": {"file": str(path)}},
            {"name": "thr", "id": "throttle",
             "parameters": {"samp_rate": 250e3}},
            {"name": "thr2", "id": "throttle",
             "parameters": {"samp_rate": 250e3}},
            {"name": "rx", "id": "lora_receiver",
             "parameters": {"samp_rate": 250e3, "center_freq": 868e6,
                            "channel_list": [868e6], "sf": 7}},
        ],
        "connections": [
            ["src", "0", "thr", "0"],
            ["src", "0", "thr2", "0"],
            ["thr", "0", "rx", "0"],
            ["thr2", "0", "rx", "0"],
        ],
    }
    with pytest.raises(ValueError, match="fan-out"):
        Flowgraph(spec)
