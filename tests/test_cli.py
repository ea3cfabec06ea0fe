"""End-to-end CLI coverage (the reference's user surface:
apps/lora_receive_file_nogui.py + python/qa_testsuite.py flows)."""

import numpy as np

from lora_tpu import LoRaConfig
from lora_tpu.cli import main
from lora_tpu.io.udp import LoRaUDPServer
from lora_tpu.tx.modulator import modulate_frame


def _write_cf32(path, payload=b"\xde\xad\xbe\xef", times=2):
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True)
    chunks = [
        modulate_frame(cfg, payload, pad_before=3000, pad_after=1024,
                       snr_db=35.0, seed=i)
        for i in range(times)
    ]
    stream = np.concatenate(chunks + [np.zeros(4096, np.complex64)])
    stream.astype(np.complex64).tofile(path)
    return path


def test_decode_file_raw_cf32(tmp_path, capsys):
    f = _write_cf32(str(tmp_path / "capture.cf32"))
    rc = main(["decode-file", f, "--samp-rate", "1e6", "--sf", "7",
               "--cr", "4", "--engine", "golden"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2
    # LORAPHY layer: 3 header bytes + payload + 2 CRC bytes
    assert all(line.split()[3:7] == ["de", "ad", "be", "ef"] for line in out)


def test_decode_file_udp_sink(tmp_path, capsys):
    f = _write_cf32(str(tmp_path / "capture.cf32"), times=1)
    server = LoRaUDPServer(port=40871, timeout=5.0)
    try:
        rc = main(["decode-file", f, "--engine", "golden", "--udp",
                   "--udp-port", "40871", "--layer", "2"])
        assert rc == 0
        payloads = server.get_payloads(1)
    finally:
        server.close()
    # LORAMAC layer strips loratap+phy headers and the MAC CRC;
    # get_payloads hexlifies like the reference's lorasocket.py
    assert payloads == [b"deadbeef"]


def test_gen_suite_and_testsuite_roundtrip(tmp_path):
    rc = main(["gen-suite", str(tmp_path), "--suite", "short_sim",
               "--sfs", "7", "--crs", "4"])
    assert rc == 0
    rc = main(["testsuite", str(tmp_path), "--nowrite",
               "--min-accuracy", "1.0"])
    assert rc == 0


def test_gateway_multi_sf_cf32(tmp_path, capsys):
    """lora-gateway: all channels x all SFs of one wideband capture."""
    from lora_tpu.channelizer import pfb_channel_freqs

    M = 8
    chan_rate = 250e3
    wide_rate = M * chan_rate
    freqs = pfb_channel_freqs(wide_rate, M)
    rng = np.random.default_rng(3)
    sps9 = int(4 * 2 ** 7 * chan_rate / 125e3)
    L = M * (40 * sps9)
    x = (rng.normal(0, 1e-4, L) + 1j * rng.normal(0, 1e-4, L)).astype(
        np.complex64)
    t = np.arange(L, dtype=np.float64)
    for sf, chan, payload in [(7, 2, b"\xca\xfe"), (9, 5, b"\xf0\x0d")]:
        wcfg = LoRaConfig(sf=sf, cr=4, samp_rate=wide_rate, crc=True)
        pkt = modulate_frame(wcfg, payload, snr_db=None)
        pos = 2 * wcfg.samples_per_symbol
        x[pos:pos + len(pkt)] += (
            pkt * np.exp(2j * np.pi * freqs[chan] / wide_rate
                         * t[pos:pos + len(pkt)])
        ).astype(np.complex64)
    f = str(tmp_path / "wide.cf32")
    x.tofile(f)

    rc = main(["gateway", f, "--samp-rate", str(wide_rate),
               "--channels", str(M), "--sfs", "7", "8", "9",
               "--pool", "8"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    got = {}
    for line in out:
        parts = line.split()
        chan = int(parts[0][2:])
        sf = int(parts[1][2:])
        got[(sf, chan)] = "".join(parts[3:])
    assert set(got) == {(7, 2), (9, 5)}
    assert "cafe" in got[(7, 2)]
    assert "f00d" in got[(9, 5)]


def test_gateway_plan_eu868(tmp_path, capsys):
    """lora-gateway --plan EU868: regional-plan receive from the shell."""
    center, rate = 868.3e6, 2e6
    rng = np.random.default_rng(9)
    L = 40 * int(2 ** 8 * rate / 125e3)
    x = (rng.normal(0, 1e-4, L) + 1j * rng.normal(0, 1e-4, L)).astype(
        np.complex64)
    t = np.arange(L, dtype=np.float64)
    wcfg = LoRaConfig(sf=7, cr=4, samp_rate=rate, crc=True, sync_word=0x34)
    pkt = modulate_frame(wcfg, b"\xaa\x55", snr_db=None)
    pos = 2 * wcfg.samples_per_symbol
    off = 868.1e6 - center
    x[pos:pos + len(pkt)] += (
        pkt * np.exp(2j * np.pi * off / rate * t[pos:pos + len(pkt)])
    ).astype(np.complex64)
    f = str(tmp_path / "plan.cf32")
    x.tofile(f)

    rc = main(["gateway", f, "--plan", "EU868", "--center-freq",
               str(center), "--samp-rate", str(rate), "--sfs", "7",
               "--pool", "8"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    parts = out[0].split()
    assert parts[1] == "sf7" and parts[2] == "868100000Hz"
    assert "".join(parts[3:]).find("aa55") >= 0
