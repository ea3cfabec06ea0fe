"""Frame format / header tests against reference-known byte patterns."""

from lora_tpu.io.frames import (
    Frame,
    LoRaTapHeader,
    LORAMAC,
    LORAPHY,
    LORATAP,
    LORATAP_HEADER_SIZE,
    PhyHeader,
    header_checksum_nibbles,
    snr_to_loratap,
)


def test_phy_header_demo_trace_bytes():
    # reference README.md:81-86 demo frame header: 04 90 40
    hdr = PhyHeader.from_bytes(b"\x04\x90\x40")
    assert hdr.length == 4
    assert hdr.cr == 4
    assert hdr.has_mac_crc == 1
    assert hdr.crc_msn == 0
    assert hdr.crc_lsn == 0
    assert hdr.reserved == 4
    assert hdr.to_bytes() == b"\x04\x90\x40"


def test_header_checksum_matches_demo_trace():
    # The checksum nibbles for (len=4, cr=4, crc=1) must reproduce the
    # demo trace bytes (msn in crc_msn, lsn in the reserved field slot).
    assert header_checksum_nibbles(4, 4, True) == (0, 4)


def test_loratap_roundtrip():
    tap = LoRaTapHeader(snr=12, sf=7, frequency=868100000)
    assert len(tap.to_bytes()) == LORATAP_HEADER_SIZE
    back = LoRaTapHeader.from_bytes(tap.to_bytes())
    assert back == tap


def test_layer_stripping():
    # reference message_socket_sink_impl.cc:97-116
    phy = PhyHeader(length=4, cr=4, has_mac_crc=1)
    f = Frame(phy_header=phy, payload=b"\xde\xad\xbe\xef\x70\x0d", snr=10.0)
    tap = f.to_bytes(LORATAP)
    assert len(tap) == 15 + 3 + 6
    assert f.to_bytes(LORAPHY) == tap[15:]
    assert f.to_bytes(LORAMAC) == b"\xde\xad\xbe\xef"  # strips phy hdr + CRC


def test_snr_encoding():
    # reference lib/decoder_impl.cc:597
    assert snr_to_loratap(10.0) == 10  # 10*log10(10)+0.5 = 10.5 -> 10
    assert snr_to_loratap(100.0) == 20
    assert snr_to_loratap(0.0) == 0


def test_crc_ok_validation():
    # a capability the reference lacks (README.md:10-14): CRC checking
    from lora_tpu.io.frames import Frame, PhyHeader, mac_crc

    data = b"\xde\xad\xbe\xef"
    good = Frame(
        phy_header=PhyHeader(length=4, has_mac_crc=1, cr=4),
        payload=data + mac_crc(data),
    )
    assert good.crc_ok is True
    bad = Frame(
        phy_header=PhyHeader(length=4, has_mac_crc=1, cr=4),
        payload=data + b"\x00\x00",
    )
    assert bad.crc_ok is False
    nocrc = Frame(phy_header=PhyHeader(length=4, has_mac_crc=0, cr=4),
                  payload=data)
    assert nocrc.crc_ok is None


def test_end_to_end_decoded_frame_has_valid_crc():
    import numpy as np
    from lora_tpu import LoRaConfig
    from lora_tpu.rx.golden import GoldenReceiver
    from lora_tpu.tx.modulator import modulate_frame

    cfg = LoRaConfig(sf=7, cr=4, samp_rate=1e6, crc=True)
    pkt = modulate_frame(cfg, b"\x12\x34\x56", pad_before=2000,
                         pad_after=1024, snr_db=35.0, seed=9)
    frames = GoldenReceiver(cfg).run(np.concatenate([pkt, np.zeros(2048, np.complex64)]))
    assert len(frames) == 1
    assert frames[0].crc_ok is True


def test_frame_from_bytes_roundtrip():
    """dissect_packet parity (utilities.h:406-416): to_bytes <-> from_bytes."""
    from lora_tpu.io.frames import Frame, PhyHeader, LoRaTapHeader, LORATAP

    f = Frame(
        phy_header=PhyHeader(length=6, cr=4, has_mac_crc=1, crc_msn=0x9,
                             crc_lsn=0x4),
        payload=bytes.fromhex("deadbeef80ec"),
        snr=100.0,
        tap_header=LoRaTapHeader(lt_length=15, frequency=868100000,
                                 bandwidth=125, sf=7, sync_word=0x34),
    )
    buf = f.to_bytes(LORATAP)
    g = Frame.from_bytes(buf)
    assert g.to_bytes(LORATAP) == buf
    assert g.phy_header == f.phy_header
    assert g.tap_header == f.tap_header
    assert g.mac_payload == bytes.fromhex("deadbeef")
    assert g.crc_ok is True
