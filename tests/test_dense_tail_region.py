"""Regression for the packed-plane region gather (dense Phase B) tail
contract: host *complex* input is padded by ``pkt_samples`` so a packet
whose candidate region extends past the capture end still decodes when
the packet itself fits; pre-packed input (streaming/bench paths) must
provide its own tailroom — region-crossing candidates are invalidated,
never decoded from a shifted (clamped) region."""

import numpy as np

from lora_tpu import LoRaConfig
from lora_tpu.ops.xfer import pack_iq
from lora_tpu.rx.dense import DenseReceiver
from lora_tpu.tx.modulator import modulate_frame


def test_packet_near_block_end_decodes():
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    sps = cfg.samples_per_symbol
    rx = DenseReceiver(cfg, max_candidates=4, max_symbols=32,
                       sfd_search=12, demod_method="fft")
    pkt = modulate_frame(cfg, b"\xab\xcd", snr_db=35.0, seed=5)
    # place the packet so its *region* (pkt_samples) overruns the block
    # but the packet data ends a symbol before the block end
    L = 64 * sps
    assert rx.pkt_samples > len(pkt) + 2 * sps  # region > packet: overrun real
    start = L - len(pkt) - sps
    x = np.zeros(L, np.complex64)
    x[start : start + len(pkt)] = pkt
    # host complex entry: padded internally, the tail packet decodes
    res = rx.process(x[None])
    valid = np.asarray(res.valid)[0]
    pay = np.asarray(res.payload)[0]
    ln = np.asarray(res.length)[0]
    got = [bytes(pay[k][: ln[k]])[:2] for k in np.nonzero(valid)[0]]
    assert got == [b"\xab\xcd"]
    # pre-packed entry without tailroom: the region-crossing candidate is
    # invalidated (clamped-region decodes must never surface)
    res = rx.process(pack_iq(x[None]))
    assert not np.asarray(res.valid).any()


def test_preamble_only_tail_not_decoded():
    # a packet cut off inside its preamble (no SFD in the block) must not
    # produce a frame. NOTE: a packet cut off *after* its header decodes
    # DOES emit a (corrupt-payload) frame — same as the reference, which
    # never validates CRCs (reference README.md:10-14).
    cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
    sps = cfg.samples_per_symbol
    rx = DenseReceiver(cfg, max_candidates=4, max_symbols=32,
                       sfd_search=12, demod_method="fft")
    pkt = modulate_frame(cfg, b"\xab\xcd", snr_db=35.0, seed=6)
    L = 64 * sps
    start = L - 5 * sps  # only ~5 preamble symbols fit
    x = np.zeros(L, np.complex64)
    x[start:] = pkt[: L - start]
    res = rx.process(pack_iq(x[None]))
    assert not np.asarray(res.valid).any()
