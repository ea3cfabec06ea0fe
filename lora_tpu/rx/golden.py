"""Golden sequential receiver — numpy mirror of the reference state machine.

This is the exactness-first model of ``decoder_impl::work``
(``lib/decoder_impl.cc:740-903``) and its helpers, kept deliberately
sequential and simple. It exists to (a) anchor the integer/DSP ops against
the reference algorithm, and (b) serve as the parity target for the jitted
TPU receivers: every detection decision, consume amount, and decoded byte
must match.

State machine (reference lib/decoder_impl.h:40-48):

    DETECT -> SYNC -> FIND_SFD -> PAUSE -> DECODE_HEADER -> DECODE_PAYLOAD
    with FIND_SFD -> DETECT on 4+ correlation failures and
    DECODE_PAYLOAD -> DETECT after frame emission.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..config import LoRaConfig, MAC_CRC_SIZE, MAX_PWR_QUEUE_SIZE, payload_symbol_count
from ..io.frames import Frame, PhyHeader
from ..ops import bits, demod
from ..ops.chirp import build_ideal_chirps, instantaneous_frequency, tiled_upchirp_ifreq
from ..ops.hamming import hamming84_decode
from ..tables import PRNG_HEADER
from ..tx.modulator import deinterleave_block, payload_whitening


class DecoderState(enum.Enum):
    DETECT = 0
    SYNC = 1
    FIND_SFD = 2
    PAUSE = 3
    DECODE_HEADER = 4
    DECODE_PAYLOAD = 5
    STOP = 6


@dataclass
class DebugTrace:
    """Optional per-packet intermediates (reference GRLORA_DEBUG analogue)."""

    bins: List[int] = field(default_factory=list)
    words: List[int] = field(default_factory=list)
    fine_syncs: List[int] = field(default_factory=list)
    detect_corrs: List[float] = field(default_factory=list)
    sfd_corrs: List[float] = field(default_factory=list)


class GoldenReceiver:
    def __init__(self, config: LoRaConfig, debug: bool = False):
        self.cfg = config
        self.debug = DebugTrace() if debug else None

        self.sps = config.samples_per_symbol
        self.decim = config.decim_factor
        self.n_bins = config.number_of_bins
        self.n_bins_hdr = config.number_of_bins_hdr

        up, down = build_ideal_chirps(config)
        self.upchirp, self.downchirp = up, down
        self.upchirp_ifreq = instantaneous_frequency(up)
        self.downchirp_ifreq = instantaneous_frequency(down)
        self.upchirp_ifreq_v = tiled_upchirp_ifreq(config)

        self._reset_all()

    # ---- lifecycle -------------------------------------------------------

    def _reset_all(self):
        cfg = self.cfg
        self.state = DecoderState.DETECT
        self.words: List[int] = []
        self.demodulated: List[int] = []
        self.decoded = np.zeros(0, dtype=np.uint8)
        self.payload_symbols = 0
        self.payload_length = 0
        self.energy_threshold = 0.0
        self.fine_sync = 0
        self.corr_fails = 0
        self.snr = 0.0
        self.pwr_queue: List[float] = []
        # d_phdr initialised from constructor args (reference :72-73)
        self.phdr = PhyHeader(cr=cfg.cr, has_mac_crc=1 if cfg.crc else 0)

    # ---- reference helper mirrors ---------------------------------------

    def _demodulate(self, window: np.ndarray, is_first: bool) -> bool:
        """reference demodulate() :493-529."""
        cfg = self.cfg
        reduced = is_first or cfg.reduced_rate
        bin_idx = int(demod.max_frequency_gradient_idx(window, self.n_bins, self.decim))
        if not cfg.disable_drift_correction:
            self.fine_sync = int(
                demod.fine_sync_lag(
                    window, np.int64(bin_idx), self.upchirp_ifreq_v,
                    self.sps, self.decim, max(self.decim // 4, 2),
                )
            )
        if reduced:
            bin_idx = int(np.floor(bin_idx / 4.0 + 0.5)) % self.n_bins_hdr
        word = bin_idx ^ (bin_idx >> 1)
        if self.debug is not None:
            self.debug.bins.append(bin_idx)
            self.debug.words.append(word)
            self.debug.fine_syncs.append(self.fine_sync)
        self.words.append(word)
        if len(self.words) == 4 + (4 if is_first else cfg.cr):
            ppm = cfg.sf - 2 if reduced else cfg.sf
            rows = deinterleave_block(np.asarray(self.words, dtype=np.uint16), ppm)
            self.demodulated.extend(int(r) for r in rows)
            self.words.clear()
            return True
        return False

    def _decode(self, is_header: bool) -> np.ndarray:
        """reference decode() :567-586 + hamming_decode :654-675."""
        cfg = self.cfg
        dem = np.asarray(self.demodulated, dtype=np.uint8)
        if is_header:
            to_decode = bits.deshuffle(dem[:5])
            self.demodulated = self.demodulated[5:]
            deshuffled = np.concatenate([to_decode, np.zeros(1, dtype=np.uint8)])
            prng = np.asarray(PRNG_HEADER[: len(deshuffled)], dtype=np.uint8)
        else:
            deshuffled = bits.deshuffle(dem)
            self.demodulated = []
            prng = payload_whitening(self.phdr.cr, len(deshuffled))
        dewhitened = deshuffled ^ prng

        cr = self.phdr.cr
        if cr in (4, 3):
            # liquid fec_decode(HAMMING84, n) consumes 2n codewords; for CR3
            # that overruns the input in the reference (bytes past
            # payload_length are garbage there, zeros here — both ignored).
            n = int(np.ceil(len(dewhitened) * 4.0 / (4.0 + cr)))
            nibbles = hamming84_decode(dewhitened)
            if len(nibbles) < 2 * n:
                nibbles = np.concatenate(
                    [nibbles, np.zeros(2 * n - len(nibbles), dtype=np.uint8)]
                )
            decoded = bits.pack_nibbles_to_bytes(nibbles[: 2 * n], high_first=True)
            if not is_header:
                decoded = bits.swap_nibbles(decoded)
        elif cr in (2, 1):  # no FEC, extract data bits (reference :693-706)
            data = bits.extract_data_only(dewhitened)
            if len(data) % 2:
                data = np.concatenate([data, np.zeros(1, dtype=np.uint8)])
            decoded = bits.pack_nibbles_to_bytes(data, high_first=is_header)
        else:  # cr == 0: reference switch has no matching case; stays empty
            decoded = np.zeros(0, dtype=np.uint8)
        self.decoded = decoded.astype(np.uint8)
        return self.decoded

    # ---- the state machine ----------------------------------------------

    def run(self, samples: np.ndarray, step_callback=None) -> List[Frame]:
        """Feed a complex64 stream; returns decoded frames.

        ``step_callback(state, position)``, when given, is invoked before
        every state-machine step (debug/observability hook, the analogue of
        the reference's DBGR_CHRONO instrumentation points).
        """
        cfg = self.cfg
        samples = np.asarray(samples, dtype=np.complex64)
        if cfg.conj:
            samples = np.conj(samples)
        frames: List[Frame] = []
        sps = self.sps
        p = 0
        n = len(samples)

        while p + 2 * sps <= n:
            if step_callback is not None:
                step_callback(self.state, p)
            self.fine_sync = 0
            window = samples[p : p + 2 * sps]

            if self.state is DecoderState.DETECT:
                corr, e1, e2 = demod.preamble_autocorr(window, sps)
                self.energy_threshold = float(e2) / 2.0
                self.pwr_queue.append(float(e1) / sps)
                if len(self.pwr_queue) > MAX_PWR_QUEUE_SIZE:
                    self.pwr_queue.pop(0)
                if self.debug is not None:
                    self.debug.detect_corrs.append(float(corr))
                if corr >= 0.90:
                    if len(self.pwr_queue) >= 2:
                        # C++ float semantics: x/0 = inf, not an exception
                        self.snr = (
                            self.pwr_queue[-1] / self.pwr_queue[0]
                            if self.pwr_queue[0] != 0.0 else float("inf")
                        )
                    self.corr_fails = 0
                    self.state = DecoderState.SYNC
                else:
                    p += sps

            elif self.state is DecoderState.SYNC:
                i, _ = demod.upchirp_sync_xcorr(window, self.upchirp_ifreq, sps)
                p += int(i)
                self.state = DecoderState.FIND_SFD

            elif self.state is DecoderState.FIND_SFD:
                c = float(demod.downchirp_pearson(window[:sps], self.downchirp_ifreq, sps))
                if self.debug is not None:
                    self.debug.sfd_corrs.append(c)
                if c > 0.96:
                    self.state = DecoderState.PAUSE
                else:
                    if c < -0.97:
                        self.fine_sync = int(
                            demod.fine_sync_lag(
                                window[:sps], np.int64(-1), self.upchirp_ifreq_v,
                                sps, self.decim, self.decim * 4,
                            )
                        )
                    else:
                        self.corr_fails += 1
                    if self.corr_fails > 4:
                        self.state = DecoderState.DETECT
                p += sps + self.fine_sync

            elif self.state is DecoderState.PAUSE:
                self.state = DecoderState.DECODE_HEADER
                p += sps + cfg.delay_after_sync

            elif self.state is DecoderState.DECODE_HEADER:
                if self._demodulate(window[:sps], True):
                    if cfg.implicit:
                        self.payload_symbols = 1
                    else:
                        decoded = self._decode(True)
                        if len(decoded) < 3:
                            # A prior garbage header can leave phdr.cr == 0,
                            # whose decode branch yields no bytes; the
                            # reference then memcpy's 3 bytes from an empty
                            # vector (decoder_impl.cc:826, undefined reads).
                            # Refuse to mirror the UB: drop sync, back to
                            # DETECT (garbage headers can't produce a valid
                            # frame either way). Surfaced by the *drift*
                            # suites' occasional mis-synced candidates.
                            self._reset_all()
                            p += sps
                            continue
                        self.phdr = PhyHeader.from_bytes(bytes(decoded[:3]))
                        if self.phdr.cr > 4:
                            self.phdr.cr = 4  # reference :834-835
                        self.decoded = np.zeros(0, dtype=np.uint8)
                        self.payload_length = (
                            self.phdr.length + MAC_CRC_SIZE * self.phdr.has_mac_crc
                        )
                        self.payload_symbols = payload_symbol_count(
                            cfg.sf, self.phdr.cr, cfg.reduced_rate, self.payload_length
                        )
                    self.state = DecoderState.DECODE_PAYLOAD
                p += sps + self.fine_sync

            elif self.state is DecoderState.DECODE_PAYLOAD:
                if cfg.implicit and float(demod.symbol_energy(window[:sps])) < self.energy_threshold:
                    self.payload_symbols = 0
                    self.payload_length = len(self.demodulated) // 2
                elif self._demodulate(window[:sps], False):
                    if not cfg.implicit:
                        self.payload_symbols -= 4 + self.phdr.cr
                if self.payload_symbols <= 0:
                    decoded = self._decode(False)
                    frames.append(
                        Frame(
                            phy_header=PhyHeader(**vars(self.phdr)),
                            payload=bytes(decoded[: self.payload_length]),
                            snr=self.snr,
                            sample_index=p,
                        )
                    )
                    self.state = DecoderState.DETECT
                    self.decoded = np.zeros(0, dtype=np.uint8)
                    self.words.clear()
                    self.demodulated = []
                p += sps + self.fine_sync

            else:  # STOP
                p += sps

        return frames
