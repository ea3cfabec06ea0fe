"""Jitted TPU state-machine receiver (parity mode).

The reference's ``decoder_impl::work`` loop (lib/decoder_impl.cc:740-903)
re-expressed as a ``lax.while_loop`` whose carry is the complete decoder
state, with ``lax.switch`` dispatching the 7 states. All per-window DSP
reuses the dual-backend ops from :mod:`lora_tpu.ops` with ``xp=jax.numpy``,
so the arithmetic is the same code the golden model runs.

Design notes (TPU-first):

- The sample stream is a static-shape device array; windows are
  ``lax.dynamic_slice`` reads. The variable ``consume_each`` amounts of the
  reference become pointer arithmetic in the carry.
- The integer decode chain (deshuffle/dewhiten/Hamming/pack) runs *inside*
  jit on fixed-capacity buffers with masking — no host roundtrips per
  packet.
- Frames land in a fixed-capacity output ring; the host wrapper converts
  them to :class:`lora_tpu.io.frames.Frame` objects.
- ``vmap`` over the leading axis gives multi-channel parity decoding; the
  dense receiver (:mod:`lora_tpu.rx.dense`) is the high-throughput path.

Capacity limits (static): ``max_frames`` frames per stream chunk,
``MAX_CODEWORDS`` payload codewords (covers 255-byte payloads at every
SF/CR incl. reduced rate).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LoRaConfig, MAC_CRC_SIZE
from ..io.frames import Frame, PhyHeader
from ..ops import bits, demod, xfer
from ..ops.chirp import build_ideal_chirps, instantaneous_frequency, tiled_upchirp_ifreq
from ..ops.hamming import HAMMING84_DECODE_LUT
from ..tables import PRNG_PAYLOAD_CR56, PRNG_PAYLOAD_CR78

# State ids (reference lib/decoder_impl.h:40-48)
DETECT, SYNC, FIND_SFD, PAUSE, DECODE_HEADER, DECODE_PAYLOAD, STOP = range(7)

MAX_CODEWORDS = 544          # >= 525 codewords of an SF12 reduced 257B frame
MAX_DECODED = MAX_CODEWORDS // 2 + 8
MAX_PAYLOAD = 260


class RxState(NamedTuple):
    p: jnp.ndarray                 # int32 stream pointer
    state: jnp.ndarray             # int32 state id
    words: jnp.ndarray             # int32[8] symbol words of current block
    n_words: jnp.ndarray           # int32
    demod_buf: jnp.ndarray         # int32[MAX_CODEWORDS]
    n_demod: jnp.ndarray           # int32
    hdr_cr: jnp.ndarray            # int32 effective cr (phdr.cr)
    hdr_crc: jnp.ndarray           # int32 has_mac_crc
    hdr_bytes: jnp.ndarray         # int32[3] decoded phy header bytes
    payload_symbols: jnp.ndarray   # int32
    payload_length: jnp.ndarray    # int32
    energy_thresh: jnp.ndarray     # f32
    corr_fails: jnp.ndarray        # int32
    drift_num: jnp.ndarray         # f32 sum of FIND_SFD fine corrections
    drift_den: jnp.ndarray         # int32 windows contributing to drift_num
    drift_acc: jnp.ndarray         # f32 fractional open-loop drift accumulator
    sync_ref_bin: jnp.ndarray      # int32 anchored preamble bin (-1 unset)
    sync_run: jnp.ndarray          # int32 run length of recognised sync symbols
    sync_streak: jnp.ndarray       # int32 consecutive stable preamble reads
    snr: jnp.ndarray               # f32
    pwr_queue: jnp.ndarray         # f32[4]
    pwr_len: jnp.ndarray           # int32
    # outputs
    n_frames: jnp.ndarray          # int32 frames stored (clamped at capacity)
    n_total: jnp.ndarray           # int32 frames decoded (incl. overwritten)
    out_payload: jnp.ndarray       # uint8[max_frames, MAX_PAYLOAD]
    out_len: jnp.ndarray           # int32[max_frames]
    out_hdr: jnp.ndarray           # uint8[max_frames, 3]
    out_snr: jnp.ndarray           # f32[max_frames]
    out_pos: jnp.ndarray           # int32[max_frames]


def _payload_prng(cr_is_low, n: int):
    """Whitening table selected by cr<=2, zero-padded to n."""
    t56 = np.zeros(n, np.int32)
    t78 = np.zeros(n, np.int32)
    t56[: len(PRNG_PAYLOAD_CR56)] = PRNG_PAYLOAD_CR56[:n]
    t78[: len(PRNG_PAYLOAD_CR78)] = PRNG_PAYLOAD_CR78[:n]
    return jnp.where(cr_is_low, jnp.asarray(t56), jnp.asarray(t78))


class JaxReceiver:
    """Compiled reference-parity receiver for a fixed config."""

    def __init__(self, config: LoRaConfig, max_frames: int = 16):
        self.cfg = config
        self.max_frames = max_frames
        cfg = config
        self.sps = cfg.samples_per_symbol
        self.n_bins = cfg.number_of_bins
        self.n_bins_hdr = cfg.number_of_bins_hdr
        self.decim = cfg.decim_factor

        up, down = build_ideal_chirps(cfg)
        # keep constants host-side: XLA embeds them at trace time (a
        # device-committed constant would need a device->host fetch during
        # lowering, which the axon TPU transport does not support)
        self._up_ifreq = instantaneous_frequency(up)
        self._down_ifreq = instantaneous_frequency(down)
        self._up_ifreq_v = tiled_upchirp_ifreq(cfg)
        self._ham_lut = HAMMING84_DECODE_LUT.astype(np.int32)

        self._run = jax.jit(self._build_run())

    # ------------------------------------------------------------------
    def _initial_state(self) -> RxState:
        mf = self.max_frames
        z = jnp.int32(0)
        return RxState(
            p=z, state=jnp.int32(DETECT),
            words=jnp.zeros(8, jnp.int32), n_words=z,
            demod_buf=jnp.zeros(MAX_CODEWORDS, jnp.int32), n_demod=z,
            hdr_cr=jnp.int32(self.cfg.cr),
            hdr_crc=jnp.int32(1 if self.cfg.crc else 0),
            # d_phdr starts from constructor args (reference :72-73);
            # matters for implicit mode where no header is decoded
            hdr_bytes=jnp.asarray(
                [0, (self.cfg.cr << 5) | ((1 if self.cfg.crc else 0) << 4), 0],
                jnp.int32,
            ),
            payload_symbols=z, payload_length=z,
            energy_thresh=jnp.float32(0.0), corr_fails=z,
            drift_num=jnp.float32(0.0), drift_den=z,
            drift_acc=jnp.float32(0.0),
            sync_ref_bin=jnp.int32(-1), sync_run=z, sync_streak=z,
            snr=jnp.float32(0.0), pwr_queue=jnp.zeros(4, jnp.float32), pwr_len=z,
            n_frames=z, n_total=z,
            out_payload=jnp.zeros((mf, MAX_PAYLOAD), jnp.uint8),
            out_len=jnp.zeros(mf, jnp.int32),
            out_hdr=jnp.zeros((mf, 3), jnp.uint8),
            out_snr=jnp.zeros(mf, jnp.float32),
            out_pos=jnp.zeros(mf, jnp.int32),
        )

    # ------------------------------------------------------------------
    def _decode_header(self, st: RxState):
        """decode(true) + header parse (reference :826-852)."""
        buf = st.demod_buf
        to_decode = bits.deshuffle(buf[:5], xp=jnp)
        deshuffled = jnp.concatenate([to_decode, jnp.zeros(1, jnp.int32)])
        # header dewhitening is XOR with zeros
        nibbles = jnp.take(self._ham_lut, deshuffled)
        hdr = jnp.stack(
            [
                (nibbles[0] << 4) | nibbles[1],
                (nibbles[2] << 4) | nibbles[3],
                (nibbles[4] << 4) | nibbles[5],
            ]
        )
        length = hdr[0]
        cr = jnp.minimum((hdr[1] >> 5) & 0x7, 4)  # clamp, reference :834-835
        has_crc = (hdr[1] >> 4) & 0x1
        payload_length = length + MAC_CRC_SIZE * has_crc

        # payload symbol budget (reference :842-847), float32 math
        red = jnp.float32(2.0 if self.cfg.reduced_rate else 0.0)
        spb = (cr + 4).astype(jnp.float32)
        bits_needed = payload_length.astype(jnp.float32) * 8.0
        symbols_needed = bits_needed * (spb / 4.0) / (jnp.float32(self.cfg.sf) - red)
        blocks_needed = jnp.ceil(symbols_needed / spb)
        payload_symbols = (blocks_needed * spb).astype(jnp.int32)

        # erase the 5 header codewords from the stream buffer
        demod_buf = jnp.roll(buf, -5)
        demod_buf = demod_buf * (jnp.arange(MAX_CODEWORDS) < (st.n_demod - 5))
        return st._replace(
            demod_buf=demod_buf,
            n_demod=st.n_demod - 5,
            hdr_cr=cr.astype(jnp.int32),
            hdr_crc=has_crc.astype(jnp.int32),
            hdr_bytes=hdr.astype(jnp.int32),
            payload_length=payload_length.astype(jnp.int32),
            payload_symbols=payload_symbols,
        )

    def _decode_payload_bytes(self, st: RxState):
        """decode(false): full-buffer masked int chain -> decoded bytes."""
        n = st.n_demod
        cr = st.hdr_cr
        idx = jnp.arange(MAX_CODEWORDS)
        valid = idx < n
        deshuffled = bits.deshuffle(st.demod_buf, xp=jnp) & 0xFF
        prng = _payload_prng(cr <= 2, MAX_CODEWORDS)
        dewhitened = jnp.where(valid, deshuffled ^ prng, 0)

        # cr 4/3: hamming84 -> nibbles, pack (n0<<4|n1), swap_nibbles
        nib = jnp.take(self._ham_lut, dewhitened)
        b_ham = (nib[0::2] << 4) | nib[1::2]
        b_ham = ((b_ham & 0x0F) << 4) | ((b_ham & 0xF0) >> 4)  # swap_nibbles
        # cr 2/1: data-bit extraction, pack (second<<4 | first)
        data = bits.extract_data_only(dewhitened, xp=jnp)
        b_raw = (data[1::2] << 4) | data[0::2]

        decoded = jnp.where(cr >= 3, b_ham, jnp.where(cr >= 1, b_raw, 0))
        return decoded.astype(jnp.uint8)  # [MAX_CODEWORDS // 2]

    def _emit_frame(self, st: RxState):
        decoded = self._decode_payload_bytes(st)
        k = jnp.minimum(st.n_frames, self.max_frames - 1)
        paylen = jnp.minimum(st.payload_length, MAX_PAYLOAD)
        pay = jnp.where(
            jnp.arange(MAX_PAYLOAD) < paylen,
            jnp.pad(decoded, (0, MAX_PAYLOAD - decoded.shape[0]))[:MAX_PAYLOAD]
            if decoded.shape[0] < MAX_PAYLOAD else decoded[:MAX_PAYLOAD],
            0,
        )
        return st._replace(
            n_frames=jnp.minimum(st.n_frames + 1, self.max_frames),
            n_total=st.n_total + 1,
            out_payload=st.out_payload.at[k].set(pay),
            out_len=st.out_len.at[k].set(paylen),
            out_hdr=st.out_hdr.at[k].set(st.hdr_bytes.astype(jnp.uint8)),
            out_snr=st.out_snr.at[k].set(st.snr),
            out_pos=st.out_pos.at[k].set(st.p),
        )

    # ------------------------------------------------------------------
    def _demodulate(self, st: RxState, window, is_first: bool):
        """reference demodulate() :493-529 as a carry update.

        Returns (st, fine_sync, block_done).
        """
        cfg = self.cfg
        reduced = is_first or cfg.reduced_rate
        bin_idx = demod.max_frequency_gradient_idx(window, self.n_bins, self.decim, xp=jnp)
        if not cfg.disable_drift_correction:
            fine = demod.fine_sync_lag(
                window, bin_idx, self._up_ifreq_v, self.sps, self.decim,
                demod.fine_sync_search_space(self.decim), xp=jnp,
            )
        else:
            fine = jnp.int32(0)
        if reduced:
            bin_idx = jnp.floor(bin_idx / 4.0 + 0.5).astype(jnp.int32) % self.n_bins_hdr
        word = bin_idx ^ (bin_idx >> 1)

        words = st.words.at[jnp.minimum(st.n_words, 7)].set(word.astype(jnp.int32))
        n_words = st.n_words + 1
        block_size = jnp.int32(8) if is_first else (4 + st.hdr_cr)
        done = n_words == block_size

        # deinterleave on completion (reference :535-565)
        ppm = (cfg.sf - 2) if reduced else cfg.sf
        rot = jnp.stack(
            [bits.rotl(words[i], i, ppm, xp=jnp) for i in range(8)], axis=0
        )  # [8]
        i_idx = jnp.arange(8)
        x_idx = jnp.arange(ppm)
        bits_mat = (rot[:, None] >> x_idx[None, :]) & 1          # [8, ppm]
        in_block = i_idx < block_size
        rows = jnp.sum(
            jnp.where(in_block[:, None], bits_mat << i_idx[:, None], 0), axis=0
        )  # [ppm]

        # append rows when done
        pos = st.n_demod + jnp.arange(ppm)
        demod_buf = jnp.where(
            done,
            st.demod_buf.at[jnp.minimum(pos, MAX_CODEWORDS - 1)].set(rows.astype(jnp.int32)),
            st.demod_buf,
        )
        st = st._replace(
            words=jnp.where(done, jnp.zeros(8, jnp.int32), words),
            n_words=jnp.where(done, 0, n_words),
            demod_buf=demod_buf,
            n_demod=jnp.where(done, jnp.minimum(st.n_demod + ppm, MAX_CODEWORDS), st.n_demod),
        )
        return st, fine, done

    # ------------------------------------------------------------------
    def _build_run(self):
        cfg = self.cfg
        sps = self.sps

        def run(samples_f):
            # packed IQ float32 [2, L] (see lora_tpu.ops.xfer)
            samples = xfer.unpack_iq(samples_f)
            if cfg.conj:
                samples = jnp.conj(samples)
            n = samples.shape[0]

            def window2(p):
                return jax.lax.dynamic_slice(samples, (p,), (2 * sps,))

            def detect(st, w2):
                corr, e1, e2 = demod.preamble_autocorr(w2, sps, xp=jnp)
                pwr = e1 / sps
                # 4-deep circular queue (reference d_pwr_queue)
                full = st.pwr_len >= 4
                queue = jnp.where(full, jnp.roll(st.pwr_queue, -1), st.pwr_queue)
                queue = queue.at[jnp.minimum(st.pwr_len, 3)].set(pwr)
                pwr_len = jnp.minimum(st.pwr_len + 1, 4)
                hit = corr >= 0.90
                snr = jnp.where(
                    (pwr_len >= 2) & hit, queue[pwr_len - 1] / queue[0], st.snr
                )
                return st._replace(
                    energy_thresh=e2 / 2.0,
                    pwr_queue=queue, pwr_len=pwr_len,
                    snr=snr,
                    corr_fails=jnp.where(hit, 0, st.corr_fails),
                    drift_num=jnp.where(hit, 0.0, st.drift_num).astype(jnp.float32),
                    drift_den=jnp.where(hit, 0, st.drift_den).astype(jnp.int32),
                    drift_acc=jnp.where(hit, 0.0, st.drift_acc).astype(jnp.float32),
                    sync_ref_bin=jnp.where(hit, -1, st.sync_ref_bin).astype(jnp.int32),
                    sync_run=jnp.where(hit, 0, st.sync_run).astype(jnp.int32),
                    sync_streak=jnp.where(hit, 0, st.sync_streak).astype(jnp.int32),
                    state=jnp.where(hit, SYNC, DETECT).astype(jnp.int32),
                    # on hit: sync one window past the detection edge
                    # (see GoldenReceiver DETECT; dense-engine rule)
                    p=st.p + sps,
                )

            def sync(st, w2):
                i, _ = demod.upchirp_sync_xcorr(w2, self._up_ifreq, sps, xp=jnp)
                return st._replace(p=st.p + i, state=jnp.int32(FIND_SFD))

            def find_sfd(st, w2):
                c = demod.downchirp_pearson(w2[:sps], self._down_ifreq, sps, xp=jnp)
                found = c > 0.96
                # sync-word recognition (see GoldenReceiver FIND_SFD): a
                # run of <= 2 upchirps clearly shifted vs the anchored
                # preamble bin, after >= 2 stable preamble reads, is the
                # sync word — hold alignment, no fail spent
                b = demod.max_frequency_gradient_idx(
                    w2[:sps], self.n_bins, self.decim, xp=jnp)
                first = st.sync_ref_bin < 0
                ref = jnp.where(first, b, st.sync_ref_bin)
                streak0 = jnp.where(first, 1, st.sync_streak)
                rel = (b - ref) % self.n_bins
                dist = jnp.minimum(rel, self.n_bins - rel)
                # signal-evidence gate: see demod.upchirp_likeness (noise
                # windows must keep spending correlation-fail budget)
                likeness = demod.upchirp_likeness(
                    w2[:sps], b, self._up_ifreq_v, sps, self.decim, xp=jnp)
                is_syncw = ((~found) & (dist > 3) & (st.sync_run < 2)
                            & (streak0 >= 2)
                            & (likeness > demod.SYNC_LIKENESS_MIN))
                is_up = (c < -0.97) & ~is_syncw
                re_anchor = is_up & (dist > 3)
                ref = jnp.where(re_anchor, b, ref)
                streak = jnp.where(
                    is_up,
                    jnp.where(dist <= 3, streak0 + 1, 1),
                    streak0,
                )
                fine = jnp.where(
                    is_up,
                    demod.fine_sync_lag(
                        w2[:sps], jnp.int32(-1), self._up_ifreq_v,
                        sps, self.decim, self.decim * 4, xp=jnp,
                    ),
                    jnp.int32(0),
                )
                corr_fails = jnp.where(
                    found | is_up | is_syncw, st.corr_fails, st.corr_fails + 1
                )
                state = jnp.where(
                    found, PAUSE, jnp.where(corr_fails > 4, DETECT, FIND_SFD)
                ).astype(jnp.int32)
                fine = jnp.where(found, 0, fine)
                # sample-clock drift estimate from the per-upchirp
                # corrections (large lags are resyncs, not drift); fed
                # forward across the blind SFD consume in pause()
                track = is_up & ~found & (jnp.abs(fine) <= self.decim // 2)
                return st._replace(
                    corr_fails=corr_fails, state=state, p=st.p + sps + fine,
                    drift_num=st.drift_num + jnp.where(track, fine, 0).astype(jnp.float32),
                    drift_den=st.drift_den + jnp.where(track, 1, 0),
                    sync_ref_bin=ref.astype(jnp.int32),
                    # total per-walk budget, not a resettable run (see
                    # GoldenReceiver FIND_SFD note)
                    sync_run=jnp.where(is_syncw, st.sync_run + 1,
                                       st.sync_run).astype(jnp.int32),
                    sync_streak=streak.astype(jnp.int32),
                )

            def pause(st, w2):
                # drift-rate feed-forward across the blind 2.25-symbol SFD
                # region (see GoldenReceiver PAUSE / short_sim_drift)
                rate = st.drift_num / jnp.maximum(st.drift_den, 1)
                corr = jnp.round(2.25 * rate).astype(jnp.int32)
                return st._replace(
                    state=jnp.int32(DECODE_HEADER),
                    p=st.p + sps + cfg.delay_after_sync + corr,
                )

            def drift_step(st):
                # open-loop clock-drift advance (GoldenReceiver._drift_step)
                rate = st.drift_num / jnp.maximum(st.drift_den, 1)
                acc = st.drift_acc + rate
                step = jnp.round(acc).astype(jnp.int32)
                if cfg.disable_drift_correction:
                    step = jnp.int32(0)
                return (acc - step.astype(jnp.float32)).astype(jnp.float32), step

            def decode_header(st, w2):
                st2, fine, done = self._demodulate(st, w2[:sps], is_first=True)
                if cfg.implicit:
                    st3 = st2._replace(payload_symbols=jnp.int32(1))
                else:
                    st3 = self._decode_header(st2)
                st4 = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(done, a, b), st3, st2
                )
                acc, dstep = drift_step(st)
                return st4._replace(
                    state=jnp.where(done, DECODE_PAYLOAD, DECODE_HEADER).astype(jnp.int32),
                    p=st.p + sps + fine + dstep,
                    drift_acc=acc,
                )

            def decode_payload(st, w2):
                if cfg.implicit:
                    energy = demod.symbol_energy(w2[:sps], xp=jnp)
                    stop = energy < st.energy_thresh
                else:
                    stop = jnp.bool_(False)
                st_dem, fine, done = self._demodulate(st, w2[:sps], is_first=False)
                if cfg.implicit:
                    dec = jnp.int32(0)  # reference :866-867: only explicit decrements
                else:
                    dec = jnp.where(done, 4 + st.hdr_cr, 0)
                st_dem = st_dem._replace(payload_symbols=st.payload_symbols - dec)
                # implicit stop: no demod this window (reference :861-864)
                st2 = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(stop, a, b),
                    st._replace(
                        payload_symbols=jnp.int32(0),
                        payload_length=st.n_demod // 2,
                    ),
                    st_dem,
                )
                fine = jnp.where(stop, 0, fine)

                finish = st2.payload_symbols <= 0
                st_emit = self._emit_frame(st2)
                st_reset = st_emit._replace(
                    state=jnp.int32(DETECT),
                    words=jnp.zeros(8, jnp.int32), n_words=jnp.int32(0),
                    demod_buf=jnp.zeros(MAX_CODEWORDS, jnp.int32),
                    n_demod=jnp.int32(0),
                )
                st3 = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(finish, a, b), st_reset, st2
                )
                acc, dstep = drift_step(st)
                return st3._replace(
                    state=jnp.where(finish, DETECT, DECODE_PAYLOAD).astype(jnp.int32),
                    p=st.p + sps + fine + dstep,
                    drift_acc=acc,
                )

            def stop(st, w2):
                return st._replace(p=st.p + sps)

            branches = [detect, sync, find_sfd, pause, decode_header, decode_payload, stop]

            def body(st):
                w2 = window2(st.p)
                return jax.lax.switch(st.state, branches, st, w2)

            def cond(st):
                return st.p + 2 * sps <= n

            st = jax.lax.while_loop(cond, body, self._initial_state())
            # promote 0-d leaves to shape (1,): some TPU transports (axon)
            # cannot transfer 0-d arrays device->host
            return jax.tree_util.tree_map(
                lambda a: a[None] if a.ndim == 0 else a, st
            )

        return run

    # ------------------------------------------------------------------
    def run(self, samples) -> List[Frame]:
        """Decode a stream; returns host-side Frame objects."""
        samples = np.asarray(samples)
        if np.iscomplexobj(samples):
            samples = xfer.pack_iq(samples.astype(np.complex64))
        st = self._run(samples)
        return self.frames_from_state(jax.device_get(st))

    def frames_from_state(self, st, channel: int = 0) -> List[Frame]:
        """Also sets ``self.n_dropped``: frames decoded past the
        ``max_frames`` ring capacity (they overwrote the last slot — a
        long capture with more packets than capacity no longer loses them
        silently; raise ``max_frames`` when this is nonzero)."""
        frames = []
        n_frames = int(np.ravel(st.n_frames)[0])
        self.n_dropped = max(int(np.ravel(st.n_total)[0]) - n_frames, 0)
        for k in range(n_frames):
            ln = int(st.out_len[k])
            frames.append(
                Frame(
                    phy_header=PhyHeader.from_bytes(bytes(np.asarray(st.out_hdr[k], np.uint8))),
                    payload=bytes(np.asarray(st.out_payload[k][:ln], np.uint8)),
                    snr=float(st.out_snr[k]),
                    channel=channel,
                    sample_index=int(st.out_pos[k]),
                )
            )
        return frames
