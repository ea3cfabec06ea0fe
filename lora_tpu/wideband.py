"""Wideband full-band receiver: PFB channelizer + dense decode, one jit.

The capability the reference explicitly lacks ("decoding multiple channels
simultaneously", reference README.md:10-14; its channelizer extracts only
``channel_list[0]``, lib/channelizer_impl.cc:47). Here one wideband capture
at ``M * chan_rate`` is split by the critically-sampled polyphase
filterbank into ``M`` channel streams which are decoded by the dense
receiver in the same compiled program — channelization output never
returns to the host, so the whole band runs at device speed.

Channel ``c`` of the PFB sits at ``pfb_channel_freqs(samp_rate, M)[c]`` Hz
relative to the capture center; :meth:`WidebandReceiver.run` stamps each
frame with its channel index and center frequency.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .channelizer import PolyphaseChannelizer, pfb_channel_freqs
from .config import LoRaConfig
from .io.frames import Frame
from .ops import xfer
from .rx.dense import DenseReceiver, DenseResult


def _frames_from_pooled(res, active, cfg: LoRaConfig,
                        channel_freqs) -> List[Frame]:
    """Host-side Frame extraction from a fetched PooledResult."""
    from .io.frames import PhyHeader

    frames: List[Frame] = []
    valid = np.asarray(res.valid)
    for g in np.nonzero(valid)[0]:
        chan = int(active[int(np.asarray(res.channel)[g])])
        f = Frame(
            phy_header=PhyHeader.from_bytes(bytes(np.asarray(res.hdr)[g])),
            payload=bytes(
                np.asarray(res.payload)[g][: np.asarray(res.length)[g]]
            ),
            snr=float(np.asarray(res.snr)[g]),
            channel=chan,
            sample_index=int(np.asarray(res.start)[g]),
            cfo=float(np.asarray(res.cfo)[g]),
        )
        f.tap_header.frequency = int(abs(channel_freqs[chan]))
        f.tap_header.sf = cfg.sf
        f.tap_header.sync_word = cfg.sync_word
        frames.append(f)
    return frames


class WidebandReceiver:
    """Decode every LoRa channel of a wideband capture on-device.

    ``chan_config``: the per-channel LoRa config; its ``samp_rate`` is the
    per-channel rate. The wideband input rate is ``num_channels *
    chan_config.samp_rate``.

    ``active_channels``: optional list of PFB channel indices to decode
    (default: all). Restricting the set shrinks the candidate pipelines
    but the PFB always computes the full bank (its cost is independent of
    the channel count).
    """

    def __init__(
        self,
        chan_config: LoRaConfig,
        num_channels: int,
        active_channels: Optional[Sequence[int]] = None,
        pool: Optional[int] = None,
        plane_dtype=None,
        **dense_kwargs,
    ):
        self.cfg = chan_config
        self.M = int(num_channels)
        self.wide_rate = self.M * chan_config.samp_rate
        self.pfb = PolyphaseChannelizer.for_lora(
            self.wide_rate, self.M, chan_config.bandwidth
        )
        self.rx = DenseReceiver(chan_config, **dense_kwargs)
        self.pool = pool
        # dtype of the on-device channel planes between the PFB and the
        # dense stage. bf16 halves the HBM traffic of the detection pass
        # and every Phase B gather at a ~40 dB quantization floor (the
        # validated packed-bf16 regime, ops/xfer.pack_iq); f32 is the
        # parity default.
        self.plane_dtype = jnp.float32 if plane_dtype is None else plane_dtype
        self.active = (
            np.arange(self.M)
            if active_channels is None
            else np.asarray(list(active_channels), dtype=np.int32)
        )
        self.channel_freqs = pfb_channel_freqs(self.wide_rate, self.M)
        act = tuple(int(a) for a in self.active)

        def process(xf):
            """packed wideband IQ float32 ``[2, L]`` -> DenseResult
            ``[n_active, P]`` (or PooledResult ``[pool]`` when ``pool``
            is set — the scaling mode for hundreds/thousands of
            channels)."""
            # single-pass Pallas polyphase FIR + DFT-matmul
            # recombination, writing channel-major packed planes
            # [M, 2, Lc] directly (no complex materialisation, no
            # separate transpose pass) — see PolyphaseChannelizer.planes
            cp = self.pfb.planes(xf, out_dtype=self.plane_dtype)
            if len(act) != self.M:
                cp = cp[np.asarray(act)]
            if self.pool is not None:
                return self.rx.process_pooled_planes(cp, self.pool)
            return self.rx.process_planes(cp)

        self.process_fn = process
        self._process = jax.jit(process)

    # ------------------------------------------------------------------
    def process(self, x) -> DenseResult:
        """``x``: host complex wideband IQ ``[L]`` (or packed float32
        ``[2, L]`` / device array). Host complex input is padded by one
        packet region of *wideband* samples so channel-rate tails keep a
        full decode region (see DenseReceiver._region_from)."""
        if not isinstance(x, jax.Array):
            x = np.asarray(x)
            if np.iscomplexobj(x):
                pad = self.rx.pkt_samples * self.M
                x = xfer.pack_iq(np.pad(x.astype(np.complex64), (0, pad)))
        return self._process(x)

    def run(self, x) -> List[Frame]:
        """Decode; frames carry the PFB channel index and its frequency."""
        res = jax.device_get(self.process(x))
        frames: List[Frame] = []
        valid = np.asarray(res.valid)
        from .io.frames import PhyHeader

        if self.pool is not None:  # PooledResult: flat [G] lanes
            return _frames_from_pooled(res, self.active, self.cfg,
                                       self.channel_freqs)

        for ci in range(valid.shape[0]):
            for k in np.nonzero(valid[ci])[0]:
                chan = int(self.active[ci])
                f = Frame(
                    phy_header=PhyHeader.from_bytes(bytes(np.asarray(res.hdr)[ci, k])),
                    payload=bytes(
                        np.asarray(res.payload)[ci, k][: np.asarray(res.length)[ci, k]]
                    ),
                    snr=float(np.asarray(res.snr)[ci, k]),
                    channel=chan,
                    sample_index=int(np.asarray(res.start)[ci, k]),
                    cfo=float(np.asarray(res.cfo)[ci, k]),
                )
                f.tap_header.frequency = int(abs(self.channel_freqs[chan]))
                f.tap_header.sf = self.cfg.sf
                f.tap_header.sync_word = self.cfg.sync_word
                frames.append(f)
        return frames


class MultiSFWidebandReceiver:
    """Gateway-class receive: every channel x every spreading factor of a
    wideband capture, in one compiled program.

    LoRaWAN gateways listen for ALL spreading factors on every channel
    simultaneously (each SF is a quasi-orthogonal code on the same
    125 kHz channel); the reference needs one decoder block instance per
    SF, each re-reading the stream (``lora_receiver`` decodes a single
    configured SF — reference python/lora_receiver.py:30,53 — and the
    multi-SF GRC topology fans the source out to N receivers, mirrored
    by ``examples/lora_receive_multi_sf.yml``). Here the polyphase
    channelizer runs ONCE and its channel planes feed one
    :class:`~lora_tpu.rx.dense.DenseReceiver` per SF inside the same
    jit: the marginal cost of each extra SF is its detection pass over
    the planes plus its Phase B candidate lanes — not a
    re-channelization of the band.

    ``chan_config`` carries everything but the SF (rate, bandwidth, CR
    hint for implicit mode, sync word...); ``sfs`` lists the spreading
    factors to listen for. ``pool`` is the per-SF global candidate pool
    (the scaling path — required here since per-channel-per-SF lanes
    would multiply, exactly what pooling exists to avoid).

    Cross-SF rejection is inherent: a candidate raised on the wrong SF's
    grid fails that receiver's SFD walk or header decode (different
    ``2^sf`` chip grid), so ``run()`` needs no cross-SF arbitration; for
    captures without MAC CRCs, ``header_checksum=True`` tightens the
    header gate (docs/perf/false_frames.md).
    """

    def __init__(
        self,
        chan_config: LoRaConfig,
        num_channels: int,
        sfs: Sequence[int] = (7, 8, 9, 10, 11, 12),
        pool: int = 16,
        active_channels: Optional[Sequence[int]] = None,
        plane_dtype=None,
        shared_detection: bool = True,
        **dense_kwargs,
    ):
        if not sfs:
            raise ValueError("sfs must name at least one spreading factor")
        self.cfg = chan_config
        # dedup preserving order: duplicate SFs would emit every frame
        # once per duplicate (self.rxs dedups via the dict either way)
        self.sfs = tuple(dict.fromkeys(int(s) for s in sfs))
        self.M = int(num_channels)
        self.wide_rate = self.M * chan_config.samp_rate
        self.pfb = PolyphaseChannelizer.for_lora(
            self.wide_rate, self.M, chan_config.bandwidth
        )
        self.pool = int(pool)
        self.plane_dtype = jnp.float32 if plane_dtype is None else plane_dtype
        self.active = (
            np.arange(self.M)
            if active_channels is None
            else np.asarray(list(active_channels), dtype=np.int32)
        )
        self.channel_freqs = pfb_channel_freqs(self.wide_rate, self.M)
        self.rxs: Dict[int, DenseReceiver] = {
            sf: DenseReceiver(
                dataclasses.replace(chan_config, sf=sf), **dense_kwargs
            )
            for sf in self.sfs
        }
        act = tuple(int(a) for a in self.active)

        # the per-SF detection metrics share one fine-row substrate
        # (every SF's symbol length is a multiple of the smallest's)
        # computed in a single multi-lag pass over the planes — the
        # 6x-detection-reads fix of docs/perf/NOTES.md "Gateway cost
        # shape". low_snr receivers use the dechirp metric instead, so
        # any of them opts the whole bank out of the shared pass;
        # ``shared_detection=False`` is the per-SF-pass A/B control.
        self._shared_metrics = bool(shared_detection) and not any(
            rx.low_snr for rx in self.rxs.values()
        )

        def process(xf):
            """packed wideband IQ ``[2, L]`` -> {sf: PooledResult [pool]}.

            One PFB pass; every SF's detection + pooled Phase B reads
            the same channel planes (XLA shares the planes buffer across
            the per-SF subgraphs — no re-channelization, no transfer).
            """
            from .rx.frontend import multi_sf_detection_metrics

            cp = self.pfb.planes(xf, out_dtype=self.plane_dtype)
            if len(act) != self.M:
                cp = cp[np.asarray(act)]
            metrics = (
                multi_sf_detection_metrics(
                    cp, {sf: rx.sps for sf, rx in self.rxs.items()}
                )
                if self._shared_metrics
                else {sf: None for sf in self.sfs}
            )
            return {
                sf: rx.process_pooled_planes(cp, self.pool,
                                             metrics=metrics[sf])
                for sf, rx in self.rxs.items()
            }

        self.process_fn = process
        self._process = jax.jit(process)

    # ------------------------------------------------------------------
    @property
    def max_pkt_samples(self) -> int:
        """Largest per-SF packet region (channel-rate samples)."""
        return max(rx.pkt_samples for rx in self.rxs.values())

    def process(self, x):
        """``x``: host complex wideband IQ ``[L]`` (or packed ``[2, L]``
        / device array) -> ``{sf: PooledResult}``. Host complex input is
        padded by the largest SF's packet region (at the wideband rate)
        so channel-rate tails keep a full decode region for every SF."""
        if not isinstance(x, jax.Array):
            x = np.asarray(x)
            if np.iscomplexobj(x):
                pad = self.max_pkt_samples * self.M
                x = xfer.pack_iq(np.pad(x.astype(np.complex64), (0, pad)))
        return self._process(x)

    def run(self, x) -> List[Frame]:
        """Decode; frames carry channel index, channel frequency AND the
        spreading factor they decoded at (``frame.tap_header.sf``)."""
        results = jax.device_get(self.process(x))
        frames: List[Frame] = []
        for sf in self.sfs:
            cfg_sf = self.rxs[sf].cfg
            frames.extend(
                _frames_from_pooled(results[sf], self.active, cfg_sf,
                                    self.channel_freqs)
            )
        frames.sort(key=lambda f: (f.channel, f.sample_index))
        return frames
