"""User-facing receiver facade.

Mirrors the reference hier block ``lora.lora_receiver``
(python/lora_receiver.py:30): channelization (optional) -> conjugate
(optional, downlink) -> decoder, with the decoder's CFO ``control``
feedback applied to the channelizer mixer (the reference wires this via
controller_impl; the publisher is disabled there — lib/decoder_impl.cc:774
— so ``apply_cfo`` is exposed for explicit use, matching
``channelizer_impl::apply_cfo`` :68-71).

Engines:

- ``"golden"`` — numpy sequential reference-parity model
- ``"parity"`` — jitted state machine (TPU), bit-parity with golden
- ``"dense"``  — batched two-phase throughput pipeline (TPU)

Unlike the reference (which channelizes only ``channel_list[0]``,
lib/channelizer_impl.cc:47), every listed channel is extracted and decoded.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from .config import LoRaConfig
from .channelizer import lora_channel_taps, freq_xlating_fir, channelize_list
from .io.frames import Frame


class LoRaReceiver:
    def __init__(
        self,
        samp_rate: float,
        center_freq: float,
        channel_list: Sequence[float],
        bandwidth: float,
        sf: int,
        implicit: bool = False,
        cr: int = 4,
        crc: bool = True,
        reduced_rate: bool = False,
        conj: bool = False,
        decimation: int = 1,
        disable_channelization: bool = False,
        disable_drift_correction: bool = False,
        engine: str = "golden",
        auto_cfo: bool = False,
        **engine_kwargs,
    ):
        self.auto_cfo = auto_cfo
        self.samp_rate = samp_rate
        self.center_freq = center_freq
        self.channel_list = list(channel_list) if channel_list else [center_freq]
        self.bandwidth = bandwidth
        # non-integer decimation (e.g. RTL-SDR 1.024 Msps -> 1 Msps) takes
        # the fractional-resampler path, as in the reference (:59-62)
        self.decimation = (
            int(decimation) if float(decimation) == int(decimation)
            else float(decimation)
        )
        self.decimation = max(1, self.decimation)
        if not isinstance(self.decimation, int) and not disable_channelization:
            raise ValueError(
                "fractional decimation requires disable_channelization=True "
                "(the reference's fractional_resampler path; its channelizer "
                "FIR likewise only takes integer decimation)"
            )
        self.disable_channelization = disable_channelization
        self.engine = engine
        self._cfo = 0.0

        self.config = LoRaConfig(
            sf=sf,
            cr=cr,
            bandwidth=bandwidth,
            samp_rate=samp_rate / self.decimation,
            implicit=implicit,
            crc=crc,
            reduced_rate=reduced_rate,
            conj=conj,
            disable_drift_correction=disable_drift_correction,
        )
        self._taps = lora_channel_taps(samp_rate, bandwidth)
        self._decoders = None
        self._engine_kwargs = dict(engine_kwargs)
        # low_snr="auto" (dense engine): decode with the reference-parity
        # gates first; when a capture yields NOTHING, retry it through
        # the coherent low-SNR pipeline (docs/perf/sensitivity.md). The
        # two-pass policy costs one extra dispatch only on empty blocks
        # — a receiver at the sensitivity floor is mostly-empty by
        # definition, and blocks with decodable strong packets never pay
        # it. Implicit-header configs stay on the parity gates: the
        # implicit end-of-frame is an energy threshold against the
        # preamble window (lib/decoder_impl.cc:356-357,861-864), and at
        # the SNRs where coherent detection matters the per-symbol
        # energy is noise-dominated — the stop fires arbitrarily, so a
        # coherent retry would emit garbage-length frames rather than
        # recover real ones.
        self._auto_low_snr = (
            engine == "dense"
            and self._engine_kwargs.get("low_snr") == "auto"
        )
        if self._auto_low_snr:
            self._engine_kwargs.pop("low_snr")
            self._coherent = None  # built lazily on first empty capture

    # ---- control plane (reference controller/channelizer feedback) ----

    def apply_cfo(self, cfo: float) -> None:
        """Accumulate a CFO correction into the channelizer mixer
        (reference channelizer_impl.cc:68-71)."""
        self._cfo += cfo

    # ---- decode -------------------------------------------------------

    def _make_decoder(self):
        if self.engine == "golden":
            from .rx.golden import GoldenReceiver

            return GoldenReceiver(self.config)
        if self.engine == "parity":
            from .rx.receiver import JaxReceiver

            return JaxReceiver(self.config, **self._engine_kwargs)
        if self.engine == "dense":
            from .rx.dense import DenseReceiver

            return DenseReceiver(self.config, **self._engine_kwargs)
        raise ValueError(f"unknown engine {self.engine!r}")

    def _receive_coherent(self, streams) -> List[Frame]:
        """The low_snr="auto" second pass (see __init__): coherent
        dechirp-fold detection/SFD on the already-channelized streams."""
        if self._coherent is None:
            from .rx.dense import DenseReceiver

            kw = dict(self._engine_kwargs)
            kw.pop("demod_method", None)  # low_snr mode is fft-engine only
            try:
                self._coherent = DenseReceiver(self.config, low_snr=True,
                                               **kw)
            except ValueError:
                # geometry can't host the fold matrices (sps * n_bins
                # past the budget) — auto mode quietly stays single-pass
                self._coherent = False
        if self._coherent is False:
            return []
        frames: List[Frame] = []
        if len(streams) > 1:
            return self._coherent.run(
                np.stack([np.asarray(s) for s in streams])
            )
        for ci, s in enumerate(streams):
            for f in self._coherent.run(np.asarray(s)):
                f.channel = ci
                frames.append(f)
        return frames

    def receive(self, samples: np.ndarray) -> List[Frame]:
        """Channelize + decode one capture; returns all decoded frames
        (frame.channel = index into channel_list)."""
        samples = np.asarray(samples, dtype=np.complex64)
        if self._decoders is None:
            self._decoders = self._make_decoder()
        dec = self._decoders

        if self.disable_channelization:
            # reference: fractional resampler path (python/lora_receiver.py:59-62);
            # for integer decimation plain stride decimation suffices
            if isinstance(self.decimation, int):
                streams = [samples[:: self.decimation]]
            else:
                from .channelizer import fractional_resampler

                streams = [fractional_resampler(samples, self.decimation)]
        else:
            offsets = [f - self.center_freq + self._cfo for f in self.channel_list]
            if len(offsets) == 1:
                streams = [
                    freq_xlating_fir(samples, self._taps, offsets[0],
                                     self.samp_rate, self.decimation)
                ]
            else:
                streams = np.asarray(
                    channelize_list(samples, self._taps, offsets,
                                    self.samp_rate, self.decimation)
                )

        frames: List[Frame] = []
        if self.engine == "dense" and len(streams) > 1:
            frames = dec.run(np.stack([np.asarray(s) for s in streams]))
        else:
            for ci, s in enumerate(streams):
                for f in dec.run(np.asarray(s)):
                    f.channel = ci
                    frames.append(f)
        if self._auto_low_snr and not frames and not self.config.implicit:
            frames = self._receive_coherent(streams)
        for f in frames:
            # stamp the LoRaTap radio-metadata fields (the reference
            # memsets them to zero except snr, lib/decoder_impl.cc:592-600;
            # filling them matches what loratap consumers expect)
            f.tap_header.frequency = int(self.channel_list[f.channel])
            f.tap_header.sf = self.config.sf
            f.tap_header.sync_word = self.config.sync_word
        if self.auto_cfo and frames:
            # close the reference's decoder->controller->channelizer loop
            # (python/lora_receiver.py:66, lib/controller_impl.cc:52-57):
            # retune the mixer by the median frame CFO for the next capture
            self.apply_cfo(float(np.median([f.cfo for f in frames])))
        return frames

    # ---- reference API surface (python/lora_receiver.py:80-97) --------

    def get_sf(self) -> int:
        return self.config.sf

    def set_sf(self, sf: int) -> None:
        # runtime SF changes are unsupported in the reference too
        # (lib/decoder_impl.cc:905-909)
        import warnings

        warnings.warn("setting the spreading factor during execution is not supported")

    def get_center_freq(self) -> float:
        return self.center_freq

    def set_center_freq(self, center_freq: float) -> None:
        self.center_freq = center_freq
