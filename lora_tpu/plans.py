"""LoRaWAN regional channel plans: gateway receive on real deployments.

The reference takes a ``channel_list`` of absolute frequencies but only
ever extracts the first one (reference ``lib/channelizer_impl.cc:47``,
``grc/lora_receiver.block.yml`` channel_list param). :class:`PlanGateway`
honours the whole list — every plan channel × every data-rate SF decoded
in one compiled program.

Why not the PFB here: LoRaWAN plans space channels 200 kHz apart, and a
critically-sampled polyphase filterbank forces channel rate = spacing —
at 200 ksps the LoRa symbol is ``2^sf * 200/125`` samples, which is not
an integer for any SF, so plan channels can never sit on a PFB grid that
the decoder can consume. An 8-64-channel plan is exactly the regime
where the batched frequency-translating FIR (`channelizer.channelize_list`,
the vectorised form of the reference's one-channel
``freq_xlating_fir_filter``) is the right tool: cost scales with the
channel count, but the count is small and every channel lands at a
decoder-legal rate (default 250 ksps, decimation 2). Dense channel grids
on the PFB-legal spacing stay with
:class:`~lora_tpu.wideband.MultiSFWidebandReceiver`.

Plan constants are the published LoRaWAN regional parameters (uplink
125 kHz channels): EU868 = the 3 mandatory + 5 conventional extension
channels; US915 = 64 uplink channels at 200 kHz spacing; AU915 mirrors
US915 shifted to 915.2 MHz.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

from .config import LoRaConfig
from .io.frames import Frame

# Uplink 125 kHz channel center frequencies [Hz].
EU868 = tuple(868.1e6 + 0.2e6 * i for i in range(3)) + tuple(
    867.1e6 + 0.2e6 * i for i in range(5)
)
US915 = tuple(902.3e6 + 0.2e6 * i for i in range(64))
AU915 = tuple(915.2e6 + 0.2e6 * i for i in range(64))

PLANS = {"EU868": EU868, "US915": US915, "AU915": AU915}


class PlanGateway:
    """Every channel of a LoRaWAN regional plan × every SF, one jit.

    ``plan``: a plan name (``"EU868"``/``"US915"``/``"AU915"``) or a
    sequence of absolute channel frequencies [Hz]. Channels outside the
    captured band ``center_freq ± samp_rate/2`` are skipped (a 64-channel
    US915 plan against an 8 MHz capture listens on the 8 channels in
    band).

    ``samp_rate`` must be an integer multiple of ``chan_rate`` (the
    decimated per-channel rate; 250 ksps default = decimation 2 against
    the 125 kHz LoRa bandwidth, the validated wideband geometry).
    ``sync_word`` defaults to 0x34 (public LoRaWAN).
    """

    def __init__(
        self,
        plan,
        center_freq: float,
        samp_rate: float,
        chan_rate: float = 250e3,
        sfs: Sequence[int] = (7, 8, 9, 10, 11, 12),
        bandwidth: float = 125e3,
        cr: int = 4,
        crc: bool = True,
        implicit: bool = False,
        sync_word: int = 0x34,
        pool: Optional[int] = None,
        transition_hz: Optional[float] = None,
        plane_dtype=None,
        fused: Optional[bool] = None,
        fused_interpret: bool = False,
        **dense_kwargs,
    ):
        import jax

        from .channelizer import (channelize_list_planes_factored,
                                  firdes_low_pass, make_fused_fir_matrix)
        from .rx.dense import DenseReceiver

        if isinstance(plan, str):
            try:
                plan = PLANS[plan.upper()]
            except KeyError:
                raise ValueError(
                    f"unknown plan {plan!r}; known: {sorted(PLANS)}"
                ) from None
        decim = int(round(samp_rate / chan_rate))
        if abs(samp_rate - decim * chan_rate) > 1e-6 or decim < 1:
            raise ValueError(
                f"samp_rate {samp_rate} is not an integer multiple of "
                f"chan_rate {chan_rate}")
        self.center_freq = float(center_freq)
        self.samp_rate = float(samp_rate)
        self.chan_rate = float(chan_rate)
        self.decim = decim
        guard = chan_rate / 2.0
        self.channels: List[float] = [
            float(f) for f in plan
            if abs(f - center_freq) <= samp_rate / 2.0 - guard
        ]
        if not self.channels:
            raise ValueError(
                "no plan channel falls inside the captured band "
                f"[{(center_freq - samp_rate/2)/1e6:.3f}, "
                f"{(center_freq + samp_rate/2)/1e6:.3f}] MHz")
        self.offsets = np.asarray(
            [f - center_freq for f in self.channels], dtype=np.float64)
        # channel filter: reference cutoff (bw/2 + 15k,
        # lib/channelizer_impl.cc:46) with the transition relaxed to
        # chan_rate/4 — the reference's fixed 10 kHz transition costs
        # ~2000 taps at 8 Msps for no decode benefit (same trade as
        # PolyphaseChannelizer.for_lora), and sub-512-tap kernels keep
        # the conv compile-friendly on the remote toolchain
        self.taps = firdes_low_pass(
            1.0, samp_rate, bandwidth / 2.0 + 15000.0,
            transition_hz if transition_hz is not None else chan_rate / 4.0,
        )
        cfg = LoRaConfig(sf=min(sfs), cr=cr, samp_rate=chan_rate,
                         bandwidth=bandwidth, crc=crc, implicit=implicit,
                         sync_word=sync_word)
        self.cfg = cfg
        # dedup preserving order (duplicate SFs would emit every frame
        # once per duplicate; self.rxs dedups via the dict either way)
        self.sfs = tuple(dict.fromkeys(int(s) for s in sfs))
        self.pool = int(pool) if pool is not None else max(
            8, 2 * len(self.channels))
        self.rxs: Dict[int, "DenseReceiver"] = {
            sf: DenseReceiver(dataclasses.replace(cfg, sf=sf), **dense_kwargs)
            for sf in self.sfs
        }
        # streaming-adapter surface (see stream.WidebandStreamingReceiver)
        self.active = np.arange(len(self.channels), dtype=np.int32)
        self.channel_freqs = np.asarray(self.channels, dtype=np.float64)
        # dtype of the channel planes between the channelizer and the
        # per-SF dense stages (mirrors WidebandReceiver.plane_dtype:
        # bf16 halves detection + Phase B gather traffic at the
        # validated ~40 dB quantization floor; mixing/FIR stay f32)
        self.plane_dtype = plane_dtype
        # fused Pallas channelizer (one HBM pass over the wideband
        # input for ALL channels; see ops.pallas_kernels.
        # fused_channelize_pallas — measured 2.7x the factored XLA
        # mix+FIR on the EU868 geometry). Auto on TPU; ``fused=True``
        # forces it (tests run it in interpret mode on CPU).
        self._fused_tile = 1024
        self._fused_interpret = bool(fused_interpret)
        if fused is None:
            fused = jax.default_backend() == "tpu"
        from .ops.pallas_kernels import fused_channelize_geometry_ok

        self._g2 = (
            make_fused_fir_matrix(self.offsets, samp_rate, self.taps, decim)
            if (fused and fused_channelize_geometry_ok(
                decim, len(self.taps), self._fused_tile)) else None
        )

        def _decode_planes(cp):
            """Channel planes ``[C, 2, Lc]`` -> {sf: PooledResult}; the
            per-SF detection metrics share one multi-lag pass over the
            planes (rx.frontend.multi_sf_detection_metrics)."""
            from .rx.frontend import multi_sf_detection_metrics

            if self.plane_dtype is not None:
                cp = cp.astype(self.plane_dtype)
            # materialize the channel planes ONCE: the factored mixer +
            # polyphase FIR is pure fusible math, and without a barrier
            # XLA duplicates it into every consumer — each pooled Phase
            # B window gather would re-derive its samples through the
            # whole mix+FIR chain (measured 20x on the EU868 gateway:
            # 486 -> 25 ms class). A no-op after the Pallas fused
            # channelizer, which materializes its output by nature.
            cp = jax.lax.optimization_barrier(cp)
            metrics = (
                multi_sf_detection_metrics(
                    cp, {sf: rx.sps for sf, rx in self.rxs.items()}
                )
                if not any(rx.low_snr for rx in self.rxs.values())
                else {sf: None for sf in self.sfs}
            )
            return {
                sf: rx.process_pooled_planes(cp, self.pool,
                                             metrics=metrics[sf])
                for sf, rx in self.rxs.items()
            }

        def process(xf, outer, inner):
            """packed wideband ``[2, L]`` + factored mixer planes
            (``[C, 2, nI]``, ``[C, 2, tile]``) -> {sf: PooledResult}.
            (Packed because complex64 can't cross the host<->device
            boundary on some TPU runtimes — see lora_tpu.ops.xfer.)"""
            cp = channelize_list_planes_factored(
                xf, self.taps, outer, inner, self.decim)
            return _decode_planes(cp)

        def process_fused(xf, g2, o_re, o_im, i_re, i_im):
            """packed wideband ``[2, L]`` + the fused-kernel tables
            (make_fused_fir_matrix / make_output_ramp_factors)."""
            from .ops.pallas_kernels import fused_channelize_pallas

            cp = fused_channelize_pallas(
                xf, g2, (o_re, o_im, i_re, i_im), self.decim,
                len(self.taps), tile=self._fused_tile,
                interpret=self._fused_interpret)
            return _decode_planes(cp)

        self.process_fn = process
        self._process = jax.jit(process)
        self._process_fused = jax.jit(process_fused)
        # length -> factored mixer (outer [C,2,nI], inner [C,2,tile]):
        # O(C * (L/tile + tile)) host floats vs the O(C * L) full table
        # this replaces — streaming/long captures are now memory-bounded
        self._mixer_cache = {}

    # ------------------------------------------------------------------
    @property
    def max_pkt_samples(self) -> int:
        return max(rx.pkt_samples for rx in self.rxs.values())

    def process(self, x):
        """``x``: host complex wideband IQ ``[L]`` (or packed float32
        ``[2, L]`` / device array) -> ``{sf: PooledResult}``. Host
        complex input is padded by the largest SF's packet region (at
        the wideband rate) so tail packets keep a full decode region."""
        import jax

        from .channelizer import make_mixer_factors, make_output_ramp_factors
        from .ops.xfer import pack_iq

        if not isinstance(x, jax.Array):
            x = np.asarray(x)
            if np.iscomplexobj(x):
                x = np.pad(x.astype(np.complex64),
                           (0, self.max_pkt_samples * self.decim))
                x = pack_iq(x)
        L = x.shape[-1]
        n_out = (L - len(self.taps)) // self.decim + 1
        if self._g2 is not None and n_out >= 1:
            key = ("fused", L)
            if key not in self._mixer_cache:
                if len(self._mixer_cache) >= 2:
                    self._mixer_cache.pop(next(iter(self._mixer_cache)))
                self._mixer_cache[key] = make_output_ramp_factors(
                    self.offsets, self.samp_rate, self.decim,
                    -(-n_out // self._fused_tile), self._fused_tile)
            ramp = self._mixer_cache[key]
            return self._process_fused(x, self._g2, *ramp)
        if L not in self._mixer_cache:
            # f64-accurate factored host mixers, keyed by block length so
            # repeated block lengths reuse tables + compile; capped at two
            # entries (steady block + final partial)
            if len(self._mixer_cache) >= 2:
                self._mixer_cache.pop(next(iter(self._mixer_cache)))
            self._mixer_cache[L] = make_mixer_factors(
                self.offsets, self.samp_rate, L)
        outer, inner = self._mixer_cache[L]
        return self._process(x, outer, inner)

    def run(self, x) -> List[Frame]:
        """Decode; frames carry the plan channel index, its absolute
        frequency and the SF they decoded at."""
        import jax

        from .wideband import _frames_from_pooled

        results = jax.device_get(self.process(x))
        frames: List[Frame] = []
        idx = np.arange(len(self.channels))
        for sf in self.sfs:
            fs = _frames_from_pooled(
                results[sf], idx, self.rxs[sf].cfg,
                np.zeros(len(self.channels)))
            for f in fs:
                f.tap_header.frequency = int(self.channels[f.channel])
            frames.extend(fs)
        frames.sort(key=lambda f: (f.channel, f.sample_index))
        return frames
