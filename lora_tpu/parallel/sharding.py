"""Mesh sharding for the dense receiver.

Two orthogonal axes of scale (SURVEY.md §2.5, §7 step 5):

- **Channel sharding** (:func:`channel_sharded_process`): the ``[C, L]``
  channel batch is sharded over the mesh; the whole receive pipeline is
  batched per channel so XLA partitions it with zero collectives — LoRa
  channels are embarrassingly parallel. This is the "data parallel" axis.

- **Time sharding** (:func:`time_sharded_process`): one long stream is
  split into per-device blocks; each device pulls a halo of
  ``halo_samples`` from its right neighbour via ``shard_map`` +
  ``ppermute`` over ICI (overlap-save), decodes its block+halo densely,
  and claims only the packets that *start* inside its own block — the
  moral of ring/blockwise sequence parallelism for an unbounded IQ stream.
  The halo must cover one maximal packet (preamble + header + payload),
  i.e. ``DenseReceiver.pkt_samples``.

Both run on a virtual CPU mesh for tests
(``--xla_force_host_platform_device_count``) and unchanged on real
TPU slices (ICI collectives).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..rx.dense import DenseReceiver, DenseResult


def make_mesh(n_devices: Optional[int] = None, axis: str = "dev",
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D device mesh over the first ``n_devices`` available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), (axis,), devices=np.asarray(devices))


def channel_sharded_process(receiver: DenseReceiver, mesh: Mesh,
                            axis: str = "dev"):
    """Compile the dense pipeline with channels sharded over ``mesh``.

    Returns ``fn(xf)`` for packed IQ ``xf: [C, 2, L]`` (see
    ``lora_tpu.ops.xfer.pack_iq``) with ``C`` divisible by the mesh size;
    the result arrays inherit the channel sharding.
    """
    in_shard = NamedSharding(mesh, P(axis, None, None))

    @functools.partial(jax.jit, in_shardings=(in_shard,))
    def fn(xf):
        return receiver.process_fn(xf)

    return fn


def time_sharded_process(receiver: DenseReceiver, mesh: Mesh,
                         axis: str = "dev", halo_samples: Optional[int] = None):
    """Compile an overlap-save time-sharded pipeline over ``mesh``.

    Returns ``fn(xf)`` for one packed stream ``xf: [2, L]`` with ``L``
    divisible by the mesh size; each device decodes its block plus a right
    halo and keeps only packets starting inside the block. Result leading
    axis is the device/block index; ``start`` values are block-relative.
    """
    n_dev = mesh.shape[axis]
    if halo_samples is None:
        halo_samples = receiver.pkt_samples
    halo = int(halo_samples)

    shard_map = jax.shard_map

    def local_fn(xb):
        # xb: local packed block [2, L/n_dev]
        head = jax.lax.dynamic_slice_in_dim(xb, 0, min(halo, xb.shape[-1]), axis=-1)
        # right neighbour's head arrives as our halo (circular ring; the
        # wrap pair is harmless: the last block's halo is the stream head)
        perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        from_right = jax.lax.ppermute(head, axis, perm)
        ext = jnp.concatenate([xb, from_right], axis=-1)
        res = receiver.process_fn(ext)
        # claim only packets starting inside the local block
        own = res.start < xb.shape[-1]
        return DenseResult(
            valid=(res.valid & own)[None],
            payload=res.payload[None],
            length=res.length[None],
            hdr=res.hdr[None],
            snr=res.snr[None],
            start=res.start[None],
            cfo=res.cfo[None],
            n_dropped=res.n_dropped[None],
        )

    sm = shard_map(
        local_fn, mesh=mesh,
        in_specs=P(None, axis),
        out_specs=DenseResult(
            valid=P(axis), payload=P(axis), length=P(axis),
            hdr=P(axis), snr=P(axis), start=P(axis), cfo=P(axis),
            n_dropped=P(axis),
        ),
        # the dense pipeline's internal scans mix device-varying data with
        # unvarying constants; skip the varying-manual-axes check
        check_vma=False,
    )
    return jax.jit(sm)


def wideband_time_sharded_process(wideband, mesh: Mesh, axis: str = "dev",
                                  halo_channel_samples: Optional[int] = None):
    """Time-shard a *wideband* capture: each device channelizes and decodes
    its own block, with a right-halo exchanged over ICI.

    ``wideband``: a :class:`lora_tpu.wideband.WidebandReceiver`. Input is
    one packed wideband stream ``xf: [2, L]`` (``L`` divisible by
    ``n_dev * M``). Each device runs the polyphase filterbank on its local
    block + halo — channelization is local (the PFB is a sliding FIR, so
    overlap-save applies at the wideband rate) and the only communication
    is the halo ``ppermute``. Result leading axis = device/block; per
    result ``start`` is channel-rate samples relative to the local block.
    """
    n_dev = mesh.shape[axis]
    M = wideband.M
    rx = wideband.rx
    if halo_channel_samples is None:
        halo_channel_samples = rx.pkt_samples
    # wideband halo: packet region at channel rate, scaled to the wideband
    # rate, plus the PFB's filter tail (K polyphase frames)
    halo = (int(halo_channel_samples) + wideband.pfb.K + 1) * M

    def local_fn(xb):
        head = jax.lax.dynamic_slice_in_dim(xb, 0, min(halo, xb.shape[-1]), axis=-1)
        perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        from_right = jax.lax.ppermute(head, axis, perm)
        ext = jnp.concatenate([xb, from_right], axis=-1)
        # single-pass Pallas FIR + DFT-matmul planes path (round 4)
        cp = wideband.pfb.planes(ext, out_dtype=wideband.plane_dtype)
        res = rx.process_planes(cp)
        own = res.start < (xb.shape[-1] // M)
        return DenseResult(
            valid=(res.valid & own)[None],
            payload=res.payload[None],
            length=res.length[None],
            hdr=res.hdr[None],
            snr=res.snr[None],
            start=res.start[None],
            cfo=res.cfo[None],
            n_dropped=res.n_dropped[None],
        )

    sm = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=P(None, axis),
        out_specs=DenseResult(
            valid=P(axis), payload=P(axis), length=P(axis),
            hdr=P(axis), snr=P(axis), start=P(axis), cfo=P(axis),
            n_dropped=P(axis),
        ),
        check_vma=False,
    )
    return jax.jit(sm)


def wideband_subband_sharded_process(wideband, mesh: Mesh, axis: str = "dev"):
    """Channel-COUNT scale-out: two-stage channelization across the mesh
    (the BASELINE config-#5 architecture — thousands-to-tens-of-thousands
    of concurrent channels).

    Stage 1 (time-parallel): each device holds a time shard of the
    full-band capture (rate ``n_dev * M_fine * chan_rate``), pulls a
    right halo over ICI (``ppermute``) to cover the coarse FIR tail, and
    computes a critically-sampled ``n_dev``-band coarse PFB — yielding
    every subband's samples for ITS time slice.

    Redistribution: one ``all_to_all`` flips the sharding from
    time-sharded/band-replicated to band-sharded/time-complete — device
    ``d`` ends up holding subband ``d``'s packed planes for the whole
    capture. Subband streams concatenate seamlessly across time shards:
    the coarse PFB has no mixer state (FFT-bin convention) and the
    shard length is a multiple of ``n_dev`` frames, so the polyphase
    grid aligns.

    Stage 2 (band-parallel): each device fine-channelizes its subband
    with ``wideband``'s M-channel PFB and pool-decodes — per-device
    work is independent of the total channel count
    ``n_dev * wideband.M``.

    Input: packed wideband ``xf [2, L]``, ``L`` divisible by
    ``n_dev^2 * M_fine`` (time shards must hold whole coarse frames).
    Returns ``PooledResult`` with leading axis = subband/device index;
    ``channel`` indexes fine channels within the subband. Global fine
    channel = ``band * M_fine + channel`` in the nested FFT-bin
    convention (see :func:`subband_channel_freq`).
    """
    from ..channelizer import PolyphaseChannelizer, firdes_low_pass
    from ..rx.dense import PooledResult

    n_dev = mesh.shape[axis]
    if wideband.pool is None:
        raise ValueError("subband sharding uses the pooled decode path; "
                         "construct WidebandReceiver(pool=...)")
    # coarse prototype: pass the whole subband, stop by the neighbour's
    # center (transition = spacing/5 keeps K = ceil(ntaps/n_dev) <= 16,
    # the Pallas FIR halo budget)
    wide_rate = wideband.wide_rate * n_dev
    spacing = wide_rate / n_dev
    coarse = PolyphaseChannelizer(
        n_dev,
        firdes_low_pass(1.0, wide_rate, 0.42 * spacing, spacing / 5.0),
    )
    halo = (coarse.K + 1) * n_dev

    def local_fn(xb):
        # xb: local time shard [2, Ls]
        Ls = xb.shape[-1]
        head = jax.lax.dynamic_slice_in_dim(xb, 0, min(halo, Ls), axis=-1)
        perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        from_right = jax.lax.ppermute(head, axis, perm)
        ext = jnp.concatenate([xb, from_right], axis=-1)
        bands = coarse.planes(ext)          # [n_dev, 2, >= Ls/n_dev]
        bands = bands[..., : Ls // n_dev]   # whole-frame grid alignment
        # time-sharded bands -> band-sharded time: device d receives its
        # band's chunk from every time shard, concatenated in time order
        mine = jax.lax.all_to_all(
            bands, axis, split_axis=0, concat_axis=2, tiled=True
        )  # [1, 2, Ls] — subband `device_index` for the whole capture
        res = wideband.rx.process_pooled_planes(
            wideband.pfb.planes(mine[0], out_dtype=wideband.plane_dtype),
            wideband.pool,
        )
        return PooledResult(*(v[None] for v in res))

    sm = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=P(None, axis),
        out_specs=PooledResult(
            valid=P(axis), channel=P(axis), payload=P(axis),
            length=P(axis), hdr=P(axis), snr=P(axis), start=P(axis),
            cfo=P(axis), n_dropped=P(axis),
        ),
        check_vma=False,
    )
    return jax.jit(sm)


def subband_channel_freq(wide_rate: float, n_bands: int, m_fine: int,
                         band: int, chan: int) -> float:
    """Center frequency (Hz rel. capture center) of fine channel
    ``chan`` in subband ``band`` of the two-stage channelizer."""
    f_band = band * wide_rate / n_bands
    if f_band >= wide_rate / 2:
        f_band -= wide_rate
    band_rate = wide_rate / n_bands
    f_chan = chan * band_rate / m_fine
    if f_chan >= band_rate / 2:
        f_chan -= band_rate
    return f_band + f_chan
