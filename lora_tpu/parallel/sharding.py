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
        x = jax.lax.complex(ext[0], ext[1])
        chans = wideband.pfb(x)  # [M, (Lb + halo)/M - K + 1]
        cp = jnp.stack([jnp.real(chans), jnp.imag(chans)], axis=-2)
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
