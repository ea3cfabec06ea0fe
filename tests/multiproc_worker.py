"""Worker for the multi-host simulation test (run as a subprocess).

Usage: python multiproc_worker.py <coordinator_port> <process_id> <n_procs>

Each process owns 4 virtual CPU devices; together they form one global
8-device mesh connected by jax.distributed — the CPU stand-in for a
multi-host TPU pod slice (ICI within a process, DCN across). The
time-sharded receive pipeline must decode every packet exactly once
across the global mesh.
"""

import os
import sys

port, pid, n_procs = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=n_procs,
    process_id=pid,
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lora_tpu import LoRaConfig  # noqa: E402
from lora_tpu.ops.xfer import pack_iq  # noqa: E402
from lora_tpu.parallel import make_mesh, time_sharded_process  # noqa: E402
from lora_tpu.rx.dense import DenseReceiver  # noqa: E402
from lora_tpu.tx.modulator import modulate_frame  # noqa: E402

assert jax.device_count() == 4 * n_procs, jax.device_count()
assert jax.local_device_count() == 4

cfg = LoRaConfig(sf=7, cr=4, samp_rate=250e3, crc=True)
sps = cfg.samples_per_symbol
# demod "auto" resolves to fft at this rate (decim 2): the gradient
# method's drift loop cannot disambiguate ±1 sample from ±1 bin below
# decim 4 — see lora_tpu/rx/dense.py module docs
rx = DenseReceiver(cfg, max_candidates=4, max_symbols=24, sfd_search=12)

# deterministic stream, identical in every process: one packet per device
# block (8 blocks of 64 symbols each)
n_dev = 4 * n_procs
block = 64 * sps
payloads = [bytes([0xA0 | d, d, 0xFF ^ d]) for d in range(n_dev)]
stream = np.zeros(n_dev * block, np.complex64)
for d, pl in enumerate(payloads):
    pkt = modulate_frame(cfg, pl, snr_db=40.0, seed=d)
    pos = d * block + (3 + d) * sps
    stream[pos: pos + len(pkt)] = pkt
xf = pack_iq(stream)  # [2, L]

mesh = make_mesh()  # all 8 global devices
fn = time_sharded_process(rx, mesh)

# build the global sharded array from per-process local slices
sharding = NamedSharding(mesh, P(None, "dev"))
gxf = jax.make_array_from_callback(
    xf.shape, sharding, lambda idx: np.ascontiguousarray(xf[idx])
)
res = fn(gxf)

# global checks run as tiny replicated-jit reductions over DCN
total_valid = int(
    jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(
        res.valid.astype(jnp.int32)
    ).addressable_data(0)
)
assert total_valid == n_dev, f"decoded {total_valid} != {n_dev} packets"

# local checks: every addressable shard's decoded payload matches the
# packet planted in that device's block
payload_shards = {(s.index[0].start or 0): np.asarray(s.data)
                  for s in res.payload.addressable_shards}
length_shards = {(s.index[0].start or 0): np.asarray(s.data)
                 for s in res.length.addressable_shards}
for shard in res.valid.addressable_shards:
    b = shard.index[0].start or 0
    valid = np.asarray(shard.data)[0]
    k = np.nonzero(valid)[0]
    assert len(k) == 1, (b, valid)
    k = int(k[0])
    n = int(length_shards[b][0][k])
    got = bytes(payload_shards[b][0][k][:n])
    want = payloads[b]
    # decoded payload carries the 2-byte MAC CRC after the data
    assert got[: len(want)] == want, (b, got.hex(), want.hex())

# --- subband-sharded wideband over the SAME global mesh: the coarse
# PFB's all_to_all redistribution crosses the process boundary (DCN),
# the CPU stand-in for a multi-host band exchange ---
from lora_tpu.parallel import (subband_channel_freq,  # noqa: E402
                               wideband_subband_sharded_process)
from lora_tpu.wideband import WidebandReceiver  # noqa: E402

M_fine = 8
wr = WidebandReceiver(cfg, M_fine, pool=8, max_candidates=2,
                      max_symbols=12, sfd_search=10, demod_method="fft")
wide_rate = n_dev * M_fine * cfg.samp_rate
chan_samples = (wr.rx.pkt_samples // sps + 16) * sps
Lw = n_dev * M_fine * chan_samples
step = n_dev * n_dev * M_fine
Lw = -(-Lw // step) * step
wide_cfg = LoRaConfig(sf=7, cr=4, samp_rate=wide_rate, crc=True,
                      bandwidth=cfg.bandwidth)
sps_w = wide_cfg.samples_per_symbol
xw = np.zeros(Lw, np.complex64)
# one packet on a band owned by each PROCESS (bands 1 and 6 live on
# different processes in the 2x4 layout)
wplacements = [(1, 2, b"\x77"), (6, 3, b"\x99")]
tw = np.arange(Lw)
for band, chan, pl in wplacements:
    f = subband_channel_freq(wide_rate, n_dev, M_fine, band, chan)
    pkt = modulate_frame(wide_cfg, pl, snr_db=None)
    pos = 2 * sps_w * (1 + band)
    xw[pos:pos + len(pkt)] += (
        pkt * np.exp(2j * np.pi * f / wide_rate * tw[pos:pos + len(pkt)])
    ).astype(np.complex64)
xwf = pack_iq(xw)
wfn = wideband_subband_sharded_process(wr, mesh)
gxw = jax.make_array_from_callback(
    xwf.shape, sharding, lambda idx: np.ascontiguousarray(xwf[idx])
)
wres = wfn(gxw)
ok_bands = []
for shard in wres.valid.addressable_shards:
    band = shard.index[0].start or 0
    want = next((pl for b, c, pl in wplacements if b == band), None)
    if want is None:
        continue
    chan_want = next(c for b, c, pl in wplacements if b == band)
    v = np.asarray(shard.data)[0]
    chans = np.asarray(
        next(s.data for s in wres.channel.addressable_shards
             if (s.index[0].start or 0) == band))[0]
    pays = np.asarray(
        next(s.data for s in wres.payload.addressable_shards
             if (s.index[0].start or 0) == band))[0]
    lens = np.asarray(
        next(s.data for s in wres.length.addressable_shards
             if (s.index[0].start or 0) == band))[0]
    hit = False
    for g in np.nonzero(v)[0]:
        if int(chans[g]) == chan_want and \
                bytes(pays[g][: int(lens[g])])[: len(want)] == want:
            hit = True
    assert hit, (band, chan_want, want.hex())
    ok_bands.append(band)

print(f"proc {pid}: OK ({total_valid} packets over {n_dev} devices; "
      f"subband all_to_all bands {ok_bands} decoded)")
jax.distributed.shutdown()
