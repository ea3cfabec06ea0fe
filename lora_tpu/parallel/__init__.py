"""Multi-device scale-out: mesh setup, channel sharding, time sharding.

The reference is strictly single-process/single-channel (SURVEY.md §2.5);
this package adds the distributed layer: channel-parallel decoding over a
device mesh and overlap-save time sharding with halo exchange for streams
longer than one device's block.
"""

from .sharding import (  # noqa: F401
    make_mesh,
    channel_sharded_process,
    time_sharded_process,
    wideband_time_sharded_process,
    wideband_subband_sharded_process,
    subband_channel_freq,
)
