"""lora_tpu — a TPU-native LoRa PHY receiver framework.

A from-scratch JAX/XLA/Pallas implementation of the complete LoRa receive
chain with the capabilities of the gr-lora GNU Radio module (channelization,
preamble detection, chirp sync, clock-drift correction, demodulation, gray
decoding, deinterleaving, deshuffling, dewhitening, Hamming FEC, LoRaTap/PHY
framing, UDP/file sinks) — re-architected for TPUs: batched array pipelines
instead of streaming blocks, `lax` control flow instead of a threaded
scheduler, and mesh sharding for multi-channel / multi-chip scale.
"""

__version__ = "0.1.0"

from .config import LoRaConfig  # noqa: F401
from .io.frames import Frame, PhyHeader, LoRaTapHeader  # noqa: F401


def __getattr__(name):  # lazy: avoid importing jax at package import
    if name == "StreamingReceiver":
        from .stream import StreamingReceiver

        return StreamingReceiver
    if name == "LoRaReceiver":
        from .receiver import LoRaReceiver

        return LoRaReceiver
    if name == "DenseReceiver":
        from .rx.dense import DenseReceiver

        return DenseReceiver
    if name == "WidebandReceiver":
        from .wideband import WidebandReceiver

        return WidebandReceiver
    if name == "MultiSFWidebandReceiver":
        from .wideband import MultiSFWidebandReceiver

        return MultiSFWidebandReceiver
    if name == "PlanGateway":
        from .plans import PlanGateway

        return PlanGateway
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
