"""LoRa receivers.

- :mod:`.golden` — sequential numpy receiver mirroring the reference's
  7-state machine cycle-for-cycle; the correctness anchor.
- :mod:`.receiver` — the jitted TPU state-machine receiver (parity mode),
  vmappable over channels.
- :mod:`.dense` — the two-phase dense receiver (throughput mode): batched
  detection metrics over all windows, then per-candidate packet decode.
"""

from ..xla_cache import ensure_compilation_cache

ensure_compilation_cache()

from .golden import GoldenReceiver  # noqa: F401,E402
