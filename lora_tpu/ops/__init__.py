"""Array-level LoRa PHY operations.

Every op in this package is written array-first (no Python loops over
samples) and is dual-backend: functions take an ``xp`` module argument that
may be ``numpy`` (golden / host path) or ``jax.numpy`` (TPU path), so the
exact same arithmetic runs in both worlds and parity is testable
element-by-element.
"""
