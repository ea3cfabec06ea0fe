"""Persistent XLA compilation cache setup.

The dense/parity engines jit one program per (sf, cr, trace-geometry)
combination; on a remote TPU toolchain a cold compile dominates suite
wall-clock (~2 min/config). Enabling JAX's persistent compilation cache
makes every process after the first reuse the compiled executables, which
is what turns the 24-config accuracy matrix (docs/test-results/*) and the
CLI tools into interactive-speed runs.

Opt out (or redirect) with ``LORA_TPU_CACHE_DIR`` (empty string disables).
Importing this module is idempotent and safe before or after backends
initialise; it only sets config flags.
"""

from __future__ import annotations

import os

_done = False


def ensure_compilation_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    cache_dir = os.environ.get(
        "LORA_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "lora_tpu", "xla"),
    )
    if not cache_dir:
        return
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache even quick compiles: suite runs spawn many processes and
        # the per-trace programs are individually cheap but numerous
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - very old jax or readonly FS
        pass
