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

import hashlib
import os

_done = False


def _host_fingerprint() -> str:
    """Host-feature key for the cache path.

    XLA's CPU AOT loader does not key cached executables by the host's
    ISA features, so a cache populated on one machine can hand another
    machine code it cannot run ("could lead to execution errors such as
    SIGILL", cpu_aot_loader.cc — seen across every CPU-mesh dryrun in
    MULTICHIP_r04.json). Scoping the cache directory by a digest of the
    CPU feature flags makes mismatched hosts miss instead of loading
    poisoned entries; same-host runs lose nothing.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.md5(feats.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return platform.machine() or "unknown"


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
    if "LORA_TPU_CACHE_DIR" not in os.environ:
        cache_dir = os.path.join(cache_dir, _host_fingerprint())
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
