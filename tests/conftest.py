"""Test configuration.

Force JAX onto a virtual 8-device CPU mesh so sharding/pjit paths are
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; see __graft_entry__.dryrun_multichip).

Note: the environment's sitecustomize registers the TPU backend and pins
``jax_platforms``; overriding the env var alone is not enough, so we update
the config after import (before any backend is initialised).
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
