"""Test configuration.

Force JAX onto a virtual 8-device CPU mesh so sharding/pjit paths are
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; see __graft_entry__.dryrun_multichip).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
