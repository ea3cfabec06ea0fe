"""Multi-host simulation: 2 jax.distributed processes x 4 CPU devices.

The reference is strictly single-process (SURVEY.md §2.5); this gate
covers the layer the TPU framework adds: a global mesh spanning
processes (DCN between hosts), with the time-sharded overlap-save
pipeline decoding every packet exactly once across the pod.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_mesh_decodes_all_packets():
    worker = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert f"proc {pid}: OK" in out, out[-2000:]
