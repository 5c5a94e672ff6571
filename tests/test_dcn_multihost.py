"""Multi-host (DCN) integration test: 2 real processes, jax.distributed.

SURVEY §7 M5 / VERDICT r1 #8: spawn two local processes that join via
``jax.distributed.initialize`` (localhost coordinator — the DCN transport),
form one 8-device mesh across both, and run the sharded top-m scorer with
cross-process collectives; each worker asserts the merged result equals the
single-process reference. Opt out with OMNI_DCN_TEST=0 (reference analog:
the env-guarded AzureIngestionIntegrationTests.cs:13-15 skip pattern).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("OMNI_DCN_TEST", "1") == "0",
    reason="disabled via OMNI_DCN_TEST=0",
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_sharded_search():
    port = _free_port()
    worker = Path(__file__).with_name("dcn_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu via jax.config
    env.pop("XLA_FLAGS", None)      # worker sets its own 4-device count
    repo_root = str(Path(__file__).resolve().parent.parent)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [repo_root, env.get("PYTHONPATH", "")] if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"DCN-OK pid={pid}" in out
