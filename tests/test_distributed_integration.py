"""REAL 2-process jax.distributed run (round-3 verdict missing #4).

tests/test_distributed.py covers the env-wiring logic with initialize
monkeypatched; this file is the complement: it actually executes
`jax.distributed.initialize` across two OS processes on a localhost
coordinator and proves a cross-process collective returns the right
answer. This is the CPU stand-in for the multi-host DCN topology SURVEY
§5 names (DP replicas across hosts); the launch path it exercises is the
exact production entry point (parallel.distributed.maybe_init_distributed).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).with_name("dist_worker.py")
REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_psum_over_localhost_coordinator():
    port = _free_port()
    procs = []
    try:
        for pid in (0, 1):
            env = dict(os.environ)
            env.update(
                OS_DIST_COORDINATOR=f"127.0.0.1:{port}",
                OS_DIST_NUM_PROCESSES="2",
                OS_DIST_PROCESS_ID=str(pid),
                # `python tests/dist_worker.py` puts tests/ (not the repo
                # root) on sys.path; the package import needs the root
                PYTHONPATH=str(REPO),
            )
            # the worker pins its own JAX_PLATFORMS/XLA_FLAGS; scrub any
            # test-process leakage that would race the pin
            env.pop("JAX_PLATFORMS", None)
            env.pop("XLA_FLAGS", None)
            procs.append(
                subprocess.Popen(
                    [sys.executable, str(WORKER)],
                    cwd=REPO,
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                )
            )
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=180)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
                pytest.fail(f"distributed worker hung:\n{out[-2000:]}")
            outs.append(out)
            assert p.returncode == 0, out[-2000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for pid, out in enumerate(outs):
        line = next((l for l in out.splitlines() if l.startswith("DIST_OK")), "")
        assert line, f"worker {pid} produced no DIST_OK line:\n{out[-2000:]}"
        assert f"pid={pid}" in line
        # allgather sums process contributions 1 + 2; the shard_map psum
        # weights each by its 2 local devices: 2*1 + 2*2
        assert "allgather=3.0" in line, line
        assert "psum=6.0" in line, line
