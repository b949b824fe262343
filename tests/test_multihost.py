"""Two-process multi-host execution test — the mpiexec -np 2 analog of the
reference's MPI test sweep (tests/functional_tests/solvers/CMakeLists.txt:
27-43).  Spawns two real OS processes wired by ``jax.distributed`` over a
localhost coordinator, each owning 2 emulated CPU devices; the global mesh
spans the process boundary, so the package's collectives (all_gather /
psum / ppermute in the distributed matvec and the sharded DDM solve) run
over the inter-process Gloo backend, not shared memory."""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_matvec_and_solve(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    port = _free_port()
    nproc = 2
    procs = []
    outs = []
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    for pid in range(nproc):
        out = tmp_path / f"worker{pid}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, str(pid), str(nproc), str(port), str(out)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                env=env,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    results = [json.loads(open(o).read()) for o in outs]
    for r in results:
        assert r["process_count"] == nproc
        assert r["matvec_N_err"] < 1e-5
        assert r["matvec_T_err"] < 1e-5
        assert r["solve_err"] < 1e-5
    # SPMD determinism: both processes computed identical global results
    assert results[0] == results[1]
