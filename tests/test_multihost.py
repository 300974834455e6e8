"""2-process multi-host runtime test (DCN analog on CPU).

Spawns two OS processes that rendezvous via the reference's env protocol
(WORLD_SIZE/RANK/MASTER_ADDR/MASTER_PORT — utils/distributed.py:13-43),
form one global 4-device mesh (2 local CPU devices each, gloo
collectives), and run the REAL t2v train engine for 2 steps with the
global batch assembled from host-local shards. Passing means the engines
no longer silently assume process_count()==1.
"""

import pytest
import os
import re
import socket
import subprocess
import sys

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train(tmp_path):
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    procs = []
    for rank in range(2):
        env = dict(
            env_base,
            # PYTHONPATH without the axon sitecustomize dir: the TPU
            # tunnel registers its PJRT plugin at interpreter start,
            # which would pre-empt the CPU platform selection
            PYTHONPATH=REPO,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            WORLD_SIZE="2", RANK=str(rank),
            MASTER_ADDR="127.0.0.1", MASTER_PORT=str(port),
        )
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             str(tmp_path / f"rank{rank}")],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    checks = [re.search(r"MHCHECK rank=(\d) step=(\d+) pnorm=([\d.]+) "
                        r"enorm=([\d.]+)", out) for out in outs]
    assert all(checks), [o[-2000:] for o in outs]
    steps = {c.group(2) for c in checks}
    pnorms = {c.group(3) for c in checks}
    enorms = {c.group(4) for c in checks}
    assert steps == {"2"}
    # SPMD invariant: both processes hold the same global state
    assert len(pnorms) == 1, f"param state diverged across hosts: {pnorms}"
    assert len(enorms) == 1, f"EMA state diverged across hosts: {enorms}"
