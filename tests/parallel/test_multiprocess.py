"""TRUE multi-process multi-host test: 2 JAX processes x 2 CPU devices form one
4-device data mesh via ``jax.distributed.initialize`` (gloo), and drive
host_local_batch_to_global + a real SPMD train step + the gather_to_host
allgather branch across the process boundary — the coverage the single-process
tests can't give (reference equivalent: torchrun 2-node NCCL,
/root/reference/README.md:137-139)."""

import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_mp_worker.py")


import pytest

pytestmark = pytest.mark.slow  # heavy equivalence/integration chain


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train_step_and_gather():
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), coordinator],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=REPO,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-2500:]
        outs.append(out)

    losses = []
    for out in outs:
        m = re.search(r"RESULT \d loss=([-\d.einf]+) gather=ok", out)
        assert m, out[-1500:]
        losses.append(float(m.group(1)))
    # SPMD: both processes computed the same global step
    assert losses[0] == losses[1], losses
