"""Multi-host readiness: 2 real processes, one logical mesh (VERDICT r1 #9).

Launches two python processes that `jax.distributed.initialize` against a
local coordinator (2 virtual CPU devices each -> a 4-device global ``data``
mesh), shard one global batch host-wise through `DataPipeline`, assemble it
with `shard_batch` (`make_array_from_process_local_data`), and run a jitted
global reduction. Asserts the hosts drew disjoint index slices of the SAME
shuffled order and both computed the identical full-batch mean — data no
single host ever held locally.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_mesh(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "_multihost_worker.py")

    env = {**os.environ, "PYTHONPATH": root,
           "EEGAN_NO_COMPILE_CACHE": "1"}
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"

    # Disjoint per-host index slices covering one global batch.
    def parse_local(out, pid):
        for line in out.splitlines():
            if line.startswith(f"MH_LOCAL p{pid}:"):
                return eval(line.split(":", 1)[1].strip())
        raise AssertionError(out)

    idx0 = parse_local(outs[0], 0)
    idx1 = parse_local(outs[1], 1)
    assert len(idx0) == len(idx1) == 4
    assert not set(idx0) & set(idx1)

    # Both hosts computed the same global mean = mean of the union of their
    # index values (ToyDataset: sample i == constant i).
    expected = np.mean([float(i) for i in idx0 + idx1])
    means = []
    for pid, out in enumerate(outs):
        for line in out.splitlines():
            if line.startswith(f"MH_OK p{pid}"):
                means.append(float(line.split("=")[1]))
    assert len(means) == 2, outs
    np.testing.assert_allclose(means, expected, rtol=1e-6)
