"""`eegan_tpu.parallel.distributed.initialize` must actually work (ADVICE r2).

Round 2's guard called `jax.process_count()`, which initialises the XLA
backend, after which `jax.distributed.initialize` always raises — the wrapper
could never succeed. These tests run the wrapper in a fresh subprocess (the
only way to get a pre-backend jax) and assert:

* the env-var path (`EEGAN_COORDINATOR` et al.) brings up a 1-process
  cluster;
* a second call after the backend exists is a no-op, not a crash.

The 2-process path is covered by test_multihost.py, whose workers also route
through this wrapper now.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


_WORKER = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from eegan_tpu.parallel import distributed

distributed.initialize()          # env-var path
assert jax.process_count() == 1, jax.process_count()
assert jax.process_index() == 0
distributed.initialize()          # backend is now live: must be a no-op
x = jax.numpy.arange(4).sum()
print("DIST_OK", int(x), flush=True)
"""


@pytest.mark.slow
def test_initialize_env_path_and_idempotency():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ,
           "PYTHONPATH": root,
           "EEGAN_NO_COMPILE_CACHE": "1",
           "EEGAN_COORDINATOR": f"127.0.0.1:{_free_port()}",
           "EEGAN_NUM_PROCESSES": "1",
           "EEGAN_PROCESS_ID": "0"}
    out = subprocess.run([sys.executable, "-c", _WORKER], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "DIST_OK 6" in out.stdout, out.stdout + out.stderr
