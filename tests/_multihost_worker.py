"""Worker for the 2-process multi-host CPU test (see test_multihost.py).

Each process: 2 virtual CPU devices -> global mesh of 4 across 2 processes;
per-host DataPipeline sharding; global-array assembly; one jitted global
reduction whose value must equal the full-batch mean no host ever saw
locally. Prints MH_OK lines the parent asserts on.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Route through the framework wrapper (not jax.distributed directly) so the
# test exercises eegan_tpu.parallel.distributed.initialize itself, including
# its pre-backend already-initialised guard. Called twice: the second call
# must be a no-op even though the first initialised the cluster.
from eegan_tpu.parallel import distributed  # noqa: E402

distributed.initialize(coordinator=sys.argv[1],
                       num_processes=int(sys.argv[2]),
                       process_id=int(sys.argv[3]))
distributed.initialize(coordinator=sys.argv[1],
                       num_processes=int(sys.argv[2]),
                       process_id=int(sys.argv[3]))

import numpy as np  # noqa: E402

from eegan_tpu.data.pipeline import DataPipeline  # noqa: E402
from eegan_tpu.parallel.mesh import DATA_AXIS, make_mesh, shard_batch  # noqa: E402

assert jax.process_count() == int(sys.argv[2])
assert len(jax.devices()) == 2 * jax.process_count(), jax.devices()


class ToyDataset:
    """Deterministic: sample i is the constant vector i."""

    def __len__(self):
        return 64

    def sample(self, index, rng):
        return {"x": np.full((3,), float(index), np.float32),
                "idx": np.int32(index)}


mesh = make_mesh("data:-1")
pipe = DataPipeline(ToyDataset(), batch_size=8, seed=0, shuffle=True)
local = next(iter(pipe.epoch(1)))
assert local["x"].shape[0] == 4, local["x"].shape  # 8 global / 2 hosts
print(f"MH_LOCAL p{jax.process_index()}: "
      f"{sorted(int(i) for i in local['idx'])}", flush=True)

batch = shard_batch(local, mesh)
assert batch["x"].shape[0] == 8  # global logical shape


@jax.jit
def global_mean(x):
    return x.mean()


gm = float(global_mean(batch["x"]))
print(f"MH_OK p{jax.process_index()} global_mean={gm:.4f}", flush=True)
