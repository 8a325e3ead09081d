"""Optional FSDP (ZeRO-3 style) parameter sharding over a second mesh axis.

The reference is single-node ``nn.DataParallel`` — parameters are always
replicated (`/root/reference/train.py:219-228`). At EE-GAN's model sizes
replication is also the right default here, but the mesh layer was designed
multi-axis from round 1 (``parse_mesh_spec("data:4,fsdp:2")``), and for
larger ``GF_DIM`` / ``DF_DIM`` builds the optimizer+EMA state is the first
thing to outgrow a chip's HBM. This module supplies the missing piece: a
sharding *rule* mapping every TrainState leaf to a `NamedSharding` that
splits one dimension over the ``fsdp`` axis.

TPU-native design: there is no hand-written gather/scatter — the rule is
handed to ``jax.jit`` as in/out shardings and GSPMD inserts the
all-gathers (params, forward) and reduce-scatters (grads, backward) on ICI,
exactly the "annotate and let XLA place collectives" recipe. The batch is
sharded over BOTH axes (``data`` × ``fsdp``) so every device still does
data-parallel work; global-batch BN statistics are unchanged because the
step's normalisations already reduce over the full logical batch.

Rule: shard the largest dimension divisible by the axis size; leave small
leaves (< ``min_shard_elems``) and indivisible leaves replicated. Scalars,
BN statistics and step counters therefore stay replicated — only the big
conv/dense kernels and their Adam moments and EMA copies are split.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eegan_tpu.parallel.mesh import FSDP_AXIS, has_fsdp_axis  # noqa: F401 (re-export)

# Leaves smaller than this stay replicated: splitting a small kernel trades
# an all-gather (and, for the per-sample conditioning MLPs, awkward GSPMD
# reshards against the batch-sharded activations) for no real memory win.
# 2^17 elements keeps the flagship's big conv kernels, the generator fc and
# all their Adam/EMA copies sharded while leaving the 256×256 text-MLPs and
# every bias replicated.
MIN_SHARD_ELEMS = 2 ** 17


def fsdp_spec(shape, axis_size: int,
              min_shard_elems: int = MIN_SHARD_ELEMS) -> P:
    """PartitionSpec splitting the largest divisible dim over ``fsdp``."""
    if not shape or int(np.prod(shape)) < min_shard_elems:
        return P()
    order = sorted(range(len(shape)), key=lambda d: -shape[d])
    for d in order:
        if shape[d] % axis_size == 0:
            spec = [None] * len(shape)
            spec[d] = FSDP_AXIS
            return P(*spec)
    return P()


def state_shardings(state: Any, mesh: Mesh,
                    min_shard_elems: int = MIN_SHARD_ELEMS):
    """Pytree of NamedShardings for a TrainState (params, optimizer
    moments, EMA copies — every array leaf gets the same rule, so Adam's
    m/v shard exactly like their parameter)."""
    size = mesh.shape[FSDP_AXIS]

    def rule(leaf):
        shape = np.shape(leaf)
        return NamedSharding(mesh, fsdp_spec(shape, size, min_shard_elems))

    return jax.tree_util.tree_map(rule, state)
