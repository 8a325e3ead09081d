"""Device mesh construction and sharding rules.

The reference's entire parallelism story is single-process ``nn.DataParallel``
plus a 661-LoC thread-rendezvous sync-batchnorm (reference
`sync_batchnorm/batchnorm.py:48-125`, `train.py:219-228`). On TPU the whole
subsystem collapses into GSPMD: we build a `jax.sharding.Mesh` with a ``data``
axis, shard the batch over it, replicate parameters, and let XLA insert the
ICI collectives. Batch-norm statistics are computed over the *global* batch
inside jit, so cross-replica synchronisation is automatic — no master/slave
asymmetry, no running-stat drift between replicas.

The mesh spec is a string like ``"data:8"`` / ``"data:-1"`` (-1 = all local
devices) and generalises to multiple axes (``"data:4,fsdp:2"``) so model
sharding can be layered on later without API changes.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"


def has_fsdp_axis(mesh: Optional[Mesh]) -> bool:
    """True when the mesh carries an active (size>1) ``fsdp`` axis.

    Single source of truth for the predicate — `parallel/fsdp.py` and
    `batch_axes` below both use it, so the axis name and the "active"
    condition cannot drift apart."""
    return (mesh is not None and FSDP_AXIS in mesh.axis_names
            and mesh.shape[FSDP_AXIS] > 1)


def batch_axes(mesh: Mesh):
    """Mesh axes the batch dimension is split over.

    With a plain ``data`` mesh this is ``"data"``; when an ``fsdp`` axis is
    present (see `parallel/fsdp.py`) the batch shards over BOTH axes so
    every device keeps doing data-parallel work while parameters shard over
    ``fsdp`` only — the standard GSPMD FSDP layout."""
    if has_fsdp_axis(mesh):
        return (DATA_AXIS, FSDP_AXIS)
    return DATA_AXIS


def parse_mesh_spec(spec: str, n_devices: int) -> Tuple[Tuple[str, ...], Tuple[int, ...]]:
    """Parse ``"data:8,fsdp:2"`` into axis names and sizes.

    A single ``-1`` size absorbs all remaining devices.
    """
    names, sizes = [], []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if ":" in part:
            name, size_s = part.split(":")
            size = int(size_s)
        else:
            name, size = part, -1
        names.append(name.strip())
        sizes.append(size)
    if sizes.count(-1) > 1:
        raise ValueError(f"at most one -1 axis allowed in mesh spec {spec!r}")
    fixed = int(np.prod([s for s in sizes if s != -1])) if sizes else 1
    if -1 in sizes:
        if n_devices % fixed != 0:
            raise ValueError(
                f"mesh spec {spec!r}: {n_devices} devices not divisible by {fixed}"
            )
        sizes[sizes.index(-1)] = n_devices // fixed
    return tuple(names), tuple(sizes)


def make_mesh(spec: str = "data:-1", devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    names, sizes = parse_mesh_spec(spec, len(devices))
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"mesh spec {spec!r} needs {total} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(dev_array, names)


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dimension over the data (+fsdp) axes."""
    return NamedSharding(mesh, P(batch_axes(mesh), *([None] * (ndim - 1))))


def stacked_batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """(K, B, ...) stacks for the multi-step scan driver: steps replicated,
    batch dim sharded."""
    return NamedSharding(mesh,
                         P(None, batch_axes(mesh), *([None] * (ndim - 2))))


def shard_stacked_batch(batch, mesh: Mesh):
    """Place a K-stacked batch pytree (leaves (K, B, ...)) for
    `make_multi_train_step`."""

    def _put(x):
        x = np.asarray(x)
        return jax.device_put(x, stacked_batch_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(_put, batch)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host arrays on the mesh, batch-sharded on dim 0.

    Single-host: a plain sharded device_put. Multi-host (jax.distributed
    initialised): each process holds only its slice of the global batch
    (`DataPipeline` per-host sharding), so assemble the global array from
    process-local shards — the GSPMD train step then sees one logical array
    spanning the DCN-connected mesh."""
    multihost = jax.process_count() > 1

    def _put(x):
        x = np.asarray(x)
        sharding = batch_sharding(mesh, x.ndim)
        if multihost:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_put, batch)
