"""Multi-host (multi-process) initialisation.

The reference is strictly single-process (`CUDA_VISIBLE_DEVICES` only,
SURVEY.md §2.2); this is the beyond-parity leg of the v5e-pod story. One
call per process before any other jax use wires every host into one runtime:
`jax.devices()` then returns the global device list, `make_mesh` lays the
``data`` axis across hosts (ICI within a slice, DCN across), and
`DataPipeline(process_index/count)` + `shard_batch` feed each host's slice
of the global batch.

On Cloud TPU pods `jax.distributed.initialize()` auto-discovers everything
from the metadata server; elsewhere (CPU fleets, tests) pass coordinator
address / process counts explicitly or via env:

    EEGAN_COORDINATOR=host:port  EEGAN_NUM_PROCESSES=N  EEGAN_PROCESS_ID=i
"""

from __future__ import annotations

import os
from typing import Optional


def _already_initialized() -> bool:
    """True iff `jax.distributed.initialize` has already run in this process.

    Deliberately does NOT call `jax.process_count()`: that initialises the
    XLA backend, after which `jax.distributed.initialize` permanently refuses
    to run (it must precede any backend-touching call). The distributed
    client handle is the only pre-backend signal of prior initialisation.
    """
    try:
        from jax._src.distributed import global_state

        return global_state.client is not None
    except Exception:
        return False


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Idempotent `jax.distributed.initialize` with env-var fallbacks."""
    import jax

    coordinator = coordinator or os.environ.get("EEGAN_COORDINATOR")
    if num_processes is None and "EEGAN_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["EEGAN_NUM_PROCESSES"])
    if process_id is None and "EEGAN_PROCESS_ID" in os.environ:
        process_id = int(os.environ["EEGAN_PROCESS_ID"])

    if _already_initialized():
        return
    try:
        if coordinator is None and num_processes is None:
            # TPU-pod auto-discovery path (metadata server).
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(coordinator_address=coordinator,
                                       num_processes=num_processes,
                                       process_id=process_id)
    except RuntimeError as e:
        # A second call (or a call after another component initialised the
        # cluster) raises; treat genuine double-init as a no-op.
        if "already" in str(e).lower():
            return
        raise
