#!/usr/bin/env python
"""Clean synchronous-step measurement (run on an otherwise idle tunnel).

Methodology: one dispatch -> immediate value fetch, repeated; no queueing,
no overlap, so each sample is (true execution time + one round trip).
Reports per-sample times so inter-sample variance (shared-backend
contention) is visible. Complements bench_truth.py, which established that
block_until_ready is not a barrier on this platform.
"""

from __future__ import annotations

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr)

    # --- single 8192^3 bf16 matmul, fully synchronous ----------------
    n = 8192
    x = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)

    @jax.jit
    def mm(a):
        return (a @ a).sum()  # scalar output: fetch is O(1) bytes

    float(mm(x))  # compile + warm
    mm_times = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(mm(x))
        mm_times.append(time.perf_counter() - t0)
    mm_ms = [round(t * 1e3, 1) for t in mm_times]
    best_tf = 2 * n**3 / min(mm_times) / 1e12
    print(f"matmul sync times (ms): {mm_ms} -> best {best_tf:.1f} TFLOP/s",
          file=sys.stderr)

    # --- fused train step (scan8, flagship config), synchronous ------
    from eegan_tpu.config import Config
    from eegan_tpu.data.synthetic import synthetic_batch
    from eegan_tpu.models.factory import build_models
    from eegan_tpu.parallel.mesh import make_mesh, shard_stacked_batch
    from eegan_tpu.training.state import create_train_state
    from eegan_tpu.training.steps import make_multi_train_step

    scan_k = 8
    config = Config()
    config.GAN.GF_DIM = 32
    config.GAN.DF_DIM = 32
    config.TRAIN.CLASS_NUM = 200
    config.TRAIN.BATCH_SIZE = 32
    config.RUNTIME.COMPUTE_DTYPE = "bfloat16"
    mesh = make_mesh("data:-1")
    models = build_models(config, n_words=5450)
    state, frozen = create_train_state(config, models, jax.random.PRNGKey(0))
    host = synthetic_batch(config, 32, n_words=5450)
    stacked = shard_stacked_batch({k: np.stack([host[k]] * scan_k)
                                   for k in host}, mesh)
    multi = make_multi_train_step(config, models, mesh=mesh, donate=True)
    rng = jax.random.PRNGKey(1)

    state, metrics = multi(state, frozen, stacked, rng)
    float(np.asarray(metrics["errG/total"])[-1])  # warm + drain

    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        state, metrics = multi(state, frozen, stacked, rng)
        float(np.asarray(metrics["errG/total"])[-1])
        samples.append(time.perf_counter() - t0)
    per_disp = [round(t, 2) for t in samples]
    best = min(samples)
    imgs = scan_k * config.TRAIN.BATCH_SIZE
    print(f"train scan8 sync dispatch times (s): {per_disp}", file=sys.stderr)
    print(f"best: {best / scan_k * 1e3:.0f} ms/step -> "
          f"{imgs / best:.0f} img/s", file=sys.stderr)

    print(json.dumps({
        "metric": "sync_truth_probe",
        "value": round(imgs / best, 1),
        "unit": "images/sec (sync best)",
        "vs_baseline": round(best_tf, 1),
        "mm_ms": mm_ms,
        "train_dispatch_s": per_disp,
    }))


if __name__ == "__main__":
    main()
