#!/usr/bin/env python
"""Timing-methodology truth probe for the attached (tunnelled) TPU.

Round-2 finding: with `block_until_ready`-based timing, the fused train
step "speeds up" linearly with both batch size and steps-per-dispatch while
per-dispatch wall time stays ~5 ms — i.e. the measurement saturates at the
host->device dispatch rate and implies >100x chip peak FLOP/s, which is
impossible. This probe establishes what a synchronisation actually waits
for on this platform:

  1. *Calibration*: a chain of N bf16 matmuls of known FLOPs, timed with
     (a) block_until_ready and (b) a device_get of one output element (the
     value cannot exist before the chain executed). If (a) reports more
     than peak FLOP/s and (b) reports less, block_until_ready is not a real
     barrier here and every bench MUST fetch a value.
  2. *Train-step drain*: enqueue K scanned train-step dispatches, then time
     how long the final metric value takes to materialise. enqueue time +
     drain time is the honest wall clock for the whole chain.

Prints one JSON line with both throughput figures and the implied
conclusion. bench.py's methodology follows whatever this probe proves.
"""

from __future__ import annotations

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    # ---- 1. matmul calibration --------------------------------------
    n = 8192
    chain = 32
    flops_per_mm = 2 * n * n * n  # 1.1 TFLOP at n=8192
    x = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)

    @jax.jit
    def mm_chain(a):
        def body(c, _):
            c = c @ a
            # renormalise so values stay finite over the chain
            c = c / jnp.sqrt(jnp.float32(n)).astype(jnp.bfloat16)
            return c, ()
        c, _ = jax.lax.scan(body, a, None, length=chain)
        return c

    out = jax.block_until_ready(mm_chain(x))  # compile + warm
    reps = 4

    t0 = time.perf_counter()
    for _ in range(reps):
        out = mm_chain(out)
    jax.block_until_ready(out)
    dt_block = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(reps):
        out = mm_chain(out)
    val = float(out[0, 0])  # value fetch: cannot complete before execution
    dt_fetch = time.perf_counter() - t0

    total_flops = reps * chain * flops_per_mm
    tf_block = total_flops / dt_block / 1e12
    tf_fetch = total_flops / dt_fetch / 1e12
    print(f"matmul chain: block_until_ready -> {tf_block:.1f} TFLOP/s, "
          f"value-fetch -> {tf_fetch:.1f} TFLOP/s", file=sys.stderr)

    # ---- 2. train-step drain ----------------------------------------
    from eegan_tpu.config import Config
    from eegan_tpu.data.synthetic import synthetic_batch
    from eegan_tpu.models.factory import build_models
    from eegan_tpu.parallel.mesh import make_mesh, shard_stacked_batch
    from eegan_tpu.training.state import create_train_state
    from eegan_tpu.training.steps import make_multi_train_step

    import numpy as np

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

    state, metrics = multi(state, frozen, stacked, rng)  # compile + warm
    float(np.asarray(metrics["errG/total"])[-1])

    dispatches = 15
    t0 = time.perf_counter()
    for _ in range(dispatches):
        state, metrics = multi(state, frozen, stacked, rng)
    t_enqueue = time.perf_counter() - t0
    jax.block_until_ready(metrics)
    t_block = time.perf_counter() - t0
    _ = float(np.asarray(metrics["errG/total"])[-1])
    t_value = time.perf_counter() - t0

    imgs = dispatches * scan_k * 32
    print(f"train chain: enqueue {t_enqueue * 1e3:.0f} ms, "
          f"+block {t_block * 1e3:.0f} ms, +value {t_value * 1e3:.0f} ms",
          file=sys.stderr)
    print(f"  img/s: block-based {imgs / t_block:.0f}, "
          f"value-based {imgs / t_value:.0f}", file=sys.stderr)

    out = {
        "metric": "timing_truth_probe",
        "value": round(imgs / t_value, 1),
        "unit": "images/sec (value-fetch, honest)",
        "vs_baseline": round(imgs / t_block, 1),
        "device_kind": dev.device_kind,
        "matmul_tflops_block": round(tf_block, 1),
        "matmul_tflops_fetch": round(tf_fetch, 1),
        "block_until_ready_is_real_barrier": bool(
            tf_block < 1.5 * tf_fetch),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
