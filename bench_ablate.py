#!/usr/bin/env python
"""Marginal-cost attribution inside the fused train step (VERDICT r2 #1).

`bench_breakdown.py` times each phase as a SEPARATE jitted program; those
numbers don't attribute time inside the fused step (the fused program is
2.4× faster than the sum of isolated phases — PERF.md §4). This script
compiles the fused step with one phase surgically removed (the `ablate`
knob of `build_train_step_fn`) and reports full − ablated = the marginal
wall-clock cost of that phase *in situ*, value-fetch synchronised.

Output: one JSON line per variant with ms/step and delta vs full.

Env: EEGAN_BENCH_BATCH (32), EEGAN_BENCH_ITERS (4), EEGAN_BENCH_WINDOWS (2).
"""

from __future__ import annotations

import json
import os
import sys
import time

BATCH = int(os.environ.get("EEGAN_BENCH_BATCH", "32"))
ITERS = int(os.environ.get("EEGAN_BENCH_ITERS", "4"))
WINDOWS = int(os.environ.get("EEGAN_BENCH_WINDOWS", "2"))

VARIANTS = [
    ("full", frozenset()),
    ("no_text", frozenset({"text"})),
    ("no_damsm", frozenset({"damsm"})),
    ("no_words", frozenset({"words"})),
    ("no_magp", frozenset({"magp"})),
    ("no_dsteps", frozenset({"dsteps", "magp"})),
]


def main():
    import jax
    import numpy as np

    from eegan_tpu.config import Config
    from eegan_tpu.data.synthetic import synthetic_batch
    from eegan_tpu.models.factory import build_models
    from eegan_tpu.parallel.mesh import make_mesh, shard_batch
    from eegan_tpu.training.state import create_train_state
    from eegan_tpu.training.steps import make_train_step

    n_dev = len(jax.devices())
    config = Config()
    config.GAN.GF_DIM = 32
    config.GAN.DF_DIM = 32
    config.TRAIN.CLASS_NUM = 200
    config.TRAIN.BATCH_SIZE = BATCH * n_dev
    config.RUNTIME.COMPUTE_DTYPE = "bfloat16"
    config.RUNTIME.PALLAS_DAMSM = os.environ.get("EEGAN_BENCH_PALLAS",
                                                 "1") == "1"

    mesh = make_mesh(f"data:{n_dev}")
    models = build_models(config, n_words=5450)
    state0, frozen = create_train_state(config, models, jax.random.PRNGKey(0))
    host = synthetic_batch(config, config.TRAIN.BATCH_SIZE, n_words=5450)
    batch = shard_batch(host, mesh)
    rng = jax.random.PRNGKey(1)

    def fetch(metrics, st):
        # errG/total exists in every variant; fall back to the step counter.
        if "errG/total" in metrics:
            return float(np.asarray(metrics["errG/total"]))
        return float(np.asarray(st.step))

    results = {}
    for name, ablate in VARIANTS:
        step = make_train_step(config, models, mesh=mesh, donate=False,
                               ablate=ablate)
        t0 = time.perf_counter()
        compiled = step.lower(state0, frozen, batch, rng).compile()
        print(f"compile({name}): {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, list) else cost
        tflops = float(cost.get("flops", 0.0)) / 1e12 if cost else 0.0

        state, metrics = compiled(state0, frozen, batch, rng)  # warm, drain
        fetch(metrics, state)
        best = None
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            st = state0
            for _ in range(ITERS):
                st, metrics = compiled(st, frozen, batch, rng)
            fetch(metrics, st)
            dt = (time.perf_counter() - t0) / ITERS
            best = dt if best is None else min(best, dt)
        results[name] = (best * 1e3, tflops)
        print(f"{name}: {best * 1e3:.1f} ms/step, {tflops:.3f} TFLOP",
              file=sys.stderr)

    full_ms = results["full"][0]
    for name, (ms, tflops) in results.items():
        print(json.dumps({
            "metric": f"ablate_{name}", "value": round(ms, 1), "unit": "ms/step",
            "vs_baseline": round(full_ms / ms, 3),
            "marginal_ms": round(full_ms - ms, 1),
            "tflops": round(tflops, 3), "batch_per_chip": BATCH,
        }))


if __name__ == "__main__":
    main()
