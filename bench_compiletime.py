#!/usr/bin/env python
"""Compile-time bisect for the fused train step (VERDICT r3 #2).

BENCH_r02 measured compile(step)=18.6s; BENCH_r03 measured 115.6s on the
same protocol. This probe times `step.lower(...).compile()` for the
flagship shapes under each round-3 step/model change that can be toggled,
in ONE process (shared backend warmup), and prints one JSON line per
config. Env: EEGAN_CT_CONFIGS (comma list of config names; default all),
EEGAN_CT_BATCH (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main():
    import jax

    from eegan_tpu.config import Config
    from eegan_tpu.data.synthetic import synthetic_batch
    from eegan_tpu.models.factory import build_models
    from eegan_tpu.parallel.mesh import make_mesh, shard_batch
    from eegan_tpu.training.state import create_train_state
    from eegan_tpu.training.steps import make_train_step

    batch_size = int(os.environ.get("EEGAN_CT_BATCH", "32"))
    configs = {
        # round-3 shipped defaults (the BENCH_r03 shape)
        "r3_default": {},
        # round-2 D phase: per-branch passes (DENSE_D was the r3 change)
        "dense_off": {"DENSE_D": False},
        # no Pallas kernel (rules out Mosaic compile time)
        "pallas_off": {"PALLAS_DAMSM": False},
        # both off
        "dense_pallas_off": {"DENSE_D": False, "PALLAS_DAMSM": False},
    }
    names = os.environ.get("EEGAN_CT_CONFIGS")
    if names:
        configs = {k: configs[k] for k in names.split(",")}

    n_dev = len(jax.devices())
    mesh = make_mesh(f"data:{n_dev}")

    for name, overrides in configs.items():
        config = Config()
        config.GAN.GF_DIM = 32
        config.GAN.DF_DIM = 32
        config.TRAIN.USE_CLASS = True
        config.TRAIN.CLASS_NUM = 200
        config.TRAIN.BATCH_SIZE = batch_size * n_dev
        config.RUNTIME.COMPUTE_DTYPE = "bfloat16"
        for k, v in overrides.items():
            setattr(config.RUNTIME, k, v)

        models = build_models(config, n_words=5450)
        state, frozen = create_train_state(config, models,
                                           jax.random.PRNGKey(0))
        step = make_train_step(config, models, mesh=mesh, donate=True)
        batch = shard_batch(
            synthetic_batch(config, config.TRAIN.BATCH_SIZE, n_words=5450),
            mesh)
        rng = jax.random.PRNGKey(1)

        t0 = time.perf_counter()
        lowered = step.lower(state, frozen, batch, rng)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        lowered.compile()
        t_compile = time.perf_counter() - t0
        print(json.dumps({
            "metric": "compile_time_s", "config": name,
            "lower_s": round(t_lower, 1), "compile_s": round(t_compile, 1),
            "batch_per_chip": batch_size,
        }))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
