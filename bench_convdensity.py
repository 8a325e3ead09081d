#!/usr/bin/env python
"""Op-class proof: per-image conv efficiency vs batch density (VERDICT r2 #1).

The ablation bench (bench_ablate.py) shows every phase of the batch-32 fused
step running at 30-48 TFLOP/s while the same program at batch 128 sustains
~65 TFLOP/s — no single pathological op, a uniform small-batch effect. This
script pins that claim at the op-class level: it times the two dominant conv
stacks (the 256² discriminator tower fwd+bwd and the generator fwd+bwd) in
isolation at batch 32/64/128 and reports achieved TFLOP/s per shape, with
XLA's own FLOP counts and value-fetch timing.

If per-image efficiency rises materially with batch while the op mix is
unchanged, the batch-32 gap is MXU under-utilisation from small
spatial×batch tiles — an architecture/batch property, not a scheduling or
fusion defect.
"""

from __future__ import annotations

import json
import sys
import time


def _time_compiled(compiled, args, iters=4, windows=2, fetch=None):
    out = compiled(*args)
    (fetch or (lambda o: float(jax_np_sum(o))))(out)
    best = None
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = compiled(*args)
        (fetch or (lambda o: float(jax_np_sum(o))))(out)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best


def jax_np_sum(out):
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    import numpy as np

    return np.asarray(leaves[0]).ravel()[0]


def main():
    import jax
    import jax.numpy as jnp

    from eegan_tpu.config import Config
    from eegan_tpu.models.factory import build_models
    from eegan_tpu.training.state import create_train_state

    config = Config()
    config.GAN.GF_DIM = 32
    config.GAN.DF_DIM = 32
    config.TRAIN.CLASS_NUM = 200
    config.RUNTIME.COMPUTE_DTYPE = "bfloat16"
    models = build_models(config, n_words=5450)
    state, _ = create_train_state(config, models, jax.random.PRNGKey(0))

    d256 = models.discriminators[-1]
    d256_params = state.d_params[-1]
    gen = models.generator
    g_vars = {"params": state.g_params, "batch_stats": state.g_stats}

    def d_tower_grad(p, img, sent):
        def loss(p):
            feat = d256.apply({"params": p}, img, method="features")
            out = d256.apply({"params": p}, feat, sent, method="head")
            out = out[0] if isinstance(out, tuple) else out
            return out.sum()

        return jax.grad(loss)(p)

    def g_fwd_bwd(p, z, sent):
        def loss(p):
            imgs = gen.apply({"params": p, "batch_stats": g_vars["batch_stats"]},
                             z, sent, sent, train=True,
                             mutable=["batch_stats"])[0]
            return sum(im.astype(jnp.float32).sum() for im in imgs)

        return jax.grad(loss)(p)

    for b in (32, 64, 128):
        key = jax.random.PRNGKey(b)
        img = jax.random.normal(key, (b, 256, 256, 3), jnp.float32)
        sent = jax.random.normal(key, (b, 256), jnp.float32)
        z = jax.random.normal(key, (b, 100), jnp.float32)

        for name, fn, args in (
            ("d256_tower_fwd_bwd", d_tower_grad, (d256_params, img, sent)),
            ("generator_fwd_bwd", g_fwd_bwd, (state.g_params, z, sent)),
        ):
            jitted = jax.jit(fn)
            t0 = time.perf_counter()
            compiled = jitted.lower(*args).compile()
            print(f"compile({name}, b={b}): {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
            cost = compiled.cost_analysis()
            cost = cost[0] if isinstance(cost, list) else cost
            tflop = float(cost.get("flops", 0.0)) / 1e12
            dt = _time_compiled(compiled, args)
            print(json.dumps({
                "metric": f"convdensity_{name}", "batch": b,
                "value": round(tflop / dt, 1), "unit": "TFLOP/s",
                "vs_baseline": 1.0,
                "ms": round(dt * 1e3, 1), "tflop": round(tflop, 3),
                "tflops_per_img": round(tflop / b * 1e3, 2),
            }))


if __name__ == "__main__":
    main()
