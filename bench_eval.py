#!/usr/bin/env python
"""Evaluation-path throughput on the attached chip.

Measures (a) generation images/sec of the jitted sample step (the 30k-image
test.py sweep bound) and (b) Inception pool3 feature extraction images/sec
(the FID bound). Together they determine how fast the 50k-sweep +
overlapped-eval story runs (BASELINE.md north-star).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from eegan_tpu.config import Config
    from eegan_tpu.data.synthetic import synthetic_batch
    from eegan_tpu.evaluation.fid import FIDExtractor
    from eegan_tpu.models.factory import build_models
    from eegan_tpu.training.state import create_train_state
    from eegan_tpu.training.steps import make_sample_step

    c = Config()
    c.GAN.GF_DIM = 32
    c.GAN.DF_DIM = 32
    c.TRAIN.BATCH_SIZE = 64
    c.RUNTIME.COMPUTE_DTYPE = "bfloat16"
    models = build_models(c, n_words=5450)
    state, frozen = create_train_state(c, models, jax.random.PRNGKey(0))
    sample_step = make_sample_step(c, models)
    b = 64
    batch = synthetic_batch(c, b, n_words=5450)
    args = (state.g_params, state.attr_params, state.g_stats, frozen,
            jnp.asarray(batch["caps"]), jnp.asarray(batch["cap_lens"]),
            jnp.asarray(batch["attrs"]), jnp.asarray(batch["attr_lens"]))

    # Value-fetch sync throughout: on this platform block_until_ready is
    # not an execution barrier (see bench_truth.py / PERF.md §1).
    imgs = sample_step(*args, jax.random.PRNGKey(0))
    float(imgs[-1].sum())
    t0 = time.perf_counter()
    iters = 20
    # chain iterations (fold a scalar of the previous output into the key)
    # so the runtime cannot cancel unconsumed computations
    for i in range(iters):
        key = jax.random.fold_in(jax.random.PRNGKey(i),
                                 imgs[-1][0, 0, 0, 0].astype(jnp.int32))
        imgs = sample_step(*args, key)
    float(imgs[-1].sum())
    gen_rate = iters * b / (time.perf_counter() - t0)
    print(f"generation: {gen_rate:.0f} images/sec (256² pyramid, batch {b})")

    extractor = FIDExtractor(batch_size=b)

    # device-resident path (overlapped eval): no host round-trip
    dev_imgs = imgs[-1]
    feats = extractor.features_jax(dev_imgs)
    float(feats.sum())
    t0 = time.perf_counter()
    for _ in range(iters):  # chained, see above
        x = dev_imgs + 1e-12 * feats[0, 0]
        feats = extractor.features_jax(x)
    float(feats.sum())
    fid_dev_rate = iters * b / (time.perf_counter() - t0)
    print(f"inception pool3 (device-resident): {fid_dev_rate:.0f} images/sec")

    # host-array path (folder-based FID; includes host->device upload,
    # which on this tunneled dev setup is the bottleneck)
    fake = np.asarray(dev_imgs, np.float32)
    _ = extractor.features(fake)
    t0 = time.perf_counter()
    for _ in range(iters):
        feats = extractor.features(fake)
    fid_rate = iters * b / (time.perf_counter() - t0)
    print(f"inception pool3 (host arrays):     {fid_rate:.0f} images/sec")
    fid_rate = max(fid_rate, fid_dev_rate)

    sweep_30k_s = 30000 / gen_rate + 30000 / fid_rate
    print(f"-> one 30k-image FID sweep: ~{sweep_30k_s:.0f}s "
          f"(generation + features, excluding IO)")
    print(json.dumps({"metric": "eval_generation_images_per_sec",
                      "value": round(gen_rate, 1), "unit": "images/sec",
                      "vs_baseline": 1.0}))


if __name__ == "__main__":
    main()
