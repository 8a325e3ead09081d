#!/usr/bin/env python
"""Evaluation-path throughput on the attached chip.

Measures (a) generation images/sec of the jitted sample step (the 30k-image
test.py sweep bound) and (b) Inception pool3 feature extraction images/sec
(the FID bound). Together they determine how fast the 50k-sweep +
overlapped-eval story runs (BASELINE.md north-star).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


class SyntheticTextOnly:
    """CUB-test-shaped caption corpus in memory (2933 images × 10 captions,
    200 classes) so the full-sweep wall-clock includes a realistically
    sized caption-embedding cache and wrong-caption index space."""

    def __init__(self, config, n_images=2933, n_classes=200):
        rng = np.random.RandomState(0)
        self.config = config
        self.words_num = config.TEXT.WORDS_NUM
        self.max_attr_num = config.TEXT.MAX_ATTR_NUM
        self.max_attr_len = config.TEXT.MAX_ATTR_LEN
        self.embeddings_num = config.TEXT.CAPTIONS_PER_IMAGE
        self.img_sum = n_images
        self.class_id = rng.randint(1, n_classes + 1, n_images)
        self.captions = [list(rng.randint(1, 5450, rng.randint(5, 25)))
                         for _ in range(n_images * self.embeddings_num)]

    def __len__(self):
        return self.img_sum

    def sample(self, index, rng):
        from eegan_tpu.data.datasets import pad_caption

        sub = int(rng.integers(0, self.embeddings_num))
        caps, cap_len = pad_caption(
            self.captions[index * self.embeddings_num + sub],
            self.words_num, rng)
        attrs = np.zeros((self.max_attr_num, self.max_attr_len), np.int32)
        attrs[:, 0] = caps[0]
        return {"caps": caps, "cap_lens": np.int32(cap_len),
                "attrs": attrs,
                "attr_lens": np.ones(self.max_attr_num, np.int32),
                "class_ids": np.int32(self.class_id[index]),
                "keys": f"img_{index}"}


def bench_full_sweep(c, models, state, frozen, sampling_nums):
    """Wall-clock of ONE full (epoch, repeat) R-precision sweep through the
    production Tester — cache build + generation + encodes + host scoring
    (VERDICT r2 #8). saving_images=False isolates compute from PNG IO."""
    from eegan_tpu.evaluation.tester import Tester
    from eegan_tpu.parallel.mesh import make_mesh

    ds = SyntheticTextOnly(c)
    tester = Tester(c, models, frozen, dataset=ds,
                    batch_size=c.TRAIN.BATCH_SIZE, mesh=make_mesh("data:-1"))
    # warm the compiled programs outside the timed window
    warm = tester.generate(state.g_params, state.attr_params, state.g_stats,
                           "/tmp/_unused", sampling_nums=c.TRAIN.BATCH_SIZE,
                           compute_r_precision=True, saving_images=False)
    t0 = time.perf_counter()
    res = tester.generate(state.g_params, state.attr_params, state.g_stats,
                          "/tmp/_unused", sampling_nums=sampling_nums,
                          compute_r_precision=True, saving_images=False)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "eval_sweep_wall_clock_s", "value": round(dt, 1),
        "unit": "s", "vs_baseline": 1.0,
        "sampling_nums": sampling_nums,
        "images_per_sec": round(sampling_nums / dt, 1),
        "r_precision_mean": res.get("r_precision_mean"),
        "caption_cache_size": int(tester._cap_cache.shape[0]),
    }))


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

    # Full production-Tester sweep wall-clock: --sweep [N] (default 30000).
    if "--sweep" in sys.argv:
        i = sys.argv.index("--sweep")
        n = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 30000
        bench_full_sweep(c, models, state, frozen, n)


if __name__ == "__main__":
    main()
