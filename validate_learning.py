#!/usr/bin/env python
"""End-to-end learning probe: does the adversarial loop actually learn?

Synthetic task with a known answer: K classes, each a distinct solid RGB
color; the caption is the color word, the attribute repeats it. A correct
implementation of the hinge + class-BCE + MAGP training dynamics must drive
the generator to emit the right color for each caption within a few
thousand steps (the generator only has to learn a constant per condition).

Pass criterion: after training, for >= 80% of classes the mean RGB of the
generated image is nearest to its own class color.

Findings so far (one v5e chip):
* bf16 + near-noiseless solid colors diverges after ~2k steps — the patch
  discriminator saturates on the trivially separable manifold and the
  ||grad||^6 MAGP then amplifies the blow-up. Degenerate-data artefact, not
  an implementation bug: with brightness jitter + sigma=0.1 noise and f32
  the same recipe is stable for 15k+ steps.
* Conditioning emerges slowly: by 15k steps the outputs land on palette
  colors and form class-distinct groups, but not the full 8-way mapping.
  With RANDOM frozen text encoders the per-color sentence embeddings are
  weakly separated, so the only clean conditioning signal is the class-BCE
  head — consistent with the reference recipe needing real DAMSM encoders
  and hundreds of epochs. Treat this script as a stability/diagnostic
  harness (run with lower assert thresholds for CI-style checks).

Runs on whatever device is attached (a few minutes on a TPU chip).
"""

from __future__ import annotations

import json

import numpy as np

PALETTE = np.array([
    [0.9, -0.8, -0.8],   # red
    [-0.8, 0.9, -0.8],   # green
    [-0.8, -0.8, 0.9],   # blue
    [0.9, 0.9, -0.8],    # yellow
    [0.9, -0.8, 0.9],    # magenta
    [-0.8, 0.9, 0.9],    # cyan
    [0.9, 0.9, 0.9],     # white
    [-0.9, -0.9, -0.9],  # black
], np.float32)


class ColorDataset:
    """caption = color word; image = solid class color (+ tiny noise)."""

    def __init__(self, config, size=512):
        self.config = config
        self.size = size
        self.k = len(PALETTE)
        self.n_words = self.k + 2
        self.ixtoword = {0: "<end>", **{i + 1: f"color{i}"
                                        for i in range(self.k)},
                         self.k + 1: "pad"}
        self.wordtoix = {v: k for k, v in self.ixtoword.items()}

    def __len__(self):
        return self.size

    def sample(self, index, rng, augment=True):
        c = self.config
        t = c.TEXT
        cls = index % self.k
        out = {}
        # brightness jitter + noise keep the real manifold from being
        # trivially separable (a saturated D gives the generator no signal)
        scale = 1.0 - 0.25 * rng.random()
        for s in c.imsizes:
            img = (PALETTE[cls] * scale)[None, None, :] + rng.normal(
                0, 0.1, (s, s, 3))
            out[f"img{s}"] = np.clip(img, -1, 1).astype(np.float32)
        caps = np.zeros(t.WORDS_NUM, np.int32)
        caps[0] = cls + 1
        out["caps"] = caps
        out["cap_lens"] = np.int32(1)
        attrs = np.zeros((t.MAX_ATTR_NUM, t.MAX_ATTR_LEN), np.int32)
        attrs[:, 0] = cls + 1
        out["attrs"] = attrs
        out["attr_lens"] = np.ones(t.MAX_ATTR_NUM, np.int32)
        wrong = (cls + int(rng.integers(1, self.k))) % self.k
        u = np.zeros(t.WORDS_NUM, np.int32)
        u[0] = wrong + 1
        out["unpair_caps"] = u
        out["unpair_cap_lens"] = np.int32(1)
        out["class_ids"] = np.int32(cls + 1)
        return out


def main(steps: int = 6000, batch: int = 32):
    import jax
    import jax.numpy as jnp

    from eegan_tpu.config import Config
    from eegan_tpu.data.pipeline import DataPipeline, device_prefetch
    from eegan_tpu.models.factory import build_models
    from eegan_tpu.parallel.mesh import make_mesh
    from eegan_tpu.training.state import create_train_state
    from eegan_tpu.training.steps import make_sample_step, make_train_step

    c = Config()
    c.GAN.GF_DIM = 16
    c.GAN.DF_DIM = 16
    c.TRAIN.BATCH_SIZE = batch
    c.TRAIN.CLASS_NUM = len(PALETTE)
    c.TRAIN.SIM_COE = 0.0  # encoders are random; drop the DAMSM terms
    c.TRAIN.CLASS_COE = 2.0
    c.RUNTIME.COMPUTE_DTYPE = "float32"

    mesh = make_mesh("data:-1")
    ds = ColorDataset(c)
    models = build_models(c, n_words=ds.n_words)
    state, frozen = create_train_state(c, models, jax.random.PRNGKey(0))
    step = make_train_step(c, models, mesh=mesh, donate=True)
    sample = make_sample_step(c, models)
    pipe = DataPipeline(ds, batch, seed=0, num_workers=0)

    # The dev tunnel gives ~50MB/s host->device, so per-step batch upload
    # would dominate. The probe's data distribution cycles, so pre-upload a
    # fixed pool of batches once and train from device-resident data.
    from eegan_tpu.parallel.mesh import shard_batch

    pool = []
    for i, b in enumerate(pipe.epoch(1)):
        pool.append(shard_batch(b, mesh))
        if len(pool) == 12:
            break

    rng = jax.random.PRNGKey(1)
    for done in range(1, steps + 1):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, frozen, pool[done % len(pool)], sub)
        if done % 500 == 0:
            print(f"step {done}: errG={float(metrics['errG/total']):.3f} "
                  f"D256 real={float(metrics['errD_2/real_sent']):.3f} "
                  f"fake={float(metrics['errD_2/fake_sent']):.3f}")

    # probe: one caption per class
    k = len(PALETTE)
    t = c.TEXT
    caps = np.zeros((k, t.WORDS_NUM), np.int32)
    caps[:, 0] = np.arange(1, k + 1)
    attrs = np.zeros((k, t.MAX_ATTR_NUM, t.MAX_ATTR_LEN), np.int32)
    attrs[:, :, 0] = np.arange(1, k + 1)[:, None]
    imgs = sample(state.g_params, state.attr_params, state.g_stats, frozen,
                  jnp.asarray(caps), jnp.ones(k, jnp.int32),
                  jnp.asarray(attrs), jnp.ones((k, t.MAX_ATTR_NUM), jnp.int32),
                  jax.random.PRNGKey(7))
    mean_rgb = np.asarray(imgs[-1]).mean(axis=(1, 2))  # (K, 3)
    dists = np.linalg.norm(mean_rgb[:, None] - PALETTE[None], axis=-1)
    nearest = np.argmin(dists, axis=1)
    correct = int((nearest == np.arange(k)).sum())
    for i in range(k):
        print(f"class {i}: mean rgb {np.round(mean_rgb[i], 2)} -> "
              f"nearest {nearest[i]} ({'OK' if nearest[i] == i else 'X'})")
    print(json.dumps({"metric": "color_conditioning_accuracy",
                      "value": correct / k, "unit": "fraction",
                      "vs_baseline": correct / k}))
    assert correct >= int(0.8 * k), f"only {correct}/{k} classes learned"
    print("LEARNING PROBE PASSED")


if __name__ == "__main__":
    import sys

    main(steps=int(sys.argv[1]) if len(sys.argv) > 1 else 6000)
