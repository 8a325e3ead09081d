#!/usr/bin/env python
"""R-precision discrimination gate (VERDICT r3 #5).

The 30k-sweep's SPEED is proven (PERF.md §5a) but until round 4 the
recorded sweeps had only ever scored random weights (r_precision_mean
0.0103 = chance at R=100). This script closes the loop: it runs the
PRODUCTION evaluation chain end to end on a checkpoint that is actually
trained, and shows R-precision discriminating trained from random.

Chain (every stage is the production code path, not a harness shortcut):
  1. write a color corpus to disk in the reference artefact layout
     (8 classes = 8 solid colors; caption = the color word) — the same
     formats `prepare_datas.py` emits (reference `datasets.py:55-189`);
  2. DAMSM-pretrain the text/image encoders (`training/damsm_trainer.py`,
     the in-framework replacement for AttnGAN's pretrain) and save them
     with `CheckpointManager.save_frozen` — exactly what
     `convert_checkpoints.py` emits for real AttnGAN weights;
  3. snapshot epoch 0 (random G), adversarially train 3k steps with the
     shells/train_cub.sh recipe at probe widths (GF=DF=16, fp32 — the
     15/15 campaign recipe, PERF.md §8), snapshotting epochs 1..3;
  4. drive `test.py --compare_sim` as a subprocess over epochs 0..3 —
     the reference's own checkpoint-sweep protocol (`test.py:184-242`,
     R-precision per `test.py:306-357`).

Pass: best trained R-precision >= 0.30, random-init within noise of
chance, and (trained - random) >= 10 sigma. The chance model matters:
with 8 classes the 99 wrong captions are all other-color captions
(`TextOnlyDataset.wrong_captions` excludes the true class, mirroring
reference `get_sent_multi_unpair`, datasets.py:509-529) — they collapse
to only SEVEN distinct sentence embeddings, so a random image code ranks
the true caption first with p = 1/8 = 0.125, NOT the 1/R ~= 0.01 of the
real 200-class CUB sweep (the recorded 30k-sweep random row, 0.0103).
The first on-chip run measured random init at 0.1249 — exactly the
8-class chance line, which is itself evidence the sweep math is right.
Measured discrimination (chip, seed 0, 3k steps, sampling_nums 256):
0.1249 (epoch 0) -> 0.50 -> 0.625 -> 0.7495 (epoch 3) = chance + 30
sigma, monotone per epoch.

Usage: validate_rprecision.py [gan_steps] [--batch 32] [--seed 0]
       [--dir DIR] [--sampling_nums 256] [--no_check]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import re
import subprocess
import sys
import tempfile

import numpy as np

COLORS = ["red", "green", "blue", "yellow", "magenta", "cyan", "white",
          "gray"]
PALETTE = np.array([
    [0.9, -0.8, -0.8], [-0.8, 0.9, -0.8], [-0.8, -0.8, 0.9],
    [0.9, 0.9, -0.8], [0.9, -0.8, 0.9], [-0.8, 0.9, 0.9],
    [0.9, 0.9, 0.9], [-0.2, -0.2, -0.2],
], np.float32)


def build_color_corpus(root: str, train_per_class: int = 48,
                       test_per_class: int = 8, seed: int = 0) -> str:
    """Reference-layout corpus: images/, text/, split pickles, bboxes,
    captions.pickle, attributes/EE-GAN.pickle."""
    from PIL import Image

    from eegan_tpu.data.prep import build_captions_pickle

    rng = np.random.RandomState(seed)
    k = len(COLORS)
    names, classes, bboxes = [], [], {}
    os.makedirs(os.path.join(root, "images", "001.colors"), exist_ok=True)
    os.makedirs(os.path.join(root, "text", "001.colors"), exist_ok=True)
    per_class = train_per_class + test_per_class
    for c in range(k):
        for j in range(per_class):
            key = f"001.colors/{COLORS[c]}_{j}"
            names.append(key)
            classes.append(c + 1)
            # brightness jitter + pixel noise: keeps the real manifold from
            # being trivially separable (a saturated D starves G of signal)
            scale = 1.0 - 0.25 * rng.random()
            img = PALETTE[c] * scale + rng.normal(0, 0.1, (300, 300, 3))
            u8 = ((np.clip(img, -1, 1) + 1) * 127.5).astype(np.uint8)
            Image.fromarray(u8).save(
                os.path.join(root, "images", f"{key}.jpg"))
            with open(os.path.join(root, "text", f"{key}.txt"), "w") as f:
                f.write(f"{COLORS[c]}\n{COLORS[c]}\n")
            bboxes[key] = [10, 10, 280, 280]

    # interleave classes in both splits (class-balanced, like CUB's split)
    order = np.arange(len(names)).reshape(k, per_class)
    train_idx = order[:, :train_per_class].T.ravel()
    test_idx = order[:, train_per_class:].T.ravel()
    for split, idx in [("train", train_idx), ("test", test_idx)]:
        os.makedirs(os.path.join(root, split), exist_ok=True)
        with open(os.path.join(root, split, "filenames.pickle"), "wb") as f:
            pickle.dump([names[i] for i in idx], f, protocol=2)
        with open(os.path.join(root, split, "class_info.pickle"), "wb") as f:
            pickle.dump([classes[i] for i in idx], f, protocol=2)
    with open(os.path.join(root, "bounding_boxes.pickle"), "wb") as f:
        pickle.dump(bboxes, f, protocol=2)

    build_captions_pickle(root, captions_per_image=2)

    with open(os.path.join(root, "captions.pickle"), "rb") as f:
        train_ids, test_ids, _, _ = pickle.load(f)
    attr = lambda caps: [[c[:1]] for c in caps]  # attribute = the color word
    os.makedirs(os.path.join(root, "attributes"), exist_ok=True)
    with open(os.path.join(root, "attributes", "EE-GAN.pickle"), "wb") as f:
        pickle.dump([attr(train_ids), attr(test_ids)], f, protocol=2)
    return root


def main(steps: int = 3000, batch: int = 32, seed: int = 0,
         work_dir: str = "", sampling_nums: int = 256,
         damsm_steps: int = 300, check: bool = True):
    import jax

    from eegan_tpu.config import Config
    from eegan_tpu.data.datasets import TextImageDataset
    from eegan_tpu.data.pipeline import DataPipeline
    from eegan_tpu.models.factory import build_models
    from eegan_tpu.parallel.mesh import make_mesh, shard_batch
    from eegan_tpu.training.checkpoint import CheckpointManager
    from eegan_tpu.training.damsm_trainer import make_damsm_train_step
    from eegan_tpu.training.state import FrozenEncoders, create_train_state
    from eegan_tpu.training.steps import make_train_step

    work_dir = work_dir or tempfile.mkdtemp(prefix="eegan_rprec_")
    corpus = os.path.join(work_dir, "data")
    model_dir = os.path.join(work_dir, "Model")
    if not os.path.isfile(os.path.join(corpus, "captions.pickle")):
        build_color_corpus(corpus, seed=seed)
    print(f"corpus: {corpus}  model_dir: {model_dir}")

    c = Config()
    c.DATA_DIR = corpus
    c.SAVE_DIR = work_dir
    c.GAN.GF_DIM = 16
    c.GAN.DF_DIM = 16
    c.TRAIN.BATCH_SIZE = batch
    c.TRAIN.CLASS_NUM = len(COLORS)
    c.TRAIN.SIM_COE = 0.25          # shells/train_cub.sh recipe
    c.TRAIN.CLASS_COE = 2.0
    c.TRAIN.G_EMA_DECAY = 0.995
    c.TEXT.CAPTIONS_PER_IMAGE = 2
    c.RUNTIME.COMPUTE_DTYPE = "float32"  # the 15/15-campaign recipe

    mesh = make_mesh("data:-1")
    ds = TextImageDataset(c, split="train")
    models = build_models(c, n_words=ds.n_words)
    state, frozen = create_train_state(c, models,
                                       jax.random.PRNGKey(1000 + seed))
    # Device-resident batch pool: the dev tunnel's ~50MB/s host->device
    # link would otherwise dominate a tiny-model probe (PERF.md §8).
    pipe = DataPipeline(ds, batch, seed=seed, num_workers=0)
    pool = []
    for b in pipe.epoch(1):
        pool.append(shard_batch(b, mesh))
        if len(pool) == 12:
            break

    # ---- DAMSM pretrain -> the production frozen-encoder artefact ------
    damsm_step, damsm_init = make_damsm_train_step(c, models, mesh)
    text_vars, image_vars = frozen.text_vars, frozen.image_vars
    opt_states = damsm_init(text_vars, image_vars)
    rng = jax.random.PRNGKey(11 + seed)
    for done in range(1, damsm_steps + 1):
        rng, sub = jax.random.split(rng)
        text_vars, image_vars, opt_states, dm = damsm_step(
            text_vars, image_vars, opt_states, pool[done % len(pool)], sub)
        if done % 100 == 0:
            print(f"damsm step {done}: total={float(dm['damsm/total']):.3f}")
    frozen = FrozenEncoders(text_vars=text_vars, image_vars=image_vars)
    mgr = CheckpointManager(model_dir)
    mgr.save_frozen(frozen)

    # ---- epoch 0 = random G (the chance arm, same sweep code path) -----
    mgr.save_generator(0, state)

    # ---- adversarial training, epoch snapshots at thirds ---------------
    step = make_train_step(c, models, mesh=mesh, donate=True)
    rng = jax.random.PRNGKey(1 + 7919 * seed)
    snap_every = max(steps // 3, 1)
    for done in range(1, steps + 1):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, frozen, pool[done % len(pool)], sub)
        if done % 250 == 0:
            print(f"step {done}: errG={float(metrics['errG/total']):.3f} "
                  f"D256 real={float(metrics['errD_2/real_sent']):.3f} "
                  f"fake={float(metrics['errD_2/fake_sent']):.3f}")
        if done % snap_every == 0:
            mgr.save_generator(done // snap_every, state)
    mgr.close()
    epochs = [0] + list(range(1, steps // snap_every + 1))

    # ---- the production sweep: test.py --compare_sim over all epochs ---
    here = os.path.dirname(os.path.abspath(__file__))
    cmd = [sys.executable, os.path.join(here, "test.py"),
           "--output_dir", "rprec_sweep", "--model_dir", model_dir,
           "--compare_sim", "--batch_size", str(batch),
           "--sampling_nums", str(sampling_nums),
           "--select_epochs", ",".join(str(e) for e in epochs),
           "--set", f"DATA_DIR={corpus}", "--set", f"SAVE_DIR={work_dir}",
           "--set", f"TEXT.DAMSM_NAME={model_dir}",
           "--set", "GAN.GF_DIM=16", "--set", "GAN.DF_DIM=16",
           "--set", f"TRAIN.CLASS_NUM={len(COLORS)}",
           "--set", "TEXT.CAPTIONS_PER_IMAGE=2",
           "--set", "RUNTIME.COMPUTE_DTYPE=float32"]
    print("sweep:", " ".join(cmd))
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=here,
                          timeout=7200)
    sys.stdout.write(proc.stdout[-4000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"test.py sweep failed rc={proc.returncode}")

    scores = {}
    for e in epochs:
        m = re.search(rf"Epoch_{e}_0: .*'r_precision_mean': ([0-9.eE+-]+)",
                      proc.stdout)
        if not m:
            raise SystemExit(f"no R-precision line for epoch {e}")
        scores[e] = float(m.group(1))
    random_r = scores[0]
    trained_best = max(scores[e] for e in epochs if e > 0)
    best_epoch = max((e for e in epochs if e > 0), key=lambda e: scores[e])
    # Chance model (docstring): the wrong-caption pool spans only the
    # other len(COLORS)-1 classes, so random init sits at 1/len(COLORS),
    # not 1/R. Gate on separation in sigma units of that chance line.
    chance = 1.0 / len(COLORS)
    sigma = (chance * (1 - chance) / max(sampling_nums, 1)) ** 0.5
    result = {"metric": "r_precision_discrimination",
              "value": trained_best, "unit": "fraction@R100",
              "vs_baseline": trained_best / max(random_r, 1e-4),
              "random_init": random_r, "per_epoch": scores,
              "best_epoch": best_epoch, "gan_steps": steps,
              "sampling_nums": sampling_nums, "seed": seed,
              "chance": chance, "sigma": sigma,
              "separation_sigma": (trained_best - random_r) / sigma,
              "passed": trained_best >= 0.30
              and random_r <= chance + 5 * sigma
              and (trained_best - random_r) >= 10 * sigma}
    print(json.dumps(result))
    if check:
        assert result["passed"], \
            (f"R-precision failed to discriminate: trained {trained_best:.4f}"
             f" vs random {random_r:.4f}")
        print(f"R-PRECISION GATE PASSED (trained {trained_best:.4f} @ epoch "
              f"{best_epoch} vs random {random_r:.4f})")
    return result


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("steps", nargs="?", type=int, default=3000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dir", default="")
    p.add_argument("--sampling_nums", type=int, default=256)
    p.add_argument("--damsm_steps", type=int, default=300)
    p.add_argument("--no_check", action="store_true")
    a = p.parse_args()
    main(steps=a.steps, batch=a.batch, seed=a.seed, work_dir=a.dir,
         sampling_nums=a.sampling_nums, damsm_steps=a.damsm_steps,
         check=not a.no_check)
