#!/usr/bin/env python
"""Overlapped evaluation: train while the AsyncEvaluator scores a snapshot.

BASELINE.md's third north-star row asks for eval sweeps "overlapped with
training" — a capability the reference lacks entirely (its `test.py` /
FID / IS are separate post-hoc processes over PNG folders,
`/root/reference/test.py:184-242`). `evaluation/async_eval.py` implements
the overlap; this benchmark is the live chip demonstration: the flagship
fused train step keeps dispatching on the main thread while a background
thread generates `EVAL_NUMS` images from a generator snapshot and scores
FID (device-resident pool3 features) + R-precision on the SAME chip.

Measured quantities (all windows end in a value fetch — `block_until_ready`
is not a barrier on this platform, PERF.md §1):

  * train img/s solo            (no eval running)
  * eval wall-clock solo        (no training running)
  * train img/s while overlapped + eval wall-clock while overlapped
  * the contention cost of each (the chip is shared, so the sum of useful
    work should be ~conserved; what the overlap buys is zero *serial* eval
    time in the training schedule)

Env knobs: EEGAN_OVL_BATCH (default 32/chip), EEGAN_OVL_SCAN (8 steps per
dispatch), EEGAN_OVL_EVAL_NUMS (2048 images per eval), EEGAN_OVL_EVAL_BATCH
(64), EEGAN_OVL_ITERS (dispatches per train window, default 2),
EEGAN_OVL_GF (generator/discriminator width, default 32 = flagship; shrink
only for CPU smoke runs).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

BATCH = int(os.environ.get("EEGAN_OVL_BATCH", "32"))
SCAN = int(os.environ.get("EEGAN_OVL_SCAN", "8"))
EVAL_NUMS = int(os.environ.get("EEGAN_OVL_EVAL_NUMS", "2048"))
EVAL_BATCH = int(os.environ.get("EEGAN_OVL_EVAL_BATCH", "64"))
ITERS = int(os.environ.get("EEGAN_OVL_ITERS", "2"))
GF = int(os.environ.get("EEGAN_OVL_GF", "32"))


def main():
    import jax
    import numpy as np

    from bench_pipeline import make_corpus
    from eegan_tpu.config import Config
    from eegan_tpu.data.datasets import TextOnlyDataset
    from eegan_tpu.data.synthetic import synthetic_batch
    from eegan_tpu.evaluation.async_eval import AsyncEvaluator
    from eegan_tpu.evaluation.tester import Tester
    from eegan_tpu.models.factory import build_models
    from eegan_tpu.parallel.mesh import make_mesh, shard_stacked_batch
    from eegan_tpu.training.state import create_train_state
    from eegan_tpu.training.steps import make_multi_train_step

    n_dev = len(jax.devices())
    tmp = tempfile.mkdtemp(prefix="eegan_ovl_")
    make_corpus(tmp, n=64)

    config = Config()
    config.DATA_DIR = tmp
    config.DATASET_NAME = "bird"
    config.TEXT.CAPTIONS_PER_IMAGE = 2
    config.GAN.GF_DIM = GF  # 32 = cfg/bird.yml flagship
    config.GAN.DF_DIM = GF
    config.TRAIN.CLASS_NUM = 200
    config.TRAIN.BATCH_SIZE = BATCH * n_dev
    config.RUNTIME.COMPUTE_DTYPE = "bfloat16"
    config.RUNTIME.PALLAS_DAMSM = jax.default_backend() == "tpu"

    dataset = TextOnlyDataset(config, split="test")
    mesh = make_mesh(f"data:{n_dev}")
    # One model bundle shared by the train step and the eval path; the
    # corpus vocab only sizes the embedding table — every other flagship
    # shape matches bench.py.
    models = build_models(config, n_words=dataset.n_words)
    state, frozen = create_train_state(config, models, jax.random.PRNGKey(0))

    multi = make_multi_train_step(config, models, mesh=mesh, donate=True)
    host = synthetic_batch(config, config.TRAIN.BATCH_SIZE,
                           n_words=dataset.n_words)
    stacked = shard_stacked_batch(
        {k: np.stack([host[k]] * SCAN) for k in host}, mesh)
    rng = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    compiled = multi.lower(state, frozen, stacked, rng).compile()
    print(f"compile(scan{SCAN}): {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    def fetch(metrics) -> None:
        v = float(np.asarray(metrics["errG/total"])[-1])
        assert np.isfinite(v), f"non-finite errG/total: {v}"

    # Warm + drain the train program.
    state, metrics = compiled(state, frozen, stacked, rng)
    fetch(metrics)

    # Eval stack: Tester + AsyncEvaluator with FID (synthetic real stats —
    # the *cost* of the eval is what is being measured) and R-precision.
    stats_path = os.path.join(tmp, "real_stats.npz")
    np.savez(stats_path, mu=np.zeros(2048, np.float32),
             sigma=np.eye(2048, dtype=np.float32))
    tester = Tester(config, models, frozen, dataset,
                    batch_size=EVAL_BATCH * n_dev, mesh=mesh)
    evaluator = AsyncEvaluator(tester, real_stats=stats_path,
                               eval_nums=EVAL_NUMS,
                               compute_r_precision=True)

    def snapshot():
        return (state.g_ema if state.g_ema is not None else state.g_params,
                state.attr_ema if state.attr_ema is not None
                else state.attr_params, state.g_stats)

    # Warm the whole eval path (sample step + encoders + pool3 extractor +
    # caption cache) with a one-batch evaluation on the worker thread.
    # snapshot() must be taken fresh before every submit: the donating
    # train step consumes the previous state's buffers, and submit()'s
    # device copy can only copy buffers that are still alive.
    t0 = time.perf_counter()
    evaluator.eval_nums = EVAL_BATCH * n_dev  # one batch
    evaluator.submit(0, *snapshot())
    while 0 not in evaluator.results:
        time.sleep(0.2)
    evaluator.eval_nums = EVAL_NUMS
    print(f"eval warmup (compiles): {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    imgs_per_dispatch = config.TRAIN.BATCH_SIZE * SCAN

    def train_window(iters: int) -> float:
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = compiled(state, frozen, stacked, rng)
        fetch(m)
        return time.perf_counter() - t0

    # --- solo baselines -------------------------------------------------
    solo_train = min(train_window(ITERS) for _ in range(3))
    train_solo_rate = ITERS * imgs_per_dispatch / solo_train / n_dev
    print(f"train solo: {train_solo_rate:.1f} img/s/chip", file=sys.stderr)

    t0 = time.perf_counter()
    evaluator.submit(1, *snapshot())
    while 1 not in evaluator.results:
        time.sleep(0.2)
    eval_solo = time.perf_counter() - t0
    assert "eval/error" not in evaluator.results[1], evaluator.results[1]
    print(f"eval solo ({EVAL_NUMS} imgs, FID+R-prec): {eval_solo:.1f}s",
          file=sys.stderr)

    # --- overlapped -----------------------------------------------------
    t0 = time.perf_counter()
    evaluator.submit(2, *snapshot())
    windows = 0
    eval_done_at = None
    # Keep training until the eval lands, then finish the current window
    # accounting; resolution is one train window.
    while True:
        train_window(ITERS)
        windows += 1
        if eval_done_at is None and 2 in evaluator.results:
            eval_done_at = time.perf_counter() - t0
            break
    total = time.perf_counter() - t0
    train_ovl_rate = windows * ITERS * imgs_per_dispatch / total / n_dev
    evaluator.close(wait=True)
    assert "eval/error" not in evaluator.results[2], evaluator.results[2]

    eval_imgs_per_sec_solo = EVAL_NUMS / eval_solo
    eval_imgs_per_sec_ovl = EVAL_NUMS / eval_done_at
    out = {
        "metric": "overlap_train_images_per_sec_per_chip",
        "value": round(train_ovl_rate, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(train_ovl_rate / train_solo_rate, 3),
        "train_solo_imgs_per_sec": round(train_solo_rate, 1),
        "eval_solo_wall_s": round(eval_solo, 1),
        "eval_overlapped_wall_s": round(eval_done_at, 1),
        "eval_solo_imgs_per_sec": round(eval_imgs_per_sec_solo, 1),
        "eval_overlapped_imgs_per_sec": round(eval_imgs_per_sec_ovl, 1),
        "eval_nums": EVAL_NUMS,
        "eval_fid_scored": "eval/fid" in evaluator.results[2],
        "eval_r_precision_scored": "eval/r_precision" in evaluator.results[2],
        "batch_per_chip": BATCH,
        "steps_per_dispatch": SCAN,
    }
    print(json.dumps(out))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
