#!/usr/bin/env python
"""End-to-end `train.py`-path throughput on the REAL data pipeline.

VERDICT r2 #3: every chip number so far timed the device program on
preloaded synthetic batches; no one had run the actual Trainer loop —
JPEG decode -> bbox crop -> augment -> 3-scale resize -> host->device
upload -> fused step — on the TPU. This benchmark builds a CUB-shaped JPEG
corpus on disk, runs the production `Trainer` (the same object
`train.py --cfg cfg/bird.yml` drives, real TextImageDataset, device
prefetch, per-epoch image/checkpoint artefacts) and reports steady-state
end-to-end images/sec next to the device-only number.

Timing: the first epoch (compiles + first-save artefacts) is warmup; the
timed window covers EEGAN_E2E_EPOCHS full epochs and ends by fetching
`state.step` — a value that exists only after every dispatched step has
executed (the round-2 value-fetch rule; `block_until_ready` is not a
barrier on this platform, PERF.md §1).

Env knobs:
  EEGAN_E2E_IMAGES  corpus size              (default 1024)
  EEGAN_E2E_EPOCHS  timed epochs             (default 2)
  EEGAN_E2E_BATCH   per-chip batch           (default 32)
  EEGAN_E2E_PRELOAD 1 = decoded-RAM cache + native OpenMP batch assembly,
                    0 = per-step PIL decode  (default 1)
  EEGAN_E2E_UINT8   1 = RUNTIME.UINT8_TRANSFER (uint8 pyramids, 4x smaller
                    host->device transfer, on-device normalise; default 0)
  EEGAN_E2E_WORKERS fork worker processes    (default 0; host has 1 core)
  EEGAN_E2E_SCAN    steps per dispatch       (default 8)
  EEGAN_E2E_DATA    use an existing corpus dir instead of building one
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

N_IMAGES = int(os.environ.get("EEGAN_E2E_IMAGES", "1024"))
EPOCHS = int(os.environ.get("EEGAN_E2E_EPOCHS", "2"))
BATCH = int(os.environ.get("EEGAN_E2E_BATCH", "32"))
PRELOAD = os.environ.get("EEGAN_E2E_PRELOAD", "1") == "1"
UINT8 = os.environ.get("EEGAN_E2E_UINT8", "0") == "1"
WORKERS = int(os.environ.get("EEGAN_E2E_WORKERS", "0"))
SCAN = int(os.environ.get("EEGAN_E2E_SCAN", "8"))


def main():
    import numpy as np

    from bench_pipeline import make_corpus
    from eegan_tpu.config import Config
    from eegan_tpu.training.trainer import Trainer

    root = os.environ.get("EEGAN_E2E_DATA", "")
    tmp = None
    if not root:
        tmp = tempfile.mkdtemp(prefix="eegan_e2e_data_")
        t0 = time.perf_counter()
        make_corpus(tmp, n=N_IMAGES)
        print(f"built {N_IMAGES}-image JPEG corpus in "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
        root = tmp

    c = Config()
    c.DATA_DIR = root
    c.DATASET_NAME = "bird"
    c.TEXT.CAPTIONS_PER_IMAGE = 2
    c.GAN.GF_DIM = 32  # cfg/bird.yml flagship
    c.GAN.DF_DIM = 32
    c.TRAIN.BATCH_SIZE = BATCH
    c.TRAIN.CLASS_NUM = 200
    c.TRAIN.MAX_EPOCH = 10_000
    c.TRAIN.WARMUP_EPOCHS = 10_000  # no checkpoint IO in the timed window
    c.RUNTIME.COMPUTE_DTYPE = "bfloat16"
    c.RUNTIME.STEPS_PER_DISPATCH = SCAN
    c.RUNTIME.DATA_PRELOAD = PRELOAD
    c.RUNTIME.DATA_WORKERS = WORKERS
    c.RUNTIME.UINT8_TRANSFER = UINT8
    c.RUNTIME.ALLOW_RANDOM_ENCODERS = True  # synthetic-corpus smoke bench

    out_dir = tempfile.mkdtemp(prefix="eegan_e2e_out_")
    trainer = Trainer(c, out_dir, data_workers=WORKERS)
    n_iters = len(trainer.pipeline)

    # Warmup epoch: compiles (step + scan program) + the epoch-1 saves.
    t0 = time.perf_counter()
    trainer.train(max_epochs=1)
    int(np.asarray(trainer.state.step))  # drain
    print(f"warmup epoch ({n_iters} iters incl. compiles): "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    trainer.start_epoch = 2
    t0 = time.perf_counter()
    trainer.train(max_epochs=EPOCHS)
    steps_done = int(np.asarray(trainer.state.step))  # value fetch = drain
    dt = time.perf_counter() - t0

    # a timed run of a NaN-computing program is not a benchmark (PERF.md §2a)
    # last_metrics is K-stacked under STEPS_PER_DISPATCH>1; check the last
    err_g = float(np.asarray(trainer.last_metrics["errG/total"]).reshape(-1)[-1])
    assert np.isfinite(err_g), f"non-finite errG/total after run: {err_g}"

    imgs = EPOCHS * n_iters * BATCH
    rate = imgs / dt
    print(f"steady state: {EPOCHS} epochs x {n_iters} iters, "
          f"{steps_done} total steps", file=sys.stderr)
    print(json.dumps({
        "metric": "e2e_train_images_per_sec_real_pipeline",
        "value": round(rate, 1), "unit": "images/sec",
        # ratio to the device-only synthetic-batch headline (PERF.md §3).
        "vs_baseline": round(rate / 136.7, 3),
        "epochs": EPOCHS, "iters_per_epoch": n_iters,
        "batch": BATCH, "preload": PRELOAD, "uint8": UINT8,
        "workers": WORKERS,
        "steps_per_dispatch": SCAN, "corpus_images": N_IMAGES,
    }))

    trainer.close()
    shutil.rmtree(out_dir, ignore_errors=True)
    if tmp:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
