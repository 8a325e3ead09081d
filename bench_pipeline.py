#!/usr/bin/env python
"""Host data-pipeline throughput benchmark (no accelerator involved).

The fused train step sustains ~137 img/s at batch 32 (244 at batch 128) on
the attached chip (PERF.md §3, value-fetch-synchronised), so the host must
decode+augment at least that fast or training becomes input-bound. This
measures images/sec of the DataPipeline over a synthetic JPEG corpus for
several worker counts, with and without the decoded-image preload cache.
Caveat: this dev box has ONE CPU core — treat results as floor values.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np


def make_corpus(root: str, n: int = 256) -> None:
    from PIL import Image

    from tests.corpus_util import build_corpus  # layout only; rebuild imgs

    os.makedirs(os.path.join(root, "images", "001.cls"), exist_ok=True)
    os.makedirs(os.path.join(root, "text", "001.cls"), exist_ok=True)
    rng = np.random.RandomState(0)
    import pickle

    filenames, bboxes = [], {}
    for i in range(n):
        key = f"001.cls/img_{i}"
        filenames.append(key)
        arr = rng.randint(0, 255, (400, 500, 3), np.uint8)
        Image.fromarray(arr).save(os.path.join(root, "images", f"{key}.jpg"),
                                  quality=90)
        with open(os.path.join(root, "text", f"{key}.txt"), "w") as f:
            f.write("this bird has a bright red head\n"
                    "a small bird with white belly\n")
        bboxes[key] = [50, 40, 300, 300]
    for split, names in [("train", filenames), ("test", filenames[:8])]:
        os.makedirs(os.path.join(root, split), exist_ok=True)
        with open(os.path.join(root, split, "filenames.pickle"), "wb") as f:
            pickle.dump(names, f, protocol=2)
        with open(os.path.join(root, split, "class_info.pickle"), "wb") as f:
            pickle.dump([1 + (i % 5) for i in range(len(names))], f, protocol=2)
    with open(os.path.join(root, "bounding_boxes.pickle"), "wb") as f:
        pickle.dump(bboxes, f, protocol=2)
    from eegan_tpu.data.prep import build_captions_pickle

    build_captions_pickle(root, 2)
    with open(os.path.join(root, "captions.pickle"), "rb") as f:
        train_ids, test_ids, _, _ = pickle.load(f)
    mk = lambda caps: [[c[:3], c[3:5]] for c in caps]
    os.makedirs(os.path.join(root, "attributes"), exist_ok=True)
    with open(os.path.join(root, "attributes", "EE-GAN.pickle"), "wb") as f:
        pickle.dump([mk(train_ids), mk(test_ids)], f, protocol=2)


def main():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from eegan_tpu.config import Config
    from eegan_tpu.data.datasets import TextImageDataset
    from eegan_tpu.data.pipeline import DataPipeline

    with tempfile.TemporaryDirectory() as root:
        make_corpus(root, n=256)
        c = Config()
        c.DATA_DIR = root
        c.DATASET_NAME = "bird"
        c.TEXT.CAPTIONS_PER_IMAGE = 2

        best = 0.0
        for preload in (False, True):
            ds = TextImageDataset(c, split="train", preload=preload)
            for workers in (0, 8, 16):
                pipe = DataPipeline(ds, batch_size=32, seed=0,
                                    num_workers=workers)
                # warmup one batch (fork + fill caches)
                next(pipe.epoch(0))
                t0 = time.perf_counter()
                n_img = 0
                for epoch in range(1, 100):
                    for b in pipe.epoch(epoch):
                        n_img += len(b["caps"])
                    if time.perf_counter() - t0 > 6:
                        break
                rate = n_img / (time.perf_counter() - t0)
                best = max(best, rate)
                print(f"preload={preload} workers={workers:2d}: "
                      f"{rate:8.1f} images/sec")
                pipe.close()

        print(json.dumps({"metric": "host_pipeline_images_per_sec",
                          "value": round(best, 1), "unit": "images/sec",
                          "vs_baseline": 1.0}))


if __name__ == "__main__":
    main()
