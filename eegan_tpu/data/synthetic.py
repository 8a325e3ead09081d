"""Synthetic batch generation for tests and benchmarks.

Produces batches with exactly the shapes/dtypes the real pipeline emits
(see `eegan_tpu/data/datasets.py`), so the train step, bench and multichip
dry-run can run without the CUB/COCO corpora on disk.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from eegan_tpu.config import Config


class SyntheticDataset:
    """Drop-in dataset for smoke training without a corpus on disk.

    Exposes the same `.sample(index, rng)` / `n_words` / `ixtoword` surface
    as `TextImageDataset`.
    """

    def __init__(self, config: Config, size: int = 256, n_words: int = 100):
        self.config = config
        self.size = size
        self.n_words = n_words
        self.ixtoword = {i: f"w{i}" for i in range(n_words)}
        self.ixtoword[0] = "<end>"
        self.wordtoix = {v: k for k, v in self.ixtoword.items()}

    def __len__(self):
        return self.size

    def sample(self, index: int, rng: np.random.Generator,
               augment: bool = True) -> Dict[str, np.ndarray]:
        c, t = self.config, self.config.TEXT
        out: Dict[str, np.ndarray] = {}
        for s in c.imsizes:
            out[f"img{s}"] = rng.uniform(-1, 1, (s, s, 3)).astype(np.float32)
        out["caps"] = rng.integers(1, self.n_words, t.WORDS_NUM).astype(np.int32)
        out["cap_lens"] = np.int32(rng.integers(4, t.WORDS_NUM + 1))
        out["attrs"] = rng.integers(
            1, self.n_words, (t.MAX_ATTR_NUM, t.MAX_ATTR_LEN)).astype(np.int32)
        out["attr_lens"] = rng.integers(
            1, t.MAX_ATTR_LEN + 1, t.MAX_ATTR_NUM).astype(np.int32)
        out["unpair_caps"] = rng.integers(1, self.n_words, t.WORDS_NUM).astype(np.int32)
        out["unpair_cap_lens"] = np.int32(rng.integers(4, t.WORDS_NUM + 1))
        out["class_ids"] = np.int32(rng.integers(1, c.TRAIN.CLASS_NUM + 1))
        return out


def synthetic_batch(config: Config, batch_size: int, seed: int = 0,
                    n_words: int = 100) -> Dict[str, np.ndarray]:
    rng = np.random.RandomState(seed)
    t = config.TEXT
    batch: Dict[str, np.ndarray] = {}
    for s in config.imsizes:
        batch[f"img{s}"] = rng.uniform(-1, 1, (batch_size, s, s, 3)).astype(np.float32)
    batch["caps"] = rng.randint(1, n_words, (batch_size, t.WORDS_NUM)).astype(np.int32)
    batch["cap_lens"] = rng.randint(4, t.WORDS_NUM + 1, (batch_size,)).astype(np.int32)
    batch["attrs"] = rng.randint(1, n_words, (batch_size, t.MAX_ATTR_NUM, t.MAX_ATTR_LEN)).astype(np.int32)
    batch["attr_lens"] = rng.randint(1, t.MAX_ATTR_LEN + 1, (batch_size, t.MAX_ATTR_NUM)).astype(np.int32)
    batch["unpair_caps"] = rng.randint(1, n_words, (batch_size, t.WORDS_NUM)).astype(np.int32)
    batch["unpair_cap_lens"] = rng.randint(4, t.WORDS_NUM + 1, (batch_size,)).astype(np.int32)
    batch["class_ids"] = rng.randint(1, config.TRAIN.CLASS_NUM + 1, (batch_size,)).astype(np.int32)
    return batch
