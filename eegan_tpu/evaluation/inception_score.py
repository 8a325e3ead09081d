"""Inception Score on TPU.

Rebuilds the *scoring math* of `metrics/IS_TF/inception_score.py`
(reference :64-107) — per-split IS = exp(mean KL(p(y|x) || p(y))) over 10
splits — on our Flax Inception instead of the vendored TF1 slim stack
(reference ships 3,226 LoC of 2016 TF-slim solely for this; SURVEY.md §2).

The reference uses StackGAN's *fine-tuned* checkpoints (50 bird / 20 flower
classes + 1 background class sliced off, reference :41-51,99). Weights
convert from any torch export via `utils/torch_convert`; with no fine-tuned
checkpoint available the harness still runs with standard 1000-class
weights (scores are then not comparable to the papers — flagged in the
output).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eegan_tpu.models.inception import InceptionV3
from eegan_tpu.models.layers import resize_bilinear_half_pixel


def inception_score_from_probs(probs: np.ndarray, splits: int = 10
                               ) -> Tuple[float, float]:
    """exp(mean KL) per split, mean±std over splits (reference :99-107)."""
    n = probs.shape[0]
    scores = []
    for i in range(splits):
        part = probs[i * n // splits:(i + 1) * n // splits]
        marginal = np.mean(part, axis=0, keepdims=True)
        kl = part * (np.log(np.maximum(part, 1e-30))
                     - np.log(np.maximum(marginal, 1e-30)))
        scores.append(np.exp(np.mean(np.sum(kl, axis=1))))
    return float(np.mean(scores)), float(np.std(scores))


class InceptionScorer:
    """Batched on-device softmax probabilities + split scoring."""

    def __init__(self, variables=None, num_classes: int = 51,
                 drop_background: bool = True, batch_size: int = 64,
                 rng: Optional[jax.Array] = None):
        self.model = InceptionV3(num_classes=num_classes)
        self.batch_size = batch_size
        self.drop_background = drop_background
        self.finetuned = variables is not None
        if variables is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            variables = self.model.init(
                rng, jnp.zeros((1, 299, 299, 3)), train=False)
        self.variables = variables

        # variables as jit argument — see FIDExtractor for why.
        @jax.jit
        def _probs(variables, x):
            x = resize_bilinear_half_pixel(x, (299, 299))
            logits = self.model.apply(variables, x, train=False)["logits"]
            if self.drop_background:
                # fine-tuned checkpoints reserve class 0 for background
                # (reference :99: softmax over logits[:, 1:]).
                logits = logits[:, 1:]
            return jax.nn.softmax(logits, axis=-1)

        self._probs = _probs

    def probs(self, images: np.ndarray) -> np.ndarray:
        """images: (N, H, W, 3) float in [-1, 1]."""
        outs = []
        bs = self.batch_size
        for i in range(0, len(images), bs):
            chunk = np.asarray(images[i:i + bs], np.float32)
            pad = bs - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], np.float32)])
            p = np.asarray(self._probs(self.variables,
                                       jnp.asarray(chunk)))
            outs.append(p[:bs - pad] if pad else p)
        return np.concatenate(outs, axis=0)

    def score_folder(self, folder: str, splits: int = 10,
                     max_images: int = 30000,
                     shuffle_seed: Optional[int] = 0) -> Tuple[float, float]:
        """Disk-image scoring sweep entry (reference `load_data` +
        `get_inception_score`, :64-131). Images are shuffled before
        splitting, as the reference does."""
        from PIL import Image

        paths = sorted(
            os.path.join(r, f)
            for r, _, files in os.walk(folder) for f in files
            if f.lower().endswith((".png", ".jpg")))[:max_images]
        if shuffle_seed is not None:
            np.random.RandomState(shuffle_seed).shuffle(paths)
        imgs = []
        for p in paths:
            im = Image.open(p).convert("RGB").resize((299, 299), Image.BILINEAR)
            imgs.append(np.asarray(im, np.float32) / 127.5 - 1.0)
        probs = self.probs(np.stack(imgs))
        return inception_score_from_probs(probs, splits)
