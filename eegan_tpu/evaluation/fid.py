"""Fréchet Inception Distance with on-device feature extraction.

Rebuilds `metrics/FID/fid_score.py` (reference :49-305): Inception-v3 pool3
(2048-d) activations over generated-image folders (or the dataset ``.npz``
with keys ``mu``/``sigma``, reference :100-103), Gaussian statistics, and
the stabilised matrix-sqrt Fréchet distance (sqrtm stays on host / scipy —
it's a one-off 2048x2048 op; everything batched runs on TPU in bf16-safe
fp32).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg

from eegan_tpu.models.inception import InceptionV3
from eegan_tpu.models.layers import resize_bilinear_half_pixel


class FIDExtractor:
    """Jitted pool3 feature extractor. Inputs: float NHWC in [-1, 1]."""

    def __init__(self, variables=None, rng: Optional[jax.Array] = None,
                 batch_size: int = 50):
        self.model = InceptionV3(num_classes=0)
        self.batch_size = batch_size
        if variables is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            variables = self.model.init(
                rng, jnp.zeros((1, 299, 299, 3)), train=False)
        self.variables = variables

        # variables are a jit ARGUMENT (closing over them would bake ~90MB
        # of weights into the HLO as constants — catastrophically slow
        # through the remote-compile path).
        @jax.jit
        def _features(variables, x):
            x = resize_bilinear_half_pixel(x, (299, 299))
            return self.model.apply(variables, x, train=False)["pool3"]

        self._features = _features

    def features_jax(self, images) -> jnp.ndarray:
        """Device-resident feature extraction (no host round-trip).

        For the overlapped-evaluation path the generated images are already
        on the accelerator; fetching them to host and re-uploading would
        bottleneck on host<->device bandwidth.
        """
        return self._features(self.variables, images)

    def features(self, images: np.ndarray) -> np.ndarray:
        """images: (N, H, W, 3) float32 in [-1, 1] -> (N, 2048)."""
        outs = []
        n = len(images)
        bs = self.batch_size
        for i in range(0, n, bs):
            chunk = np.asarray(images[i:i + bs], dtype=np.float32)
            pad = 0
            if len(chunk) < bs:  # keep shapes static for the jit cache
                pad = bs - len(chunk)
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], np.float32)])
            feats = np.asarray(self._features(self.variables,
                                              jnp.asarray(chunk)))
            outs.append(feats[:bs - pad] if pad else feats)
        return np.concatenate(outs, axis=0)

    def features_from_folder(self, folder: str,
                             max_images: Optional[int] = None) -> np.ndarray:
        from PIL import Image

        paths = sorted(
            os.path.join(r, f)
            for r, _, files in os.walk(folder) for f in files
            if f.lower().endswith((".png", ".jpg", ".jpeg")))
        if max_images:
            paths = paths[:max_images]
        outs, batch = [], []
        for p in paths:
            img = Image.open(p).convert("RGB").resize((299, 299), Image.BILINEAR)
            batch.append(np.asarray(img, np.float32) / 127.5 - 1.0)
            if len(batch) == self.batch_size:
                outs.append(self.features(np.stack(batch)))
                batch = []
        if batch:
            outs.append(self.features(np.stack(batch)))
        if not outs:
            raise FileNotFoundError(f"no images under {folder}")
        return np.concatenate(outs, axis=0)


def activation_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def load_npz_stats(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Dataset statistics npz with keys mu/sigma (reference :100-103)."""
    with np.load(path) as f:
        return f["mu"][:], f["sigma"][:]


def save_npz_stats(path: str, mu: np.ndarray, sigma: np.ndarray) -> None:
    np.savez(path, mu=mu, sigma=sigma)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """d² = ||mu1-mu2||² + Tr(S1 + S2 - 2 sqrt(S1 S2)), with the standard
    eps-offset retry and imaginary-part guard (reference :174-228)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                f"sqrtm imaginary component {np.max(np.abs(covmean.imag))}")
        covmean = covmean.real

    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def dataset_statistics(config, extractor: "FIDExtractor", split: str = "test",
                       n_images: int = 30000, seed: int = 0
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Activation statistics over randomly augmented dataset crops.

    Rebuilds `MeasureFID.gen_dataset_imgs` + `gen_npz_file` (reference
    `metrics/FID/fid_score.py:233-292`): sample n_images random-cropped
    dataset images (bbox crop for CUB) and compute pool3 mu/sigma — without
    the intermediate on-disk image dump.
    """
    from eegan_tpu.data.datasets import TextImageDataset

    ds = TextImageDataset(config, split=split)
    rng = np.random.default_rng([seed])
    feats = []
    batch, bs = [], extractor.batch_size
    for i in range(n_images):
        idx = int(rng.integers(0, len(ds)))
        key = ds.filenames[idx]
        bbox = ds.bbox[key] if ds.bbox is not None else None
        from eegan_tpu.data.transforms import load_image_pyramid

        pyramid = load_image_pyramid(ds.image_path(key), ds.imsizes, bbox,
                                     rng, augment=True)
        batch.append(pyramid[-1])
        if len(batch) == bs:
            feats.append(extractor.features(np.stack(batch)))
            batch = []
    if batch:
        feats.append(extractor.features(np.stack(batch)))
    return activation_statistics(np.concatenate(feats, axis=0))


class MeasureFID:
    """Folder-sweep harness (reference `MeasureFID.calculate_fid`, :66-95)."""

    def __init__(self, extractor: Optional[FIDExtractor] = None):
        self.extractor = extractor or FIDExtractor()

    def stats_for(self, path: str, max_images: Optional[int] = None):
        if path.endswith(".npz"):
            return load_npz_stats(path)
        feats = self.extractor.features_from_folder(path, max_images)
        return activation_statistics(feats)

    def fid_between(self, real: str, fake_folder: str,
                    max_images: Optional[int] = None) -> float:
        m1, s1 = self.stats_for(real)
        m2, s2 = self.stats_for(fake_folder, max_images)
        return frechet_distance(m1, s1, m2, s2)

    def sweep(self, real: str, gen_root: str, epochs: Sequence[int],
              repeats: Sequence[int], max_images: Optional[int] = None):
        """Epoch×repeat folder sweep over GenImage/Epoch_{e}_{r}/
        (reference :84-95; folder layout from test.py)."""
        m1, s1 = self.stats_for(real)
        results = {}
        for e in epochs:
            for r in repeats:
                folder = os.path.join(gen_root, f"Epoch_{e}_{r}")
                if not os.path.isdir(folder):
                    continue
                feats = self.extractor.features_from_folder(folder, max_images)
                m2, s2 = activation_statistics(feats)
                results[(e, r)] = frechet_distance(m1, s1, m2, s2)
                print(f"Epoch_{e}_{r}: FID = {results[(e, r)]:.3f}")
        return results
