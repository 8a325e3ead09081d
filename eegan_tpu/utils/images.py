"""Image/text result saving (reference `miscc/utils.py:11-113`), PIL-based.

The reference uses torchvision's `save_image` with normalize+scale_each; we
renormalise from the generator's [-1, 1] tanh range per-image and compose
grids with numpy, keeping the same file layout so downstream FID/IS folder
sweeps work identically.
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image


def mkdir_p(path: str, rm_exist: bool = False) -> None:
    """(reference `miscc/utils.py` mkdir_p)."""
    if rm_exist and os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)


def to_uint8(img: np.ndarray, scale_each: bool = True) -> np.ndarray:
    """(H, W, 3) float in [-1, 1] (or arbitrary range) -> uint8."""
    img = np.asarray(img, dtype=np.float32)
    if scale_each:
        lo, hi = img.min(), img.max()
    else:
        lo, hi = -1.0, 1.0
    img = (img - lo) / max(hi - lo, 1e-5)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def make_grid(images: np.ndarray, nrow: int = 8, pad: int = 2) -> np.ndarray:
    """(N, H, W, 3) -> one uint8 grid array."""
    n, h, w, c = images.shape
    ncol = int(np.ceil(n / nrow))
    grid = np.zeros((ncol * (h + pad) + pad, nrow * (w + pad) + pad, c),
                    dtype=np.uint8)
    for i in range(n):
        r, col = divmod(i, nrow)
        y = pad + r * (h + pad)
        x = pad + col * (w + pad)
        grid[y:y + h, x:x + w] = to_uint8(images[i])
    return grid


def save_img_grid(images: np.ndarray, path: str, nrow: int = 8) -> None:
    Image.fromarray(make_grid(np.asarray(images), nrow)).save(path)


def save_img_results(img_pyramid: Sequence[np.ndarray], prefix: str,
                     image_dir: str) -> None:
    """One grid per scale (reference `save_img_results`)."""
    for imgs in img_pyramid:
        imgs = np.asarray(imgs)
        scale = imgs.shape[1]
        save_img_grid(imgs, os.path.join(image_dir, f"{prefix}_{scale}.png"))


def save_img_results_one_by_one(images: np.ndarray, keys: Sequence[str],
                                image_dir: str,
                                suffix: Optional[str] = None) -> None:
    """Per-sample PNGs feeding the FID/IS folder sweeps
    (reference `save_img_results_one_by_one`)."""
    os.makedirs(image_dir, exist_ok=True)
    for img, key in zip(np.asarray(images), keys):
        name = key.replace("/", "_")
        if suffix:
            name = f"{name}_{suffix}"
        Image.fromarray(to_uint8(img)).save(
            os.path.join(image_dir, f"{name}.png"))


def get_filenames(data_path: str) -> List[str]:
    """Recursive jpg/png walker (reference `get_filenames`)."""
    out = []
    for path, _, files in os.walk(data_path):
        for name in files:
            if name.lower().endswith((".jpg", ".png")):
                full = os.path.join(path, name)
                if os.path.isfile(full):
                    out.append(full)
    return out


def get_filenames_from_pickle(data_path: str, pickle_path: str) -> List[str]:
    """Keys pickle -> image paths (reference `get_filenames_from_pickle`)."""
    import pickle

    with open(pickle_path, "rb") as f:
        keys = pickle.load(f)
    return [os.path.join(data_path, f"{k}.jpg") for k in keys]


def recall_at_k(scores: np.ndarray, ks: Sequence[int] = (1, 5, 10)) -> np.ndarray:
    """Recall@k hits for retrieval scores where index 0 is the true match.

    Batched rebuild of `calculate_r` (reference `miscc/utils.py:102-113`):
    scores (B, N) similarity rows; returns per-k hit counts over the batch.
    """
    scores = np.atleast_2d(np.asarray(scores))
    order = np.argsort(-scores, axis=1)
    rank_of_true = np.argmax(order == 0, axis=1)  # position of index 0
    return np.array([(rank_of_true < k).sum() for k in ks])


def save_text_results(caps: np.ndarray, cap_lens: np.ndarray,
                      ixtoword: Dict[int, str], path: str,
                      attrs: Optional[np.ndarray] = None,
                      attr_lens: Optional[np.ndarray] = None) -> None:
    """Dump the captions (and attributes) of a batch
    (reference `save_text_results`)."""
    lines: List[str] = []
    caps = np.asarray(caps)
    cap_lens = np.asarray(cap_lens)
    for i in range(len(caps)):
        words = [ixtoword.get(int(w), "?") for w in caps[i][:cap_lens[i]]]
        line = f"[{i}] " + " ".join(words)
        if attrs is not None:
            parts = []
            for a in range(attrs.shape[1]):
                ln = int(attr_lens[i][a]) if attr_lens is not None else attrs.shape[2]
                toks = [ixtoword.get(int(w), "?") for w in attrs[i][a][:ln]
                        if int(w) != 0]
                if toks:
                    parts.append(" ".join(toks))
            line += "  | attrs: " + "; ".join(parts)
        lines.append(line)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
