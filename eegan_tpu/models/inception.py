"""Inception-v3 trunk in Flax (NHWC), torchvision-layout compatible.

One implementation serves three consumers (the reference keeps three copies):

* the frozen DAMSM image encoder `CNN_ENCODER` (reference `DAMSM.py:117-230`)
  — needs the Mixed_6e 17x17x768 tap and the 2048-d pool tap;
* the FID feature extractor (reference `metrics/FID/inception.py:7-147`) —
  needs the pool3 2048-d activations;
* the Inception Score harness (reference `metrics/IS_TF/inception_score.py`)
  — needs class logits.

Module/parameter names mirror torchvision (``Conv2d_1a_3x3``, ``Mixed_5b``,
branch names, ``conv``/``bn`` inside BasicConv2d) so torch checkpoints
convert mechanically (see `eegan_tpu/utils/torch_convert.py`).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from eegan_tpu.models.layers import torch_kernel_init

Dtype = Any


def _pad(p):
    if isinstance(p, int):
        return ((p, p), (p, p))
    return ((p[0], p[0]), (p[1], p[1]))


class BasicConv2d(nn.Module):
    features: int
    kernel: Any = (3, 3)
    strides: Any = (1, 1)
    padding: Any = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel if isinstance(self.kernel, tuple) else (self.kernel, self.kernel)
        s = self.strides if isinstance(self.strides, tuple) else (self.strides, self.strides)
        x = nn.Conv(self.features, k, strides=s, padding=_pad(self.padding),
                    use_bias=False, kernel_init=torch_kernel_init,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=0.001, dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


def max_pool3_s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


def avg_pool3_s1_p1(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=False)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        b1 = BasicConv2d(64, 1, dtype=dt, name="branch1x1")(x, train)
        b5 = BasicConv2d(48, 1, dtype=dt, name="branch5x5_1")(x, train)
        b5 = BasicConv2d(64, 5, padding=2, dtype=dt, name="branch5x5_2")(b5, train)
        b3 = BasicConv2d(64, 1, dtype=dt, name="branch3x3dbl_1")(x, train)
        b3 = BasicConv2d(96, 3, padding=1, dtype=dt, name="branch3x3dbl_2")(b3, train)
        b3 = BasicConv2d(96, 3, padding=1, dtype=dt, name="branch3x3dbl_3")(b3, train)
        bp = avg_pool3_s1_p1(x)
        bp = BasicConv2d(self.pool_features, 1, dtype=dt, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        b3 = BasicConv2d(384, 3, strides=2, dtype=dt, name="branch3x3")(x, train)
        bd = BasicConv2d(64, 1, dtype=dt, name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(96, 3, padding=1, dtype=dt, name="branch3x3dbl_2")(bd, train)
        bd = BasicConv2d(96, 3, strides=2, dtype=dt, name="branch3x3dbl_3")(bd, train)
        bp = max_pool3_s2(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt, c7 = self.dtype, self.channels_7x7
        b1 = BasicConv2d(192, 1, dtype=dt, name="branch1x1")(x, train)
        b7 = BasicConv2d(c7, 1, dtype=dt, name="branch7x7_1")(x, train)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=dt, name="branch7x7_2")(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=dt, name="branch7x7_3")(b7, train)
        bd = BasicConv2d(c7, 1, dtype=dt, name="branch7x7dbl_1")(x, train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=dt, name="branch7x7dbl_2")(bd, train)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=dt, name="branch7x7dbl_3")(bd, train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=dt, name="branch7x7dbl_4")(bd, train)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=dt, name="branch7x7dbl_5")(bd, train)
        bp = avg_pool3_s1_p1(x)
        bp = BasicConv2d(192, 1, dtype=dt, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        b3 = BasicConv2d(192, 1, dtype=dt, name="branch3x3_1")(x, train)
        b3 = BasicConv2d(320, 3, strides=2, dtype=dt, name="branch3x3_2")(b3, train)
        b7 = BasicConv2d(192, 1, dtype=dt, name="branch7x7x3_1")(x, train)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=dt, name="branch7x7x3_2")(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=dt, name="branch7x7x3_3")(b7, train)
        b7 = BasicConv2d(192, 3, strides=2, dtype=dt, name="branch7x7x3_4")(b7, train)
        bp = max_pool3_s2(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        b1 = BasicConv2d(320, 1, dtype=dt, name="branch1x1")(x, train)
        b3 = BasicConv2d(384, 1, dtype=dt, name="branch3x3_1")(x, train)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=dt, name="branch3x3_2a")(b3, train)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=dt, name="branch3x3_2b")(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, 1, dtype=dt, name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(384, 3, padding=1, dtype=dt, name="branch3x3dbl_2")(bd, train)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=dt, name="branch3x3dbl_3a")(bd, train)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=dt, name="branch3x3dbl_3b")(bd, train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = avg_pool3_s1_p1(x)
        bp = BasicConv2d(192, 1, dtype=dt, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Full trunk with named feature taps.

    ``__call__(x)`` expects NHWC input already resized to 299x299 and scaled
    to the network's expected range; returns a dict with:
      mixed_6e (B,17,17,768), pool3 (B,2048), and logits (B,num_classes)
      when ``num_classes`` > 0.
    """

    num_classes: int = 1000
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        x = x.astype(dt)
        x = BasicConv2d(32, 3, strides=2, dtype=dt, name="Conv2d_1a_3x3")(x, train)
        x = BasicConv2d(32, 3, dtype=dt, name="Conv2d_2a_3x3")(x, train)
        x = BasicConv2d(64, 3, padding=1, dtype=dt, name="Conv2d_2b_3x3")(x, train)
        x = max_pool3_s2(x)
        x = BasicConv2d(80, 1, dtype=dt, name="Conv2d_3b_1x1")(x, train)
        x = BasicConv2d(192, 3, dtype=dt, name="Conv2d_4a_3x3")(x, train)
        x = max_pool3_s2(x)
        x = InceptionA(32, dtype=dt, name="Mixed_5b")(x, train)
        x = InceptionA(64, dtype=dt, name="Mixed_5c")(x, train)
        x = InceptionA(64, dtype=dt, name="Mixed_5d")(x, train)
        x = InceptionB(dtype=dt, name="Mixed_6a")(x, train)
        x = InceptionC(128, dtype=dt, name="Mixed_6b")(x, train)
        x = InceptionC(160, dtype=dt, name="Mixed_6c")(x, train)
        x = InceptionC(160, dtype=dt, name="Mixed_6d")(x, train)
        x = InceptionC(192, dtype=dt, name="Mixed_6e")(x, train)
        mixed_6e = x
        x = InceptionD(dtype=dt, name="Mixed_7a")(x, train)
        x = InceptionE(dtype=dt, name="Mixed_7b")(x, train)
        x = InceptionE(dtype=dt, name="Mixed_7c")(x, train)
        pool3 = jnp.mean(x, axis=(1, 2))  # global 8x8 avg pool

        out = {"mixed_6e": mixed_6e.astype(jnp.float32),
               "pool3": pool3.astype(jnp.float32)}
        if self.num_classes > 0:
            out["logits"] = nn.Dense(self.num_classes,
                                     kernel_init=torch_kernel_init,
                                     dtype=dt, name="fc")(pool3).astype(jnp.float32)
        return out
