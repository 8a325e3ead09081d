"""Frozen DAMSM image encoder on the Inception-v3 trunk.

Rebuilds `CNN_ENCODER` (reference `DAMSM.py:117-230`): input images are
bilinearly resized to 299², region features are the Mixed_6e 17x17x768 tap
projected to nef=256 by a 1x1 conv (``emb_features``), and the global code is
the Mixed_7c 8x8 average pool (2048) through a linear (``emb_cnn_code``).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from eegan_tpu.models.inception import InceptionV3
from eegan_tpu.models.layers import resize_bilinear_half_pixel

Dtype = Any


def _uniform_init(key, shape, dtype=jnp.float32):
    import jax

    return jax.random.uniform(key, shape, dtype, -0.1, 0.1)


class ImageEncoder(nn.Module):
    nef: int = 256
    dtype: Dtype = jnp.float32
    # RUNTIME.REMAT_IMAGE_ENCODER: the trunk is frozen, but generator
    # gradients flow THROUGH it (DAMSM losses on generated images), so its
    # activations are otherwise held for the backward — ~2.6 GB at batch
    # 192 in the fused step. Checkpointing recomputes them instead.
    # Opt-in and OFF by default: measured counterproductive on the axon
    # backend (b192 peak allocation grows 17.81 -> 19.31 GB with it on).
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (B, H, W, 3) in [-1, 1] NHWC.

        Returns (region_features (B, 17, 17, nef), cnn_code (B, nef)).
        """
        # Resize in the compute dtype: the trunk consumes bf16 anyway, and
        # the 256->299 interpolation matmuls are bandwidth-bound.
        x = resize_bilinear_half_pixel(x.astype(self.dtype), (299, 299))
        # static_argnums counts the bound method's args with self at 0.
        Trunk = (nn.remat(InceptionV3, static_argnums=(2,)) if self.remat
                 else InceptionV3)
        taps = Trunk(num_classes=0, dtype=self.dtype,
                     name="inception")(x, False)

        # Trainable-in-DAMSM projections (frozen here, like the trunk):
        # reference DAMSM.py:162-168 inits them U(-0.1, 0.1).
        region = nn.Conv(self.nef, (1, 1), use_bias=False,
                         kernel_init=_uniform_init, dtype=self.dtype,
                         name="emb_features")(taps["mixed_6e"])
        code = nn.Dense(self.nef, use_bias=True, kernel_init=_uniform_init,
                        dtype=self.dtype, name="emb_cnn_code")(taps["pool3"])
        return region.astype(jnp.float32), code.astype(jnp.float32)
