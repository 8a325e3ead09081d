"""Per-scale conditional patch discriminators.

Rebuilds `resD`, `DiscSent`, `DiscCond`, `Dis64/128/256` (reference
`models.py:262-403`) as NHWC Flax modules. Each tower downsamples its input
to a 4x4 feature map through residual blocks (avg-pool shortcut with a
learned zero-init residual gate); the conditional head concatenates the
tiled sentence embedding and produces per-sample hinge logits, plus a
class-logit head at 256² when USE_CLASS is on (reference `models.py:308-338`).
No spectral norm and no batch norm in D — faithful to the reference.

`features` and `head` are exposed as separate apply-methods because the
discriminator loss reuses the real-image features for both the matched and
mismatched condition branches (reference `train.py:340-346`).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from eegan_tpu.models.layers import (
    avg_pool_2x,
    conv1x1,
    conv3x3,
    conv4x4_down,
    dense,
    leaky_relu,
    torch_kernel_init,
)

Dtype = Any


class ResDown(nn.Module):
    """Residual down block (reference `resD`, models.py:262-288)."""

    fout: int
    downsample: bool = True
    dtype: Dtype = jnp.float32
    # Space-to-depth lowering for conv_r2 when fout is lane-starved
    # (RUNTIME.S2D_CONVS; ops/s2d_conv.py) — identical math + param tree.
    s2d: bool = False

    @nn.compact
    def __call__(self, x):
        fin = x.shape[-1]
        h = conv4x4_down(self.fout, dtype=self.dtype, name="conv_r1")(x)
        h = leaky_relu(h, 0.2)
        h = conv3x3(self.fout, dtype=self.dtype, name="conv_r2",
                    s2d=self.s2d)(h)
        h = leaky_relu(h, 0.2)

        sc = x
        if fin != self.fout:
            sc = conv1x1(self.fout, use_bias=True, dtype=self.dtype, name="conv_s")(sc)
        if self.downsample:
            sc = avg_pool_2x(sc)

        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return sc + gamma.astype(self.dtype) * h


class DiscSent(nn.Module):
    """Sentence-conditional logit head (reference `DiscSent`, models.py:290-306).

    feat (B,4,4,ndf) ++ tiled sent (B,4,4,nef) -> conv3x3 -> lrelu ->
    conv4x4 VALID -> (B,) logit.
    """

    ndf: int
    nef: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, cond):
        b, h, w, _ = feat.shape
        cond = jnp.broadcast_to(cond[:, None, None, :].astype(feat.dtype),
                                (b, h, w, cond.shape[-1]))
        x = jnp.concatenate([feat, cond], axis=-1)
        x = nn.Conv(self.ndf * 2, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    kernel_init=torch_kernel_init, dtype=self.dtype,
                    name="joint_conv1")(x)
        x = leaky_relu(x, 0.2)
        x = nn.Conv(1, (4, 4), padding="VALID", use_bias=False,
                    kernel_init=torch_kernel_init, dtype=self.dtype,
                    name="joint_conv2")(x)
        return x.reshape(b)


class DiscCond(nn.Module):
    """Pair + class-logit head at 256² (reference `DiscCond`, models.py:308-338)."""

    ndf: int
    class_nums: int = 200
    nef: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, cond) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, h, w, _ = feat.shape
        cond = jnp.broadcast_to(cond[:, None, None, :].astype(feat.dtype),
                                (b, h, w, cond.shape[-1]))
        x = jnp.concatenate([feat, cond], axis=-1)
        x = nn.Conv(self.ndf * 2, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    kernel_init=torch_kernel_init, dtype=self.dtype,
                    name="joinConv")(x)
        x = leaky_relu(x, 0.2)

        # Reference uses strides=(4,4) (models.py:318-325); on the 4x4 head
        # input VALID 4x4 kernels produce a single output position either
        # way, so strides=(1,1) is bitwise-identical math. We use stride 1
        # because the TPU backend miscompiles the BACKWARD of the strided
        # variant when the head runs as one 3B-concat pass (finite loss,
        # NaN cotangents below joinConv; CPU and the separate-pass program
        # agree to the last bit, and the stride-1 program matches both).
        pair = nn.Conv(1, (4, 4), padding="VALID", use_bias=True,
                       kernel_init=torch_kernel_init, dtype=self.dtype,
                       name="pair_node")(x).reshape(b)
        cls = nn.Conv(self.ndf * 2, (4, 4), padding="VALID",
                      use_bias=True, kernel_init=torch_kernel_init,
                      dtype=self.dtype, name="class_node")(x).reshape(b, self.ndf * 2)
        cls = dense(self.class_nums, dtype=self.dtype, name="class_linear")(cls)
        return pair, cls


def channel_ladder(ndf: int, scale: int):
    if scale == 64:
        return [ndf * 2, ndf * 4, ndf * 8, ndf * 8]
    if scale == 128:
        return [ndf * 2, ndf * 4, ndf * 8, ndf * 8, ndf * 16]
    if scale == 256:
        return [ndf * 2, ndf * 4, ndf * 8, ndf * 16, ndf * 16, ndf * 16]
    raise ValueError(f"unsupported discriminator scale {scale}")


class Discriminator(nn.Module):
    """One per-scale tower (reference `Dis64/128/256`, models.py:340-403)."""

    ndf: int
    scale: int  # 64, 128 or 256
    disc_class: bool = False
    class_nums: int = 200
    dtype: Dtype = jnp.float32
    # RUNTIME.REMAT: checkpoint each down block — its activations are
    # recomputed in the backward instead of held live. The densified hinge
    # phase runs the towers on 2B/3B-concat batches, so at large per-chip
    # batch the D activations (not the generator's) dominate HBM; remat
    # works through the MAGP double-backward too (jax.checkpoint composes
    # with higher-order AD).
    remat: bool = False
    # RUNTIME.S2D_CONVS: space-to-depth lowering for the lane-starved 3x3
    # convs — conv_img (Cout=ndf at the tower's full input resolution, the
    # densest-spatial/narrowest-channel op in the step) and the early
    # blocks' conv_r2 where fout < 128. Identical math and param tree
    # (ops/s2d_conv.py); gated per-conv so full-width convs keep the plain
    # lowering (the 16/9 FLOP premium buys nothing at full lanes).
    s2d: bool = False

    def setup(self):
        ladder = channel_ladder(self.ndf, self.scale)
        block_cls = nn.remat(ResDown) if self.remat else ResDown
        self.conv_img = conv3x3(self.ndf, use_bias=True, dtype=self.dtype,
                                name="conv_img",
                                s2d=self.s2d and self.ndf < 128)
        self.blocks = [block_cls(ch, dtype=self.dtype, name=f"block{i}",
                                 s2d=self.s2d and ch < 128)
                       for i, ch in enumerate(ladder)]
        if self.disc_class:
            self.COND_DNET = DiscCond(ladder[-1], self.class_nums,
                                      dtype=self.dtype, name="COND_DNET")
        else:
            self.COND_DNET = DiscSent(ladder[-1], dtype=self.dtype,
                                      name="COND_DNET")

    def features(self, x):
        x = self.conv_img(x.astype(self.dtype))
        for block in self.blocks:
            x = block(x)
        return x

    def head(self, feat, cond):
        return self.COND_DNET(feat, cond)

    def __call__(self, x, cond):
        return self.head(self.features(x), cond)
