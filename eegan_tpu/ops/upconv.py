"""Fused nearest-2x-upsample + 3x3 convolution (subpixel lowering).

Why
---
The generator's up-path (reference `models.py:218-223` upsample + the
`Cum_Block` ladder, `models.py:129-143`) nearest-2x-upsamples a feature
map and then convolves it.  On TPU that shape is doubly wasteful:

* the 4x-larger upsampled tensor is materialised in HBM just to be read
  back by the conv (bandwidth — the scarcest resource at 256², PERF.md
  §4b), and
* the conv runs at the HIGH resolution with the ladder's NARROW channel
  counts (Cout=32/64 -> 1/4-1/2 full MXU output lanes, PERF.md §4).

But a 3x3 stride-1 conv applied to a nearest-2x upsample is EXACTLY a
3-tap-summed conv on the LOW-resolution input.  With y = up2(x),
y[u, v] = x[floor(u/2), floor(v/2)]:

    z[2i+dh, 2j+dw] = sum_{ki,kj} W[ki, kj] * y[2i+dh+ki-1, 2j+dw+kj-1]
                    = sum_{ki,kj} W[ki, kj] * x[i + m_dh(ki), j + m_dw(kj)]

where the per-parity index maps collapse three high-res taps onto two
low-res ones:  m_0 = {0 -> -1, 1 -> 0, 2 -> 0},  m_1 = {0 -> 0, 1 -> 0,
2 -> +1}.  Folding the collapsed taps (W[1]+W[2] for parity 0, W[0]+W[1]
for parity 1, per axis) gives four 3x3 kernels — one per output parity
(dh, dw) — that run on x directly:

    z_packed[i, j, (dh*2+dw)*Cout + k] = conv3x3(x, W'_{dh,dw})[i, j, k]
    z = depth_to_space_2x(z_packed)

Identical math up to float summation order (the fold adds kernel WEIGHTS,
which the high-res conv adds as products of equal activations), at the
same FLOP count — but the conv now runs at the low resolution with
4*Cout output channels: full 128 lanes at Cout=32, no 4x intermediate in
HBM, and the backward's dW/dx matmuls densify the same way.  This is the
shape XLA cannot recover on its own: the upsample is a broadcast-reshape
it will not fold through a convolution.

The module exposes the SAME parameter pytree as ``nn.Conv`` ({"kernel":
(3, 3, Cin, Cout)} [+ "bias"]), so checkpoints, torch weight conversion
and the torch-oracle parity tests are layout-blind; packing is pure
forward plumbing JAX differentiates through.

Replaces nothing in the reference — torch's `F.interpolate` + `Conv2d`
pair picks layouts inside cuDNN; on TPU the layout is the program.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from eegan_tpu.models.layers import torch_kernel_init

Dtype = Any

# A[dh][u, ki] = 1 iff high-res tap ki of parity dh lands on low-res
# offset u-1 (u in {0,1,2} <-> offsets {-1,0,+1}).
_FOLD = np.zeros((2, 3, 3), np.float32)
_FOLD[0, 0, 0] = 1.0  # parity 0: tap 0 -> offset -1
_FOLD[0, 1, 1] = 1.0  # parity 0: taps 1,2 -> offset 0
_FOLD[0, 1, 2] = 1.0
_FOLD[1, 1, 0] = 1.0  # parity 1: taps 0,1 -> offset 0
_FOLD[1, 1, 1] = 1.0
_FOLD[1, 2, 2] = 1.0  # parity 1: tap 2 -> offset +1


def pack_kernel_upconv(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Cin,Cout) -> (3,3,Cin,4*Cout) parity-packed low-res kernel.

    Packed output channel index is (dh*2 + dw)*Cout + k, matching
    :func:`depth_to_space_2x`'s reshape order.
    """
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3), kernel.shape
    fold = jnp.asarray(_FOLD, kernel.dtype)
    # W'[dh,dw,u,v,c,k] = sum_{ki,kj} A[dh,u,ki] A[dw,v,kj] W[ki,kj,c,k]
    packed = jnp.einsum("huk,wvl,klco->uvchwo", fold, fold, kernel)
    return packed.reshape(3, 3, cin, 4 * cout)


def depth_to_space_2x(y: jnp.ndarray, cout: int) -> jnp.ndarray:
    """(B, H, W, 4*Cout) parity-major packed -> (B, 2H, 2W, Cout)."""
    b, h, w, _ = y.shape
    y = y.reshape(b, h, w, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, h * 2, w * 2, cout)


def upconv3x3_apply(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """conv3x3(upsample_nearest_2x(x), kernel), computed at low resolution.

    ``x``: (B, H, W, Cin) low-res input; ``kernel``: (3, 3, Cin, Cout)
    stride-1 kernel for the HIGH-res conv.  Returns (B, 2H, 2W, Cout).
    """
    cout = kernel.shape[-1]
    packed = pack_kernel_upconv(kernel)
    y = jnp.asarray(
        nn.Conv(
            features=4 * cout, kernel_size=(3, 3), strides=(1, 1),
            padding=((1, 1), (1, 1)), use_bias=False,
        ).apply({"params": {"kernel": packed}}, x)
    )
    return depth_to_space_2x(y, cout)


class Conv3x3UpFused(nn.Module):
    """``conv3x3(features)(upsample_nearest_2x(x))`` as one low-res conv.

    Parameter pytree is identical to the plain ``conv3x3`` module
    ({"kernel": (3, 3, Cin, Cout)} [+ "bias"]) so the lowering is
    checkpoint- and oracle-invisible (cf. reference `models.py:129-143`,
    where `Cum_Block` upsamples then convolves).
    """

    features: int
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init,
                            (3, 3, cin, self.features), jnp.float32)
        x = x.astype(self.dtype)
        out = upconv3x3_apply(x, kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.features,), jnp.float32)
            out = out + bias.astype(self.dtype)
        return out
