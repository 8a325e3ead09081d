"""Space-to-depth 3x3 convolution: full MXU lanes for narrow-channel convs.

Why
---
The generator's high-resolution blocks (and the cumulative-fusion tail)
have 32-64 output channels (reference `models.py:233-256` ladder at
GF_DIM=32).  A 3x3 NHWC conv lowers to a matmul with the *output channels
on the 128-lane MXU minor dimension*, so Cout=32 fills 1/4 of the lanes
and Cout=64 fills 1/2 — measured 26.9 TFLOP/s for the generator stack at
batch 32 vs 58.8 at batch 128 (PERF.md §4).  The batch-32 recipe cannot
change Cout, but the *layout* can: a 3x3 stride-1 conv on (H, W, C) is
exactly a 4x4 stride-2 conv producing the space-to-depth-packed output
(H/2, W/2, 4*Cout) — the classic MLPerf space-to-depth trick, applied at
the output instead of the input.

    y[2i+di, 2j+dj, k] = sum_{u,v,c} W[u,v,c,k] * x[2i+di+u-1, 2j+dj+v-1, c]

Group the four output sub-positions (di, dj) into channels:

    y_p[i, j, (di,dj,k)] = sum_{u',v',c} W'[u',v',c,(di,dj,k)]
                            * x_pad[2i+u', 2j+v', c]

with W'[di+u, dj+v, c, (di,dj,k)] = W[u,v,c,k] (zero elsewhere), pad
(1, 2) per spatial dim, stride 2.  Each packed output element is the SAME
sum of 9*Cin products (plus exact-zero products from the structural
zeros), so the op is mathematically identical to the stride-1 conv up to
floating-point summation order.  The matmul view becomes

    (B*H*W/4, 16*Cin) @ (16*Cin, 4*Cout)

— for Cout=32: 128 output lanes (full) and a 512-deep reduction, at
16/9 = 1.78x the FLOPs.  Net on the MXU: up to 4x density for 1.78x work.
The backward pass wins the same way: the weight-gradient matmul's output
tile grows from (9*Cin, Cout) to (16*Cin, 4*Cout).

The module exposes the SAME parameter pytree as ``nn.Conv`` ({"kernel":
(3, 3, Cin, Cout)} [+ "bias"]), so checkpoints, torch weight conversion
and the torch-oracle parity tests are layout-blind; the packing is pure
forward-pass plumbing that JAX differentiates through (its transpose is a
gather — negligible against the conv).

Replaces nothing in the reference — the reference's torch convs
(`models.py:17-23`) pick layouts inside cuDNN; on TPU the layout is the
program, so this IS the tuning surface.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

Dtype = Any


def pack_kernel_s2d(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Cin,Cout) -> (4,4,Cin,4*Cout) packed stride-2 kernel.

    Packed output channel index is (di*2 + dj)*Cout + k, matching
    :func:`unpack_s2d`'s reshape order.
    """
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3), kernel.shape
    packed = jnp.zeros((4, 4, cin, 4, cout), dtype=kernel.dtype)
    for di in range(2):
        for dj in range(2):
            packed = packed.at[di:di + 3, dj:dj + 3, :, di * 2 + dj, :].set(kernel)
    return packed.reshape(4, 4, cin, 4 * cout)


def unpack_s2d(y: jnp.ndarray, cout: int) -> jnp.ndarray:
    """(B, H/2, W/2, 4*Cout) packed -> (B, H, W, Cout)."""
    b, hh, hw, _ = y.shape
    y = y.reshape(b, hh, hw, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, hh * 2, hw * 2, cout)


def conv3x3_s2d_apply(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 SAME-pad conv via the packed stride-2 form (H, W even)."""
    cout = kernel.shape[-1]
    packed = pack_kernel_s2d(kernel)
    y = lax.conv_general_dilated(
        x, packed, window_strides=(2, 2), padding=((1, 2), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return unpack_s2d(y, cout)


class Conv3x3S2D(nn.Module):
    """Drop-in for ``conv3x3`` with the space-to-depth-packed lowering.

    Parameter layout is identical to ``nn.Conv`` so the two are freely
    interchangeable per checkpoint; choose at construction time via
    ``eegan_tpu.models.layers.conv3x3(..., s2d=True)``.
    """

    features: int
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        if x.shape[1] % 2 or x.shape[2] % 2:
            raise ValueError(
                f"Conv3x3S2D needs even spatial dims, got {x.shape}")
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (3, 3, cin, self.features), jnp.float32)
        y = conv3x3_s2d_apply(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y
