"""Fused Pallas TPU kernel for the SAGB affine modulation chain.

The generator's per-block non-conv cost — BN-normalise, the mask-gated
text-conditional affine (reference `affine_ssa`, `models.py:43-86`) and the
following ReLU — was measured at 7-21 ms/block fwd+bwd at the flagship
recipe (PERF.md §4b `gprofile_block` rows: ~45-50%% of block time), all of
it bandwidth-bound elementwise work over the high-resolution NHWC maps.
This kernel computes

    out = relu((gamma*mask + 1) * (x - mean)*rsqrt(var + eps) + beta*mask)

in ONE pass over HBM (x read once, out written once; mask/gamma/beta are
lane-broadcast in VMEM), with an optional fused nearest-2x upsample of the
normalised map (`up=True`, the RUNTIME.FUSED_UPSAMPLE schedule where BN
statistics live at the pre-upsample resolution) so the 4x-upsampled
normalised tensor never exists in HBM at all.

The batch statistics stay OUTSIDE the kernel (XLA computes mean/var — one
fused two-moment reduction — and the running-stat update), so the
surrounding `TorchBatchNorm` variable tree and train/eval semantics are
untouched; the kernel replaces only the normalise→upsample→modulate→relu
elementwise chain and is differentiable w.r.t. x, mean, var, gamma, beta
and mask via a custom VJP whose backward is a single Pallas pass producing
dx and the five reduced cotangents together (XLA would issue separate
reduction kernels for each).

Enabled by `RUNTIME.PALLAS_AFFINE` (TPU backend only; the plain module path
is used elsewhere). Math parity vs the module path: tests/test_affine_pallas.py
(interpret mode, fwd + grads); chip gate: validate_affine_chip.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _up2(t):
    """Nearest-2x upsample of a (TH, W, C) tile inside VMEM.

    Broadcast+reshape keeps the lane (C) dimension untouched — the reshape
    class Mosaic supports; the W interleave is a sublane relayout."""
    th, w, c = t.shape
    t = jnp.broadcast_to(t[:, None, :, :], (th, 2, w, c)).reshape(2 * th, w, c)
    return jnp.broadcast_to(t[:, :, None, :],
                            (2 * th, w, 2, c)).reshape(2 * th, 2 * w, c)


def _down2_sum(t):
    """Inverse of `_up2` under summation: (TH, W, C) -> (TH/2, W/2, C)."""
    th, w, c = t.shape
    t = t.reshape(th // 2, 2, w, c).sum(axis=1)
    return t.reshape(th // 2, w // 2, 2, c).sum(axis=2)


def _fwd_kernel(x_ref, mean_ref, var_ref, gamma_ref, beta_ref, mask_ref,
                out_ref, *, up: bool, eps: float):
    x = x_ref[0].astype(jnp.float32)                      # (THl, w, C)
    r = jax.lax.rsqrt(var_ref[:].astype(jnp.float32) + eps)  # (1, C)
    xhat = (x - mean_ref[:].astype(jnp.float32)[None]) * r[None]
    if up:
        xhat = _up2(xhat)                                 # (TH, W, C)
    m = mask_ref[0].astype(jnp.float32)                   # (TH, W, 1)
    gamma = gamma_ref[0].astype(jnp.float32)[None]        # (1, 1, C)
    beta = beta_ref[0].astype(jnp.float32)[None]
    z = (gamma * m + 1.0) * xhat + beta * m
    out_ref[0] = jnp.maximum(z, 0.0).astype(out_ref.dtype)


def _bwd_kernel(x_ref, mean_ref, var_ref, gamma_ref, beta_ref, mask_ref,
                dy_ref, dx_ref, dmask_ref, dgamma_ref, dbeta_ref, dmean_ref,
                dvar_ref, *, up: bool, eps: float):
    """One pass: recompute z from the inputs (no saved forward residuals),
    emit dx/dmask per-block and accumulate the reduced gradients across the
    sequential grid (dgamma/dbeta over row-tiles; dmean/dvar over the whole
    grid)."""
    x = x_ref[0].astype(jnp.float32)                      # (THl, w, C)
    mean = mean_ref[:].astype(jnp.float32)                # (1, C)
    var = var_ref[:].astype(jnp.float32)
    r = jax.lax.rsqrt(var + eps)
    xhat_lo = (x - mean[None]) * r[None]
    xhat = _up2(xhat_lo) if up else xhat_lo               # (TH, W, C)
    m = mask_ref[0].astype(jnp.float32)                   # (TH, W, 1)
    gamma = gamma_ref[0].astype(jnp.float32)[None]        # (1, 1, C)
    beta = beta_ref[0].astype(jnp.float32)[None]
    wgt = gamma * m + 1.0
    z = wgt * xhat + beta * m
    g = dy_ref[0].astype(jnp.float32) * (z > 0)           # relu grad

    gw = g * wgt
    gw_ds = _down2_sum(gw) if up else gw                  # (THl, w, C)
    dx_ref[0] = (gw_ds * r[None]).astype(dx_ref.dtype)
    dmask_ref[0] = jnp.sum(g * (gamma * xhat + beta), axis=-1,
                           keepdims=True).astype(dmask_ref.dtype)

    dgamma = jnp.sum(g * xhat * m, axis=(0, 1))[None, None]  # (1, 1, C)
    dbeta = jnp.sum(g * m, axis=(0, 1))[None, None]
    # Reduce at the HI resolution: sum(gw_ds) == sum(gw) and
    # sum(gw_ds*(x-mean)) == sum(gw*up2(x-mean)) == sum(gw*xhat)/r (up2 is
    # replication; the per-channel r commutes with it), so dvar =
    # -0.5*r^2*sum(gw*xhat). Same math — and Mosaic rejects multi-dim
    # reductions OVER the down-summed value with an invalid-relayout error
    # ('non-singleton logical dimension replicated in destination'), while
    # its elementwise use in dx is fine.
    sum_gw = jnp.sum(gw, axis=(0, 1))[None]
    dmean = -r * sum_gw
    dvar = (-0.5) * r * r * jnp.sum(gw * xhat, axis=(0, 1))[None]

    @pl.when(pl.program_id(1) == 0)
    def _():
        dgamma_ref[:] = jnp.zeros_like(dgamma_ref)
        dbeta_ref[:] = jnp.zeros_like(dbeta_ref)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        dmean_ref[:] = jnp.zeros_like(dmean_ref)
        dvar_ref[:] = jnp.zeros_like(dvar_ref)

    dgamma_ref[:] += dgamma
    dbeta_ref[:] += dbeta
    dmean_ref[:] += dmean
    dvar_ref[:] += dvar


def _tile_rows(H: int, W: int, C: int, up: bool) -> int:
    """Output-row tile: keep the padded fp32 working set well under VMEM.

    The lane dim is C (padded to 128); budget ~2 MB for the output block.
    """
    budget = 1024 * 1024
    row_bytes = W * max(C, 128) * 4
    th = max(1, budget // max(row_bytes, 1))
    th = min(H, 1 << (th.bit_length() - 1))  # power of two <= th
    if up:
        th = max(th, 2)
    return th


def _specs(B, H, W, C, TH, up, mask_dtype, x_dtype, dy=False):
    # Mosaic rule: the last TWO dims of every block must divide (8, 128) or
    # equal the array dims — hence gamma/beta ride as (B, 1, C) with
    # (1, 1, C) blocks, and mean/var as (1, C) full blocks.
    thl, wl = (TH // 2, W // 2) if up else (TH, W)
    in_specs = [
        pl.BlockSpec((1, thl, wl, C), lambda b, h: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda b, h: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda b, h: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C), lambda b, h: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C), lambda b, h: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TH, W, 1), lambda b, h: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if dy:
        in_specs.append(pl.BlockSpec((1, TH, W, C), lambda b, h: (b, h, 0, 0),
                                     memory_space=pltpu.VMEM))
    return in_specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def affine_mask_relu(x, mean, var, gamma, beta, mask, up: bool = False,
                     eps: float = 1e-5, out_dtype=jnp.float32,
                     interpret: bool = False):
    """relu((gamma*mask+1) * normalise(x) + beta*mask), one fused pass.

    x:     (B, h, w, C) raw features (pre-normalise; any float dtype)
    mean:  (C,) / var: (C,) batch or running statistics (fp32)
    gamma: (B, C) / beta: (B, C) per-sample modulation (MLP outputs)
    mask:  (B, H, W, 1) sigmoid mask at the OUTPUT resolution
    up:    nearest-2x upsample the normalised map ((H, W) == (2h, 2w))
    """
    return _affine_fwd_call(x, mean, var, gamma, beta, mask, up, eps,
                            out_dtype, interpret)


def _affine_fwd_call(x, mean, var, gamma, beta, mask, up, eps, out_dtype,
                     interpret):
    B, h, w, C = x.shape
    H, W = (2 * h, 2 * w) if up else (h, w)
    assert mask.shape == (B, H, W, 1), (mask.shape, (B, H, W, 1))
    TH = _tile_rows(H, W, C, up)
    kernel = functools.partial(_fwd_kernel, up=up, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(B, H // TH),
        in_specs=_specs(B, H, W, C, TH, up, mask.dtype, x.dtype),
        out_specs=pl.BlockSpec((1, TH, W, C), lambda b, hh: (b, hh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), out_dtype),
        interpret=interpret,
    )(x, mean.reshape(1, C), var.reshape(1, C), gamma.reshape(B, 1, C),
      beta.reshape(B, 1, C), mask)


def _affine_vjp_fwd(x, mean, var, gamma, beta, mask, up, eps, out_dtype,
                    interpret):
    out = _affine_fwd_call(x, mean, var, gamma, beta, mask, up, eps,
                           out_dtype, interpret)
    return out, (x, mean, var, gamma, beta, mask)


def _affine_vjp_bwd(up, eps, out_dtype, interpret, res, dy):
    x, mean, var, gamma, beta, mask = res
    B, h, w, C = x.shape
    H, W = (2 * h, 2 * w) if up else (h, w)
    TH = _tile_rows(H, W, C, up)
    kernel = functools.partial(_bwd_kernel, up=up, eps=eps)
    dx, dmask, dgamma, dbeta, dmean, dvar = pl.pallas_call(
        kernel,
        grid=(B, H // TH),
        in_specs=_specs(B, H, W, C, TH, up, mask.dtype, x.dtype, dy=True),
        out_specs=(
            pl.BlockSpec((1, TH // 2 if up else TH, W // 2 if up else W, C),
                         lambda b, hh: (b, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, W, 1), lambda b, hh: (b, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, hh: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, hh: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, hh: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, hh: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, h, w, C), x.dtype),
            jax.ShapeDtypeStruct((B, H, W, 1), mask.dtype),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        interpret=interpret,
    )(x, mean.reshape(1, C), var.reshape(1, C), gamma.reshape(B, 1, C),
      beta.reshape(B, 1, C), mask, dy)
    return (dx,
            dmean.reshape(mean.shape).astype(mean.dtype),
            dvar.reshape(var.shape).astype(var.dtype),
            dgamma.reshape(gamma.shape).astype(gamma.dtype),
            dbeta.reshape(beta.shape).astype(beta.dtype),
            dmask)


affine_mask_relu.defvjp(_affine_vjp_fwd, _affine_vjp_bwd)


def affine_mask_relu_reference(x, mean, var, gamma, beta, mask,
                               up: bool = False, eps: float = 1e-5,
                               out_dtype=jnp.float32):
    """Pure-XLA mirror of the kernel math (fp32 internal), for parity tests
    and as documentation of the exact contract."""
    xf = x.astype(jnp.float32)
    r = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    xhat = (xf - mean.astype(jnp.float32)) * r
    if up:
        b, h, w, c = xhat.shape
        xhat = jnp.broadcast_to(xhat[:, :, None, :, None, :],
                                (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)
    m = mask.astype(jnp.float32)
    g = gamma.astype(jnp.float32)[:, None, None, :]
    bt = beta.astype(jnp.float32)[:, None, None, :]
    z = (g * m + 1.0) * xhat + bt * m
    return jnp.maximum(z, 0.0).astype(out_dtype)
