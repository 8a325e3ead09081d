"""Fused Pallas TPU kernel for DAMSM word-region similarity.

The words-loss similarity grid (losses/damsm.py `words_loss`) materialises
an O(B_img · B_txt · S · L) attention tensor twice plus an
O(B_img · B_txt · L · D) weighted-context tensor in HBM — at large batch
this is gigabytes of traffic (B=256: ~1.5 GB per materialisation). This
kernel computes a (1 image) x (TILE_T texts) block of the (B_img, B_txt)
grid per program with every intermediate resident in VMEM:

    A     = R_i @ W_tile^T                    (S_pad, TILE_T*L_pad)   MXU
    a1    = groupwise softmax over words l    (per-text lane groups)
    a2    = softmax over regions s            (sublane axis)
    C     = a2^T @ R_i                        (TILE_T*L_pad, D)       MXU
    sims  = log(group-sum(mask * exp(gamma2 * cos(W, C))))

Group reductions over the per-text lane/sublane blocks are expressed as
matmuls against constant block-diagonal 0/1 matrices (MXU-friendly; Mosaic
cannot reshape the minor dimension). Softmax-over-words stability combines
the per-row global max with a matmul-computable per-group log-sum-exp bound
(constant within each group, hence softmax-exact — see the kernel body).
The reference's double-softmax quirk is preserved: gamma1 multiplies the
*probabilities*, not the logits (reference `miscc/DAMSM_losses.py:42-54`).

Forward-only: training keeps the XLA path (it needs grads w.r.t. the region
features); evaluation-side scoring (`words_similarity`) can use this kernel.
Parity vs the XLA path: tests/test_pallas.py (interpret mode) and the
hardware check in bench_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(r_ref, w_ref, mask_row_ref, mask_col_ref, bd_ref, gsum_ref,
            out_ref, *, S: int, gamma1: float, gamma2: float, eps: float):
    """One (image, text-tile) block per program.

    r_ref:        (1, S_pad, D)     image i's regions (zero-padded rows)
    w_ref:        (TL, D)           tile's words, flattened (TL = TILE_T*L_pad)
    mask_row_ref: (1, TL)           word-valid mask, lane layout
    mask_col_ref: (TL, 1)           word-valid mask, sublane layout
    bd_ref:       (TL, TL)          block-diagonal ones (same-text pairs)
    gsum_ref:     (TILE_T, TL)      per-text row-sum matrix
    out_ref:      (1, TILE_T, 1)
    """
    R = r_ref[0]  # (S_pad, D)
    W = w_ref[:]  # (TL, D)
    mask_row = mask_row_ref[:]  # (1, TL)

    # --- attention logits on the MXU ---------------------------------
    A = jax.lax.dot_general(R, W, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (S_pad, TL)

    # --- groupwise softmax over words l ------------------------------
    # Stabiliser must be constant within each text's lane group. The
    # per-row global max alone underflows groups sitting far below the row
    # max, so refine it with a matmul-computable per-group bound: with
    # temperature c, c*log(group_sum(exp((A - rowmax)/c))) lies within
    # [group_max, group_max + c*log(L)] of the true group max — softmax-exact
    # at fp32 for any term within ~88-c*log(L) of its group max.
    A = jnp.where(mask_row > 0, A, NEG_INF)
    A = A - jnp.max(A, axis=1, keepdims=True)
    c = 16.0
    Ehat = jnp.exp(A * (1.0 / c))
    S1 = jax.lax.dot_general(Ehat, bd_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    group_bound = c * jnp.log(jnp.maximum(S1, 1e-30))  # (S_pad, TL), per-group
    E = jnp.exp(A - group_bound)
    group_sums = jax.lax.dot_general(  # per-group sum, broadcast to lanes
        E, bd_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    attn1 = E / jnp.maximum(group_sums, 1e-30)

    # --- reference quirk: scale the probabilities, softmax over s ----
    s_valid = jax.lax.broadcasted_iota(jnp.int32, A.shape, 0) < S
    G = jnp.where(s_valid, attn1 * gamma1, NEG_INF)
    G = G - jnp.max(G, axis=0, keepdims=True)
    E2 = jnp.exp(G)
    attn2 = E2 / jnp.maximum(jnp.sum(E2, axis=0, keepdims=True), eps)

    # --- weighted context on the MXU ---------------------------------
    C = jax.lax.dot_general(attn2, R, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (TL, D)

    # --- cosine + masked exp / per-text log-sum ----------------------
    dots = jnp.sum(W * C, axis=1, keepdims=True)  # (TL, 1)
    wn = jnp.sqrt(jnp.sum(W * W, axis=1, keepdims=True))
    cn = jnp.sqrt(jnp.sum(C * C, axis=1, keepdims=True))
    cos = dots / jnp.maximum(wn * cn, eps)
    row = jnp.exp(cos * gamma2) * mask_col_ref[:]  # (TL, 1)
    sums = jax.lax.dot_general(  # (TILE_T, 1)
        gsum_ref[:], row, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log(jnp.maximum(sums, eps))


@functools.partial(jax.jit,
                   static_argnames=("gamma1", "gamma2", "interpret", "tile_t"))
def words_similarity_fused(regions: jnp.ndarray, words: jnp.ndarray,
                           cap_lens: jnp.ndarray, gamma1: float = 5.0,
                           gamma2: float = 5.0, interpret: bool = False,
                           tile_t: int = 32) -> jnp.ndarray:
    """Fused (B_img, B_txt) word-region log-similarity (unscaled by gamma3).

    regions: (Bi, S, D) float32; words: (Bt, L, D); cap_lens: (Bt,).
    """
    Bi, S, D = regions.shape
    Bt, L, _ = words.shape
    S_pad = _round_up(S, 8)
    L_pad = _round_up(L, 8)
    TT = min(tile_t, _round_up(Bt, 8))
    Bt_pad = _round_up(Bt, TT)
    TL = TT * L_pad

    r = jnp.pad(regions.astype(jnp.float32), ((0, 0), (0, S_pad - S), (0, 0)))
    w = jnp.pad(words.astype(jnp.float32),
                ((0, Bt_pad - Bt), (0, L_pad - L), (0, 0)))
    w_flat = w.reshape(Bt_pad * L_pad, D)
    lens = jnp.pad(cap_lens, (0, Bt_pad - Bt), constant_values=1)
    mask = (jnp.arange(L_pad)[None, :] < lens[:, None]).astype(jnp.float32)
    mask_flat = mask.reshape(1, Bt_pad * L_pad)

    # Constant group matrices (per tile, identical across tiles).
    groups = np.repeat(np.arange(TT), L_pad)
    bd = jnp.asarray((groups[:, None] == groups[None, :]), jnp.float32)
    gsum = jnp.asarray((np.arange(TT)[:, None] == groups[None, :]), jnp.float32)

    kernel = functools.partial(_kernel, S=S, gamma1=gamma1, gamma2=gamma2,
                               eps=1e-8)
    out = pl.pallas_call(
        kernel,
        grid=(Bi, Bt_pad // TT),
        in_specs=[
            pl.BlockSpec((1, S_pad, D), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TL, D), lambda i, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TL), lambda i, t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TL, 1), lambda i, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TL, TL), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TT, TL), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TT, 1), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bi, Bt_pad, 1), jnp.float32),
        interpret=interpret,
    )(r, w_flat, mask_flat, mask_flat.reshape(-1, 1), bd, gsum)
    return out[:, :Bt, 0]


def words_similarity_pallas(region_features: jnp.ndarray,
                            words_emb: jnp.ndarray, cap_lens: jnp.ndarray,
                            class_ids=None, gamma1: float = 5.0,
                            gamma2: float = 5.0, gamma3: float = 10.0,
                            interpret: bool = False) -> jnp.ndarray:
    """Drop-in for `losses.damsm.words_similarity` using the fused kernel."""
    from eegan_tpu.losses.damsm import same_class_mask

    if region_features.ndim == 4:
        b, h, w_, d = region_features.shape
        region_features = region_features.reshape(b, h * w_, d)
    sims = words_similarity_fused(region_features, words_emb, cap_lens,
                                  gamma1, gamma2, interpret=interpret) * gamma3
    if class_ids is not None:
        sims = jnp.where(same_class_mask(class_ids), NEG_INF, sims)
    return sims
