"""Hierarchical explore-then-exploit generator.

Rebuilds the reference `Gen` (reference `models.py:183-256`) TPU-first:

* z(100) -> fc -> 4x4 x 8*ngf seed, then seven SAGB blocks with nearest-2x
  upsampling to 256². Blocks 0-3 ("explore") condition both affine layers on
  the sentence embedding; blocks 4-6 ("exploit") condition the second affine
  on the merged attribute embedding (reference `models.py:233-246`).
* Every block (except the last) predicts a semantic-mask logit map that
  gates the *next* block's affine modulation after a bilinear
  align_corners=True resize + sigmoid (reference `models.py:218-223`).
* Three cumulative blocks fuse the 32->64->128->256 feature ladder, and three
  to-RGB heads emit [img64, img128, img256] (reference `models.py:248-256`).

All tensors are NHWC; the seed reshape keeps torch's channel-major memory
order so reference checkpoints can be imported weight-for-weight.
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from eegan_tpu.models.layers import (
    MaskHead,
    ToImage,
    batch_norm,
    conv1x1,
    conv3x3,
    dense,
    resize_bilinear_align_corners,
    upsample_nearest_2x,
)
from eegan_tpu.ops.upconv import Conv3x3UpFused

Dtype = Any


class AffineSSA(nn.Module):
    """Mask-gated text-conditional affine over BN-normalised features.

    Reference `affine_ssa` (`models.py:43-86`): BN(affine=False), then
    gamma/beta from 2-layer MLPs on the condition (last layer zero-init), and
    ``w = gamma*mask + 1; b = beta*mask; out = w*feat + b``.
    """

    features: int
    hidden: int = 256
    dtype: Dtype = jnp.float32
    # Fused up-path (RUNTIME.FUSED_UPSAMPLE): ``feat`` arrives at the
    # PRE-upsample resolution; BN stats and the per-channel normalise are
    # computed there (nearest-2x replication leaves mean/var bit-identical,
    # and ``n_override`` keeps the unbiased running-var factor at the
    # reference's 4x element count), then the normalised map is upsampled
    # for the spatially-varying mask affine. Exact math, 4x less data
    # through the BN reductions.
    up: bool = False
    # RUNTIME.PALLAS_AFFINE: run normalise + (upsample) + modulate + ReLU as
    # ONE fused Pallas pass (ops/affine_pallas.py). The BN stats/running
    # stats remain in XLA through the same `norm2d` module (identical
    # variable tree); the caller must then NOT apply its own ReLU — the
    # kernel output is already rectified (`fuses_relu`).
    pallas: bool = False

    @property
    def fuses_relu(self) -> bool:
        return self.pallas

    @nn.compact
    def __call__(self, feat, cond, mask, train: bool = True):
        n_override = 4 * feat.shape[0] * feat.shape[1] * feat.shape[2] \
            if self.up else None

        def mlp(name):
            h = dense(self.hidden, dtype=self.dtype, name=f"{name}_linear1")(cond)
            h = nn.relu(h)
            return dense(self.features, dtype=self.dtype, zero_init=True,
                         name=f"{name}_linear2")(h)

        if self.pallas:
            from eegan_tpu.ops.affine_pallas import affine_mask_relu

            mean, var = batch_norm(train, affine=False, name="norm2d",
                                   n_override=n_override,
                                   return_stats=True)(feat)
            # Interpret mode keeps the op runnable on CPU meshes (tests,
            # dryrun); Mosaic compiles it on the TPU backend.
            interpret = jax.default_backend() != "tpu"
            return affine_mask_relu(
                feat, mean, var, mlp("fc_gamma"), mlp("fc_beta"),
                mask.astype(self.dtype), self.up, 1e-5, self.dtype,
                interpret)

        feat = batch_norm(train, affine=False, name="norm2d",
                          n_override=n_override)(feat)
        feat = feat.astype(self.dtype)
        if self.up:
            feat = upsample_nearest_2x(feat)

        gamma = mlp("fc_gamma")[:, None, None, :]  # (B,1,1,C)
        beta = mlp("fc_beta")[:, None, None, :]
        mask = mask.astype(self.dtype)  # (B,H,W,1)
        weight = gamma * mask + 1.0
        bias = beta * mask
        return weight * feat + bias


class SAGBBlock(nn.Module):
    """Spatial Affine Generative Block (reference `SAGB_Block`, models.py:89-126).

    residual = c2(relu(affine2(c1(relu(affine1(x, cond1, m))), cond2, m)))
    out      = shortcut(x) + gamma * residual      (gamma scalar, zero-init)
    mask     = MaskHead(out) if pred_mask

    The inter-block nearest-2x upsample and the mask-logit resize+sigmoid
    (reference ``models.py:218-223``) live INSIDE the block (``up=True``)
    rather than between blocks, so that under ``nn.remat`` the saved
    residual is the 4x-smaller PRE-upsample feature map and the upsample
    broadcast is recomputed in the backward — at batch 192 the between-
    blocks form kept a 2.0 GB padded 6-D broadcast temp live per
    high-resolution block (the dominant OOM allocation). Takes the RAW
    mask logits; identical math.
    """

    out_ch: int
    pred_mask: bool = True
    dtype: Dtype = jnp.float32
    up: bool = False  # nearest-2x upsample the input inside the block
    s2d: bool = False  # space-to-depth conv lowering (RUNTIME.S2D_CONVS)
    # Fused up-path (RUNTIME.FUSED_UPSAMPLE): BN stats/normalise and the
    # 1x1 shortcut run at the PRE-upsample resolution (both commute exactly
    # with nearest-2x replication); only the mask affine, relus and 3x3
    # convs touch the 4x tensor. Identical math, no standalone upsampled
    # copy of the input in HBM.
    up_fused: bool = False
    # RUNTIME.PALLAS_AFFINE: fused affine+mask+ReLU Pallas kernel in both
    # affine layers (the kernel output is already rectified).
    pallas_affine: bool = False

    @nn.compact
    def __call__(self, feat, cond1, cond2, mask_logits, train: bool = True):
        fused = self.up and self.up_fused
        in_ch = feat.shape[-1]
        if self.up and not fused:
            feat = upsample_nearest_2x(feat)
        hi_hw = ((feat.shape[1] * 2, feat.shape[2] * 2) if fused
                 else feat.shape[1:3])
        m = resize_bilinear_align_corners(mask_logits, hi_hw)
        mask = nn.sigmoid(m)

        affine1 = AffineSSA(in_ch, dtype=self.dtype, up=fused,
                            pallas=self.pallas_affine, name="affine1")
        h = affine1(feat, cond1, mask, train)
        if not affine1.fuses_relu:
            h = nn.relu(h)
        h = conv3x3(self.out_ch, dtype=self.dtype, name="c1", s2d=self.s2d)(h)
        affine2 = AffineSSA(self.out_ch, dtype=self.dtype,
                            pallas=self.pallas_affine, name="affine2")
        h = affine2(h, cond2, mask, train)
        if not affine2.fuses_relu:
            h = nn.relu(h)
        h = conv3x3(self.out_ch, dtype=self.dtype, name="c2", s2d=self.s2d)(h)

        sc = feat
        if in_ch != self.out_ch:
            # conv1x1 is per-pixel: computing it pre-upsample is exact and
            # 4x cheaper at the ladder's lane-starved widths.
            sc = conv1x1(self.out_ch, use_bias=True, dtype=self.dtype, name="c_sc")(sc)
        if fused:
            sc = upsample_nearest_2x(sc.astype(self.dtype))

        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        out = sc + gamma.astype(self.dtype) * h

        new_mask = None
        if self.pred_mask:
            new_mask = MaskHead(dtype=self.dtype, name="conv_mask")(out, train)
        return out, new_mask


class CumBlock(nn.Module):
    """Cumulative fusion block (reference `Cum_Block`, models.py:129-143)."""

    cur_ch: int
    dtype: Dtype = jnp.float32
    s2d: bool = False  # space-to-depth conv lowering (RUNTIME.S2D_CONVS)
    # Fused up-path (RUNTIME.FUSED_UPSAMPLE): up_conv3 directly follows the
    # nearest-2x upsample, so it lowers EXACTLY to a low-res conv with the
    # parity-packed kernel + depth_to_space (ops/upconv.py) — same FLOPs,
    # 4*cur_ch output lanes, no 4x intermediate. Param tree unchanged.
    up_fused: bool = False

    @nn.compact
    def __call__(self, prev_feat, cur_feat):
        h = conv1x1(self.cur_ch, dtype=self.dtype, name="up_conv1")(prev_feat)
        if self.up_fused:
            h = Conv3x3UpFused(self.cur_ch, dtype=self.dtype,
                               name="up_conv3")(h)
        else:
            h = upsample_nearest_2x(h)
            h = conv3x3(self.cur_ch, dtype=self.dtype, name="up_conv3",
                        s2d=self.s2d)(h)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        fused = h + cur_feat * gamma.astype(self.dtype)
        return conv3x3(self.cur_ch, dtype=self.dtype, name="fuse",
                       s2d=self.s2d)(fused)


class Generator(nn.Module):
    """Reference `Gen` (models.py:183-256), NHWC / TPU-native.

    ``remat=True`` (config ``RUNTIME.REMAT``) checkpoints each SAGB block:
    its internals are recomputed in the backward pass instead of keeping the
    per-block activations live, trading ~1 extra block forward of FLOPs for
    most of the generator's activation HBM — the lever for growing batch or
    GF_DIM past HBM (`jax.checkpoint` through flax's lifted ``nn.remat``).
    """

    ngf: int = 32
    nz: int = 100
    dtype: Dtype = jnp.float32
    remat: bool = False
    # Space-to-depth lowering for the narrow (Cout < 128) high-res convs
    # (RUNTIME.S2D_CONVS): identical math, full MXU lanes — see
    # eegan_tpu/ops/s2d_conv.py. Applied only where Cout is lane-starved.
    s2d: bool = False
    # Fused up-path (RUNTIME.FUSED_UPSAMPLE): exact-math rewrites that keep
    # the nearest-2x upsample out of HBM — pre-upsample BN stats/shortcut in
    # the SAGB blocks, subpixel (low-res, 4x-channel) up_conv3 in the Cum
    # blocks. See ops/upconv.py.
    up_fused: bool = False
    # RUNTIME.PALLAS_AFFINE: fused affine+mask+ReLU kernel in the SAGB
    # blocks (ops/affine_pallas.py).
    pallas_affine: bool = False
    # RUNTIME.REMAT_BLOCKS: with remat on, checkpoint only these SAGB block
    # indices / "cum" (comma list); "" = all (see config.py).
    remat_blocks: str = ""

    def _remat_wanted(self, key) -> bool:
        if not self.remat:
            return False
        if not self.remat_blocks:
            return True
        return str(key) in {t.strip() for t in self.remat_blocks.split(",")}

    @nn.compact
    def __call__(self, z, sent, attrs, train: bool = True
                 ) -> List[jnp.ndarray]:
        ngf = self.ngf
        b = z.shape[0]
        # static_argnums counts the bound method's args with self at 0, so
        # `train` (a python bool) is arg 5 of (self, feat, c1, c2, mask, train).
        RematBlock = nn.remat(SAGBBlock, static_argnums=(5,))

        def Block(*args, block_ix: int, **kw):
            cls = RematBlock if self._remat_wanted(block_ix) else SAGBBlock
            return cls(*args, **kw)

        Cum = nn.remat(CumBlock) if self._remat_wanted("cum") else CumBlock
        sent = sent.astype(self.dtype)
        attrs = attrs.astype(self.dtype)

        out = dense(ngf * 8 * 4 * 4, dtype=self.dtype, name="fc")(z.astype(self.dtype))
        # torch view(B, 8*ngf, 4, 4) is channel-major; transpose to NHWC so a
        # converted reference checkpoint reproduces identical activations.
        out = out.reshape(b, ngf * 8, 4, 4).transpose(0, 2, 3, 1)

        # Blocks take the RAW mask logits; the align-corners resize to the
        # block's (post-upsample) resolution + sigmoid happen inside (for
        # block0 the resize is the identity: 4x4 logits, 4x4 features).
        stage_mask = MaskHead(dtype=self.dtype, name="init_mask")(out, train)

        chans = [ngf * 8, ngf * 8, ngf * 8, ngf * 8, ngf * 4, ngf * 2, ngf * 1]

        def s2d(ch: int) -> bool:
            # Only lane-starved convs benefit; full-width ones lose the
            # 16/9 FLOP premium for nothing.
            return self.s2d and ch < 128

        out, stage_mask = Block(chans[0], True, dtype=self.dtype,
                                s2d=s2d(chans[0]),
                                pallas_affine=self.pallas_affine,
                                block_ix=0, name="block0")(
            out, sent, sent, stage_mask, train)

        # Explore stage: blocks 1-3 at 8/16/32, conditioned on [sent, sent].
        for ix in range(3):
            out, stage_mask = Block(
                chans[ix + 1], True, dtype=self.dtype, up=True,
                s2d=s2d(chans[ix + 1]), up_fused=self.up_fused,
                pallas_affine=self.pallas_affine,
                block_ix=ix + 1, name=f"block{ix + 1}")(out, sent, sent, stage_mask, train)

        x_32 = out
        # Exploit stage: blocks 4-6 at 64/128/256, conditioned on [sent, attrs].
        feats = {}
        for ix, scale in enumerate((64, 128, 256)):
            pred = scale != 256
            out, new_mask = Block(
                chans[ix + 4], pred, dtype=self.dtype, up=True,
                s2d=s2d(chans[ix + 4]), up_fused=self.up_fused,
                pallas_affine=self.pallas_affine,
                block_ix=ix + 4, name=f"block{ix + 4}")(out, sent, attrs, stage_mask, train)
            if pred:
                stage_mask = new_mask
            feats[scale] = out

        cum_64 = Cum(ngf * 4, dtype=self.dtype, s2d=s2d(ngf * 4),
                     up_fused=self.up_fused,
                     name="cum_64")(x_32, feats[64])
        cum_128 = Cum(ngf * 2, dtype=self.dtype, s2d=s2d(ngf * 2),
                      up_fused=self.up_fused,
                      name="cum_128")(cum_64, feats[128])
        cum_256 = Cum(ngf * 1, dtype=self.dtype, s2d=s2d(ngf * 1),
                      up_fused=self.up_fused,
                      name="cum_256")(cum_128, feats[256])

        img_64 = ToImage(dtype=self.dtype, name="get_image_64")(cum_64, train)
        img_128 = ToImage(dtype=self.dtype, name="get_image_128")(cum_128, train)
        img_256 = ToImage(dtype=self.dtype, name="get_image_256")(cum_256, train)

        return [img_64.astype(jnp.float32),
                img_128.astype(jnp.float32),
                img_256.astype(jnp.float32)]
