"""Model bundle construction from a Config.

Mirrors `Trainer.load_networks` (reference `train.py:213-250`) minus the
DataParallel wrapping, which has no TPU equivalent (GSPMD shards the batch
instead).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from eegan_tpu.config import Config
from eegan_tpu.models.attr_enhance import AttrEnhance
from eegan_tpu.models.discriminator import Discriminator
from eegan_tpu.models.generator import Generator
from eegan_tpu.models.image_encoder import ImageEncoder
from eegan_tpu.models.text_encoder import TextEncoder

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}


def compute_dtype(config: Config):
    return _DTYPES[config.RUNTIME.COMPUTE_DTYPE]


def _jax_backend() -> str:
    import jax

    return jax.default_backend()


@dataclasses.dataclass(frozen=True)
class ModelBundle:
    generator: Generator
    attr_enhance: AttrEnhance
    discriminators: Tuple[Discriminator, ...]  # one per branch scale
    text_encoder: TextEncoder
    image_encoder: ImageEncoder
    scales: Tuple[int, ...]


def build_models(config: Config, n_words: int) -> ModelBundle:
    dt = compute_dtype(config)
    scales = tuple(config.imsizes)  # [64, 128, 256]
    discs = []
    for i, s in enumerate(scales):
        use_class = config.TRAIN.USE_CLASS and i == len(scales) - 1
        discs.append(Discriminator(
            ndf=config.GAN.DF_DIM, scale=s, disc_class=use_class,
            class_nums=config.TRAIN.CLASS_NUM, dtype=dt,
            remat=config.RUNTIME.REMAT and config.RUNTIME.REMAT_D,
            s2d=config.RUNTIME.S2D_CONVS))
    return ModelBundle(
        generator=Generator(ngf=config.GAN.GF_DIM, nz=config.GAN.Z_DIM,
                            dtype=dt, remat=config.RUNTIME.REMAT,
                            s2d=config.RUNTIME.S2D_CONVS,
                            up_fused=config.RUNTIME.FUSED_UPSAMPLE,
                            remat_blocks=config.RUNTIME.REMAT_BLOCKS,
                            pallas_affine=(config.RUNTIME.PALLAS_AFFINE
                                           and _jax_backend() == "tpu")),
        attr_enhance=AttrEnhance(ntf=config.TEXT.EMBEDDING_DIM, dtype=dt),
        discriminators=tuple(discs),
        text_encoder=TextEncoder(
            ntoken=n_words, nhidden=config.TEXT.EMBEDDING_DIM,
            rnn_type=config.RNN_TYPE, dtype=dt),
        image_encoder=ImageEncoder(nef=config.TEXT.EMBEDDING_DIM, dtype=dt,
                                   remat=config.RUNTIME.REMAT_IMAGE_ENCODER),
        scales=scales,
    )
