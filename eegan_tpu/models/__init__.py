from eegan_tpu.models.attr_enhance import AttrEnhance
from eegan_tpu.models.discriminator import DiscCond, Discriminator, DiscSent, ResDown
from eegan_tpu.models.generator import AffineSSA, CumBlock, Generator, SAGBBlock
from eegan_tpu.models.image_encoder import ImageEncoder
from eegan_tpu.models.inception import InceptionV3
from eegan_tpu.models.text_encoder import TextEncoder

__all__ = [
    "AffineSSA", "AttrEnhance", "CumBlock", "DiscCond", "DiscSent",
    "Discriminator", "Generator", "ImageEncoder", "InceptionV3", "ResDown",
    "SAGBBlock", "TextEncoder",
]
