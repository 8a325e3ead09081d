from eegan_tpu.losses.damsm import (
    attend_words_to_regions,
    cross_entropy_int,
    same_class_mask,
    sent_loss,
    sent_similarity,
    words_loss,
)
from eegan_tpu.losses.gan import (
    bce_with_logits,
    d_hinge_total,
    hinge_fake,
    hinge_real,
    magp_from_grads,
    one_hot_class_labels,
)

__all__ = [
    "attend_words_to_regions", "bce_with_logits", "cross_entropy_int",
    "d_hinge_total", "hinge_fake", "hinge_real", "magp_from_grads",
    "one_hot_class_labels", "same_class_mask", "sent_loss",
    "sent_similarity", "words_loss",
]
