"""Adversarial losses: hinge + mismatch + class BCE + MAGP.

Rebuilds the loss math of `Trainer.d_loss / d_loss_class / MA_gradient_penalty
/ g_loss / g_loss_class` (reference `train.py:336-417`) as pure functions.
The discriminator forward passes themselves live in the train step (they need
apply-fns and params); here is only the arithmetic, so it is unit-testable
against tiny oracles.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def hinge_real(out: jnp.ndarray) -> jnp.ndarray:
    """relu(1 - D(x)).mean() — real-pair branch (reference train.py:342)."""
    return nn.relu(1.0 - out).mean()


def hinge_fake(out: jnp.ndarray) -> jnp.ndarray:
    """relu(1 + D(x)).mean() — fake- and mismatched-pair branches."""
    return nn.relu(1.0 + out).mean()


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """torch F.binary_cross_entropy_with_logits (mean reduction)."""
    neg_abs = -jnp.abs(logits)
    loss = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(neg_abs))
    return loss.mean()


def d_hinge_total(err_real: jnp.ndarray, err_fake: jnp.ndarray,
                  err_unpair: jnp.ndarray) -> jnp.ndarray:
    """real + (fake + unpair) / 2 (reference train.py:450)."""
    return err_real + (err_fake + err_unpair) / 2.0


def magp_from_grads(grad_img: jnp.ndarray, grad_sent: jnp.ndarray) -> jnp.ndarray:
    """Matching-aware gradient penalty from input-grads.

    Reference `MA_gradient_penalty` (train.py:378-402): concatenate the
    flattened grads w.r.t. (image, sentence embedding), take the per-sample
    L2 norm, and return 2 * mean(norm^6).
    """
    b = grad_img.shape[0]
    g = jnp.concatenate(
        [grad_img.reshape(b, -1).astype(jnp.float32),
         grad_sent.reshape(b, -1).astype(jnp.float32)], axis=1)
    norm = jnp.sqrt(jnp.sum(g ** 2, axis=1))
    return 2.0 * jnp.mean(norm ** 6)


def one_hot_class_labels(class_ids: jnp.ndarray, class_num: int) -> jnp.ndarray:
    """Multi-label-style one-hot targets (reference prepare_class_labels,
    train.py:99-103 — note class ids are 1-based there)."""
    return nn.one_hot(class_ids - 1, class_num, dtype=jnp.float32)
