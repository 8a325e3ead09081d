"""Attribute-enhance module.

Rebuilds `ATTR_Enhance` (reference `models.py:146-180`): single-head
self-attention over the token set [sentence ++ attr_1..attr_N] with Q/K/V
linears. Quirk kept on purpose (trained checkpoints depend on it): the
1/sqrt(d) scale is applied *after* the softmax, not to the logits
(reference `models.py:166`).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from eegan_tpu.models.layers import dense

Dtype = Any


class AttrEnhance(nn.Module):
    ntf: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, sent, attrs) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """sent (B, ntf), attrs (B, A, ntf) -> (attn_sent, attn_attrs)."""
        x = jnp.concatenate([sent[:, None, :], attrs], axis=1).astype(self.dtype)
        q = dense(self.ntf, dtype=self.dtype, name="attr_query")(x)
        k = dense(self.ntf, dtype=self.dtype, name="attr_key")(x)
        v = dense(self.ntf, dtype=self.dtype, name="attr_value")(x)

        logits = jnp.einsum("bqd,bkd->bqk", q, k)
        # NB: scale applied after softmax — reference models.py:166.
        attn = nn.softmax(logits, axis=-1) * (1.0 / jnp.sqrt(float(self.ntf)))
        attn_attrs = jnp.einsum("bqk,bkd->bqd", attn, v)
        attn_sent = attn_attrs[:, 0, :]
        return attn_sent, attn_attrs

    @staticmethod
    def attr_merge(attn_attrs: jnp.ndarray) -> jnp.ndarray:
        """Sum over tokens (reference `attr_merge` method 1, models.py:171-180)."""
        return attn_attrs.sum(axis=1)
