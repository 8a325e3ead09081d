"""DAMSM sentence/word matching losses, fully vectorised.

Rebuilds `sent_loss` / `words_loss` / `func_attention` (reference
`miscc/DAMSM_losses.py:17-343`). The reference computes `words_loss` with a
Python loop over the batch, calling `func_attention` once per sample — an
O(B) sequence of small kernels that is the single slowest part of its G
update (SURVEY.md §3.1). Here the whole thing is one batched einsum chain
over the (image, text) pair grid, which XLA maps straight onto the MXU.

Layout convention: words are time-minor (B, L, D) and image regions are
(B, S, D) with S = 17*17 (the reference uses channel-major (B, D, L)).

Semantics preserved exactly, including the reference's quirky double
softmax in `func_attention` (softmax over words of the raw logits, then
multiply the *probabilities* by gamma1 and softmax over regions —
reference `DAMSM_losses.py:42-54`) and the same-class masking of the
similarity grids.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def cross_entropy_int(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy with integer labels (torch nn.CrossEntropyLoss)."""
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    ll = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(logz - ll)


def same_class_mask(class_ids: jnp.ndarray) -> jnp.ndarray:
    """mask[i, j] = True where j is a *different* sample of the same class.

    Reference `DAMSM_losses.py:237-245`: such pairs are excluded from the
    contrastive denominator.
    """
    eq = class_ids[:, None] == class_ids[None, :]
    return eq & ~jnp.eye(class_ids.shape[0], dtype=bool)


def sent_loss(cnn_code: jnp.ndarray, rnn_code: jnp.ndarray,
              class_ids: Optional[jnp.ndarray], gamma3: float = 10.0,
              eps: float = 1e-8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bidirectional sentence-image contrastive CE (reference `sent_loss`).

    cnn_code, rnn_code: (B, D). Returns (loss0, loss1) — image->text and
    text->image, with diagonal targets.
    """
    b = cnn_code.shape[0]
    scores = cnn_code @ rnn_code.T  # (B, B): [image, text]
    norms = (jnp.linalg.norm(cnn_code, axis=-1, keepdims=True)
             @ jnp.linalg.norm(rnn_code, axis=-1, keepdims=True).T)
    scores = scores / jnp.maximum(norms, eps) * gamma3

    if class_ids is not None:
        scores = jnp.where(same_class_mask(class_ids), NEG_INF, scores)

    labels = jnp.arange(b)
    return cross_entropy_int(scores, labels), cross_entropy_int(scores.T, labels)


def attend_words_to_regions(words: jnp.ndarray, regions: jnp.ndarray,
                            word_mask: jnp.ndarray, gamma1: float
                            ) -> jnp.ndarray:
    """Batched `func_attention` over the full (image, text) grid.

    words:    (Bt, L, D) text word embeddings (zeros at pads)
    regions:  (Bi, S, D) image region features
    word_mask:(Bt, L)    1.0 where the word is valid
    Returns weighted context (Bi, Bt, L, D): for every image/text pair, each
    word's attention-weighted region feature (reference
    `DAMSM_losses.py:25-63`).
    """
    # logits[i, t, s, l] = region[i, s] . word[t, l]
    logits = jnp.einsum("isd,tld->itsl", regions, words)

    # Softmax over words l, masked to each text's true length.
    logits = jnp.where(word_mask[None, :, None, :] > 0, logits, NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1)

    # Reference quirk: multiply the *probabilities* by gamma1, then softmax
    # over regions s (DAMSM_losses.py:53-54).
    attn = jax.nn.softmax(attn * gamma1, axis=2)

    # weighted[i, t, l] = sum_s attn[i, t, s, l] * region[i, s]
    return jnp.einsum("itsl,isd->itld", attn, regions)


def words_loss(region_features: jnp.ndarray, words_emb: jnp.ndarray,
               cap_lens: jnp.ndarray, class_ids: Optional[jnp.ndarray],
               gamma1: float = 5.0, gamma2: float = 5.0, gamma3: float = 10.0,
               eps: float = 1e-8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bidirectional word-region contrastive CE (reference `words_loss`).

    region_features: (B, H, W, D) or (B, S, D); words_emb: (B, L, D);
    cap_lens: (B,). Returns (loss0, loss1).
    """
    if region_features.ndim == 4:
        b, h, w, d = region_features.shape
        regions = region_features.reshape(b, h * w, d)
    else:
        regions = region_features
    b, L = words_emb.shape[0], words_emb.shape[1]
    word_mask = (jnp.arange(L)[None, :] < cap_lens[:, None]).astype(words_emb.dtype)

    wei = attend_words_to_regions(words_emb, regions, word_mask, gamma1)

    # Per-(pair, word) cosine similarity. Norms are computed via a clamped
    # sum-of-squares so padded (all-zero) word vectors get a ZERO gradient
    # instead of the NaN that d||x||/dx produces at x=0 — words are
    # trainable during DAMSM pretraining (training/damsm_trainer.py).
    dots = jnp.einsum("tld,itld->itl", words_emb, wei)
    wn = jnp.sqrt(jnp.maximum(jnp.sum(words_emb ** 2, -1), eps * eps))
    cn = jnp.sqrt(jnp.maximum(jnp.sum(wei ** 2, -1), eps * eps))
    row_sim = dots / jnp.maximum(wn[None] * cn, eps)

    # log-sum-exp word aggregation, only over valid words (Eq. 10).
    row_sim = jnp.exp(row_sim * gamma2) * word_mask[None]
    sims = jnp.log(jnp.maximum(row_sim.sum(axis=-1), eps)) * gamma3  # (Bi, Bt)

    if class_ids is not None:
        sims = jnp.where(same_class_mask(class_ids), NEG_INF, sims)

    labels = jnp.arange(b)
    return cross_entropy_int(sims, labels), cross_entropy_int(sims.T, labels)


def words_similarity(region_features: jnp.ndarray, words_emb: jnp.ndarray,
                     cap_lens: jnp.ndarray, class_ids: Optional[jnp.ndarray],
                     gamma1: float = 5.0, gamma2: float = 5.0,
                     gamma3: float = 10.0, eps: float = 1e-8) -> jnp.ndarray:
    """Score-only words similarity grid (reference `words_similarity`,
    DAMSM_losses.py:168-231): same computation as `words_loss` but returning
    the masked (B_img, B_txt) similarity matrix instead of CE losses."""
    if region_features.ndim == 4:
        b, h, w, d = region_features.shape
        regions = region_features.reshape(b, h * w, d)
    else:
        regions = region_features
    L = words_emb.shape[1]
    word_mask = (jnp.arange(L)[None, :] < cap_lens[:, None]).astype(words_emb.dtype)
    wei = attend_words_to_regions(words_emb, regions, word_mask, gamma1)
    dots = jnp.einsum("tld,itld->itl", words_emb, wei)
    wn = jnp.sqrt(jnp.maximum(jnp.sum(words_emb ** 2, -1), eps * eps))
    cn = jnp.sqrt(jnp.maximum(jnp.sum(wei ** 2, -1), eps * eps))
    row_sim = dots / jnp.maximum(wn[None] * cn, eps)
    row_sim = jnp.exp(row_sim * gamma2) * word_mask[None]
    sims = jnp.log(jnp.maximum(row_sim.sum(axis=-1), eps)) * gamma3
    if class_ids is not None:
        sims = jnp.where(same_class_mask(class_ids), NEG_INF, sims)
    return sims


def global_attention(query_feat: jnp.ndarray, context_key: jnp.ndarray,
                     content_value: jnp.ndarray,
                     mask: Optional[jnp.ndarray] = None):
    """Image-side word attention (reference `GlobalAttentionGeneral`,
    DAMSM_losses.py:65-132 — defined but unused in the reference main path;
    provided for API completeness).

    query_feat:   (B, H, W, D) image features (queries)
    context_key:  (B, S, D) word keys
    content_value:(B, S, D) word values
    mask:         (B, S) True where the word must be ignored
    Returns (weighted (B, H, W, D), attn (B, H, W, S)).
    """
    b, h, w, d = query_feat.shape
    q = query_feat.reshape(b, h * w, d)
    logits = jnp.einsum("bqd,bsd->bqs", q, context_key)
    if mask is not None:
        logits = jnp.where(mask[:, None, :], NEG_INF, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    weighted = jnp.einsum("bqs,bsd->bqd", attn, content_value)
    return (weighted.reshape(b, h, w, d),
            attn.reshape(b, h, w, -1))


def sent_similarity(cnn_code: jnp.ndarray, rnn_code: jnp.ndarray,
                    gamma3: float = 10.0, eps: float = 1e-8) -> jnp.ndarray:
    """Score-only variant (reference `sent_similarity`, DAMSM_losses.py:134-166).

    Used by R-precision: returns the (B_img, B_txt) scaled cosine grid
    without masking or CE.
    """
    scores = cnn_code @ rnn_code.T
    norms = (jnp.linalg.norm(cnn_code, axis=-1, keepdims=True)
             @ jnp.linalg.norm(rnn_code, axis=-1, keepdims=True).T)
    return scores / jnp.maximum(norms, eps) * gamma3
