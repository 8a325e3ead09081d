"""Loss oracles: vectorised DAMSM vs naive per-sample numpy, GAN math vs torch."""

import numpy as np
import pytest

import jax.numpy as jnp

from eegan_tpu.losses import (
    bce_with_logits,
    d_hinge_total,
    hinge_fake,
    hinge_real,
    magp_from_grads,
    one_hot_class_labels,
    sent_loss,
    words_loss,
)

B, L, S, D = 6, 7, 9, 16
G1, G2, G3 = 5.0, 5.0, 10.0


def _softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def naive_words_similarity(regions, words, lens):
    """Straight transcription of the documented words_loss semantics:
    for each text i, attend its first len_i words over every image's regions
    (double softmax with the post-softmax gamma1 scale), cosine per word,
    exp/sum/log aggregate. Returns (B_img, B_txt) similarity grid."""
    sims = np.zeros((B, B))
    for i in range(B):  # text index
        n = lens[i]
        word = words[i, :n]  # (n, D)
        for j in range(B):  # image index
            ctx = regions[j]  # (S, D)
            attn = ctx @ word.T  # (S, n)
            attn = _softmax(attn, axis=1)  # over words
            attn = _softmax(attn * G1, axis=0)  # over regions
            wei = attn.T @ ctx  # (n, D)
            cos = (word * wei).sum(-1) / np.maximum(
                np.linalg.norm(word, axis=-1) * np.linalg.norm(wei, axis=-1), 1e-8)
            sims[j, i] = np.log(np.exp(cos * G2).sum())
    return sims * G3


def naive_ce(scores, mask):
    scores = scores.copy()
    scores[mask] = -1e9
    p = _softmax(scores, axis=1)
    l0 = -np.mean(np.log(np.maximum(np.diag(p), 1e-30)))
    pT = _softmax(scores.T, axis=1)
    l1 = -np.mean(np.log(np.maximum(np.diag(pT), 1e-30)))
    return l0, l1


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    regions = rng.randn(B, S, D).astype(np.float32)
    words = rng.randn(B, L, D).astype(np.float32)
    lens = rng.randint(2, L + 1, B)
    for i in range(B):
        words[i, lens[i]:] = 0.0
    cls = rng.randint(0, 3, B)
    return regions, words, lens, cls


def test_words_loss_matches_naive(data):
    regions, words, lens, cls = data
    sims = naive_words_similarity(regions, words, lens)
    mask = (cls[:, None] == cls[None, :]) & ~np.eye(B, dtype=bool)
    exp0, exp1 = naive_ce(sims, mask)

    l0, l1 = words_loss(jnp.asarray(regions), jnp.asarray(words),
                        jnp.asarray(lens), jnp.asarray(cls), G1, G2, G3)
    np.testing.assert_allclose(float(l0), exp0, rtol=5e-4, atol=1e-4)
    np.testing.assert_allclose(float(l1), exp1, rtol=5e-4, atol=1e-4)


def test_sent_loss_matches_naive(data):
    regions, words, lens, cls = data
    rng = np.random.RandomState(1)
    cnn = rng.randn(B, D).astype(np.float32)
    rnn = rng.randn(B, D).astype(np.float32)
    scores = (cnn @ rnn.T) / np.maximum(
        np.linalg.norm(cnn, axis=1)[:, None] * np.linalg.norm(rnn, axis=1)[None, :],
        1e-8) * G3
    mask = (cls[:, None] == cls[None, :]) & ~np.eye(B, dtype=bool)
    exp0, exp1 = naive_ce(scores, mask)

    l0, l1 = sent_loss(jnp.asarray(cnn), jnp.asarray(rnn), jnp.asarray(cls), G3)
    np.testing.assert_allclose(float(l0), exp0, rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(float(l1), exp1, rtol=5e-4, atol=1e-5)


def test_hinge_losses():
    out = jnp.array([-2.0, 0.5, 3.0])
    np.testing.assert_allclose(float(hinge_real(out)),
                               np.mean(np.maximum(0, 1 - np.array([-2, 0.5, 3]))))
    np.testing.assert_allclose(float(hinge_fake(out)),
                               np.mean(np.maximum(0, 1 + np.array([-2, 0.5, 3]))))
    np.testing.assert_allclose(float(d_hinge_total(jnp.float32(1), jnp.float32(2),
                                                   jnp.float32(3))), 1 + 2.5)


def test_bce_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    logits = rng.randn(4, 10).astype(np.float32)
    targets = (rng.rand(4, 10) > 0.5).astype(np.float32)
    expected = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(targets)).item()
    got = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_magp_formula():
    rng = np.random.RandomState(0)
    gi = rng.randn(3, 4, 4, 2).astype(np.float32)
    gs = rng.randn(3, 5).astype(np.float32)
    flat = np.concatenate([gi.reshape(3, -1), gs], axis=1)
    norm = np.sqrt((flat ** 2).sum(1))
    expected = 2.0 * np.mean(norm ** 6)
    got = float(magp_from_grads(jnp.asarray(gi), jnp.asarray(gs)))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_one_hot_class_labels():
    labels = one_hot_class_labels(jnp.array([1, 3]), 4)
    np.testing.assert_array_equal(np.asarray(labels),
                                  [[1, 0, 0, 0], [0, 0, 1, 0]])
