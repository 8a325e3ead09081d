"""Metric math oracles: Fréchet distance + Inception Score."""

import numpy as np
import pytest

from eegan_tpu.evaluation.fid import (
    activation_statistics,
    frechet_distance,
    load_npz_stats,
    save_npz_stats,
)
from eegan_tpu.evaluation.inception_score import inception_score_from_probs


def test_frechet_identical_is_zero():
    rng = np.random.RandomState(0)
    feats = rng.randn(500, 8)
    mu, sigma = activation_statistics(feats)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_mean_shift():
    # Same covariance, shifted mean: d² == ||Δmu||².
    rng = np.random.RandomState(0)
    feats = rng.randn(2000, 4)
    mu, sigma = activation_statistics(feats)
    shift = np.array([1.0, 0.0, -2.0, 0.5])
    d = frechet_distance(mu, sigma, mu + shift, sigma)
    np.testing.assert_allclose(d, shift @ shift, rtol=1e-6)


def test_frechet_diagonal_gaussians():
    # Closed form for diagonal covariances:
    # d² = ||Δmu||² + sum (sqrt(s1) - sqrt(s2))².
    mu1, mu2 = np.zeros(3), np.array([1.0, 1.0, 1.0])
    s1 = np.diag([1.0, 4.0, 9.0])
    s2 = np.diag([1.0, 1.0, 1.0])
    d = frechet_distance(mu1, s1, mu2, s2)
    expected = 3.0 + ((1 - 1) ** 2 + (2 - 1) ** 2 + (3 - 1) ** 2)
    np.testing.assert_allclose(d, expected, rtol=1e-6)


def test_npz_roundtrip(tmp_path):
    mu = np.arange(4.0)
    sigma = np.eye(4)
    path = str(tmp_path / "stats.npz")
    save_npz_stats(path, mu, sigma)
    mu2, sigma2 = load_npz_stats(path)
    np.testing.assert_array_equal(mu, mu2)
    np.testing.assert_array_equal(sigma, sigma2)


def test_inception_score_uniform_is_one():
    # p(y|x) == p(y) for every x -> KL = 0 -> IS = 1.
    probs = np.full((100, 10), 0.1)
    mean, std = inception_score_from_probs(probs, splits=10)
    np.testing.assert_allclose(mean, 1.0, rtol=1e-6)
    np.testing.assert_allclose(std, 0.0, atol=1e-8)


def test_inception_score_confident_classifier():
    # Perfectly confident, uniformly distributed classes -> IS = n_classes.
    n, c = 100, 10
    probs = np.zeros((n, c))
    probs[np.arange(n), np.arange(n) % c] = 1.0
    mean, _ = inception_score_from_probs(probs, splits=10)
    np.testing.assert_allclose(mean, c, rtol=1e-5)


def test_inception_score_matches_reference_formula():
    rng = np.random.RandomState(0)
    logits = rng.randn(64, 7)
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    mean, std = inception_score_from_probs(probs, splits=4)
    # direct transcription of exp(mean KL) per split
    scores = []
    for i in range(4):
        part = probs[i * 16:(i + 1) * 16]
        kl = part * (np.log(part) - np.log(part.mean(0, keepdims=True)))
        scores.append(np.exp(kl.sum(1).mean()))
    np.testing.assert_allclose(mean, np.mean(scores), rtol=1e-6)
    np.testing.assert_allclose(std, np.std(scores), rtol=1e-6)
