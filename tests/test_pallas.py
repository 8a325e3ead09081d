"""Pallas kernel parity vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from eegan_tpu.losses.damsm import words_similarity
from eegan_tpu.ops.damsm_pallas import words_similarity_pallas

Bi, Bt, S, L, D = 4, 4, 289, 20, 256


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    regions = rng.randn(Bi, S, D).astype(np.float32)
    words = rng.randn(Bt, L, D).astype(np.float32)
    lens = rng.randint(3, L + 1, Bt)
    for i in range(Bt):
        words[i, lens[i]:] = 0.0
    cls = rng.randint(0, 2, Bt)
    return regions, words, lens, cls


def test_fused_matches_xla(data):
    regions, words, lens, cls = data
    expected = words_similarity(jnp.asarray(regions), jnp.asarray(words),
                                jnp.asarray(lens), None)
    got = words_similarity_pallas(jnp.asarray(regions), jnp.asarray(words),
                                  jnp.asarray(lens), None, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-3, rtol=1e-4)


def test_fused_class_mask(data):
    regions, words, lens, cls = data
    expected = words_similarity(jnp.asarray(regions), jnp.asarray(words),
                                jnp.asarray(lens), jnp.asarray(cls))
    got = words_similarity_pallas(jnp.asarray(regions), jnp.asarray(words),
                                  jnp.asarray(lens), jnp.asarray(cls),
                                  interpret=True)
    exp = np.asarray(expected)
    g = np.asarray(got)
    finite = exp > -1e8
    np.testing.assert_array_equal(finite, g > -1e8)
    np.testing.assert_allclose(g[finite], exp[finite], atol=1e-3, rtol=1e-4)
