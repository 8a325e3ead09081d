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


def test_fused_vjp_grad_parity(data):
    """Backward kernels vs jax.grad of the XLA path, through the full
    words-loss consumer (regions AND words gradients)."""
    import jax

    from eegan_tpu.losses.damsm import words_loss
    from eegan_tpu.ops.damsm_pallas import words_loss_pallas

    regions, words, lens, cls = data
    rj, wj, lj = jnp.asarray(regions), jnp.asarray(words), jnp.asarray(lens)

    def f_xla(r, w):
        l0, l1 = words_loss(r, w, lj, None)
        return l0 + 0.7 * l1

    def f_pal(r, w):
        l0, l1 = words_loss_pallas(r, w, lj, None, 5.0, 5.0, 10.0, True)
        return l0 + 0.7 * l1

    (vx, gx) = jax.value_and_grad(f_xla, argnums=(0, 1))(rj, wj)
    (vp, gp) = jax.value_and_grad(f_pal, argnums=(0, 1))(rj, wj)
    np.testing.assert_allclose(float(vp), float(vx), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]),
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]),
                               atol=2e-4, rtol=2e-3)
    # Padded word positions must get exactly zero gradient.
    for i in range(len(lens)):
        assert np.all(np.asarray(gp[1])[i, lens[i]:] == 0.0)


def test_fused_vjp_grad_parity_class_mask(data):
    import jax

    from eegan_tpu.losses.damsm import words_loss
    from eegan_tpu.ops.damsm_pallas import words_loss_pallas

    regions, words, lens, cls = data
    rj, wj = jnp.asarray(regions), jnp.asarray(words)
    lj, cj = jnp.asarray(lens), jnp.asarray(cls)

    gx = jax.grad(lambda r: sum(words_loss(r, wj, lj, cj)))(rj)
    gp = jax.grad(lambda r: sum(
        words_loss_pallas(r, wj, lj, cj, 5.0, 5.0, 10.0, True)))(rj)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               atol=2e-4, rtol=2e-3)


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
