"""Parity tests for the fused affine+mask+relu Pallas kernel
(ops/affine_pallas.py) against its XLA reference math, in interpret mode
(grad flow through x, stats, gamma/beta and mask; up=False and the fused
nearest-2x up=True schedule)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eegan_tpu.ops.affine_pallas import (
    affine_mask_relu,
    affine_mask_relu_reference,
)


def _operands(up, B=2, h=4, w=8, C=16, seed=0):
    rng = np.random.RandomState(seed)
    H, W = (2 * h, 2 * w) if up else (h, w)
    x = rng.randn(B, h, w, C).astype(np.float32)
    mean = rng.randn(C).astype(np.float32) * 0.1
    var = (rng.rand(C).astype(np.float32) + 0.5)
    gamma = rng.randn(B, C).astype(np.float32) * 0.3
    beta = rng.randn(B, C).astype(np.float32) * 0.3
    mask = rng.rand(B, H, W, 1).astype(np.float32)
    return tuple(map(jnp.asarray, (x, mean, var, gamma, beta, mask)))


@pytest.mark.parametrize("up", [False, True])
def test_forward_parity(up):
    ops = _operands(up)
    got = affine_mask_relu(*ops, up, 1e-5, jnp.float32, True)
    want = affine_mask_relu_reference(*ops, up=up)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("up", [False, True])
def test_grad_parity(up):
    ops = _operands(up, seed=3)
    B, H, W, _ = ops[-1].shape
    C = ops[0].shape[3]
    cot = jnp.asarray(
        np.random.RandomState(9).randn(B, H, W, C).astype(np.float32))

    def f_kernel(*a):
        return jnp.sum(affine_mask_relu(*a, up, 1e-5, jnp.float32, True) * cot)

    def f_ref(*a):
        return jnp.sum(affine_mask_relu_reference(*a, up=up) * cot)

    g_kernel = jax.grad(f_kernel, argnums=tuple(range(6)))(*ops)
    g_ref = jax.grad(f_ref, argnums=tuple(range(6)))(*ops)
    names = ("x", "mean", "var", "gamma", "beta", "mask")
    for n, a, b in zip(names, g_kernel, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
            err_msg=f"grad mismatch for {n} (up={up})")


def test_bf16_output_dtype():
    ops = _operands(False)
    out = affine_mask_relu(*ops, False, 1e-5, jnp.bfloat16, True)
    assert out.dtype == jnp.bfloat16
    want = affine_mask_relu_reference(*ops, up=False, out_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(want, np.float32), rtol=2e-2,
                               atol=2e-2)


@pytest.mark.parametrize("up_fused", [True, False])
def test_generator_module_parity(up_fused):
    """Generator(pallas_affine=True) == Generator(pallas_affine=False):
    identical variable tree, matching images, updated batch_stats and
    parameter gradients (interpret mode on CPU)."""
    from eegan_tpu.models.generator import Generator

    B, ngf = 2, 8
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(rng, (B, 100))
    sent = jax.random.normal(jax.random.fold_in(rng, 1), (B, 256))
    attrs = jax.random.normal(jax.random.fold_in(rng, 2), (B, 256))

    g_plain = Generator(ngf=ngf, up_fused=up_fused)
    g_pallas = Generator(ngf=ngf, up_fused=up_fused, pallas_affine=True)
    v = g_plain.init(rng, z, sent, attrs, train=True)
    v2 = g_pallas.init(rng, z, sent, attrs, train=True)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))

    def run(model, variables):
        def loss_fn(params):
            outs, mut = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                z, sent, attrs, train=True, mutable=["batch_stats"])
            return sum(jnp.sum(o) for o in outs), (outs, mut)
        (loss, (outs, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"])
        return loss, outs, mut, grads

    loss_a, outs_a, mut_a, grads_a = run(g_plain, v)
    loss_b, outs_b, mut_b, grads_b = run(g_pallas, v)

    for s, a, b in zip((64, 128, 256), outs_a, outs_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-4, err_msg=f"img{s}")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
        mut_a["batch_stats"], mut_b["batch_stats"])
    flat_a = jax.tree_util.tree_flatten_with_path(grads_a)[0]
    flat_b = jax.tree_util.tree_leaves(grads_b)
    for (path, a), b in zip(flat_a, flat_b):
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, rtol=2e-3,
            atol=2e-3, err_msg=f"grad {jax.tree_util.keystr(path)}")
