"""Fused up-path (RUNTIME.FUSED_UPSAMPLE): exact-math parity.

Three rewrites, all of which must be pure relayouts (float summation
order only): the subpixel upsample+conv3x3 (ops/upconv.py), pre-upsample
BN stats/normalise in AffineSSA (nearest-2x replication preserves
mean/var; n_override preserves the unbiased running-var factor), and the
pre-upsample 1x1 shortcut. Reference semantics being preserved:
`models.py:89-143` (SAGB_Block / Cum_Block) + `models.py:218-223`
(the inter-block upsample).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eegan_tpu.models.layers import conv3x3, upsample_nearest_2x
from eegan_tpu.ops.upconv import (
    Conv3x3UpFused,
    pack_kernel_upconv,
    upconv3x3_apply,
)

SHAPES = [
    (2, 4, 4, 8, 8),      # smoke
    (2, 16, 16, 64, 32),  # cum_256-like (up_conv1 out -> up_conv3)
    (1, 6, 10, 16, 8),    # non-square, non-power-of-two
    (2, 8, 8, 16, 3),     # tiny Cout
]


@pytest.mark.parametrize("b,h,w,cin,cout", SHAPES)
def test_forward_matches_upsample_then_conv(b, h, w, cin, cout):
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, cin), jnp.float32)
    kernel = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                               jnp.float32) * 0.1

    ref = conv3x3(cout).apply({"params": {"kernel": kernel}},
                              upsample_nearest_2x(x))
    got = upconv3x3_apply(x, kernel)
    assert got.shape == (b, 2 * h, 2 * w, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_kernel_weight_mass():
    """Every packed parity kernel redistributes exactly the 9 taps: the
    total weight per (cin, cout) is preserved 4x (once per parity)."""
    k = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 4, 6), jnp.float32)
    packed = pack_kernel_upconv(k)
    assert packed.shape == (3, 3, 4, 24)
    np.testing.assert_allclose(
        np.asarray(packed.sum(axis=(0, 1)).reshape(4, 2, 2, 6).sum((1, 2))),
        np.asarray(4.0 * k.sum(axis=(0, 1))), rtol=1e-5, atol=1e-5)


def test_gradients_match_upsample_then_conv():
    b, h, w, cin, cout = 2, 6, 6, 16, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, cin), jnp.float32)
    kernel = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                               jnp.float32) * 0.1
    cot = jax.random.normal(jax.random.PRNGKey(2), (b, 2 * h, 2 * w, cout),
                            jnp.float32)

    def loss_ref(k, x):
        y = conv3x3(cout).apply({"params": {"kernel": k}},
                                upsample_nearest_2x(x))
        return jnp.sum(y * cot)

    def loss_fused(k, x):
        return jnp.sum(upconv3x3_apply(x, k) * cot)

    gk_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(kernel, x)
    gk_f, gx_f = jax.grad(loss_fused, argnums=(0, 1))(kernel, x)
    np.testing.assert_allclose(np.asarray(gk_f), np.asarray(gk_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-5)


def test_module_param_tree_matches_nn_conv():
    """Checkpoint compatibility: same {"kernel"} [+ "bias"] pytree."""
    x = jnp.zeros((1, 4, 4, 8), jnp.float32)
    v_ref = conv3x3(16).init(jax.random.PRNGKey(0), upsample_nearest_2x(x))
    v_fused = Conv3x3UpFused(16).init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v_ref)
            == jax.tree_util.tree_structure(v_fused))
    assert v_fused["params"]["kernel"].shape == (3, 3, 8, 16)
    # Same init draw for the same param path/shape.
    np.testing.assert_array_equal(np.asarray(v_ref["params"]["kernel"]),
                                  np.asarray(v_fused["params"]["kernel"]))


def test_generator_up_fused_matches_plain():
    """Full generator: FUSED_UPSAMPLE must be a pure relayout — identical
    param tree, matching images AND matching running batch_stats (the
    n_override unbiased-variance factor is exercised here)."""
    from eegan_tpu.models.generator import Generator

    key = jax.random.PRNGKey(0)
    b, ngf = 2, 8
    z = jax.random.normal(key, (b, 100), jnp.float32)
    sent = jax.random.normal(jax.random.PRNGKey(1), (b, 256), jnp.float32)
    attrs = jax.random.normal(jax.random.PRNGKey(2), (b, 256), jnp.float32)

    g_ref = Generator(ngf=ngf)
    g_fused = Generator(ngf=ngf, up_fused=True)
    variables = g_ref.init(key, z, sent, attrs, True)
    v2 = g_fused.init(key, z, sent, attrs, True)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v2))

    out_ref, upd_ref = g_ref.apply(variables, z, sent, attrs, True,
                                   mutable=["batch_stats"])
    out_fused, upd_fused = g_fused.apply(variables, z, sent, attrs, True,
                                         mutable=["batch_stats"])
    for a, b_ in zip(out_ref, out_fused):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)
    flat_ref = jax.tree_util.tree_flatten_with_path(upd_ref)[0]
    flat_fused = jax.tree_util.tree_leaves(upd_fused)
    for (path, a), b_ in zip(flat_ref, flat_fused):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))


def test_generator_up_fused_grads_match_plain():
    from eegan_tpu.models.generator import Generator

    key = jax.random.PRNGKey(0)
    b, ngf = 2, 8
    z = jax.random.normal(key, (b, 100), jnp.float32)
    sent = jax.random.normal(jax.random.PRNGKey(1), (b, 256), jnp.float32)
    attrs = jax.random.normal(jax.random.PRNGKey(2), (b, 256), jnp.float32)

    g_ref = Generator(ngf=ngf)
    g_fused = Generator(ngf=ngf, up_fused=True)
    variables = g_ref.init(key, z, sent, attrs, True)

    def loss(gen, params):
        imgs = gen.apply({"params": params,
                          "batch_stats": variables["batch_stats"]},
                         z, sent, attrs, True, mutable=["batch_stats"])[0]
        return sum(jnp.sum(jnp.square(i)) for i in imgs)

    g_r = jax.grad(lambda p: loss(g_ref, p))(variables["params"])
    g_f = jax.grad(lambda p: loss(g_fused, p))(variables["params"])
    flat_r = jax.tree_util.tree_flatten_with_path(g_r)[0]
    flat_f = jax.tree_util.tree_leaves(g_f)
    for (path, a), b_ in zip(flat_r, flat_f):
        a, b_ = np.asarray(a), np.asarray(b_)
        denom = np.abs(a).max() + 1e-8
        assert np.abs(a - b_).max() / denom < 2e-3, \
            f"{jax.tree_util.keystr(path)}: rel {np.abs(a - b_).max() / denom}"


def test_fused_train_step_up_fused_matches_on_mesh():
    """Full fused train step, 8-device mesh, FUSED_UPSAMPLE on vs off:
    every loss metric unchanged, finite update — the same guarantee the
    s2d and plain paths carry."""
    from eegan_tpu.config import Config
    from eegan_tpu.data.synthetic import synthetic_batch
    from eegan_tpu.models.factory import build_models
    from eegan_tpu.parallel.mesh import make_mesh, shard_batch
    from eegan_tpu.training.state import create_train_state
    from eegan_tpu.training.steps import make_train_step

    def cfg(up_fused):
        c = Config()
        c.GAN.GF_DIM = 8
        c.GAN.DF_DIM = 8
        c.TRAIN.BATCH_SIZE = 8
        c.TRAIN.CLASS_NUM = 10
        c.RUNTIME.COMPUTE_DTYPE = "float32"
        c.RUNTIME.FUSED_UPSAMPLE = up_fused
        return c

    n_words = 60
    mesh = make_mesh("data:8")
    c_off, c_on = cfg(False), cfg(True)
    models_off = build_models(c_off, n_words=n_words)
    models_on = build_models(c_on, n_words=n_words)
    state, frozen = create_train_state(c_off, models_off, jax.random.PRNGKey(0))
    batch = shard_batch(synthetic_batch(c_off, 8, n_words=n_words), mesh)

    _, m_off = make_train_step(c_off, models_off, mesh=mesh, donate=False)(
        state, frozen, batch, jax.random.PRNGKey(1))
    s_on, m_on = make_train_step(c_on, models_on, mesh=mesh, donate=False)(
        state, frozen, batch, jax.random.PRNGKey(1))

    assert int(s_on.step) == 1
    for k in m_off:
        assert np.isfinite(float(m_on[k])), f"metric {k} not finite"
        np.testing.assert_allclose(float(m_on[k]), float(m_off[k]),
                                   rtol=1e-3, atol=1e-5, err_msg=k)
