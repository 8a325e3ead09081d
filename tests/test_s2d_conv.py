"""Space-to-depth conv: exact-math parity with the plain 3x3 conv.

The packed stride-2 form computes the SAME sums (plus structural zero
products), so forward values and gradients must match the `nn.Conv` path
to fp32 summation-order tolerance, for every (Cin, Cout, H) the generator
uses it at.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eegan_tpu.models.layers import conv3x3
from eegan_tpu.ops.s2d_conv import Conv3x3S2D, conv3x3_s2d_apply


SHAPES = [
    (2, 8, 8, 16, 8),     # (B, H, W, Cin, Cout) — small smoke
    (2, 16, 16, 64, 32),  # block6-like
    (1, 12, 12, 32, 32),  # non-power-of-two even spatial
    (2, 8, 8, 16, 3),     # ToImage-like tiny Cout
]


@pytest.mark.parametrize("b,h,w,cin,cout", SHAPES)
def test_forward_matches_plain_conv(b, h, w, cin, cout):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w, cin), jnp.float32)
    kernel = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                               jnp.float32) * 0.1

    ref = conv3x3(cout).apply({"params": {"kernel": kernel}}, x)
    got = conv3x3_s2d_apply(x, kernel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_plain_conv():
    b, h, w, cin, cout = 2, 8, 8, 16, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, cin), jnp.float32)
    kernel = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                               jnp.float32) * 0.1
    cot = jax.random.normal(jax.random.PRNGKey(2), (b, h, w, cout),
                            jnp.float32)

    def loss_ref(k, x):
        y = conv3x3(cout).apply({"params": {"kernel": k}}, x)
        return jnp.sum(y * cot)

    def loss_s2d(k, x):
        return jnp.sum(conv3x3_s2d_apply(x, k) * cot)

    gk_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(kernel, x)
    gk_s2d, gx_s2d = jax.grad(loss_s2d, argnums=(0, 1))(kernel, x)
    np.testing.assert_allclose(np.asarray(gk_s2d), np.asarray(gk_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_s2d), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-5)


def test_module_param_tree_matches_nn_conv():
    """Conv3x3S2D and conv3x3 must be checkpoint-interchangeable."""
    x = jnp.ones((1, 8, 8, 16), jnp.float32)
    v_ref = conv3x3(8).init(jax.random.PRNGKey(0), x)
    v_s2d = Conv3x3S2D(8).init(jax.random.PRNGKey(0), x)
    ref_tree = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v_ref)
    s2d_tree = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v_s2d)
    assert ref_tree == s2d_tree
    # Same init distribution function -> same values from the same key.
    np.testing.assert_allclose(
        np.asarray(v_ref["params"]["kernel"]),
        np.asarray(v_s2d["params"]["kernel"]))


def test_module_bias_and_dtype():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4), jnp.float32)
    mod = Conv3x3S2D(8, use_bias=True)
    v = mod.init(jax.random.PRNGKey(1), x)
    y = mod.apply(v, x)
    ref = conv3x3(8, use_bias=True).apply(v, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_odd_spatial_rejected():
    x = jnp.ones((1, 7, 8, 4), jnp.float32)
    with pytest.raises(ValueError):
        Conv3x3S2D(8).init(jax.random.PRNGKey(0), x)


def test_generator_s2d_matches_plain():
    """Full generator, same params: s2d lowering must be a pure relayout."""
    from eegan_tpu.models.generator import Generator

    key = jax.random.PRNGKey(0)
    b, ngf = 2, 8
    z = jax.random.normal(key, (b, 100), jnp.float32)
    sent = jax.random.normal(jax.random.PRNGKey(1), (b, 256), jnp.float32)
    attrs = jax.random.normal(jax.random.PRNGKey(2), (b, 256), jnp.float32)

    g_ref = Generator(ngf=ngf, s2d=False)
    g_s2d = Generator(ngf=ngf, s2d=True)
    variables = g_ref.init(key, z, sent, attrs, True)
    # Identical param tree: the s2d module must be checkpoint-compatible.
    v2 = g_s2d.init(key, z, sent, attrs, True)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v2))

    out_ref = g_ref.apply(variables, z, sent, attrs, True,
                          mutable=["batch_stats"])[0]
    out_s2d = g_s2d.apply(variables, z, sent, attrs, True,
                          mutable=["batch_stats"])[0]
    for a, b_ in zip(out_ref, out_s2d):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_discriminator_s2d_matches_plain():
    """D tower with the s2d lowering: same params, same outputs, same grads
    w.r.t. params AND the input image (the MAGP gradient-penalty path
    differentiates D w.r.t. its input — reference `train.py:378-402`)."""
    from eegan_tpu.models.discriminator import Discriminator

    b = 2
    x = jax.random.normal(jax.random.PRNGKey(0), (b, 64, 64, 3), jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(1), (b, 256), jnp.float32)

    # ndf=8 makes every ladder channel < 128, so all blocks take the s2d path
    d_ref = Discriminator(ndf=8, scale=64)
    d_s2d = Discriminator(ndf=8, scale=64, s2d=True)
    v = d_ref.init(jax.random.PRNGKey(2), x, cond)
    v2 = d_s2d.init(jax.random.PRNGKey(2), x, cond)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))

    np.testing.assert_allclose(np.asarray(d_s2d.apply(v, x, cond)),
                               np.asarray(d_ref.apply(v, x, cond)),
                               rtol=1e-4, atol=1e-4)

    def loss(mod, params, xx):
        return jnp.sum(mod.apply(params, xx, cond))

    gp_ref, gx_ref = jax.grad(loss, argnums=(1, 2))(d_ref, v, x)
    gp_s2d, gx_s2d = jax.grad(loss, argnums=(1, 2))(d_s2d, v, x)
    for a, b_ in zip(jax.tree_util.tree_leaves(gp_ref),
                     jax.tree_util.tree_leaves(gp_s2d)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_s2d), np.asarray(gx_ref),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_fused_train_step_s2d_matches_on_mesh():
    """Full fused train step, 8-device mesh, S2D_CONVS on vs off: the
    lowering must leave every loss metric unchanged (summation order only)
    and produce a finite update — the same guarantee dryrun_multichip
    asserts for the plain path."""
    from eegan_tpu.config import Config
    from eegan_tpu.data.synthetic import synthetic_batch
    from eegan_tpu.models.factory import build_models
    from eegan_tpu.parallel.mesh import make_mesh, shard_batch
    from eegan_tpu.training.state import create_train_state
    from eegan_tpu.training.steps import make_train_step

    def cfg(s2d):
        c = Config()
        c.GAN.GF_DIM = 8
        c.GAN.DF_DIM = 8
        c.TRAIN.BATCH_SIZE = 8
        c.TRAIN.CLASS_NUM = 10
        c.RUNTIME.COMPUTE_DTYPE = "float32"
        c.RUNTIME.S2D_CONVS = s2d
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
