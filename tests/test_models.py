import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eegan_tpu.models import (
    AttrEnhance,
    Discriminator,
    Generator,
    ImageEncoder,
    InceptionV3,
    TextEncoder,
)

NGF = 8  # tiny widths for test speed; reference bird config uses 32


@pytest.fixture(scope="module")
def gen_vars():
    model = Generator(ngf=NGF, nz=100)
    rng = jax.random.PRNGKey(0)
    z = jnp.zeros((2, 100))
    sent = jnp.zeros((2, 256))
    attrs = jnp.zeros((2, 256))
    variables = model.init(rng, z, sent, attrs, train=True)
    return model, variables


def test_generator_output_pyramid(gen_vars):
    model, variables = gen_vars
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 100))
    sent = jax.random.normal(jax.random.PRNGKey(2), (2, 256))
    attrs = jax.random.normal(jax.random.PRNGKey(3), (2, 256))
    imgs, mutated = model.apply(variables, z, sent, attrs, train=True,
                                mutable=["batch_stats"])
    assert [im.shape for im in imgs] == [
        (2, 64, 64, 3), (2, 128, 128, 3), (2, 256, 256, 3)]
    for im in imgs:
        assert jnp.all(jnp.abs(im) <= 1.0)  # tanh range
    assert "batch_stats" in mutated


def test_generator_zero_gamma_init_stable(gen_vars):
    # All residual gates are zero-init, so two different conditions give the
    # SAME output at init only through BN/mask paths; just check finiteness.
    model, variables = gen_vars
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 100)) * 10
    sent = jax.random.normal(jax.random.PRNGKey(2), (2, 256)) * 10
    imgs, _ = model.apply(variables, z, sent, sent, train=True,
                          mutable=["batch_stats"])
    for im in imgs:
        assert jnp.all(jnp.isfinite(im))


@pytest.mark.parametrize("scale,use_class", [(64, False), (128, False), (256, True)])
def test_discriminator_shapes(scale, use_class):
    model = Discriminator(ndf=NGF, scale=scale, disc_class=use_class,
                          class_nums=17)
    x = jnp.zeros((2, scale, scale, 3))
    cond = jnp.zeros((2, 256))
    variables = model.init(jax.random.PRNGKey(0), x, cond)
    from eegan_tpu.models.discriminator import channel_ladder

    feat = model.apply(variables, x, method="features")
    assert feat.shape == (2, 4, 4, channel_ladder(NGF, scale)[-1])
    out = model.apply(variables, feat, cond, method="head")
    if use_class:
        pair, cls = out
        assert pair.shape == (2,) and cls.shape == (2, 17)
    else:
        assert out.shape == (2,)


def test_attr_enhance():
    model = AttrEnhance(ntf=256)
    sent = jax.random.normal(jax.random.PRNGKey(0), (3, 256))
    attrs = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 256))
    variables = model.init(jax.random.PRNGKey(2), sent, attrs)
    attn_sent, attn_attrs = model.apply(variables, sent, attrs)
    assert attn_sent.shape == (3, 256)
    assert attn_attrs.shape == (3, 4, 256)
    merged = AttrEnhance.attr_merge(attn_attrs)
    assert merged.shape == (3, 256)
    np.testing.assert_allclose(merged, attn_attrs.sum(axis=1), rtol=1e-6)


def test_text_encoder_shapes_and_padding():
    model = TextEncoder(ntoken=50, nhidden=256)
    caps = jax.random.randint(jax.random.PRNGKey(0), (4, 20), 1, 50)
    lens = jnp.array([20, 7, 1, 13])
    variables = model.init(jax.random.PRNGKey(1), caps, lens)
    words, sent = model.apply(variables, caps, lens)
    assert words.shape == (4, 20, 256)
    assert sent.shape == (4, 256)
    # padded steps must be exactly zero (pad_packed_sequence semantics)
    assert jnp.all(words[1, 7:] == 0)
    assert jnp.all(words[2, 1:] == 0)
    # final state must not depend on tokens past the length
    caps2 = caps.at[1, 10:].set(3)
    words2, sent2 = model.apply(variables, caps2, lens)
    np.testing.assert_allclose(sent[1], sent2[1], atol=1e-6)


def test_inception_shapes():
    model = InceptionV3(num_classes=10)
    x = jnp.zeros((1, 299, 299, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["mixed_6e"].shape == (1, 17, 17, 768)
    assert out["pool3"].shape == (1, 2048)
    assert out["logits"].shape == (1, 10)


def test_image_encoder_shapes():
    model = ImageEncoder(nef=256)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    region, code = model.apply(variables, x)
    assert region.shape == (1, 17, 17, 256)
    assert code.shape == (1, 256)


def test_generator_remat_identity(gen_vars):
    """RUNTIME.REMAT is semantically the identity: same params, same outputs,
    same gradients — only the backward's memory/recompute schedule changes."""
    model, variables = gen_vars
    remat_model = Generator(ngf=NGF, nz=100, remat=True)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 100))
    sent = jax.random.normal(jax.random.PRNGKey(2), (2, 256))
    attrs = jax.random.normal(jax.random.PRNGKey(3), (2, 256))

    # Param trees must be interchangeable (checkpoint compatibility).
    v2 = remat_model.init(jax.random.PRNGKey(0), z, sent, attrs, train=True)
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(
        variables)

    def loss(m, v):
        imgs, _ = m.apply(v, z, sent, attrs, train=True,
                          mutable=["batch_stats"])
        return sum(jnp.sum(im ** 2) for im in imgs)

    l0, g0 = jax.value_and_grad(lambda v: loss(model, v))(variables)
    l1, g1 = jax.value_and_grad(lambda v: loss(remat_model, v))(variables)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_disc_cond_head_stride1_equals_strided_reference():
    """The production DiscCond head uses stride-1 4x4 VALID convs where the
    reference uses stride 4 (models.py:318-325) — identical math on the 4x4
    head input (one output position either way). The stride-1 form exists
    because the TPU backend miscompiles the strided backward inside the
    densified 3B-concat head pass (see discriminator.py); this pins the
    equivalence so the workaround can never drift.
    """
    from flax import linen as nn

    from eegan_tpu.models.discriminator import DiscCond
    from eegan_tpu.models.layers import dense, leaky_relu, torch_kernel_init

    class StridedRef(nn.Module):
        ndf: int
        class_nums: int

        @nn.compact
        def __call__(self, feat, cond):
            b, h, w, _ = feat.shape
            cond = jnp.broadcast_to(cond[:, None, None, :],
                                    (b, h, w, cond.shape[-1]))
            x = jnp.concatenate([feat, cond], axis=-1)
            x = nn.Conv(self.ndf * 2, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, kernel_init=torch_kernel_init,
                        name="joinConv")(x)
            x = leaky_relu(x, 0.2)
            pair = nn.Conv(1, (4, 4), strides=(4, 4), padding="VALID",
                           use_bias=True, kernel_init=torch_kernel_init,
                           name="pair_node")(x).reshape(b)
            cls = nn.Conv(self.ndf * 2, (4, 4), strides=(4, 4),
                          padding="VALID", use_bias=True,
                          kernel_init=torch_kernel_init,
                          name="class_node")(x).reshape(b, self.ndf * 2)
            return pair, dense(self.class_nums, name="class_linear")(cls)

    head = DiscCond(ndf=NGF, class_nums=17)
    ref = StridedRef(ndf=NGF, class_nums=17)
    feat = jax.random.normal(jax.random.PRNGKey(1), (6, 4, 4, NGF))
    cond = jax.random.normal(jax.random.PRNGKey(2), (6, 256))
    variables = head.init(jax.random.PRNGKey(3), feat, cond)
    # identical param tree -> the strided reference accepts it verbatim
    p0, c0 = head.apply(variables, feat, cond)
    p1, c1 = ref.apply(variables, feat, cond)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))

    # densified-pass grads stay finite (the failure mode the workaround fixes
    # was TPU-backend-specific, but pin CPU finiteness + value equality too)
    def loss(v):
        pair, cls = head.apply(v, feat, cond)
        return pair.sum() + (cls ** 2).mean()

    grads = jax.grad(loss)(variables)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_discriminator_remat_identity():
    """Discriminator remat (RUNTIME.REMAT) is the identity on values and
    grads — including grad-of-grad, the MAGP double-backward path that the
    checkpointed blocks must recompute through."""
    model = Discriminator(ndf=NGF, scale=64, disc_class=False)
    rmodel = Discriminator(ndf=NGF, scale=64, disc_class=False, remat=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 256))
    variables = model.init(jax.random.PRNGKey(0), x, cond)
    v2 = rmodel.init(jax.random.PRNGKey(0), x, cond)
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(
        variables)

    def out(m, v, img):
        return jnp.sum(m.apply(v, img, cond))

    np.testing.assert_allclose(float(out(model, variables, x)),
                               float(out(rmodel, variables, x)), rtol=1e-6)

    g0 = jax.grad(lambda v: out(model, v, x))(variables)
    g1 = jax.grad(lambda v: out(rmodel, v, x))(variables)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # MAGP-style: grad wrt the input, then a penalty differentiated again.
    def magp(m, v):
        gin = jax.grad(lambda img: out(m, v, img))(x)
        return jnp.mean(jnp.sum(gin ** 2, axis=(1, 2, 3)) ** 3)

    p0 = jax.value_and_grad(lambda v: magp(model, v))(variables)
    p1 = jax.value_and_grad(lambda v: magp(rmodel, v))(variables)
    np.testing.assert_allclose(float(p0[0]), float(p1[0]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p0[1]),
                    jax.tree_util.tree_leaves(p1[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_image_encoder_remat_identity():
    """ImageEncoder remat (RUNTIME.REMAT) is the identity on values and on
    the gradient THROUGH the frozen trunk (the DAMSM losses differentiate
    generated images through Inception, so its activations are otherwise
    live for the backward — ~2.6 GB at batch 192)."""
    model = ImageEncoder(nef=32)
    rmodel = ImageEncoder(nef=32, remat=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_structure(rmodel.init(jax.random.PRNGKey(1), x))
            == jax.tree_util.tree_structure(variables))

    def out(m, img):
        region, code = m.apply(variables, img)
        return jnp.sum(region ** 2) + jnp.sum(code ** 2)

    l0, g0 = jax.value_and_grad(lambda img: out(model, img))(x)
    l1, g1 = jax.value_and_grad(lambda img: out(rmodel, img))(x)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               rtol=1e-5, atol=1e-6)


def test_generator_selective_remat_identity(gen_vars):
    """RUNTIME.REMAT_BLOCKS (selective remat) is also the identity — only
    the chosen high-res blocks are checkpointed."""
    model, variables = gen_vars
    sel_model = Generator(ngf=NGF, nz=100, remat=True,
                          remat_blocks="4,5,6,cum")
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 100))
    sent = jax.random.normal(jax.random.PRNGKey(2), (2, 256))
    attrs = jax.random.normal(jax.random.PRNGKey(3), (2, 256))

    v2 = sel_model.init(jax.random.PRNGKey(0), z, sent, attrs, train=True)
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(
        variables)

    def loss(m, v):
        imgs, _ = m.apply(v, z, sent, attrs, train=True,
                          mutable=["batch_stats"])
        return sum(jnp.sum(im ** 2) for im in imgs)

    l0, g0 = jax.value_and_grad(lambda v: loss(model, v))(variables)
    l1, g1 = jax.value_and_grad(lambda v: loss(sel_model, v))(variables)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
