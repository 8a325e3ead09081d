"""End-to-end fused train step on the 8-device virtual CPU mesh.

This is the milestone test from SURVEY.md §7 step 5: every layer is
exercised — frozen text encode, attr-enhance, generator with cross-replica
BN, three D updates (hinge + MAGP double-step), G update with DAMSM losses
through the frozen Inception encoder — under real batch sharding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eegan_tpu.config import Config
from eegan_tpu.data.synthetic import synthetic_batch
from eegan_tpu.models.factory import build_models
from eegan_tpu.parallel.mesh import make_mesh, shard_batch
from eegan_tpu.training.state import create_train_state, param_counts
from eegan_tpu.training.steps import make_train_step

N_WORDS = 60


def tiny_config():
    c = Config()
    c.GAN.GF_DIM = 8
    c.GAN.DF_DIM = 8
    c.TRAIN.BATCH_SIZE = 8
    c.TRAIN.CLASS_NUM = 10
    c.RUNTIME.COMPUTE_DTYPE = "float32"
    return c


@pytest.fixture(scope="module")
def setup():
    c = tiny_config()
    models = build_models(c, n_words=N_WORDS)
    state, frozen = create_train_state(c, models, jax.random.PRNGKey(0))
    return c, models, state, frozen


def test_param_counts_positive(setup):
    _, _, state, _ = setup
    counts = param_counts(state)
    assert all(v > 0 for v in counts.values())


def test_train_step_runs_and_updates(setup):
    c, models, state, frozen = setup
    mesh = make_mesh("data:8")
    step_fn = make_train_step(c, models, mesh=mesh, donate=False)

    batch = shard_batch(synthetic_batch(c, 8, n_words=N_WORDS), mesh)
    new_state, metrics = step_fn(state, frozen, batch, jax.random.PRNGKey(1))

    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"metric {k} not finite"
    # expected metric surface (reference writer tags, train.py:462-498)
    for k in ["errD_0/real_sent", "errD_2/d_loss_gp", "errD_2/real_class",
              "errG/s_loss", "errG/w_loss", "errG/a_loss", "errG/total"]:
        assert k in metrics

    # generator params and all D params actually moved
    def l2_diff(a, b):
        la = jax.tree_util.tree_leaves(a)
        lb = jax.tree_util.tree_leaves(b)
        return sum(float(jnp.sum(jnp.abs(x - y))) for x, y in zip(la, lb))

    assert l2_diff(state.g_params, new_state.g_params) > 0
    assert l2_diff(state.attr_params, new_state.attr_params) > 0
    for i in range(3):
        assert l2_diff(state.d_params[i], new_state.d_params[i]) > 0
    # BN running stats updated
    assert l2_diff(state.g_stats, new_state.g_stats) > 0

    # second step with the same compiled fn
    new_state2, m2 = step_fn(new_state, frozen, batch, jax.random.PRNGKey(2))
    assert int(new_state2.step) == 2
    assert np.isfinite(float(m2["errG/total"]))


@pytest.mark.slow
def test_train_step_uint8_batch_matches_float(setup):
    """RUNTIME.UINT8_TRANSFER end-to-end: a uint8 image batch produces the
    same step as the float batch holding the identical quantised values
    (the on-device normalise is the only difference, and it is exact)."""
    c, models, state, frozen = setup
    mesh = make_mesh("data:8")
    step_fn = make_train_step(c, models, mesh=mesh, donate=False)

    host = synthetic_batch(c, 8, n_words=N_WORDS)
    host_u8, host_f = dict(host), dict(host)
    from eegan_tpu.data.transforms import float_to_u8
    for k in list(host):
        if k.startswith("img"):
            u8 = float_to_u8(host[k])
            host_u8[k] = u8
            host_f[k] = (u8.astype(np.float32) / 127.5 - 1.0)

    s_u8, m_u8 = step_fn(state, frozen, shard_batch(host_u8, mesh),
                         jax.random.PRNGKey(3))
    s_f, m_f = step_fn(state, frozen, shard_batch(host_f, mesh),
                       jax.random.PRNGKey(3))
    for k in m_f:
        np.testing.assert_allclose(float(m_u8[k]), float(m_f[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_global_batchnorm_matches_single_device(setup):
    """Cross-replica BN: sharded 8-way result == unsharded result.

    This is the numerical-oracle test the reference's sync_batchnorm ships
    helpers for but never runs (SURVEY.md §4): statistics over the global
    batch must be identical regardless of device count.
    """
    c, models, state, frozen = setup
    mesh = make_mesh("data:8")
    z = jax.random.normal(jax.random.PRNGKey(0), (8, 100))
    sent = jax.random.normal(jax.random.PRNGKey(1), (8, 256))

    def fwd(z, sent):
        imgs, _ = models.generator.apply(
            {"params": state.g_params, "batch_stats": state.g_stats},
            z, sent, sent, train=True, mutable=["batch_stats"])
        return imgs[0]

    from jax.sharding import NamedSharding, PartitionSpec as P

    single = jax.jit(fwd)(z, sent)
    sharded_fn = jax.jit(fwd, in_shardings=(
        NamedSharding(mesh, P("data")), NamedSharding(mesh, P("data"))))
    sharded = sharded_fn(jax.device_put(z, NamedSharding(mesh, P("data"))),
                         jax.device_put(sent, NamedSharding(mesh, P("data"))))
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               atol=1e-4, rtol=1e-4)


def test_g_ema_tracks_params():
    """TRAIN.G_EMA_DECAY: ema leaf == d*init + (1-d)*new after one step."""
    import dataclasses

    c = tiny_config()
    c.TRAIN = dataclasses.replace(c.TRAIN, G_EMA_DECAY=0.9)
    models = build_models(c, n_words=N_WORDS)
    state, frozen = create_train_state(c, models, jax.random.PRNGKey(0))
    assert state.g_ema is not None
    mesh = make_mesh("data:8")
    step_fn = make_train_step(c, models, mesh=mesh, donate=False)
    batch = shard_batch(synthetic_batch(c, 8, n_words=N_WORDS), mesh)
    new_state, _ = step_fn(state, frozen, batch, jax.random.PRNGKey(1))

    leaves0 = jax.tree_util.tree_leaves(state.g_params)
    leaves1 = jax.tree_util.tree_leaves(new_state.g_params)
    ema1 = jax.tree_util.tree_leaves(new_state.g_ema)
    for p0, p1, e1 in zip(leaves0, leaves1, ema1):
        np.testing.assert_allclose(
            np.asarray(e1), 0.9 * np.asarray(p0) + 0.1 * np.asarray(p1),
            rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_multi_step_matches_sequential(setup):
    """K scanned steps per dispatch == K sequential dispatches, numerically."""
    from eegan_tpu.training.steps import make_multi_train_step

    c, models, state, frozen = setup
    mesh = make_mesh("data:8")
    step_fn = make_train_step(c, models, mesh=mesh, donate=False)
    multi_fn = make_multi_train_step(c, models, mesh=mesh, donate=False)

    from eegan_tpu.parallel.mesh import shard_stacked_batch

    b0 = synthetic_batch(c, 8, seed=5, n_words=N_WORDS)
    b1 = synthetic_batch(c, 8, seed=6, n_words=N_WORDS)
    stacked = shard_stacked_batch(
        {k: np.stack([b0[k], b1[k]]) for k in b0}, mesh)

    rng = jax.random.PRNGKey(9)
    ms, metrics_m = multi_fn(state, frozen, stacked, rng)

    rngs = jax.random.split(rng, 2)
    s1, m0 = step_fn(state, frozen, shard_batch(b0, mesh), rngs[0])
    s2, m1 = step_fn(s1, frozen, shard_batch(b1, mesh), rngs[1])

    assert int(ms.step) == 2
    np.testing.assert_allclose(float(metrics_m["errG/total"][0]),
                               float(m0["errG/total"]), rtol=1e-5)
    np.testing.assert_allclose(float(metrics_m["errG/total"][1]),
                               float(m1["errG/total"]), rtol=1e-5)
    # Param-level check: the scan body and the standalone step are
    # separately compiled XLA programs, and Adam's m/sqrt(v) ratio is
    # 0/0-sensitive in the first steps — a 1-ulp grad difference on a
    # sign-borderline element legitimately moves that element by O(lr).
    # The functional-equivalence proof is the loss-trajectory match above
    # (step 2's losses are computed FROM step 1's params); here we only
    # bound the drift by the optimizer increment scale (G lr = 1e-4,
    # 2 steps -> 2.5e-4; observed max ~2e-5).
    for a, b in zip(jax.tree_util.tree_leaves(ms.g_params),
                    jax.tree_util.tree_leaves(s2.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2.5e-4)


def test_dense_d_off_matches_dense_d_on(setup):
    """RUNTIME.DENSE_D only changes the D phase's pass shape (2B/3B concat
    vs per-branch); the math is identical up to conv-batching accumulation
    order, so one full train step must produce the same metrics and
    parameters either way (to FP noise)."""
    c, models, state, frozen = setup
    import copy

    c2 = copy.deepcopy(c)
    c2.RUNTIME.DENSE_D = False
    assert c.RUNTIME.DENSE_D

    mesh = make_mesh("data:8")
    batch = shard_batch(synthetic_batch(c, 8, n_words=N_WORDS), mesh)
    rng = jax.random.PRNGKey(7)

    s_on, m_on = make_train_step(c, models, mesh=mesh, donate=False)(
        state, frozen, batch, rng)
    s_off, m_off = make_train_step(c2, models, mesh=mesh, donate=False)(
        state, frozen, batch, rng)

    for k in m_on:
        np.testing.assert_allclose(float(m_on[k]), float(m_off[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    # concat-vs-separate conv batching changes accumulation order; post-Adam
    # params may wiggle a few ULP-scale amounts (observed max 1e-5 on CPU)
    for a, b in zip(jax.tree_util.tree_leaves(s_on.d_params),
                    jax.tree_util.tree_leaves(s_off.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-5)


@pytest.mark.slow
def test_magp_chunks_matches_full_batch(setup):
    """RUNTIME.MAGP_CHUNKS computes the gradient penalty over equal batch
    chunks (checkpointed scan): 2*mean(norm^6) over equal chunks equals the
    full-batch mean, so metrics and updated D params must match."""
    c, models, state, frozen = setup
    import copy

    c2 = copy.deepcopy(c)
    c2.RUNTIME.MAGP_CHUNKS = 4

    mesh = make_mesh("data:8")
    batch = shard_batch(synthetic_batch(c, 8, n_words=N_WORDS), mesh)
    rng = jax.random.PRNGKey(9)

    s1, m1 = make_train_step(c, models, mesh=mesh, donate=False)(
        state, frozen, batch, rng)
    s4, m4 = make_train_step(c2, models, mesh=mesh, donate=False)(
        state, frozen, batch, rng)

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m4[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(s1.d_params),
                    jax.tree_util.tree_leaves(s4.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-5)
