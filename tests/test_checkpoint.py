"""Orbax checkpoint roundtrip: full train-state resume + generator snapshots."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eegan_tpu.config import Config
from eegan_tpu.models.factory import build_models
from eegan_tpu.training.checkpoint import CheckpointManager
from eegan_tpu.training.state import create_train_state


@pytest.fixture(scope="module")
def tiny_state():
    c = Config()
    c.GAN.GF_DIM = 4
    c.GAN.DF_DIM = 4
    c.TRAIN.CLASS_NUM = 5
    c.RUNTIME.COMPUTE_DTYPE = "float32"
    models = build_models(c, n_words=30)
    state, frozen = create_train_state(c, models, jax.random.PRNGKey(0))
    return c, state, frozen


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_full_state_roundtrip(tiny_state, tmp_path):
    _, state, _ = tiny_state
    mgr = CheckpointManager(str(tmp_path / "Model"))
    state = state.replace(step=jnp.int32(42))
    mgr.save_state(7, state)
    assert mgr.latest_epoch() == 7

    restored, epoch = mgr.restore_state(state)
    assert epoch == 7
    assert int(restored.step) == 42
    _tree_equal(state.g_params, restored.g_params)
    _tree_equal(state.g_opt, restored.g_opt)
    _tree_equal(state.d_params, restored.d_params)
    mgr.close()


def test_generator_snapshot_roundtrip(tiny_state, tmp_path):
    _, state, _ = tiny_state
    mgr = CheckpointManager(str(tmp_path / "Model"))
    mgr.save_generator(550, state)
    mgr.save_generator(560, state)
    assert mgr.available_generator_epochs() == [550, 560]

    restored = mgr.load_generator(550, None)
    _tree_equal(state.g_params, restored["g_params"])
    _tree_equal(state.attr_params, restored["attr_params"])
    _tree_equal(state.g_stats, restored["g_stats"])
    mgr.close()


def test_generator_snapshot_carries_ema(tiny_state, tmp_path):
    """When G-EMA is on, the eval snapshot must hold the EMA weights (the
    weights test.py's sweep actually scores), not the raw iterate (ADVICE r2)."""
    _, state, _ = tiny_state
    bump = lambda t: jax.tree_util.tree_map(lambda x: x + 1.0, t)
    state = state.replace(g_ema=bump(state.g_params),
                          attr_ema=bump(state.attr_params))
    mgr = CheckpointManager(str(tmp_path / "Model"))
    mgr.save_generator(600, state)
    restored = mgr.load_generator(600, None)
    _tree_equal(state.g_ema, restored["g_params"])
    _tree_equal(state.attr_ema, restored["attr_params"])
    mgr.close()


def test_restore_pre_ema_checkpoint_into_ema_state(tiny_state, tmp_path):
    """Enabling TRAIN.G_EMA_DECAY on an existing run: restoring a checkpoint
    written without EMA subtrees must seed them from the restored params
    (ADVICE r2), not fail StandardRestore."""
    _, state, _ = tiny_state
    assert state.g_ema is None  # fixture config has EMA off
    mgr = CheckpointManager(str(tmp_path / "Model"))
    mgr.save_state(3, state)

    ema_template = state.replace(
        g_ema=jax.tree_util.tree_map(jnp.zeros_like, state.g_params),
        attr_ema=jax.tree_util.tree_map(jnp.zeros_like, state.attr_params))
    restored, epoch = mgr.restore_state(ema_template)
    assert epoch == 3
    _tree_equal(state.g_params, restored.g_params)
    _tree_equal(restored.g_ema, restored.g_params)
    _tree_equal(restored.attr_ema, restored.attr_params)
    mgr.close()


def test_restore_failure_with_ema_checkpoint_propagates(tiny_state, tmp_path):
    """A restore failure on a checkpoint that DOES contain the EMA subtrees
    must surface, not be silently 'fixed' by resetting the EMA to the raw
    params (round-3 review finding: the pre-EMA fallback may only fire for
    genuinely pre-EMA checkpoints)."""
    _, state, _ = tiny_state
    ema_state = state.replace(
        g_ema=jax.tree_util.tree_map(jnp.copy, state.g_params),
        attr_ema=jax.tree_util.tree_map(jnp.copy, state.attr_params))
    mgr = CheckpointManager(str(tmp_path / "Model"))
    mgr.save_state(5, ema_state)

    # A template whose g_ema structure doesn't match the saved one makes the
    # first restore fail; the checkpoint still has EMA subtrees, so the
    # pre-EMA fallback must NOT swallow the error.
    bad_template = ema_state.replace(
        g_ema={"bogus": jnp.zeros((2, 2), jnp.float32)})
    with pytest.raises(Exception):
        mgr.restore_state(bad_template)
    mgr.close()


def test_frozen_roundtrip(tiny_state, tmp_path):
    _, _, frozen = tiny_state
    mgr = CheckpointManager(str(tmp_path / "Model"))
    mgr.save_frozen(frozen)
    restored = mgr.load_frozen(frozen)
    _tree_equal(frozen.text_vars, restored.text_vars)
    _tree_equal(frozen.image_vars, restored.image_vars)
    mgr.close()


def test_frozen_loads_from_parent_model_dir(tiny_state, tmp_path):
    """TEXT.DAMSM_NAME may point at the Model dir itself: save_frozen
    writes <model_dir>/frozen_encoders, and load_frozen_encoders must
    resolve that subdir (the validate_rprecision sweep drives test.py
    with --model_dir semantics, mirroring reference NET_E usage)."""
    from eegan_tpu.training.trainer import load_frozen_encoders

    c, _, frozen = tiny_state
    models = build_models(c, n_words=30)
    mgr = CheckpointManager(str(tmp_path / "Model"))
    mgr.save_frozen(frozen)
    mgr.close()
    c.TEXT.DAMSM_NAME = str(tmp_path / "Model")
    restored = load_frozen_encoders(c, models, frozen)
    _tree_equal(frozen.text_vars, restored.text_vars)
    _tree_equal(frozen.image_vars, restored.image_vars)
