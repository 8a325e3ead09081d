"""Fused train step with USE_CLASS=False (the COCO recipe, cfg/coco.yml):
Dis256 uses the plain DiscSent head and no BCE class terms anywhere."""

import jax
import numpy as np
import pytest

from eegan_tpu.config import Config
from eegan_tpu.data.synthetic import synthetic_batch
from eegan_tpu.models.factory import build_models
from eegan_tpu.parallel.mesh import make_mesh, shard_batch
from eegan_tpu.training.state import create_train_state
from eegan_tpu.training.steps import make_train_step


def test_train_step_no_class():
    c = Config()
    c.GAN.GF_DIM = 4
    c.GAN.DF_DIM = 4
    c.TRAIN.BATCH_SIZE = 8
    c.TRAIN.USE_CLASS = False
    c.TRAIN.CLASS_NUM = 1
    c.RUNTIME.COMPUTE_DTYPE = "float32"

    models = build_models(c, n_words=40)
    assert not models.discriminators[-1].disc_class
    state, frozen = create_train_state(c, models, jax.random.PRNGKey(0))
    mesh = make_mesh("data:8")
    step = make_train_step(c, models, mesh=mesh, donate=False)
    batch = shard_batch(synthetic_batch(c, 8, n_words=40), mesh)

    new_state, metrics = step(state, frozen, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert "errD_2/real_class" not in metrics
    assert "errG/G_2_fake_class" not in metrics
    assert "errD_2/d_loss_gp" in metrics


@pytest.mark.slow
def test_damsm_term_coefficients():
    """TRAIN.{SENT,WORDS,ATTR}_COE isolate one DAMSM pathway: zeroed terms
    report exactly 0 (dropped at trace time), live terms scale linearly
    (validate_words.py relies on this for the words-only ablation)."""
    c = Config()
    c.GAN.GF_DIM = 4
    c.GAN.DF_DIM = 4
    c.TRAIN.BATCH_SIZE = 8
    c.TRAIN.CLASS_NUM = 5
    c.RUNTIME.COMPUTE_DTYPE = "float32"

    models = build_models(c, n_words=40)
    state, frozen = create_train_state(c, models, jax.random.PRNGKey(0))
    mesh = make_mesh("data:8")
    batch = shard_batch(synthetic_batch(c, 8, n_words=40), mesh)

    def run(sent, words, attr):
        c.TRAIN.SENT_COE, c.TRAIN.WORDS_COE, c.TRAIN.ATTR_COE = \
            sent, words, attr
        step = make_train_step(c, models, mesh=mesh, donate=False)
        _, m = step(state, frozen, batch, jax.random.PRNGKey(1))
        return {k: float(v) for k, v in m.items()}

    base = run(1.0, 1.0, 1.0)
    words_only = run(0.0, 1.0, 0.0)
    assert words_only["errG/s_loss"] == 0.0
    assert words_only["errG/a_loss"] == 0.0
    np.testing.assert_allclose(words_only["errG/w_loss"],
                               base["errG/w_loss"], rtol=1e-5)

    doubled = run(0.0, 2.0, 0.0)
    np.testing.assert_allclose(doubled["errG/w_loss"],
                               2 * base["errG/w_loss"], rtol=1e-5)
