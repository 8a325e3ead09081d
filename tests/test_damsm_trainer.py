"""DAMSM pretraining step: losses finite, encoders update, clip applied."""

import jax
import numpy as np
import pytest

from eegan_tpu.config import Config
from eegan_tpu.data.synthetic import synthetic_batch
from eegan_tpu.models.factory import build_models
from eegan_tpu.parallel.mesh import make_mesh, shard_batch
from eegan_tpu.training.damsm_trainer import make_damsm_train_step
from eegan_tpu.training.state import create_train_state


def test_damsm_step_updates_encoders():
    c = Config()
    c.GAN.GF_DIM = 4
    c.GAN.DF_DIM = 4
    c.TRAIN.BATCH_SIZE = 8
    c.TRAIN.CLASS_NUM = 5
    c.RUNTIME.COMPUTE_DTYPE = "float32"
    models = build_models(c, n_words=40)
    _, frozen = create_train_state(c, models, jax.random.PRNGKey(0))

    mesh = make_mesh("data:8")
    step_fn, init_opt = make_damsm_train_step(c, models, mesh)
    opt_states = init_opt(frozen.text_vars, frozen.image_vars)
    batch = shard_batch(synthetic_batch(c, 8, n_words=40), mesh)

    new_text, new_image, opt_states, metrics = step_fn(
        frozen.text_vars, frozen.image_vars, opt_states, batch,
        jax.random.PRNGKey(1))

    for k, v in metrics.items():
        assert np.isfinite(float(v)), k

    def moved(a, b):
        la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
        return sum(float(np.abs(np.asarray(x) - np.asarray(y)).sum())
                   for x, y in zip(la, lb))

    assert moved(frozen.text_vars["params"], new_text["params"]) > 0
    assert moved(frozen.image_vars["params"], new_image["params"]) > 0

    # second step runs from updated state
    _, _, _, m2 = step_fn(new_text, new_image, opt_states, batch,
                          jax.random.PRNGKey(2))
    assert np.isfinite(float(m2["damsm/total"]))
