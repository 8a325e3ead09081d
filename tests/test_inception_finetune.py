"""IS classifier fine-tune step: loss decreases structure, save/load round."""

import jax
import numpy as np

from eegan_tpu.config import Config
from eegan_tpu.data.synthetic import synthetic_batch
from eegan_tpu.evaluation.inception_finetune import (
    build_is_model,
    load_is_classifier,
    make_finetune_step,
)
from eegan_tpu.parallel.mesh import make_mesh, shard_batch


def test_finetune_step_and_roundtrip(tmp_path):
    c = Config()
    c.TRAIN.CLASS_NUM = 5
    c.TRAIN.BATCH_SIZE = 8
    c.RUNTIME.COMPUTE_DTYPE = "float32"
    model = build_is_model(c)
    assert model.num_classes == 6

    mesh = make_mesh("data:8")
    step_fn, init = make_finetune_step(c, model, mesh)
    variables, opt_state = init(jax.random.PRNGKey(0))
    batch = shard_batch(synthetic_batch(c, 8, n_words=30), mesh)

    new_vars, opt_state, metrics = step_fn(variables, opt_state, batch,
                                           jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["is_finetune/loss"]))
    assert 0.0 <= float(metrics["is_finetune/acc"]) <= 1.0

    def moved(a, b):
        la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
        return sum(float(np.abs(np.asarray(x) - np.asarray(y)).sum())
                   for x, y in zip(la, lb))

    assert moved(variables["params"], new_vars["params"]) > 0

    # save/load roundtrip via orbax
    import orbax.checkpoint as ocp

    path = str(tmp_path / "is_inception")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, dict(new_vars), force=True)
    ckptr.wait_until_finished()
    restored = load_is_classifier(path, c)
    assert moved(new_vars["params"], restored["params"]) == 0
