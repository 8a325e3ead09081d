"""End-to-end Trainer driver: train -> log -> checkpoint -> resume.

Exercises the full driver path on the 8-device CPU mesh with synthetic data:
epoch loop, prefetch, fused step, fixed-batch sampling images, metric jsonl,
epoch-gated generator snapshots, full-state checkpoint and true resume (the
capability the reference lacks — `start_epoch` hardcoded 1, SURVEY.md §5).
"""

import json
import os

import pytest

from eegan_tpu.config import Config
from eegan_tpu.data.synthetic import SyntheticDataset
from eegan_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def config():
    c = Config()
    c.GAN.GF_DIM = 4
    c.GAN.DF_DIM = 4
    c.TRAIN.BATCH_SIZE = 8
    c.TRAIN.CLASS_NUM = 6
    c.TRAIN.MAX_EPOCH = 10
    c.TRAIN.WARMUP_EPOCHS = 1
    c.TRAIN.GSAVE_INTERVAL = 1
    c.TRAIN.DSAVE_INTERVAL = 1
    c.RUNTIME.COMPUTE_DTYPE = "float32"
    c.RUNTIME.MESH = "data:8"
    c.RUNTIME.DATA_WORKERS = 0
    c.RUNTIME.ALLOW_RANDOM_ENCODERS = True
    return c


def test_missing_encoders_hard_fail():
    """Production runs must not silently train with random frozen encoders
    (reference train.py:233-248 hard-requires the DAMSM .pth)."""
    from eegan_tpu.models.factory import build_models
    from eegan_tpu.training.state import create_train_state
    from eegan_tpu.training.trainer import load_frozen_encoders

    import jax

    c = Config()
    c.GAN.GF_DIM = 4
    c.GAN.DF_DIM = 4
    models = build_models(c, n_words=20)
    _, init_frozen = create_train_state(c, models, jax.random.PRNGKey(0))

    with pytest.raises(RuntimeError, match="ALLOW_RANDOM_ENCODERS"):
        load_frozen_encoders(c, models, init_frozen)
    c.TEXT.DAMSM_NAME = "/nonexistent/damsm.pth"
    with pytest.raises(FileNotFoundError):
        load_frozen_encoders(c, models, init_frozen)
    c.TEXT.DAMSM_NAME = ""
    c.RUNTIME.ALLOW_RANDOM_ENCODERS = True
    assert load_frozen_encoders(c, models, init_frozen) is init_frozen
    # explicit smoke mode downgrades a configured-but-absent path to a
    # warning (e.g. test.py --debug with the stock cfg, no artefacts on box)
    c.TEXT.DAMSM_NAME = "/nonexistent/damsm.pth"
    assert load_frozen_encoders(c, models, init_frozen) is init_frozen


@pytest.mark.slow
def test_train_checkpoint_resume(config, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("run"))
    dataset = SyntheticDataset(config, size=16, n_words=40)

    trainer = Trainer(config, out, dataset=dataset, seed=0)
    trainer.train(max_epochs=1, max_iters_per_epoch=2)
    step_after = int(trainer.state.step)
    assert step_after == 2
    trainer.close()

    # artefacts
    assert os.path.isfile(os.path.join(out, "Image", "sampling_text.txt"))
    assert os.path.isfile(os.path.join(out, "Image", "epoch_1_64.png"))
    assert os.path.isfile(os.path.join(out, "Image", "epoch_1_256.png"))
    metrics_path = os.path.join(out, "writer", "metrics.jsonl")
    with open(metrics_path) as f:
        records = [json.loads(line) for line in f]
    assert records and "errG/total" in records[0]
    assert "errD_2/d_loss_gp" in records[0]

    # generator snapshot for the eval sweep
    assert os.path.isdir(os.path.join(out, "Model", "netG_1"))

    # resume: a fresh Trainer picks up epoch 1's full state
    trainer2 = Trainer(config, out, dataset=dataset, seed=0)
    assert trainer2.start_epoch == 2
    assert int(trainer2.state.step) == step_after
    trainer2.close()


@pytest.mark.slow
def test_train_steps_per_dispatch(config, tmp_path_factory):
    """K=2 scanned steps per dispatch: same epoch = 2 steps, with an odd
    tail exercised (3 iters -> one full stack + one 1-step tail)."""
    import dataclasses

    c = dataclasses.replace(config)
    c.RUNTIME = dataclasses.replace(config.RUNTIME, STEPS_PER_DISPATCH=2)
    out = str(tmp_path_factory.mktemp("run_k2"))
    dataset = SyntheticDataset(c, size=24, n_words=40)

    trainer = Trainer(c, out, dataset=dataset, seed=0)
    trainer.train(max_epochs=1, max_iters_per_epoch=3)
    assert int(trainer.state.step) == 3
    metrics_path = os.path.join(out, "writer", "metrics.jsonl")
    with open(metrics_path) as f:
        records = [json.loads(line) for line in f]
    assert records and "errG/total" in records[0]

    # Logged scalars must be the MEAN over the K scanned sub-steps, not a
    # 1-in-K subsample (VERDICT r3 #7): re-run one K=2 dispatch and compare
    # the logged value against the stacked per-step metrics.
    import numpy as np

    trainer.train(max_epochs=1, max_iters_per_epoch=2)
    stacked = np.asarray(trainer.last_metrics["errG/total"])
    assert stacked.shape == (2,)
    with open(metrics_path) as f:
        records = [json.loads(line) for line in f]
    assert records[-1]["errG/total"] == pytest.approx(
        float(stacked.mean()), rel=1e-5)
    trainer.close()
