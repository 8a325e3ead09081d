"""Overlapped evaluation: background scoring of generator snapshots."""

import time

import jax
import pytest

from eegan_tpu.config import Config
from eegan_tpu.data.datasets import TextOnlyDataset
from eegan_tpu.evaluation.async_eval import AsyncEvaluator
from eegan_tpu.evaluation.tester import Tester
from eegan_tpu.models.factory import build_models
from eegan_tpu.training.state import create_train_state

from corpus_util import CAPS_PER_IMAGE, build_corpus


def test_async_eval_r_precision(tmp_path_factory):
    root = build_corpus(tmp_path_factory.mktemp("birds"))
    c = Config()
    c.DATA_DIR = root
    c.DATASET_NAME = "bird"
    c.TEXT.CAPTIONS_PER_IMAGE = CAPS_PER_IMAGE
    c.GAN.GF_DIM = 4
    c.GAN.DF_DIM = 4
    c.TRAIN.BATCH_SIZE = 2
    c.RUNTIME.COMPUTE_DTYPE = "float32"

    dataset = TextOnlyDataset(c, split="test")
    models = build_models(c, dataset.n_words)
    state, frozen = create_train_state(c, models, jax.random.PRNGKey(0))
    tester = Tester(c, models, frozen, dataset, batch_size=2)

    evaluator = AsyncEvaluator(tester, real_stats=None, eval_nums=4,
                               compute_r_precision=True)
    assert evaluator.submit(1, state.g_params, state.attr_params,
                            state.g_stats)
    evaluator.close(wait=True)
    assert 1 in evaluator.results
    assert 0.0 <= evaluator.results[1]["eval/r_precision"] <= 1.0


def test_async_eval_survives_buffer_donation(tmp_path_factory):
    """submit() must copy the snapshot to fresh buffers: with
    RUNTIME.DONATE the next train step donates the live ``state`` buffers
    the trainer passes in, and the eval worker would read deleted arrays
    mid-sweep (observed on-chip as an INVALID_ARGUMENT fetch). Deleting
    the originals right after submit simulates the donation."""
    root = build_corpus(tmp_path_factory.mktemp("birds"))
    c = Config()
    c.DATA_DIR = root
    c.DATASET_NAME = "bird"
    c.TEXT.CAPTIONS_PER_IMAGE = CAPS_PER_IMAGE
    c.GAN.GF_DIM = 4
    c.GAN.DF_DIM = 4
    c.TRAIN.BATCH_SIZE = 2
    c.RUNTIME.COMPUTE_DTYPE = "float32"

    dataset = TextOnlyDataset(c, split="test")
    models = build_models(c, dataset.n_words)
    state, frozen = create_train_state(c, models, jax.random.PRNGKey(0))
    tester = Tester(c, models, frozen, dataset, batch_size=2)

    g_params = jax.device_put(state.g_params)
    attr_params = jax.device_put(state.attr_params)
    g_stats = jax.device_put(state.g_stats)

    evaluator = AsyncEvaluator(tester, real_stats=None, eval_nums=4,
                               compute_r_precision=True)
    assert evaluator.submit(1, g_params, attr_params, g_stats)
    for leaf in jax.tree_util.tree_leaves((g_params, attr_params, g_stats)):
        if isinstance(leaf, jax.Array):
            leaf.delete()
    evaluator.close(wait=True)
    assert 1 in evaluator.results
    assert "eval/error" not in evaluator.results[1]
    assert 0.0 <= evaluator.results[1]["eval/r_precision"] <= 1.0
