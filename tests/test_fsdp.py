"""FSDP parameter sharding (parallel/fsdp.py) on the virtual CPU mesh.

The optional second mesh axis shards TrainState leaves (params, Adam
moments, EMA) over ``fsdp`` while the batch shards over data×fsdp; GSPMD
inserts the collectives. These tests pin:

* the sharding rule itself (largest divisible dim, small leaves replicated);
* numerical equality of a train step under "data:4,fsdp:2" vs the
  replicated "data:8" layout (same global batch, same rng);
* that the compiled FSDP program actually contains all-gathers and that
  the output state leaves really are sharded (not silently replicated).
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from eegan_tpu.config import Config
from eegan_tpu.data.synthetic import synthetic_batch
from eegan_tpu.models.factory import build_models
from eegan_tpu.parallel.fsdp import (
    fsdp_spec,
    has_fsdp_axis,
    state_shardings,
)
from eegan_tpu.parallel.mesh import make_mesh, shard_batch
from eegan_tpu.training.state import create_train_state
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


def test_fsdp_spec_rule():
    # equal dims: stable sort picks the first (dim 2)
    assert fsdp_spec((3, 3, 256, 256), 2) == P(None, None, "fsdp", None)
    # largest dim indivisible -> next largest divisible one
    assert fsdp_spec((3, 3, 513, 256), 2) == P(None, None, None, "fsdp")
    # small leaves stay replicated (flagship 256x256 text MLPs included:
    # no memory win, awkward reshards against batch-sharded activations)
    assert fsdp_spec((256, 256), 2) == P()
    assert fsdp_spec((64,), 2) == P()
    assert fsdp_spec((), 2) == P()
    # largest indivisible, smaller divisible dim picked instead
    assert fsdp_spec((4097, 4), 2, min_shard_elems=1) == P(None, "fsdp")
    # nothing divisible -> replicated
    assert fsdp_spec((4097, 3, 5), 2, min_shard_elems=1) == P()


def test_has_fsdp_axis():
    assert not has_fsdp_axis(None)
    assert not has_fsdp_axis(make_mesh("data:8"))
    assert has_fsdp_axis(make_mesh("data:4,fsdp:2"))


@pytest.mark.slow
def test_fsdp_step_matches_replicated():
    c = tiny_config()
    models = build_models(c, n_words=N_WORDS)
    host = synthetic_batch(c, 8, n_words=N_WORDS)
    rng = jax.random.PRNGKey(1)

    def run(mesh_spec, use_fsdp):
        mesh = make_mesh(mesh_spec)
        state, frozen = create_train_state(c, models, jax.random.PRNGKey(0))
        # tiny test widths: drop the production size floor so the mechanics
        # (gathers, reduce-scatters, out-shardings) are actually exercised
        ssh = (state_shardings(state, mesh, min_shard_elems=4096)
               if use_fsdp else None)
        step = make_train_step(c, models, mesh=mesh, donate=False,
                               state_shardings=ssh)
        batch = shard_batch(host, mesh)
        new_state, metrics = step(state, frozen, batch, rng)
        if use_fsdp:
            # the big kernels must actually be sharded over fsdp
            sharded = [
                leaf for leaf in jax.tree_util.tree_leaves(new_state.g_params)
                if "fsdp" in str(getattr(leaf.sharding, "spec", ""))
            ]
            assert sharded, "no generator leaf ended up fsdp-sharded"
            # and GSPMD must have inserted gathers for the forward
            txt = step.lower(state, frozen, batch, rng).compile().as_text()
            assert "all-gather" in txt or "all-gather-start" in txt
        return new_state, metrics

    s_repl, m_repl = run("data:8", use_fsdp=False)
    s_fsdp, m_fsdp = run("data:4,fsdp:2", use_fsdp=True)

    for k in m_repl:
        np.testing.assert_allclose(float(m_repl[k]), float(m_fsdp[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)

    # Post-Adam params: sharded reductions change accumulation order, and a
    # near-zero gradient element can flip its m/(sqrt(v)+eps) ratio, moving
    # a single weight by up to ~one optimizer step (LR 1e-4/4e-4). Anything
    # beyond one-step noise (a missing grad sync would diverge everywhere)
    # fails.
    ra = jax.tree_util.tree_leaves(s_repl.g_params)
    fa = jax.tree_util.tree_leaves(s_fsdp.g_params)
    for x, y in zip(ra, fa):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=5e-4)
