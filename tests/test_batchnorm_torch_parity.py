"""TorchBatchNorm vs torch.nn.BatchNorm2d numerical parity.

The reference normalises with the biased batch variance but updates the
running variance with the *unbiased* one (`sync_batchnorm/batchnorm.py:113-125`,
same as stock torch BatchNorm2d). Flax's BatchNorm uses biased for both —
a silent eval-mode drift (VERDICT r1 weak #5). This pins our custom layer to
the torch semantics: train outputs, running stats after several steps, and
eval-mode outputs must all match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from eegan_tpu.models.layers import TorchBatchNorm


def test_batchnorm_matches_torch_train_and_eval():
    torch.manual_seed(0)
    rng = np.random.RandomState(1)
    C = 5
    tbn = torch.nn.BatchNorm2d(C, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(rng.uniform(0.5, 1.5, C).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(rng.uniform(-0.5, 0.5, C).astype(np.float32)))

    fbn_train = TorchBatchNorm(use_running_average=False, momentum=0.9)
    fbn_eval = TorchBatchNorm(use_running_average=True, momentum=0.9)

    x0 = rng.randn(4, 7, 6, C).astype(np.float32)
    variables = fbn_train.init(jax.random.PRNGKey(0), jnp.asarray(x0))
    variables = {
        "params": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                   "bias": jnp.asarray(tbn.bias.detach().numpy())},
        "batch_stats": variables["batch_stats"],
    }

    tbn.train()
    for step in range(4):
        x = rng.randn(4, 7, 6, C).astype(np.float32) * (1.0 + step) + step * 0.3
        y_f, mutated = fbn_train.apply(variables, jnp.asarray(x),
                                       mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": mutated["batch_stats"]}
        # torch is NCHW
        y_t = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(y_f), y_t.detach().numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4)

    np.testing.assert_allclose(np.asarray(variables["batch_stats"]["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(variables["batch_stats"]["var"]),
                               tbn.running_var.numpy(), rtol=1e-5, atol=1e-5)

    tbn.eval()
    xe = rng.randn(3, 7, 6, C).astype(np.float32)
    y_f = fbn_eval.apply(variables, jnp.asarray(xe))
    y_t = tbn(torch.from_numpy(xe.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(y_f), y_t.detach().numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-4)


def test_batchnorm_unbiased_running_var_small_batch():
    """The n/(n-1) factor is visible at tiny n — guard it explicitly."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 1, 1, 3).astype(np.float32)  # n = 2 reduced elements
    bn = TorchBatchNorm(use_running_average=False, momentum=0.0)  # pure batch
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    _, mutated = bn.apply(variables, jnp.asarray(x), mutable=["batch_stats"])
    biased = x.reshape(2, 3).var(axis=0)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["var"]),
                               biased * 2.0, rtol=1e-5)  # n/(n-1) = 2
