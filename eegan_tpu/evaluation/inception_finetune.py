"""Fine-tune the Inception classifier used by the Inception Score.

The reference scores IS with StackGAN's *fine-tuned* Inception checkpoints
(birds: 50 classes, flowers: 20, + 1 background class — reference
`metrics/IS_TF/inception_score.py:41-51`), which it cannot produce itself.
This module trains that classifier inside the framework: InceptionV3 with
``num_classes = K + 1`` (class 0 reserved as background, matching the
checkpoint convention the scorer expects), softmax cross-entropy on the
dataset's class labels over augmented 256² crops resized on device to 299².

One fused jitted step, mesh-sharded batch; the resulting Orbax directory
loads straight into `InceptionScorer(variables=...)`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from eegan_tpu.config import Config
from eegan_tpu.models.inception import InceptionV3
from eegan_tpu.models.layers import resize_bilinear_half_pixel
from eegan_tpu.parallel.mesh import DATA_AXIS


def build_is_model(config: Config) -> InceptionV3:
    from eegan_tpu.models.factory import compute_dtype

    return InceptionV3(num_classes=config.TRAIN.CLASS_NUM + 1,
                       dtype=compute_dtype(config))


def make_finetune_step(config: Config, model: InceptionV3, mesh=None,
                       lr: float = 1e-4):
    tx = optax.adam(lr)
    img_key = f"img{config.imsizes[-1]}"

    def init(rng):
        variables = model.init(rng, jnp.zeros((2, 299, 299, 3)), train=True)
        return variables, tx.init(variables["params"])

    def step(variables, opt_state, batch, rng):
        def loss_fn(params):
            x = resize_bilinear_half_pixel(batch[img_key], (299, 299))
            out, mutated = model.apply(
                {**variables, "params": params}, x, train=True,
                mutable=["batch_stats"])
            # dataset class ids are 1-based; class 0 stays background.
            labels = batch["class_ids"]
            logz = jax.scipy.special.logsumexp(out["logits"], axis=-1)
            ll = jnp.take_along_axis(out["logits"], labels[:, None], 1)[:, 0]
            loss = jnp.mean(logz - ll)
            acc = jnp.mean((jnp.argmax(out["logits"], -1) == labels)
                           .astype(jnp.float32))
            return loss, (mutated["batch_stats"], acc)

        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"])
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        new_vars = {"params": params, "batch_stats": new_stats}
        return new_vars, opt_state, {"is_finetune/loss": loss,
                                     "is_finetune/acc": acc}

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        bsh = NamedSharding(mesh, P(DATA_AXIS))
        jitted = jax.jit(step, in_shardings=(repl, repl, bsh, repl),
                         out_shardings=(repl, repl, repl))
    else:
        jitted = jax.jit(step)
    return jitted, init


def finetune_inception(config: Config, dataset, output_dir: str, epochs: int,
                       seed: int = 0, lr: float = 1e-4,
                       max_iters_per_epoch: Optional[int] = None):
    """Train and save the IS classifier; returns its variables."""
    import orbax.checkpoint as ocp

    from eegan_tpu.data.pipeline import DataPipeline, device_prefetch
    from eegan_tpu.parallel.mesh import make_mesh
    from eegan_tpu.training.logging import MetricWriter

    mesh = make_mesh(config.RUNTIME.MESH)
    model = build_is_model(config)
    step_fn, init = make_finetune_step(config, model, mesh, lr)
    variables, opt_state = init(jax.random.PRNGKey(seed))

    pipeline = DataPipeline(dataset, config.TRAIN.BATCH_SIZE, seed=seed,
                            num_workers=config.RUNTIME.DATA_WORKERS)
    writer = MetricWriter(os.path.join(output_dir, "writer_is"))
    rng = jax.random.PRNGKey(seed)
    it = 0
    for epoch in range(1, epochs + 1):
        for i, batch in enumerate(device_prefetch(pipeline.epoch(epoch), mesh)):
            if max_iters_per_epoch is not None and i >= max_iters_per_epoch:
                break
            rng, sub = jax.random.split(rng)
            variables, opt_state, metrics = step_fn(variables, opt_state,
                                                    batch, sub)
            it += 1
            if it % 50 == 1:
                writer.write_scalars(it, {k: float(v)
                                          for k, v in metrics.items()})

    path = os.path.abspath(os.path.join(output_dir, "is_inception"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, dict(variables), force=True)
    ckptr.wait_until_finished()
    print(f"saved IS classifier -> {path}")
    writer.close()
    pipeline.close()
    return variables


def load_is_classifier(path: str, config: Config):
    """Load a saved IS classifier for `InceptionScorer(variables=...)`."""
    import orbax.checkpoint as ocp

    model = build_is_model(config)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 299, 299, 3)), train=False)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=dict(template))
