"""DAMSM encoder pretraining.

The reference *consumes* AttnGAN-pretrained DAMSM encoders
(`cfg.TEXT.DAMSM_NAME`, reference `train.py:233-248`) but cannot produce
them; its config still carries the AttnGAN training knobs (ENCODER_LR,
RNN_GRAD_CLIP — reference `miscc/config.py:43-44`). This module closes the
loop: joint contrastive training of the text BiLSTM and the Inception image
encoder with the DAMSM sentence + word losses, so a user can bootstrap
encoders for a new dataset entirely inside this framework.

TPU-native shape: one fused jitted step (both encoder forwards, both losses,
one Adam update with global-norm clip on the RNN grads), batch sharded over
the mesh ``data`` axis.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from eegan_tpu.config import Config
from eegan_tpu.losses import damsm as damsm_losses
from eegan_tpu.models.factory import ModelBundle
from eegan_tpu.parallel.mesh import DATA_AXIS
from eegan_tpu.training.state import FrozenEncoders


def make_damsm_train_step(config: Config, models: ModelBundle, mesh=None):
    sm = config.TRAIN.SMOOTH
    lr = config.TRAIN.ENCODER_LR
    clip = config.TRAIN.RNN_GRAD_CLIP

    # Per-tree optimizer: the RNN gets grad clipping (reference AttnGAN
    # recipe), the CNN head does not.
    text_tx = optax.chain(optax.clip_by_global_norm(clip),
                          optax.adam(lr, b1=0.5, b2=0.999))
    image_tx = optax.adam(lr, b1=0.5, b2=0.999)

    def init_opt(text_vars, image_vars):
        return (text_tx.init(text_vars["params"]),
                image_tx.init(image_vars["params"]))

    def step(text_vars, image_vars, opt_states, batch, rng):
        from eegan_tpu.training.steps import normalize_image_leaves

        batch = normalize_image_leaves(batch)
        text_opt, image_opt = opt_states

        def loss_fn(params):
            tp, ip = params
            words, sent = models.text_encoder.apply(
                {**text_vars, "params": tp}, batch["caps"], batch["cap_lens"],
                train=True, rngs={"dropout": rng})
            region, code = models.image_encoder.apply(
                {**image_vars, "params": ip},
                batch[f"img{models.scales[-1]}"], train=False)
            s0, s1 = damsm_losses.sent_loss(code, sent, batch["class_ids"],
                                            sm.GAMMA3)
            w0, w1 = damsm_losses.words_loss(region, words, batch["cap_lens"],
                                             batch["class_ids"], sm.GAMMA1,
                                             sm.GAMMA2, sm.GAMMA3)
            total = (s0 + s1 + w0 + w1) * sm.LAMBDA
            return total, {"damsm/s_loss": s0 + s1, "damsm/w_loss": w0 + w1,
                           "damsm/total": total}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            (text_vars["params"], image_vars["params"]))
        tg, ig = grads
        t_updates, text_opt = text_tx.update(tg, text_opt,
                                             text_vars["params"])
        i_updates, image_opt = image_tx.update(ig, image_opt,
                                               image_vars["params"])
        new_text = {**text_vars,
                    "params": optax.apply_updates(text_vars["params"],
                                                  t_updates)}
        new_image = {**image_vars,
                     "params": optax.apply_updates(image_vars["params"],
                                                   i_updates)}
        return new_text, new_image, (text_opt, image_opt), metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        bsh = NamedSharding(mesh, P(DATA_AXIS))
        jitted = jax.jit(step, in_shardings=(repl, repl, repl, bsh, repl),
                         out_shardings=(repl, repl, repl, repl))
    else:
        jitted = jax.jit(step)
    return jitted, init_opt


def pretrain_damsm(config: Config, models: ModelBundle,
                   frozen_init: FrozenEncoders, dataset, output_dir: str,
                   epochs: int, seed: int = 0, mesh=None,
                   max_iters_per_epoch: Optional[int] = None
                   ) -> FrozenEncoders:
    """Run DAMSM pretraining and save the encoders for TEXT.DAMSM_NAME."""
    from eegan_tpu.data.pipeline import DataPipeline, device_prefetch
    from eegan_tpu.parallel.mesh import make_mesh
    from eegan_tpu.training.checkpoint import CheckpointManager
    from eegan_tpu.training.logging import MetricWriter

    mesh = mesh or make_mesh(config.RUNTIME.MESH)
    pipeline = DataPipeline(dataset, config.TRAIN.BATCH_SIZE, seed=seed,
                            num_workers=config.RUNTIME.DATA_WORKERS)
    step_fn, init_opt = make_damsm_train_step(config, models, mesh)

    text_vars = frozen_init.text_vars
    image_vars = frozen_init.image_vars
    opt_states = init_opt(text_vars, image_vars)
    writer = MetricWriter(os.path.join(output_dir, "writer_damsm"))
    rng = jax.random.PRNGKey(seed)

    it_count = 0
    for epoch in range(1, epochs + 1):
        for i, batch in enumerate(device_prefetch(pipeline.epoch(epoch), mesh)):
            if max_iters_per_epoch is not None and i >= max_iters_per_epoch:
                break
            rng, sub = jax.random.split(rng)
            text_vars, image_vars, opt_states, metrics = step_fn(
                text_vars, image_vars, opt_states, batch, sub)
            it_count += 1
            if it_count % 50 == 1:
                writer.write_scalars(it_count,
                                     {k: float(v) for k, v in metrics.items()})

    frozen = FrozenEncoders(text_vars=text_vars, image_vars=image_vars)
    ckpt = CheckpointManager(os.path.join(output_dir, "Model"))
    path = ckpt.save_frozen(frozen)
    print(f"saved DAMSM encoders -> {path}")
    writer.close()
    pipeline.close()
    return frozen
