"""Train state pytrees and optimizer construction.

The reference keeps one Adam over G ∪ attr_enhance (lr 1e-4) and one Adam per
discriminator (lr 4e-4), betas (0.0, 0.9) — TTUR (reference
`train.py:252-263`). Here the whole state is a single flax.struct pytree so
the fused train step can donate it and Orbax can checkpoint it (including
optimizer state — which the reference never saved, making true resume
impossible; SURVEY.md §5).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from eegan_tpu.config import Config
from eegan_tpu.models.factory import ModelBundle


@flax.struct.dataclass
class FrozenEncoders:
    """Frozen DAMSM encoders (reference `train.py:233-248`)."""

    text_vars: Any
    image_vars: Any


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # scalar int32
    g_params: Any
    attr_params: Any
    g_stats: Any  # generator batch_stats collection
    g_opt: Any  # optax state over (g_params, attr_params)
    d_params: Tuple[Any, ...]
    d_opts: Tuple[Any, ...]
    # Optional exponential moving average of (g_params, attr_params)
    # (TRAIN.G_EMA_DECAY > 0). The reference has no G-EMA; adversarial
    # training orbits modes, and sampling from the EMA generator averages
    # over the orbit — the standard quality/stability lever of modern GAN
    # stacks. None when disabled (empty pytree subtree, checkpoint-compatible
    # with pre-EMA states).
    g_ema: Any = None
    attr_ema: Any = None


def make_optimizers(config: Config):
    t = config.TRAIN
    g_tx = optax.adam(t.GENERATOR_LR, b1=t.B1, b2=t.B2, eps=1e-8)
    d_tx = optax.adam(t.DISCRIMINATOR_LR, b1=t.B1, b2=t.B2, eps=1e-8)
    if t.D_GRAD_CLIP > 0:
        # bf16 guard rail: cap the D grad global norm before Adam — the
        # ||grad||^6 MAGP can spiral on degenerate batches (config.py note).
        d_tx = optax.chain(optax.clip_by_global_norm(t.D_GRAD_CLIP), d_tx)
    return g_tx, d_tx


def create_train_state(config: Config, models: ModelBundle,
                       rng: jax.Array) -> Tuple[TrainState, FrozenEncoders]:
    """Initialise all networks and optimizer states."""
    b = 2  # init batch (shapes don't matter for param shapes)
    t_cfg = config.TEXT
    keys = jax.random.split(rng, 8)

    z = jnp.zeros((b, config.GAN.Z_DIM))
    sent = jnp.zeros((b, t_cfg.EMBEDDING_DIM))
    g_vars = models.generator.init(keys[0], z, sent, sent, train=True)
    attr_vars = models.attr_enhance.init(
        keys[1], sent, jnp.zeros((b, t_cfg.MAX_ATTR_NUM, t_cfg.EMBEDDING_DIM)))

    d_params = []
    for i, (disc, s) in enumerate(zip(models.discriminators, models.scales)):
        dv = disc.init(keys[2 + i], jnp.zeros((b, s, s, 3)), sent)
        d_params.append(dv["params"])

    caps = jnp.zeros((b, t_cfg.WORDS_NUM), jnp.int32)
    lens = jnp.ones((b,), jnp.int32)
    text_vars = models.text_encoder.init(keys[5], caps, lens)
    image_vars = models.image_encoder.init(
        keys[6], jnp.zeros((b, models.scales[0], models.scales[0], 3)))

    g_tx, d_tx = make_optimizers(config)
    g_opt = g_tx.init((g_vars["params"], attr_vars["params"]))
    d_opts = tuple(d_tx.init(p) for p in d_params)

    use_ema = config.TRAIN.G_EMA_DECAY > 0
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_vars["params"],
        attr_params=attr_vars["params"],
        g_stats=g_vars["batch_stats"],
        g_opt=g_opt,
        d_params=tuple(d_params),
        d_opts=d_opts,
        g_ema=jax.tree_util.tree_map(jnp.copy, g_vars["params"])
              if use_ema else None,
        attr_ema=jax.tree_util.tree_map(jnp.copy, attr_vars["params"])
                 if use_ema else None,
    )
    frozen = FrozenEncoders(text_vars=text_vars, image_vars=image_vars)
    return state, frozen


def param_counts(state: TrainState) -> Dict[str, int]:
    def count(tree):
        return sum(x.size for x in jax.tree_util.tree_leaves(tree))

    return {
        "generator": count(state.g_params),
        "attr_enhance": count(state.attr_params),
        **{f"disc_{i}": count(p) for i, p in enumerate(state.d_params)},
    }
