"""The fused GAN train step: one jitted XLA program per iteration.

Reproduces the per-iteration semantics of the reference hot loop
(`train.py:148-211, 437-502`) but as a *single* compiled function:

  1. frozen text encoding of caption + N attrs + unpaired caption — batched
     into ONE BiLSTM call over 5B sequences (the reference runs five
     separate forwards, `train.py:169-184`);
  2. attr-enhance + generator forward (fake image pyramid);
  3. per scale: hinge D step (real / fake / mismatch / class), Adam update,
     then the MAGP gradient-penalty step as a SECOND Adam update at the
     freshly updated D params — the reference's two-optimizer-step quirk
     (`train.py:452-459`) is preserved exactly;
  4. G update against the *updated* discriminators + DAMSM sent/word/attr
     losses through the frozen Inception encoder (`train.py:471-502`).

The generator forward appears both in the D phase (stop-gradient) and inside
the G loss; both live in the same jit so XLA CSE merges the pure parts.
Batch-norm statistics are computed over the global (mesh-sharded) batch —
GSPMD inserts the ICI psums that replace the reference's sync_batchnorm.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eegan_tpu.config import Config
from eegan_tpu.losses import damsm as damsm_losses
from eegan_tpu.losses import gan as gan_losses
from eegan_tpu.models.attr_enhance import AttrEnhance
from eegan_tpu.models.factory import ModelBundle
from eegan_tpu.parallel.mesh import DATA_AXIS
from eegan_tpu.training.state import FrozenEncoders, TrainState, make_optimizers

Batch = Dict[str, jnp.ndarray]


def normalize_image_leaves(batch: Batch) -> Batch:
    """On-device ToTensor+Normalize for RUNTIME.UINT8_TRANSFER batches.

    The host ships uint8 [0, 255] pyramids (4x smaller transfer); this
    converts them to the float32 [-1, 1] layout the losses expect, inside
    the jitted step where XLA fuses it into the first consumer. Float
    batches pass through untouched (jit specialises on input dtype, so
    there is no runtime branch).
    """
    out = dict(batch)
    for k, v in batch.items():
        if k.startswith("img") and hasattr(v, "dtype") and v.dtype == jnp.uint8:
            out[k] = v.astype(jnp.float32) / 127.5 - 1.0
    return out


def encode_text_bundle(models: ModelBundle, frozen: FrozenEncoders,
                       config: Config, batch: Batch):
    """One BiLSTM forward over [caps; unpair; attrs] (5B sequences).

    Returns words (B,T,D), sent (B,D), unpair_sent (B,D), attrs_emb (B,A,D).
    """
    caps = batch["caps"]
    b, t = caps.shape
    a_num = config.TEXT.MAX_ATTR_NUM
    a_len = config.TEXT.MAX_ATTR_LEN

    attrs = batch["attrs"].reshape(b * a_num, a_len)
    attrs = jnp.pad(attrs, ((0, 0), (0, t - a_len)))
    attr_lens = jnp.maximum(batch["attr_lens"].reshape(b * a_num), 1)

    caps_all = jnp.concatenate([caps, batch["unpair_caps"], attrs], axis=0)
    lens_all = jnp.concatenate(
        [batch["cap_lens"], batch["unpair_cap_lens"], attr_lens], axis=0)

    words_all, sent_all = models.text_encoder.apply(
        frozen.text_vars, caps_all, lens_all, train=False)

    words = words_all[:b]
    sent = sent_all[:b]
    unpair_sent = sent_all[b:2 * b]
    attrs_emb = sent_all[2 * b:].reshape(b, a_num, -1)
    return words, sent, unpair_sent, attrs_emb


def build_train_step_fn(config: Config, models: ModelBundle,
                        ablate: frozenset = frozenset()):
    """The raw (unjitted) train step: (state, frozen, batch, rng) ->
    (state, metrics). Jitted directly by `make_train_step`, or scanned K
    times per dispatch by `make_multi_train_step`.

    ``ablate`` is for benchmarking and probe isolation ONLY
    (bench_ablate.py, validate_words.py): it surgically removes a phase so
    its marginal cost — or its conditioning channel — can be measured
    honestly. Recognised keys: "text" (zero embeddings instead of the
    BiLSTM), "damsm" (skip sent/words/attr losses + Inception), "words"
    (skip only the words-loss), "magp" (skip the second D step), "dsteps"
    (skip the D updates entirely), "dcond" (feed ZERO sentence embeddings
    to every discriminator head and to MAGP — kills the conditional-GAN
    signal path so a probe can attribute conditioning to the DAMSM terms
    alone; the seed-1 words probe showed the hinge real/unpair pair does
    NOT cancel on identical inputs: relu(1-s) + relu(1+s)/2 nets upward
    pressure on s, so COND_DNET conditions G even with every DAMSM
    coefficient at zero). Never set in production.
    """
    g_tx, d_tx = make_optimizers(config)
    n_scales = len(models.scales)
    # Fused Pallas words-loss (custom VJP) on TPU; XLA path elsewhere
    # (interpretless pallas_call requires the Mosaic TPU compiler).
    use_pallas_damsm = (config.RUNTIME.PALLAS_DAMSM
                        and jax.default_backend() == "tpu")
    use_class = config.TRAIN.USE_CLASS
    class_num = config.TRAIN.CLASS_NUM
    class_coe = config.TRAIN.CLASS_COE
    sim_coe = config.TRAIN.SIM_COE
    sent_coe = config.TRAIN.SENT_COE
    words_coe = config.TRAIN.WORDS_COE
    attr_coe = config.TRAIN.ATTR_COE
    sm = config.TRAIN.SMOOTH
    nz = config.GAN.Z_DIM

    def disc_features(i, dp, img):
        return models.discriminators[i].apply({"params": dp}, img,
                                              method="features")

    def disc_head(i, dp, feat, cond):
        return models.discriminators[i].apply({"params": dp}, feat, cond,
                                              method="head")

    def gen_forward(g_params, attr_params, g_stats, noise, sent, attrs_emb):
        _, attn_attrs = models.attr_enhance.apply(
            {"params": attr_params}, sent, attrs_emb)
        merged = AttrEnhance.attr_merge(attn_attrs)
        imgs, mutated = models.generator.apply(
            {"params": g_params, "batch_stats": g_stats},
            noise, sent, merged, train=True, mutable=["batch_stats"])
        return imgs, merged, mutated["batch_stats"]

    def d_scale_update(i, dp, d_opt, real, fake, sent, unpair_sent,
                       class_labels):
        """Hinge step then MAGP step (reference train.py:437-459)."""
        is_class_scale = use_class and i == n_scales - 1
        metrics = {}

        def loss_fn(p):
            # RUNTIME.DENSE_D (default): one 2B tower pass + one 3B head
            # pass instead of 2+3 B-sized calls. D has no cross-batch ops
            # (no BN), so the math is identical (up to conv accumulation
            # order) while the convs run at double/triple batch density —
            # the MXU-utilisation lever the batch-32 recipe needs
            # (bench_ablate.py attribution; PERF.md §3). The separate-pass
            # form costs 2-3x less D activation HBM and is the right shape
            # for very large per-chip batches (pair with RUNTIME.REMAT).
            if config.RUNTIME.DENSE_D:
                b2 = real.shape[0]
                feats = disc_features(i, p,
                                      jnp.concatenate([real, fake], axis=0))
                feat_real, feat_fake = feats[:b2], feats[b2:]
                heads = disc_head(
                    i, p,
                    jnp.concatenate([feat_real, feat_real, feat_fake], axis=0),
                    jnp.concatenate([sent, unpair_sent, sent], axis=0))
                if is_class_scale:
                    outs, clss = heads
                    real_out, unpair_out, fake_out = jnp.split(outs, 3, axis=0)
                    real_cls, unpair_cls, fake_cls = jnp.split(clss, 3, axis=0)
                else:
                    real_out, unpair_out, fake_out = jnp.split(heads, 3, axis=0)
            else:
                feat_real = disc_features(i, p, real)
                feat_fake = disc_features(i, p, fake)
                h_real = disc_head(i, p, feat_real, sent)
                h_unpair = disc_head(i, p, feat_real, unpair_sent)
                h_fake = disc_head(i, p, feat_fake, sent)
                if is_class_scale:
                    real_out, real_cls = h_real
                    unpair_out, unpair_cls = h_unpair
                    fake_out, fake_cls = h_fake
                else:
                    real_out, unpair_out, fake_out = h_real, h_unpair, h_fake
            if is_class_scale:
                err_real_c = gan_losses.bce_with_logits(real_cls, class_labels)
                err_fake_c = gan_losses.bce_with_logits(fake_cls, class_labels)
                err_unpair_c = gan_losses.bce_with_logits(unpair_cls, class_labels)
            else:
                err_real_c = err_fake_c = err_unpair_c = jnp.float32(0)
            err_real = gan_losses.hinge_real(real_out)
            err_fake = gan_losses.hinge_fake(fake_out)
            err_unpair = gan_losses.hinge_fake(unpair_out)
            loss = gan_losses.d_hinge_total(err_real, err_fake, err_unpair)
            if is_class_scale:
                loss = loss + (err_real_c + err_fake_c + err_unpair_c) / 3.0 * class_coe
            aux = {"real_sent": err_real, "fake_sent": err_fake,
                   "unpair_sent": err_unpair}
            if is_class_scale:
                aux.update({"real_class": err_real_c, "fake_class": err_fake_c,
                            "unpair_class": err_unpair_c})
            return loss, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(dp)
        updates, d_opt = d_tx.update(grads, d_opt, dp)
        dp = optax.apply_updates(dp, updates)
        metrics.update({f"errD_{i}/{k}": v for k, v in aux.items()})

        # --- MAGP second step at the freshly updated params ---
        if "magp" in ablate:
            return dp, d_opt, metrics

        def gp_loss_fn(p):
            def gp_of(img_c, sent_c):
                def pair_sum(img, s):
                    feat = disc_features(i, p, img)
                    out = disc_head(i, p, feat, s)
                    if is_class_scale:
                        out = out[0]
                    return out.sum()

                gi, gs = jax.grad(pair_sum, argnums=(0, 1))(img_c, sent_c)
                return gan_losses.magp_from_grads(gi, gs)

            # RUNTIME.MAGP_CHUNKS>1: compute the penalty over equal batch
            # chunks via a checkpointed scan. 2*mean(norm^6) over equal
            # chunks equals the full-batch mean, so the math is unchanged;
            # the double-backward's activations shrink by the chunk factor
            # — the dominant HBM term at very large per-chip batch.
            chunks = config.RUNTIME.MAGP_CHUNKS
            if chunks > 1:
                b = real.shape[0]
                if b % chunks:
                    raise ValueError(
                        f"MAGP_CHUNKS={chunks} must divide batch {b}")
                imgs = real.reshape(chunks, b // chunks, *real.shape[1:])
                sents = sent.reshape(chunks, b // chunks, sent.shape[-1])
                gp_c = jax.checkpoint(gp_of)
                _, gps = jax.lax.scan(
                    lambda c, xs: (c, gp_c(*xs)), 0.0, (imgs, sents))
                return jnp.mean(gps)
            return gp_of(real, sent)

        gp, grads = jax.value_and_grad(gp_loss_fn)(dp)
        updates, d_opt = d_tx.update(grads, d_opt, dp)
        dp = optax.apply_updates(dp, updates)
        metrics[f"errD_{i}/d_loss_gp"] = gp
        return dp, d_opt, metrics

    def train_step(state: TrainState, frozen: FrozenEncoders, batch: Batch,
                   rng: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        batch = normalize_image_leaves(batch)
        if config.RUNTIME.BF16_IMAGES:
            # "bf16-first-block D": the D phases consume bf16 pyramids, so
            # the fp32->bf16 boundary sits at the image tensors instead of
            # inside conv_img (one extra bf16 rounding of the images).
            batch = {k: (v.astype(jnp.bfloat16) if k.startswith("img") else v)
                     for k, v in batch.items()}
        if "text" in ablate:
            b_, t_ = batch["caps"].shape
            d_ = config.TEXT.EMBEDDING_DIM
            words = jnp.zeros((b_, t_, d_))
            sent = unpair_sent = jnp.zeros((b_, d_))
            attrs_emb = jnp.zeros((b_, config.TEXT.MAX_ATTR_NUM, d_))
        else:
            words, sent, unpair_sent, attrs_emb = encode_text_bundle(
                models, frozen, config, batch)
        words = jax.lax.stop_gradient(words)
        sent = jax.lax.stop_gradient(sent)
        unpair_sent = jax.lax.stop_gradient(unpair_sent)
        attrs_emb = jax.lax.stop_gradient(attrs_emb)

        b = sent.shape[0]
        # "dcond": the discriminators (and MAGP) see zero sentence
        # embeddings; G conditioning can then only flow through DAMSM.
        if "dcond" in ablate:
            d_sent = jnp.zeros_like(sent)
            d_unpair = jnp.zeros_like(unpair_sent)
        else:
            d_sent, d_unpair = sent, unpair_sent
        noise = jax.random.normal(rng, (b, nz), jnp.float32)
        class_ids = batch["class_ids"]
        class_labels = gan_losses.one_hot_class_labels(class_ids, class_num) \
            if use_class else None

        # ONE generator forward for the whole iteration: jax.vjp gives us the
        # fake pyramid for the D phase and the pullback for the G phase, so
        # the forward is never recomputed (the reference also runs G once per
        # iteration, train.py:195).
        def gen_fn(gp_ap):
            gp, ap = gp_ap
            imgs, merged, new_stats = gen_forward(gp, ap, state.g_stats,
                                                  noise, sent, attrs_emb)
            return (tuple(imgs), merged), new_stats

        ((fake_imgs, merged), gen_vjp, new_g_stats) = jax.vjp(
            gen_fn, (state.g_params, state.attr_params), has_aux=True)
        fake_sg = [jax.lax.stop_gradient(im) for im in fake_imgs]
        if config.RUNTIME.BF16_IMAGES:
            fake_sg = [im.astype(jnp.bfloat16) for im in fake_sg]

        metrics: Dict[str, jnp.ndarray] = {}
        new_d_params, new_d_opts = [], []
        for i in range(n_scales):
            if "dsteps" in ablate:
                new_d_params.append(state.d_params[i])
                new_d_opts.append(state.d_opts[i])
                continue
            real = batch[f"img{models.scales[i]}"]
            dp, d_opt, m = d_scale_update(
                i, state.d_params[i], state.d_opts[i], real, fake_sg[i],
                d_sent, d_unpair, class_labels)
            new_d_params.append(dp)
            new_d_opts.append(d_opt)
            metrics.update(m)

        # --- G phase against the updated discriminators ---
        def downstream_loss(imgs, merged):
            aux = {}
            total = jnp.float32(0)
            for i in range(n_scales):
                feat = disc_features(i, new_d_params[i], imgs[i])
                out = disc_head(i, new_d_params[i], feat, d_sent)
                if use_class and i == n_scales - 1:
                    pair, cls = out
                    err_g = -pair.mean()
                    err_g_c = gan_losses.bce_with_logits(cls, class_labels)
                    total = total + err_g + err_g_c * class_coe
                    aux[f"errG/G_{i}_fake_class"] = err_g_c
                else:
                    err_g = -out.mean()
                    total = total + err_g
                aux[f"errG/G_{i}_fake_sent"] = err_g

            # DAMSM losses on the 256² image (reference train.py:419-435).
            # Terms with a zero coefficient are dropped at TRACE time, so an
            # ablated pathway contributes no compute and no gradient.
            need_s = sent_coe != 0
            need_w = words_coe != 0 and "words" not in ablate
            need_a = attr_coe != 0
            if "damsm" in ablate or not (need_s or need_w or need_a):
                s_loss = w_loss = a_loss = jnp.float32(0)
            else:
                region, code = models.image_encoder.apply(
                    frozen.image_vars, imgs[-1], train=False)
                s_loss = w_loss = a_loss = jnp.float32(0)
                if need_s:
                    s0, s1 = damsm_losses.sent_loss(code, sent, class_ids,
                                                    sm.GAMMA3)
                    s_loss = (s0 + s1) * sm.LAMBDA * sent_coe
                if need_w and use_pallas_damsm:
                    from eegan_tpu.ops.damsm_pallas import words_loss_pallas
                    w0, w1 = words_loss_pallas(
                        region, words, batch["cap_lens"], class_ids,
                        sm.GAMMA1, sm.GAMMA2, sm.GAMMA3)
                    w_loss = (w0 + w1) * sm.LAMBDA * words_coe
                elif need_w:
                    w0, w1 = damsm_losses.words_loss(
                        region, words, batch["cap_lens"], class_ids,
                        sm.GAMMA1, sm.GAMMA2, sm.GAMMA3)
                    w_loss = (w0 + w1) * sm.LAMBDA * words_coe
                if need_a:
                    a0, a1 = damsm_losses.sent_loss(code, merged, class_ids,
                                                    sm.GAMMA3)
                    a_loss = (a0 + a1) * sm.LAMBDA * attr_coe
            total = total + sim_coe * (s_loss + w_loss + a_loss)
            aux.update({"errG/s_loss": s_loss, "errG/w_loss": w_loss,
                        "errG/a_loss": a_loss, "errG/total": total})
            return total, aux

        (_, g_aux), (d_imgs, d_merged) = jax.value_and_grad(
            downstream_loss, argnums=(0, 1), has_aux=True)(fake_imgs, merged)
        (g_grads,) = gen_vjp((tuple(d_imgs), d_merged))
        g_updates, new_g_opt = g_tx.update(
            g_grads, state.g_opt, (state.g_params, state.attr_params))
        new_gp, new_ap = optax.apply_updates(
            (state.g_params, state.attr_params), g_updates)
        metrics.update(g_aux)

        # Optional generator EMA (state.py note): ema <- d*ema + (1-d)*new.
        ema_decay = config.TRAIN.G_EMA_DECAY
        if ema_decay > 0:
            ema = lambda e, p: jax.tree_util.tree_map(
                lambda a, b: ema_decay * a + (1.0 - ema_decay) * b, e, p)
            new_g_ema = ema(state.g_ema, new_gp)
            new_attr_ema = ema(state.attr_ema, new_ap)
        else:
            new_g_ema, new_attr_ema = state.g_ema, state.attr_ema

        new_state = TrainState(
            step=state.step + 1,
            g_params=new_gp,
            attr_params=new_ap,
            g_stats=new_g_stats,
            g_opt=new_g_opt,
            d_params=tuple(new_d_params),
            d_opts=tuple(new_d_opts),
            g_ema=new_g_ema,
            attr_ema=new_attr_ema,
        )
        return new_state, metrics

    return train_step


def make_train_step(config: Config, models: ModelBundle,
                    mesh: Optional[Mesh] = None, donate: bool = True,
                    ablate: frozenset = frozenset(), state_shardings=None):
    """Build the jitted train step: (state, frozen, batch, rng) -> (state, metrics).

    ``state_shardings`` (a TrainState-shaped pytree of NamedShardings, see
    `parallel/fsdp.state_shardings`) shards parameters/optimizer/EMA leaves
    over the mesh's ``fsdp`` axis; GSPMD inserts the param all-gathers and
    grad reduce-scatters. Default None = fully replicated state (the
    reference-parity data-parallel layout)."""
    train_step = build_train_step_fn(config, models, ablate=ablate)
    donate_args = (0,) if donate else ()
    if mesh is not None:
        from eegan_tpu.parallel.mesh import batch_axes

        repl = NamedSharding(mesh, P())
        bsh = NamedSharding(mesh, P(batch_axes(mesh)))
        ssh = repl if state_shardings is None else state_shardings
        return jax.jit(
            train_step,
            donate_argnums=donate_args,
            in_shardings=(ssh, repl, bsh, repl),
            out_shardings=(ssh, repl),
        )
    return jax.jit(train_step, donate_argnums=donate_args)


def make_multi_train_step(config: Config, models: ModelBundle,
                          mesh: Optional[Mesh] = None, donate: bool = True,
                          state_shardings=None):
    """K train steps per dispatch via `lax.scan` — one host round-trip and
    one compiled program for a whole chunk of steps.

    The reference dispatches python-side per iteration (`train.py:162`);
    under a device tunnel / slow host that round-trip gates throughput.
    Takes a K-stacked batch pytree (leaves (K, B, ...), batch dim sharded on
    the mesh ``data`` axis) and returns the state after K steps plus
    per-step stacked metrics. The scan body is the SAME train_step (XLA
    compiles it once), so numerics are identical to K sequential dispatches.
    """
    train_step = build_train_step_fn(config, models)

    def multi_step(state, frozen, stacked_batch, rng):
        k = jax.tree_util.tree_leaves(stacked_batch)[0].shape[0]
        rngs = jax.random.split(rng, k)

        def body(carry, xs):
            batch, step_rng = xs
            new_state, metrics = train_step(carry, frozen, batch, step_rng)
            return new_state, metrics

        state, metrics = jax.lax.scan(body, state, (stacked_batch, rngs))
        return state, metrics

    donate_args = (0,) if donate else ()
    if mesh is not None:
        from eegan_tpu.parallel.mesh import batch_axes

        repl = NamedSharding(mesh, P())
        bsh = NamedSharding(mesh, P(None, batch_axes(mesh)))
        ssh = repl if state_shardings is None else state_shardings
        return jax.jit(
            multi_step,
            donate_argnums=donate_args,
            in_shardings=(ssh, repl, bsh, repl),
            out_shardings=(ssh, repl),
        )
    return jax.jit(multi_step, donate_argnums=donate_args)


def make_sample_step(config: Config, models: ModelBundle,
                     mesh: Optional[Mesh] = None):
    """Jitted inference: (g/attr params+stats, frozen, caps, lens, attrs, attr_lens, rng) -> image pyramid.

    Eval-mode BN (running averages), mirroring `Trainer.save_images` /
    `Tester.gen_one_batch_attr` (reference `train.py:321-331`, `test.py:280`).
    """

    def sample(g_params, attr_params, g_stats, frozen: FrozenEncoders,
               caps, cap_lens, attrs, attr_lens, rng):
        b = caps.shape[0]
        a_num = config.TEXT.MAX_ATTR_NUM
        a_len = config.TEXT.MAX_ATTR_LEN
        t = config.TEXT.WORDS_NUM

        flat_attrs = attrs.reshape(b * a_num, a_len)
        flat_attrs = jnp.pad(flat_attrs, ((0, 0), (0, t - a_len)))
        flat_lens = jnp.maximum(attr_lens.reshape(b * a_num), 1)
        caps_all = jnp.concatenate([caps, flat_attrs], axis=0)
        lens_all = jnp.concatenate([cap_lens, flat_lens], axis=0)
        _, sent_all = models.text_encoder.apply(
            frozen.text_vars, caps_all, lens_all, train=False)
        sent = sent_all[:b]
        attrs_emb = sent_all[b:].reshape(b, a_num, -1)

        _, attn_attrs = models.attr_enhance.apply(
            {"params": attr_params}, sent, attrs_emb)
        merged = AttrEnhance.attr_merge(attn_attrs)
        noise = jax.random.normal(rng, (b, config.GAN.Z_DIM), jnp.float32)
        imgs = models.generator.apply(
            {"params": g_params, "batch_stats": g_stats},
            noise, sent, merged, train=False)
        return imgs

    if mesh is not None:
        from eegan_tpu.parallel.mesh import batch_axes

        repl = NamedSharding(mesh, P())
        bsh = NamedSharding(mesh, P(batch_axes(mesh)))
        return jax.jit(sample, in_shardings=(
            repl, repl, repl, repl, bsh, bsh, bsh, bsh, repl))
    return jax.jit(sample)
