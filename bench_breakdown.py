#!/usr/bin/env python
"""Per-phase cost breakdown of the training iteration on the attached chip.

Times, as separately jitted programs: text encoding, the generator forward,
one hinge D step (per scale), one MAGP step (per scale), and the G update
(downstream losses incl. the frozen-Inception DAMSM terms). Guides kernel
work — phases that dominate are the fusion targets.

All arrays are passed as jit arguments (closing over device arrays would
bake them into the HLO as literals, which blows up the remote-compile
payload).
"""

from __future__ import annotations

import functools
import json
import time


def timeit(f, *args, iters=5):
    """Per-iteration VALUE-FETCH sync: on this tunnelled platform
    block_until_ready is not an execution barrier (bench_truth.py), so each
    iteration fetches one scalar derived from the outputs — the value
    cannot exist before the phase executed. Includes one dispatch round
    trip (~5 ms), negligible against real phase times (tens-hundreds ms)."""
    import jax
    import jax.numpy as jnp

    def scalar(out):
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        return float(jnp.sum(leaves[0].ravel()[:1].astype(jnp.float32)))

    scalar(f(*args))  # compile + warm, drained
    t0 = time.perf_counter()
    for _ in range(iters):
        scalar(f(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from eegan_tpu.config import Config
    from eegan_tpu.data.synthetic import synthetic_batch
    from eegan_tpu.losses import damsm as dl, gan as gl
    from eegan_tpu.models.attr_enhance import AttrEnhance
    from eegan_tpu.models.factory import build_models
    from eegan_tpu.training.state import create_train_state, make_optimizers
    from eegan_tpu.training.steps import encode_text_bundle

    c = Config()
    c.GAN.GF_DIM = 32
    c.GAN.DF_DIM = 32
    c.TRAIN.CLASS_NUM = 200
    c.TRAIN.BATCH_SIZE = 32
    c.RUNTIME.COMPUTE_DTYPE = "bfloat16"
    models = build_models(c, n_words=5450)
    state, frozen = create_train_state(c, models, jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(c, 32, n_words=5450).items()}
    g_tx, d_tx = make_optimizers(c)
    sm = c.TRAIN.SMOOTH

    results = {}

    @jax.jit
    def text_enc(frozen, batch):
        return encode_text_bundle(models, frozen, c, batch)

    results["text_encode"] = timeit(text_enc, frozen, batch)
    words, sent, unpair_sent, attrs_emb = jax.block_until_ready(
        text_enc(frozen, batch))
    noise = jax.random.normal(jax.random.PRNGKey(1), (32, c.GAN.Z_DIM))

    @jax.jit
    def g_forward(gp, ap, stats, noise, sent, attrs_emb):
        _, attn = models.attr_enhance.apply({"params": ap}, sent, attrs_emb)
        merged = AttrEnhance.attr_merge(attn)
        imgs, mut = models.generator.apply(
            {"params": gp, "batch_stats": stats}, noise, sent, merged,
            train=True, mutable=["batch_stats"])
        return imgs, merged, mut["batch_stats"]

    results["G_forward"] = timeit(g_forward, state.g_params,
                                  state.attr_params, state.g_stats,
                                  noise, sent, attrs_emb)
    fake_imgs, merged, _ = jax.block_until_ready(g_forward(
        state.g_params, state.attr_params, state.g_stats, noise, sent,
        attrs_emb))
    fake_imgs = [jax.lax.stop_gradient(x) for x in fake_imgs]
    cls_labels = gl.one_hot_class_labels(batch["class_ids"], c.TRAIN.CLASS_NUM)

    for i, scale in enumerate(models.scales):
        disc = models.discriminators[i]
        is_cls = disc.disc_class

        @functools.partial(jax.jit, static_argnames=())
        def d_step(dp, d_opt, real, fake, sent, unpair_sent, cls_labels,
                   _disc=disc, _is_cls=is_cls):
            def loss(p):
                fr = _disc.apply({"params": p}, real, method="features")
                ff = _disc.apply({"params": p}, fake, method="features")
                if _is_cls:
                    ro, rc = _disc.apply({"params": p}, fr, sent, method="head")
                    uo, _ = _disc.apply({"params": p}, fr, unpair_sent,
                                        method="head")
                    fo, _ = _disc.apply({"params": p}, ff, sent, method="head")
                    extra = gl.bce_with_logits(rc, cls_labels)
                else:
                    ro = _disc.apply({"params": p}, fr, sent, method="head")
                    uo = _disc.apply({"params": p}, fr, unpair_sent,
                                     method="head")
                    fo = _disc.apply({"params": p}, ff, sent, method="head")
                    extra = 0.0
                return gl.d_hinge_total(gl.hinge_real(ro), gl.hinge_fake(fo),
                                        gl.hinge_fake(uo)) + extra

            grads = jax.grad(loss)(dp)
            updates, d_opt = d_tx.update(grads, d_opt, dp)
            return optax.apply_updates(dp, updates), d_opt

        results[f"D{scale}_hinge_step"] = timeit(
            d_step, state.d_params[i], state.d_opts[i], batch[f"img{scale}"],
            fake_imgs[i], sent, unpair_sent, cls_labels)

        @jax.jit
        def magp_step(dp, d_opt, real, sent, _disc=disc, _is_cls=is_cls):
            def gp_loss(p):
                def pair_sum(img, s):
                    feat = _disc.apply({"params": p}, img, method="features")
                    out = _disc.apply({"params": p}, feat, s, method="head")
                    if _is_cls:
                        out = out[0]
                    return out.sum()

                gi, gs = jax.grad(pair_sum, (0, 1))(real, sent)
                return gl.magp_from_grads(gi, gs)

            grads = jax.grad(gp_loss)(dp)
            updates, d_opt = d_tx.update(grads, d_opt, dp)
            return optax.apply_updates(dp, updates), d_opt

        results[f"D{scale}_magp_step"] = timeit(
            magp_step, state.d_params[i], state.d_opts[i],
            batch[f"img{scale}"], sent)

    @jax.jit
    def g_update(gp, ap, stats, d_params, image_vars, noise, sent, attrs_emb,
                 words, cap_lens, class_ids):
        def loss(gp_ap):
            gp_, ap_ = gp_ap
            _, attn = models.attr_enhance.apply({"params": ap_}, sent,
                                                attrs_emb)
            merged_ = AttrEnhance.attr_merge(attn)
            imgs, _ = models.generator.apply(
                {"params": gp_, "batch_stats": stats}, noise, sent, merged_,
                train=True, mutable=["batch_stats"])
            total = jnp.float32(0)
            for i in range(3):
                disc = models.discriminators[i]
                feat = disc.apply({"params": d_params[i]}, imgs[i],
                                  method="features")
                out = disc.apply({"params": d_params[i]}, feat, sent,
                                 method="head")
                total = total - (out[0] if disc.disc_class else out).mean()
            region, code = models.image_encoder.apply(
                image_vars, imgs[-1], train=False)
            s0, s1 = dl.sent_loss(code, sent, class_ids, sm.GAMMA3)
            w0, w1 = dl.words_loss(region, words, cap_lens, class_ids,
                                   sm.GAMMA1, sm.GAMMA2, sm.GAMMA3)
            a0, a1 = dl.sent_loss(code, merged_, class_ids, sm.GAMMA3)
            return total + 0.05 * (s0 + s1 + w0 + w1 + a0 + a1)

        return jax.grad(loss)((gp, ap))

    results["G_update_grads"] = timeit(
        g_update, state.g_params, state.attr_params, state.g_stats,
        tuple(state.d_params), frozen.image_vars, noise, sent, attrs_emb,
        words, batch["cap_lens"], batch["class_ids"])

    total = sum(results.values())
    for k, v in results.items():
        print(f"{k:22s} {v:8.2f} ms  ({100 * v / total:4.1f}% of phase sum)")
    print(f"{'SUM':22s} {total:8.2f} ms")
    print(json.dumps({"metric": "phase_sum_ms", "value": round(total, 2),
                      "unit": "ms", "vs_baseline": 1.0}))


if __name__ == "__main__":
    main()
