#!/usr/bin/env python
"""Word-level conditioning probe: does the words-loss pathway TRAIN?

VERDICT r2 #4: the color probe's captions are one word, so every pass to
date could be explained by sentence/class signals alone — the DAMSM
words-loss (`miscc/DAMSM_losses.py:272-342`, the reference's signature
mechanism and the thing the Pallas kernel accelerates) had only ever been
grad-parity tested, never shown to train anything. This probe isolates it:

Task: 5 palette colors, classes = the 10 unordered color pairs. Image =
left half color A, right half color B; caption = the two color WORDS
(cap_len 2); attributes = one word each. A generator conditioned at the
word level must paint both named colors.

Signal isolation — every other conditioning pathway is switched off:
  * USE_CLASS=False: no class-BCE head;
  * TRAIN.SENT_COE = TRAIN.ATTR_COE = 0: the sentence and attr DAMSM terms
    are dropped AT TRACE TIME (steps.py);
  * ablate={"dcond"}: every discriminator head (and MAGP) receives ZERO
    sentence embeddings. This last item is a round-5 redesign: the
    original probe assumed unpair==true made the conditional hinge
    class-blind ("real/unpair terms cancel on identical inputs") — false:
    relu(1-s) + relu(1+s)/2 nets upward pressure on s, so COND_DNET
    still conditions G, and at seed 1 the words-OFF arm hit 6/10 through
    that path alone (seed 0: 0/10 — seed-dependent, which is exactly what
    made the original flip criterion unsound). With dcond the words-loss
    is genuinely the generator's ONLY class-dependent gradient.

Ablation: the run is repeated with TRAIN.WORDS_COE=0 (no conditioning
signal at all). Pass requires the flip: words arm best >= 5/10 classes
(chance per class = 2/25, P[Binom(10, 0.08) >= 5] ~ 5.4e-4 < 1e-3) AND
off arm best <= 2/10. `--pallas 1` routes the words-loss through the
fused Pallas custom-VJP kernel (TPU only) so the kernel's TRAINING
gradients are exercised, not just its grad parity.

Findings (one v5e chip, round 3): see PERF.md §8 / the recorded JSON.

Usage: validate_words.py [steps] [--arm words|off|both] [--pallas 0|1]
       [--dtype float32] [--clip 100]
"""

from __future__ import annotations

import argparse
import itertools
import json

import numpy as np

COLORS = np.array([
    [0.9, -0.8, -0.8],   # red
    [-0.8, 0.9, -0.8],   # green
    [-0.8, -0.8, 0.9],   # blue
    [0.9, 0.9, -0.8],    # yellow
    [0.9, 0.9, 0.9],     # white
], np.float32)
PAIRS = list(itertools.combinations(range(len(COLORS)), 2))  # 10 classes


class PairDataset:
    """caption = [wordA, wordB]; image = left half A, right half B."""

    def __init__(self, config, size=640):
        self.config = config
        self.size = size
        self.k = len(PAIRS)
        self.n_words = len(COLORS) + 2
        self.ixtoword = {0: "<end>", **{i + 1: f"color{i}"
                                        for i in range(len(COLORS))},
                         len(COLORS) + 1: "pad"}

    def __len__(self):
        return self.size

    def sample(self, index, rng, augment=True):
        c = self.config
        t = c.TEXT
        cls = index % self.k
        a, b = PAIRS[cls]
        out = {}
        scale = 1.0 - 0.25 * rng.random()
        for s in c.imsizes:
            img = np.empty((s, s, 3), np.float32)
            img[:, : s // 2] = COLORS[a] * scale
            img[:, s // 2:] = COLORS[b] * scale
            img += rng.normal(0, 0.1, (s, s, 3))
            out[f"img{s}"] = np.clip(img, -1, 1).astype(np.float32)
        caps = np.zeros(t.WORDS_NUM, np.int32)
        caps[0], caps[1] = a + 1, b + 1
        out["caps"] = caps
        out["cap_lens"] = np.int32(2)
        attrs = np.zeros((t.MAX_ATTR_NUM, t.MAX_ATTR_LEN), np.int32)
        attrs[0, 0], attrs[1, 0], attrs[2, 0] = a + 1, b + 1, a + 1
        out["attrs"] = attrs
        out["attr_lens"] = np.ones(t.MAX_ATTR_NUM, np.int32)
        # Mismatch-branch neutralisation: unpair == pair (see module doc).
        out["unpair_caps"] = caps.copy()
        out["unpair_cap_lens"] = np.int32(2)
        out["class_ids"] = np.int32(cls + 1)
        return out


def run_arm(words_coe: float, steps: int, batch: int, dtype: str,
            clip: float, damsm_steps: int, sim_coe: float, pallas: bool,
            frozen_override=None, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from eegan_tpu.config import Config
    from eegan_tpu.data.pipeline import DataPipeline
    from eegan_tpu.models.factory import build_models
    from eegan_tpu.parallel.mesh import make_mesh, shard_batch
    from eegan_tpu.training.damsm_trainer import make_damsm_train_step
    from eegan_tpu.training.state import FrozenEncoders, create_train_state
    from eegan_tpu.training.steps import make_sample_step, make_train_step

    c = Config()
    c.GAN.GF_DIM = 16
    c.GAN.DF_DIM = 16
    c.TRAIN.BATCH_SIZE = batch
    c.TRAIN.CLASS_NUM = len(PAIRS)
    c.TRAIN.USE_CLASS = False        # signal isolation (module doc)
    c.TRAIN.SIM_COE = sim_coe
    c.TRAIN.SENT_COE = 0.0
    c.TRAIN.ATTR_COE = 0.0
    c.TRAIN.WORDS_COE = words_coe
    c.TRAIN.D_GRAD_CLIP = clip
    c.TRAIN.G_EMA_DECAY = 0.995
    c.RUNTIME.COMPUTE_DTYPE = dtype
    c.RUNTIME.PALLAS_DAMSM = pallas

    mesh = make_mesh("data:-1")
    ds = PairDataset(c)
    models = build_models(c, n_words=ds.n_words)
    state, frozen = create_train_state(c, models,
                                       jax.random.PRNGKey(1000 + seed))
    pipe = DataPipeline(ds, batch, seed=seed, num_workers=0)

    pool = []
    for b in pipe.epoch(1):
        pool.append(shard_batch(b, mesh))
        if len(pool) == 12:
            break

    # ---- phase 1: DAMSM-pretrain the encoders on the pair corpus -------
    if frozen_override is None:
        damsm_step, damsm_init = make_damsm_train_step(c, models, mesh)
        text_vars, image_vars = frozen.text_vars, frozen.image_vars
        opt_states = damsm_init(text_vars, image_vars)
        rng = jax.random.PRNGKey(11 + seed)
        for done in range(1, damsm_steps + 1):
            rng, sub = jax.random.split(rng)
            text_vars, image_vars, opt_states, dm = damsm_step(
                text_vars, image_vars, opt_states, pool[done % len(pool)],
                sub)
            if done % 100 == 0:
                print(f"damsm step {done}: "
                      f"total={float(dm['damsm/total']):.3f} "
                      f"w={float(dm['damsm/w_loss']):.3f}")
        frozen = FrozenEncoders(text_vars=text_vars, image_vars=image_vars)
    else:
        frozen = frozen_override

    # ---- probe setup ---------------------------------------------------
    k = ds.k
    t = c.TEXT
    n_draws = 8
    caps = np.zeros((k, t.WORDS_NUM), np.int32)
    attrs = np.zeros((k, t.MAX_ATTR_NUM, t.MAX_ATTR_LEN), np.int32)
    for i, (a, b) in enumerate(PAIRS):
        caps[i, 0], caps[i, 1] = a + 1, b + 1
        attrs[i, 0, 0], attrs[i, 1, 0], attrs[i, 2, 0] = a + 1, b + 1, a + 1
    caps_r = jnp.asarray(np.repeat(caps, n_draws, axis=0))
    attrs_r = jnp.asarray(np.repeat(attrs, n_draws, axis=0))
    lens_r = jnp.full(k * n_draws, 2, jnp.int32)
    alens_r = jnp.ones((k * n_draws, t.MAX_ATTR_NUM), jnp.int32)

    sample = make_sample_step(c, models)

    def probe_params(g_p, a_p, g_stats):
        imgs = sample(g_p, a_p, g_stats, frozen, caps_r, lens_r,
                      attrs_r, alens_r, jax.random.PRNGKey(7))
        im = np.asarray(imgs[-1])
        s = im.shape[1]
        im = im.reshape(k, n_draws, s, s, 3)
        left = im[:, :, :, : s // 2].mean(axis=(1, 2, 3))    # (K, 3)
        right = im[:, :, :, s // 2:].mean(axis=(1, 2, 3))
        near = lambda x: np.argmin(
            np.linalg.norm(x[:, None] - COLORS[None], axis=-1), axis=1)
        nl, nr = near(left), near(right)
        correct = sum(1 for i, (a, b) in enumerate(PAIRS)
                      if {int(nl[i]), int(nr[i])} == {a, b})
        return correct, list(zip(nl.tolist(), nr.tolist()))

    def probe(state):
        raw = probe_params(state.g_params, state.attr_params, state.g_stats)
        if state.g_ema is None:
            return raw + ("raw",)
        ema = probe_params(state.g_ema, state.attr_ema, state.g_stats)
        return (raw + ("raw",)) if raw[0] >= ema[0] else (ema + ("ema",))

    # ---- phase 2: adversarial training with checkpoint-sweep probe -----
    # "dcond": zero sentence embeddings into every D head and MAGP (both
    # arms) — seed 1 showed the conditional hinge does NOT cancel on
    # identical real/unpair inputs (relu(1-s)+relu(1+s)/2 nets upward
    # pressure on s), so without this the off arm can condition through
    # COND_DNET alone (observed 6/10 at seed 1 vs 0/10 at seed 0). With it,
    # the words-loss is genuinely the only class-dependent gradient.
    step = make_train_step(c, models, mesh=mesh, donate=True,
                           ablate=frozenset({"dcond"}))
    rng = jax.random.PRNGKey(1 + 7919 * seed)
    probe_every = 250
    best, best_step, best_kind = -1, 0, "raw"
    for done in range(1, steps + 1):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, frozen, pool[done % len(pool)], sub)
        if done % probe_every == 0 or done == steps:
            correct, pairs_seen, kind = probe(state)
            if correct > best:
                best, best_step, best_kind = correct, done, kind
            print(f"step {done}: errG={float(metrics['errG/total']):.3f} "
                  f"w_loss={float(metrics['errG/w_loss']):.3f} "
                  f"probe {correct}/{k} [{kind}] "
                  f"(best {best}/{k} @ {best_step} [{best_kind}])")

    final, pairs_seen, kind = probe(state)
    for i, (a, b) in enumerate(PAIRS):
        nl, nr = pairs_seen[i]
        ok = {nl, nr} == {a, b}
        print(f"class {i} ({a},{b}): halves -> ({nl},{nr}) "
              f"{'OK' if ok else 'X'}")
    return {"best": best, "best_step": best_step, "final": final,
            "k": k, "seed": seed, "frozen": frozen}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("steps", nargs="?", type=int, default=3000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--clip", type=float, default=100.0)
    p.add_argument("--damsm_steps", type=int, default=400)
    p.add_argument("--sim_coe", type=float, default=1.0)
    p.add_argument("--pallas", type=int, default=0)
    p.add_argument("--arm", choices=["words", "off", "both"], default="both")
    p.add_argument("--seed", type=int, default=0,
                   help="seeds init, data order and train rng (VERDICT r3 "
                        "#8: multi-seed replication)")
    a = p.parse_args()

    results = {}
    frozen = None
    if a.arm in ("words", "both"):
        r = run_arm(1.0, a.steps, a.batch, a.dtype, a.clip, a.damsm_steps,
                    a.sim_coe, bool(a.pallas), seed=a.seed)
        frozen = r.pop("frozen")
        results["words"] = r
        print(json.dumps({"metric": "words_conditioning_best",
                          "value": r["best"] / r["k"], "unit": "fraction",
                          "vs_baseline": r["final"] / r["k"],
                          "arm": "words", "pallas": bool(a.pallas), **{
                              kk: r[kk] for kk in ("best", "best_step",
                                                   "final", "seed")}}))
    if a.arm in ("off", "both"):
        # Same pretrained encoders (when available) so the ONLY difference
        # between arms is the words-loss coefficient.
        r = run_arm(0.0, a.steps, a.batch, a.dtype, a.clip, a.damsm_steps,
                    a.sim_coe, bool(a.pallas), frozen_override=frozen,
                    seed=a.seed)
        r.pop("frozen")
        results["off"] = r
        print(json.dumps({"metric": "words_conditioning_best",
                          "value": r["best"] / r["k"], "unit": "fraction",
                          "vs_baseline": r["final"] / r["k"],
                          "arm": "off", **{kk: r[kk] for kk in
                                           ("best", "best_step", "final",
                                            "seed")}}))

    if a.arm == "both":
        # Measured dcond distribution (chip, 3 seeds, PERF.md §8): words
        # {8,8,6}, off {3,1,2} — an off arm occasionally grazes 3/10
        # (P[Binom(10,2/25)>=3] ~= 3.8% per run), so the gate is the
        # per-seed MARGIN, not an absolute off ceiling alone.
        w, o = results["words"], results["off"]
        assert w["best"] >= 5, \
            f"words arm best {w['best']}/10 — word conditioning not shown"
        assert o["best"] <= 3, \
            f"off arm best {o['best']}/10 — leak: conditioning without words-loss"
        assert w["best"] - o["best"] >= 3, \
            (f"margin {w['best']}-{o['best']} < 3 — arms not separated")
        print(f"WORDS PROBE PASSED (words {w['best']}/10 @ {w['best_step']} "
              f"vs off {o['best']}/10 — the ablation flips the outcome)")


if __name__ == "__main__":
    main()
