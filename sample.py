#!/usr/bin/env python
"""Interactive sampling CLI (reference `sample.py`).

Three sources (reference `sample.py:31-51,272-324`):
  --from_dataset  random batch of test captions + attributes
  --from_txt      free-text file, one caption per line; attributes parsed
                  live with the NLP extractor
  --from_code     hardcoded example captions

Per caption, the noise is repeated --noise_times and grids + singles are
written under <SAVE_DIR>/<output_dir>/cap_{i}/. The reference's
--from_dataset path crashes on missing argparse attrs (SURVEY.md appendix);
this one works.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

EXAMPLE_CAPTIONS = [
    "this bird is bright blue with a white belly and a short beak",
    "a small yellow bird with black wings and a pointed orange bill",
    "this large bird has a red crown white breast and long grey tail",
]


def parse_args():
    parser = argparse.ArgumentParser(description="Sample images from EE-GAN")
    parser.add_argument("--cfg", dest="cfg_file", default="cfg/sample_bird.yml")
    parser.add_argument("--gpu", dest="gpu_ids", type=str, default="0",
                        help="ignored on TPU")
    parser.add_argument("--manualSeed", type=int, default=3407)
    parser.add_argument("--output_dir", default="example_bird")
    parser.add_argument("--model_dir", default="",
                        help="dir holding netG_{epoch} checkpoints")
    parser.add_argument("--epoch", type=int, default=0,
                        help="generator epoch to load (default: latest)")
    parser.add_argument("--from_code", action="store_true")
    parser.add_argument("--from_dataset", action="store_true")
    parser.add_argument("--from_txt", action="store_true")
    parser.add_argument("--split", default="test")
    parser.add_argument("--txt_file", default="example.txt")
    parser.add_argument("--noise_times", type=int, default=1)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--taggar_mode", default="lexicon",
                        choices=["lexicon", "perceptron", "stanford"])
    parser.add_argument("--taggar_file_path", default="", type=str)
    parser.add_argument("--jar_file_path", default="", type=str)
    parser.add_argument("--set", dest="overrides", action="append",
                        default=[], metavar="KEY=VALUE",
                        help="config override, e.g. --set GAN.GF_DIM=16")
    return parser.parse_args()


def captions_to_tokens(captions, wordtoix, words_num):
    """Free text -> padded id arrays (reference `transfer_cap_tokens`,
    sample.py:226-245)."""
    from eegan_tpu.data.prep import tokenize_caption

    caps = np.zeros((len(captions), words_num), np.int32)
    lens = np.ones(len(captions), np.int32)
    for i, text in enumerate(captions):
        ids = [wordtoix[w] for w in tokenize_caption(text) if w in wordtoix]
        ids = ids[:words_num]
        caps[i, :len(ids)] = ids
        lens[i] = max(len(ids), 1)
    return caps, lens


def attrs_to_tokens(attr_lists, wordtoix, max_num, max_len):
    """Parsed attribute phrases -> fixed grids (reference
    `transfer_attr_tokens`, sample.py:247-270)."""
    n = len(attr_lists)
    attrs = np.zeros((n, max_num, max_len), np.int32)
    attr_lens = np.ones((n, max_num), np.int32)
    for i, attr_set in enumerate(attr_lists):
        for j, attr in enumerate(attr_set[:max_num]):
            ids = [wordtoix[w] for w in attr if w in wordtoix][:max_len]
            if not ids:
                continue
            attrs[i, j, :len(ids)] = ids
            attr_lens[i, j] = len(ids)
    return attrs, attr_lens


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp

    from eegan_tpu.config import apply_overrides, fresh_config
    from eegan_tpu.data.attributes import AttributeExtractor
    from eegan_tpu.data.datasets import (
        TextImageDataset,
        load_captions_pickle,
    )
    from eegan_tpu.models.factory import build_models
    from eegan_tpu.training.checkpoint import CheckpointManager
    from eegan_tpu.training.state import create_train_state
    from eegan_tpu.training.steps import make_sample_step
    from eegan_tpu.training.trainer import load_frozen_encoders
    from eegan_tpu.utils.images import (
        mkdir_p,
        save_img_grid,
        save_img_results_one_by_one,
        save_text_results,
    )

    config = fresh_config(args.cfg_file)
    apply_overrides(config, args.overrides)
    t = config.TEXT
    visual_dir = os.path.join(config.SAVE_DIR or ".", args.output_dir)
    mkdir_p(visual_dir)

    _, _, ixtoword, wordtoix, n_words = load_captions_pickle(config.DATA_DIR)

    # ---- gather captions + attributes -------------------------------
    if args.from_dataset:
        dataset = TextImageDataset(config, split=args.split)
        rng = np.random.default_rng([args.manualSeed])
        idxs = rng.integers(0, len(dataset), args.batch_size)
        samples = [dataset.sample(int(i), rng) for i in idxs]
        caps = np.stack([s["caps"] for s in samples])
        cap_lens = np.stack([s["cap_lens"] for s in samples])
        attrs = np.stack([s["attrs"] for s in samples])
        attr_lens = np.stack([s["attr_lens"] for s in samples])
        texts = [" ".join(ixtoword[int(w)] for w in c[:l])
                 for c, l in zip(caps, cap_lens)]

        # Reference `sample.py:280-286`: dump the paired real images (grid +
        # singles) and a caption/attribute text file for side-by-side eyeballing.
        top = dataset.imsizes[-1]
        real_imgs = np.stack([s[f"img{top}"] for s in samples])
        real_dir = os.path.join(visual_dir, "real_images")
        mkdir_p(real_dir)
        save_img_results_one_by_one(
            real_imgs, [f"cap_{i}" for i in range(len(real_imgs))], real_dir)
        save_img_grid(real_imgs, os.path.join(real_dir, "real_images.png"))
        save_text_results(caps, cap_lens, ixtoword,
                          os.path.join(visual_dir, "dataset_example.txt"),
                          attrs, attr_lens)
    else:
        if args.from_txt:
            with open(args.txt_file) as f:
                texts = [line.strip() for line in f if line.strip()]
        else:  # --from_code
            texts = EXAMPLE_CAPTIONS
        extractor = AttributeExtractor(
            config.DATASET_NAME, args.taggar_mode,
            args.taggar_file_path, args.jar_file_path)
        attr_lists = [extractor.parse_caption(text) for text in texts]
        for i, (text, al) in enumerate(zip(texts, attr_lists)):
            print(f"#{i} {text}  | attrs: {['_'.join(a) for a in al]}")
        caps, cap_lens = captions_to_tokens(texts, wordtoix, t.WORDS_NUM)
        attrs, attr_lens = attrs_to_tokens(attr_lists, wordtoix,
                                           t.MAX_ATTR_NUM, t.MAX_ATTR_LEN)

    # ---- models + checkpoints ---------------------------------------
    models = build_models(config, n_words)
    if not args.model_dir:
        # No generator checkpoint: this is a smoke run by construction
        # (random G), so don't hard-require the DAMSM encoders either —
        # mirrors test.py --debug. With --model_dir the production rule
        # holds: sampling needs the real text encoder to embed captions
        # (reference sample.py loads it unconditionally).
        config.RUNTIME.ALLOW_RANDOM_ENCODERS = True
    state, init_frozen = create_train_state(config, models,
                                            jax.random.PRNGKey(args.manualSeed))
    frozen = load_frozen_encoders(config, models, init_frozen)
    g_params, attr_params, g_stats = (state.g_params, state.attr_params,
                                      state.g_stats)
    if args.model_dir:
        ckpt = CheckpointManager(args.model_dir)
        epochs = ckpt.available_generator_epochs()
        epoch = args.epoch or (epochs[-1] if epochs else 0)
        if epoch:
            restored = ckpt.load_generator(epoch, None)
            g_params = restored["g_params"]
            attr_params = restored["attr_params"]
            g_stats = restored["g_stats"]
            print(f"loaded generator epoch {epoch}")
    else:
        print("WARNING: no --model_dir given — sampling from random weights")

    sample_step = make_sample_step(config, models)

    # ---- per caption: repeat noise_times ----------------------------
    for cap_i in range(len(caps)):
        b = args.noise_times
        batch_caps = jnp.asarray(np.repeat(caps[cap_i][None], b, 0))
        batch_lens = jnp.asarray(np.repeat(cap_lens[cap_i][None], b, 0)
                                 .reshape(b))
        batch_attrs = jnp.asarray(np.repeat(attrs[cap_i][None], b, 0))
        batch_attr_lens = jnp.asarray(np.repeat(attr_lens[cap_i][None], b, 0))
        key = jax.random.PRNGKey(args.manualSeed * 7919 + cap_i)
        imgs = sample_step(g_params, attr_params, g_stats, frozen,
                           batch_caps, batch_lens, batch_attrs,
                           batch_attr_lens, key)
        img256 = np.asarray(imgs[-1])
        save_dir = os.path.join(visual_dir, f"cap_{cap_i}")
        mkdir_p(save_dir)
        save_img_grid(img256, os.path.join(save_dir, "samples.png"))
        save_img_results_one_by_one(
            img256, [f"sample_{j}" for j in range(b)], save_dir)
        with open(os.path.join(save_dir, "caption.txt"), "w") as f:
            f.write(texts[cap_i] + "\n")
    print(f"saved samples for {len(caps)} captions under {visual_dir}")


if __name__ == "__main__":
    main()
