#!/usr/bin/env python
"""Pretrain the DAMSM text/image encoders (sentence + word contrastive).

The reference consumes AttnGAN-pretrained encoders but cannot produce them;
this CLI bootstraps them inside the framework:

    python pretrain_damsm.py --cfg cfg/bird.yml --output_dir damsm_bird \\
        --epochs 200

The result directory plugs straight into TEXT.DAMSM_NAME.
"""

from __future__ import annotations

import argparse
import os


def parse_args():
    parser = argparse.ArgumentParser(description="Pretrain DAMSM encoders")
    parser.add_argument("--cfg", dest="cfg_file", default="cfg/bird.yml")
    parser.add_argument("--output_dir", default="damsm_out")
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--batch_size", type=int, default=48)
    parser.add_argument("--manualSeed", type=int, default=3407)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--max_iters", type=int, default=None)
    parser.add_argument("--set", dest="overrides", action="append",
                        default=[], metavar="KEY=VALUE",
                        help="config override, e.g. --set GAN.GF_DIM=16")
    return parser.parse_args()


def main():
    args = parse_args()

    import jax

    from eegan_tpu.config import apply_overrides, fresh_config
    from eegan_tpu.models.factory import build_models
    from eegan_tpu.training.damsm_trainer import pretrain_damsm
    from eegan_tpu.training.state import create_train_state

    config = fresh_config(args.cfg_file)
    apply_overrides(config, args.overrides)
    config.TRAIN.BATCH_SIZE = args.batch_size

    if args.synthetic:
        from eegan_tpu.data.synthetic import SyntheticDataset

        dataset = SyntheticDataset(config)
    else:
        from eegan_tpu.data.datasets import TextImageDataset

        dataset = TextImageDataset(config, split="train")

    models = build_models(config, dataset.n_words)
    _, frozen_init = create_train_state(config, models,
                                        jax.random.PRNGKey(args.manualSeed))

    out = os.path.join(config.SAVE_DIR or ".", args.output_dir)
    os.makedirs(out, exist_ok=True)
    pretrain_damsm(config, models, frozen_init, dataset, out,
                   epochs=args.epochs, seed=args.manualSeed,
                   max_iters_per_epoch=args.max_iters)


if __name__ == "__main__":
    main()
