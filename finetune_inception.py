#!/usr/bin/env python
"""Train the fine-tuned Inception classifier for the Inception Score.

The reference scores IS with StackGAN's fine-tuned checkpoints it cannot
produce; this CLI produces an equivalent in-framework:

    python finetune_inception.py --cfg cfg/bird.yml --output_dir is_bird \\
        --epochs 30 --set TRAIN.CLASS_NUM=50

Then score with:
    python metrics/inception_score.py --eval_image_folder ... \\
        --is_classifier <output_dir>/is_inception --num_classes 51
"""

from __future__ import annotations

import argparse
import os


def parse_args():
    parser = argparse.ArgumentParser(description="Fine-tune IS Inception")
    parser.add_argument("--cfg", dest="cfg_file", default="cfg/bird.yml")
    parser.add_argument("--output_dir", default="is_out")
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--manualSeed", type=int, default=3407)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--max_iters", type=int, default=None)
    parser.add_argument("--set", dest="overrides", action="append",
                        default=[], metavar="KEY=VALUE")
    return parser.parse_args()


def main():
    args = parse_args()

    from eegan_tpu.config import apply_overrides, fresh_config
    from eegan_tpu.evaluation.inception_finetune import finetune_inception

    config = fresh_config(args.cfg_file)
    apply_overrides(config, args.overrides)
    config.TRAIN.BATCH_SIZE = args.batch_size

    if args.synthetic:
        from eegan_tpu.data.synthetic import SyntheticDataset

        dataset = SyntheticDataset(config)
    else:
        from eegan_tpu.data.datasets import TextImageDataset

        dataset = TextImageDataset(config, split="train")

    out = os.path.join(config.SAVE_DIR or ".", args.output_dir)
    os.makedirs(out, exist_ok=True)
    finetune_inception(config, dataset, out, epochs=args.epochs,
                       seed=args.manualSeed, lr=args.lr,
                       max_iters_per_epoch=args.max_iters)


if __name__ == "__main__":
    main()
