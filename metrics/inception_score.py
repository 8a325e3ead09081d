#!/usr/bin/env python
"""Standalone Inception Score CLI (reference `metrics/IS_TF/inception_score.py`).

Scores image folders (Epoch_{e}_{r} sweep or a single folder) with
IS = exp(mean KL) over --splits splits. Uses the Flax Inception; pass
--inception_ckpt (torch .pth export of the StackGAN fine-tuned model) for
paper-comparable numbers. Without it, scores use random weights and are only
useful as a pipeline smoke check (clearly flagged).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    parser = argparse.ArgumentParser(description="Inception Score")
    parser.add_argument("--eval_image_folder", type=str, required=True)
    parser.add_argument("--select_epochs", type=str, default="550:700:10")
    parser.add_argument("--repeat_times", type=int, default=1)
    parser.add_argument("--splits", type=int, default=10)
    parser.add_argument("--max_images", type=int, default=30000)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--num_classes", type=int, default=51,
                        help="50 birds / 20 flowers + 1 background "
                             "(reference inception_score.py:41-51)")
    parser.add_argument("--inception_ckpt", type=str, default="",
                        help="torch .pth to convert")
    parser.add_argument("--is_classifier", type=str, default="",
                        help="Orbax dir from finetune_inception.py")
    parser.add_argument("--cfg", type=str, default="cfg/bird.yml",
                        help="config (class count) for --is_classifier")
    return parser.parse_args()


def main():
    args = parse_args()

    from eegan_tpu.evaluation.inception_score import InceptionScorer

    variables = None
    if args.is_classifier:
        from eegan_tpu.config import fresh_config
        from eegan_tpu.evaluation.inception_finetune import load_is_classifier

        config = fresh_config(args.cfg)
        config.TRAIN.CLASS_NUM = args.num_classes - 1
        variables = load_is_classifier(args.is_classifier, config)
    elif args.inception_ckpt:
        import jax
        import jax.numpy as jnp

        from eegan_tpu.models.inception import InceptionV3
        from eegan_tpu.utils.torch_convert import (
            convert_by_template,
            load_state_dict,
        )

        model = InceptionV3(num_classes=args.num_classes)
        template = model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 299, 299, 3)))
        sd = load_state_dict(args.inception_ckpt)
        variables = {
            "params": convert_by_template(template["params"], sd, "params"),
            "batch_stats": convert_by_template(template["batch_stats"], sd,
                                               "batch_stats"),
        }
    else:
        print("WARNING: no --inception_ckpt — scores use random weights and "
              "are not comparable to published numbers")

    scorer = InceptionScorer(variables=variables,
                             num_classes=args.num_classes,
                             batch_size=args.batch_size)

    root = args.eval_image_folder
    has_epochs = any(d.startswith("Epoch_") for d in os.listdir(root)) \
        if os.path.isdir(root) else False
    if has_epochs:
        from test import parse_epochs

        for e in parse_epochs(args.select_epochs):
            for r in range(args.repeat_times):
                folder = os.path.join(root, f"Epoch_{e}_{r}")
                if not os.path.isdir(folder):
                    continue
                mean, std = scorer.score_folder(folder, args.splits,
                                                args.max_images)
                print(f"Epoch_{e}_{r}: IS = {mean:.3f} +- {std:.3f}")
    else:
        mean, std = scorer.score_folder(root, args.splits, args.max_images)
        print(f"IS = {mean:.3f} +- {std:.3f}")


if __name__ == "__main__":
    main()
