#!/usr/bin/env python
"""Standalone FID CLI (reference `metrics/FID/fid_score.py:296-305`).

Sweeps ``<eval_image_folder>/Epoch_{e}_{r}/`` against dataset statistics
(.npz with mu/sigma, or a folder of real images). Also builds dataset .npz
files (--gen_npz) like the reference's `gen_npz_file`.

NOTE (reference quirk fixed): the reference defines --compared_path but
reads args.compare_path, crashing; both spellings are accepted here.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    parser = argparse.ArgumentParser(description="FID measurement")
    parser.add_argument("--compared_path", "--compare_path",
                        dest="compared_path",
                        default="../data/Models/IS_model/bird_val.npz",
                        help=".npz stats or folder of real images")
    parser.add_argument("--eval_image_folder", type=str, required=True,
                        help="root containing Epoch_{e}_{r}/ folders, or a "
                             "single image folder")
    parser.add_argument("--select_epochs", type=str, default="550:700:10")
    parser.add_argument("--repeat_times", type=int, default=1)
    parser.add_argument("--max_images", type=int, default=30000)
    parser.add_argument("--batch_size", type=int, default=50)
    parser.add_argument("--inception_ckpt", type=str, default="",
                        help="torch inception .pth to convert (else random "
                             "weights — relative comparisons only)")
    parser.add_argument("--gen_npz", type=str, default="",
                        help="write dataset stats npz from --eval_image_folder")
    parser.add_argument("--dataset_npz", type=str, default="",
                        help="write stats npz from the dataset itself "
                             "(random crops; needs --cfg)")
    parser.add_argument("--cfg", type=str, default="",
                        help="config for --dataset_npz")
    parser.add_argument("--split", type=str, default="test")
    return parser.parse_args()


def main():
    args = parse_args()

    from eegan_tpu.evaluation.fid import (
        FIDExtractor,
        MeasureFID,
        activation_statistics,
        save_npz_stats,
    )

    variables = None
    if args.inception_ckpt:
        import jax

        from eegan_tpu.models.inception import InceptionV3
        from eegan_tpu.utils.torch_convert import load_state_dict
        import jax.numpy as jnp

        model = InceptionV3(num_classes=0)
        template = model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 299, 299, 3)))
        sd = load_state_dict(args.inception_ckpt)
        from eegan_tpu.utils.torch_convert import convert_by_template

        variables = {
            "params": convert_by_template(template["params"], sd, "params"),
            "batch_stats": convert_by_template(template["batch_stats"], sd,
                                               "batch_stats"),
        }

    extractor = FIDExtractor(variables=variables, batch_size=args.batch_size)
    measure = MeasureFID(extractor)

    if args.dataset_npz:
        from eegan_tpu.config import fresh_config
        from eegan_tpu.evaluation.fid import dataset_statistics

        config = fresh_config(args.cfg)
        mu, sigma = dataset_statistics(config, extractor, split=args.split,
                                       n_images=args.max_images)
        save_npz_stats(args.dataset_npz, mu, sigma)
        print(f"saved dataset stats -> {args.dataset_npz}")
        return

    if args.gen_npz:
        feats = extractor.features_from_folder(args.eval_image_folder,
                                               args.max_images)
        mu, sigma = activation_statistics(feats)
        save_npz_stats(args.gen_npz, mu, sigma)
        print(f"saved stats for {len(feats)} images -> {args.gen_npz}")
        return

    root = args.eval_image_folder
    has_epochs = any(d.startswith("Epoch_") for d in os.listdir(root)) \
        if os.path.isdir(root) else False
    if has_epochs:
        from test import parse_epochs  # reuse the CLI epoch-spec parser

        results = measure.sweep(args.compared_path, root,
                                parse_epochs(args.select_epochs),
                                range(args.repeat_times),
                                max_images=args.max_images)
        for (e, r), fid in sorted(results.items()):
            print(f"Epoch_{e}_{r}: FID = {fid:.3f}")
    else:
        fid = measure.fid_between(args.compared_path, root, args.max_images)
        print(f"FID = {fid:.3f}")


if __name__ == "__main__":
    main()
