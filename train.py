#!/usr/bin/env python
"""Train EE-GAN on TPU.

Keeps the reference CLI surface (reference `train.py:37-56`):
    python train.py --cfg cfg/bird.yml --output_dir my_run --batch_size 32
plus TPU-native extras (--mesh, --dtype, --synthetic, --max_epochs).

The --gpu flag is accepted and ignored (device selection is mesh-driven).
"""

from __future__ import annotations

import argparse
import datetime
import os
import pprint
import shutil
import sys


def parse_args():
    parser = argparse.ArgumentParser(description="Train an EE-GAN network (TPU)")
    parser.add_argument("--cfg", dest="cfg_file", default="cfg/bird.yml",
                        help="optional config file")
    parser.add_argument("--gpu", dest="gpu_ids", type=str, default="0",
                        help="ignored on TPU (kept for CLI compatibility)")
    parser.add_argument("--output_dir", dest="output_dir", default="../EE-GAN",
                        help="the path to save models and images")
    parser.add_argument("--debug_output_dir", dest="debug_output_dir",
                        default="Debug",
                        help="the path to save models and images in debug mode")
    parser.add_argument("--debug", action="store_true", help="debug mode: "
                        "in-process data loading, Debug/ output dir")
    parser.add_argument("--manualSeed", type=int, default=3407)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--class_coe", type=float, default=10)
    parser.add_argument("--sim_coe", type=float, default=0.05)
    # TPU-native extras
    parser.add_argument("--mesh", type=str, default=None,
                        help="mesh spec, e.g. data:8 (default: config)")
    parser.add_argument("--dtype", type=str, default=None,
                        choices=["float32", "bfloat16"],
                        help="compute dtype override")
    parser.add_argument("--synthetic", action="store_true",
                        help="train on synthetic data (smoke mode)")
    parser.add_argument("--max_epochs", type=int, default=None,
                        help="stop after N epochs (smoke/CI)")
    parser.add_argument("--max_iters", type=int, default=None,
                        help="cap iterations per epoch (smoke/CI)")
    parser.add_argument("--profile_steps", type=int, default=0,
                        help="capture a jax.profiler trace of N steps")
    parser.add_argument("--eval_overlap", action="store_true",
                        help="score each generator snapshot (FID/R-precision)"
                             " on a background thread during training")
    parser.add_argument("--eval_nums", type=int, default=2048,
                        help="images per overlapped evaluation")
    parser.add_argument("--fid_stats", type=str, default="",
                        help="dataset mu/sigma .npz (or real-image folder)"
                             " for overlapped FID")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: jax.distributed.initialize before "
                             "device use (TPU-pod auto-discovery, or "
                             "EEGAN_COORDINATOR/NUM_PROCESSES/PROCESS_ID)")
    parser.add_argument("--set", dest="overrides", action="append",
                        default=[], metavar="KEY=VALUE",
                        help="config override, e.g. --set GAN.GF_DIM=16")
    return parser.parse_args()


def main():
    args = parse_args()

    if args.distributed:
        from eegan_tpu.parallel.distributed import initialize

        initialize()

    from eegan_tpu.config import apply_overrides, fresh_config

    config = fresh_config(args.cfg_file)
    apply_overrides(config, args.overrides)
    config.TRAIN.BATCH_SIZE = args.batch_size
    config.TRAIN.CLASS_COE = args.class_coe
    config.TRAIN.SIM_COE = args.sim_coe
    if args.mesh:
        config.RUNTIME.MESH = args.mesh
    if args.dtype:
        config.RUNTIME.COMPUTE_DTYPE = args.dtype

    print("Using config:")
    pprint.pprint(config.to_dict())

    # Output dir layout mirrors the reference (`train.py:529-543`).
    if args.debug:
        output_dir = os.path.join(config.SAVE_DIR or ".", args.debug_output_dir)
    elif args.output_dir == "":
        stamp = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
        output_dir = os.path.join(config.SAVE_DIR or ".",
                                  f"{config.DATASET_NAME}_{stamp}")
    else:
        output_dir = os.path.join(config.SAVE_DIR or ".", args.output_dir)
    os.makedirs(output_dir, exist_ok=True)

    # Run provenance: copy entrypoint + cfg into the output dir.
    try:
        shutil.copy2(sys.argv[0], output_dir)
        shutil.copy2(args.cfg_file, output_dir)
    except (shutil.SameFileError, OSError):
        pass

    from eegan_tpu.training.trainer import Trainer

    dataset = None
    if args.synthetic:
        from eegan_tpu.data.synthetic import SyntheticDataset

        dataset = SyntheticDataset(config)
        # Smoke mode: random frozen encoders are acceptable here and only
        # here (load_frozen_encoders hard-fails otherwise).
        config.RUNTIME.ALLOW_RANDOM_ENCODERS = True

    workers = 0 if args.debug else None
    trainer = Trainer(config, output_dir, dataset=dataset,
                      seed=args.manualSeed, data_workers=workers)

    if args.eval_overlap:
        from eegan_tpu.data.datasets import TextOnlyDataset
        from eegan_tpu.evaluation.async_eval import AsyncEvaluator
        from eegan_tpu.evaluation.tester import Tester

        eval_ds = (dataset if args.synthetic
                   else TextOnlyDataset(config, split="test"))
        tester = Tester(config, trainer.models, trainer.frozen, eval_ds,
                        batch_size=config.TRAIN.BATCH_SIZE,
                        mesh=trainer.mesh)
        trainer.async_eval = AsyncEvaluator(
            tester, writer=trainer.writer,
            real_stats=args.fid_stats or None,
            eval_nums=args.eval_nums,
            compute_r_precision=not args.synthetic)
    try:
        trainer.train(max_epochs=args.max_epochs,
                      max_iters_per_epoch=args.max_iters,
                      profile_steps=args.profile_steps)
    finally:
        trainer.close()


if __name__ == "__main__":
    main()
