#!/usr/bin/env python
"""Convert reference PyTorch checkpoints into this framework's Orbax layout.

A user of the reference holds:
  * ``netG_{epoch}.pth`` / ``attr_enhance_{epoch}.pth`` (trained generator
    snapshots, reference `train.py:308-315`),
  * AttnGAN DAMSM ``text_encoder*.pth`` / ``image_encoder*.pth``
    (frozen encoders, reference `train.py:233-248`).

This CLI converts them weight-for-weight (layouts validated elementwise in
tests/test_reference_parity.py) so the evaluation sweep / sampler here can
score reference-trained models:

    python convert_checkpoints.py --cfg cfg/bird.yml --n_words 5450 \\
        --netG netG_600.pth --attr_enhance attr_enhance_600.pth \\
        --epoch 600 --out_model_dir converted/Model

    python convert_checkpoints.py --cfg cfg/bird.yml --n_words 5450 \\
        --damsm text_encoder200.pth --out_model_dir converted/Model
"""

from __future__ import annotations

import argparse


def parse_args():
    parser = argparse.ArgumentParser(description="Convert torch checkpoints")
    parser.add_argument("--cfg", dest="cfg_file", default="cfg/bird.yml")
    parser.add_argument("--n_words", type=int, required=True,
                        help="vocab size (len(ixtoword) of the dataset)")
    parser.add_argument("--netG", type=str, default="",
                        help="reference netG_{epoch}.pth")
    parser.add_argument("--attr_enhance", type=str, default="",
                        help="reference attr_enhance_{epoch}.pth")
    parser.add_argument("--epoch", type=int, default=0,
                        help="epoch tag for the converted snapshot")
    parser.add_argument("--damsm", type=str, default="",
                        help="AttnGAN text_encoder .pth (image encoder path "
                             "derived by the text->image substitution)")
    parser.add_argument("--out_model_dir", type=str, required=True)
    parser.add_argument("--set", dest="overrides", action="append",
                        default=[], metavar="KEY=VALUE")
    return parser.parse_args()


def main():
    args = parse_args()

    import jax

    from eegan_tpu.config import apply_overrides, fresh_config
    from eegan_tpu.models.factory import build_models
    from eegan_tpu.training.checkpoint import CheckpointManager
    from eegan_tpu.training.state import create_train_state
    from eegan_tpu.utils import torch_convert as tc

    config = fresh_config(args.cfg_file)
    apply_overrides(config, args.overrides)
    models = build_models(config, args.n_words)
    state, frozen = create_train_state(config, models, jax.random.PRNGKey(0))
    mgr = CheckpointManager(args.out_model_dir)

    if args.netG:
        sd = tc.load_state_dict(args.netG)
        g_vars = tc.convert_generator(sd, {"params": state.g_params,
                                           "batch_stats": state.g_stats})
        attr_params = state.attr_params
        if args.attr_enhance:
            asd = tc.load_state_dict(args.attr_enhance)
            attr_params = tc.convert_attr_enhance(
                asd, {"params": state.attr_params})["params"]
        state = state.replace(g_params=g_vars["params"],
                              g_stats=g_vars["batch_stats"],
                              attr_params=attr_params)
        epoch = args.epoch or 1
        path = mgr.save_generator(epoch, state)
        print(f"converted generator snapshot -> {path}")

    if args.damsm:
        frozen = tc.load_damsm_encoders(args.damsm, models, frozen)
        path = mgr.save_frozen(frozen)
        print(f"converted DAMSM encoders -> {path}")
        print("point TEXT.DAMSM_NAME at this directory to use them")

    if not args.netG and not args.damsm:
        print("nothing to do: pass --netG and/or --damsm")


if __name__ == "__main__":
    main()
