#!/bin/sh
# CUB training (reference shells/train_cub.sh): batch 36, ablation coefs.
nohup python -u train.py --cfg cfg/bird.yml --output_dir EE-GAN_bird \
  --class_coe 10 --sim_coe 0.25 --batch_size 36 > log_train_cub.txt 2>&1 &
