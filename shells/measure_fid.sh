#!/bin/sh
# FID sweep over generated folders (reference shells/measure_fid.sh).
nohup python -u metrics/fid_score.py \
  --compared_path ../data/Models/IS_model/bird_val.npz \
  --eval_image_folder ../data/EE_GAN_OUT/eval/GenImage \
  > log_fid.txt 2>&1 &
