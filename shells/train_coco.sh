#!/bin/sh
# COCO training. The reference script launched a nonexistent train_coco.py
# on 4 GPUs; here the same train.py scales over the mesh.
nohup python -u train.py --cfg cfg/coco.yml --output_dir EE-GAN_coco \
  --batch_size 64 --mesh data:-1 > log_train_coco.txt 2>&1 &
