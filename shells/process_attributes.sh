#!/bin/sh
# Offline attribute extraction (reference shells/process_attributes.sh).
nohup python -u prepare_attributes.py --data_dir ../data/birds \
  --dataset_name bird > log_attrs.txt 2>&1 &
