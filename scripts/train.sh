#!/usr/bin/env bash
# Canonical PASSION training launch (parity with reference scripts/train.sh:
# mmFormer + PASSION, idt, mr2468 split, 300 epochs, lr 2e-4, temp 4).
# Usage: scripts/train.sh [DATAPATH] [IMBMR_CSV] [SAVEPATH]
set -euo pipefail
cd "$(dirname "$0")/.."

# Both paths are relative to the dataroot (default: datasets/ next to the
# package), matching the reference (options.py:29,45).
DATAPATH=${1:-BraTS/BRATS2020_Training_none_npy}
IMBMR=${2:-BraTS/brats_split/Brats2020_imb_split_mr2468.csv}
SAVE=${3:-runs/mmformer_passion_idt_mr2468}

python train.py \
  --model mmformer \
  --mask_type idt \
  -batch_size 1 \
  --lr 2e-4 \
  --weight_decay 1e-4 \
  --num_epochs 300 \
  --temp 4.0 \
  --region_fusion_start_epoch 0 \
  --seed 1037 \
  --use_passion \
  --dataname BraTS/BRATS2020 \
  --datapath "$DATAPATH" \
  --imbmrpath "$IMBMR" \
  --savepath "$SAVE"
