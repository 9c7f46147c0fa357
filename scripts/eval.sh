#!/usr/bin/env bash
# Standalone 15-combination evaluation sweep (parity with reference
# scripts/eval.sh; the reference's eval.py is dead code — SURVEY §2.7-1).
# Usage: scripts/eval.sh CHECKPOINT [DATAPATH] [SAVEPATH]
set -euo pipefail
cd "$(dirname "$0")/.."

CKPT=${1:?usage: scripts/eval.sh CHECKPOINT [DATAPATH] [SAVEPATH]}
DATAPATH=${2:-BraTS/BRATS2020_Training_none_npy}  # relative to the dataroot
SAVE=${3:-runs/eval}

python eval.py \
  --model mmformer \
  --mask_type idt \
  --dataname BraTS/BRATS2020 \
  --datapath "$DATAPATH" \
  --savepath "$SAVE" \
  --resume "$CKPT"
