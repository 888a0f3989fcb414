#!/usr/bin/env bash
# ResNet/UNet baseline pipeline: 3 seeds x {cls, seg} x datasets + cross-dataset,
# mirroring /root/reference/scripts/baselines.sh.
set -euo pipefail

SEEDS=(1 2 3)
CLS_DATASETS=(LN-INT BUSI)
SEG_DATASETS=(BUSI DDTI TN3K LN-INT Prostate)
SUP_ARGS=(--batch_size 32 --lr 1e-4 --epochs 200 --patience 15)

mkdir -p logs
{
for SEED in "${SEEDS[@]}"; do
  for DS in "${CLS_DATASETS[@]}"; do
    python -m src.models.baselines.classification --exp "resnet_seed${SEED}" \
      --dataset "$DS" --seed "$SEED" --version resnet18 "${SUP_ARGS[@]}"
  done
  SRC="runs/resnet_seed${SEED}/LN-INT/train/best_model.npz"
  if [[ -f "$SRC" ]]; then
    mkdir -p "runs/resnet_seed${SEED}/LN-EXT/train"
    cp "$SRC" "runs/resnet_seed${SEED}/LN-EXT/train/best_model.npz"
    python -m src.models.baselines.classification --exp "resnet_seed${SEED}" \
      --dataset LN-EXT --seed "$SEED" --test --version resnet18
  fi

  for DS in "${SEG_DATASETS[@]}"; do
    python -m src.models.baselines.segmentation --exp "unet_seed${SEED}" \
      --dataset "$DS" --seed "$SEED" "${SUP_ARGS[@]}"
  done
  SRC="runs/unet_seed${SEED}/LN-INT/train/best_model.npz"
  if [[ -f "$SRC" ]]; then
    mkdir -p "runs/unet_seed${SEED}/LN-EXT/train"
    cp "$SRC" "runs/unet_seed${SEED}/LN-EXT/train/best_model.npz"
    python -m src.models.baselines.segmentation --exp "unet_seed${SEED}" \
      --dataset LN-EXT --seed "$SEED" --test
  fi
done
} 2>&1 | tee logs/baselines.log
