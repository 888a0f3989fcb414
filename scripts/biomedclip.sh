#!/usr/bin/env bash
# BiomedCLIP pipeline: finetune -> zero-shot -> supervised cls/seg -> retrieval,
# 3 seeds, mirroring /root/reference/scripts/biomedclip.sh (same stage order,
# hyperparameters, and cross-dataset transfer-by-checkpoint flow).
#
# Env:
#   NEXTGEN_UIA_DATA   dataset root (default ../data/NextGen-UIA)
#   BACKBONE_CKPT      converted BiomedCLIP .npz (nextgen_uia_tpu.convert biomedclip)
set -euo pipefail

SEEDS=(1 2 3)
MONA_VARIANT=hybrid
FT_ARGS=(--method mona --mona_variant "$MONA_VARIANT" --batch_size 64 --lr 1e-4
         --epochs 32 --accumulation_steps 4 --grad_clip 1.0)
SUP_ARGS=(--batch_size 32 --lr 1e-4 --epochs 200 --patience 15)
ZS_DATASETS=(LN-INT LN-EXT BUSI)
CLS_DATASETS=(LN-INT BUSI)
SEG_DATASETS=(BUSI DDTI TN3K LN-INT Prostate)
BACKBONE=${BACKBONE_CKPT:+--backbone_ckpt "$BACKBONE_CKPT"}

mkdir -p logs
{
for SEED in "${SEEDS[@]}"; do
  EXP="biomedclip_mona_seed${SEED}"

  # 1) contrastive Mona fine-tune (scripts/biomedclip.sh:50-66)
  python -m src.models.biomedclip.finetune --exp "${EXP}_finetune" \
    --seed "$SEED" "${FT_ARGS[@]}" $BACKBONE
  MONA_W="runs/${EXP}_finetune/best_model.npz"

  # 2) zero-shot: baseline and Mona (scripts/biomedclip.sh:72-97)
  for DS in "${ZS_DATASETS[@]}"; do
    python -m src.models.biomedclip.zero_shot --exp "${EXP}_zs_base" \
      --dataset "$DS" --seed "$SEED" $BACKBONE
    python -m src.models.biomedclip.zero_shot --exp "${EXP}_zs_mona" \
      --dataset "$DS" --seed "$SEED" --mona_variant "$MONA_VARIANT" \
      --mona_weights "$MONA_W" $BACKBONE
  done

  # 3) supervised classification (scripts/biomedclip.sh:99-124)
  for DS in "${CLS_DATASETS[@]}"; do
    python -m src.models.biomedclip.classification --exp "${EXP}_cls" \
      --dataset "$DS" --seed "$SEED" "${SUP_ARGS[@]}" \
      --mona_variant "$MONA_VARIANT" --mona_weights "$MONA_W" $BACKBONE
  done

  # 4) cross-dataset LN-INT -> LN-EXT: copy best, eval-only (:126-154)
  SRC="runs/${EXP}_cls/LN-INT/train/best_model.npz"
  if [[ -f "$SRC" ]]; then
    mkdir -p "runs/${EXP}_cls/LN-EXT/train"
    cp "$SRC" "runs/${EXP}_cls/LN-EXT/train/best_model.npz"
    python -m src.models.biomedclip.classification --exp "${EXP}_cls" \
      --dataset LN-EXT --seed "$SEED" --test \
      --mona_variant "$MONA_VARIANT" --mona_weights "$MONA_W" $BACKBONE
  fi

  # 5) supervised segmentation (+cross-dataset) (:156-211)
  for DS in "${SEG_DATASETS[@]}"; do
    python -m src.models.biomedclip.segmentation --exp "${EXP}_seg" \
      --dataset "$DS" --seed "$SEED" "${SUP_ARGS[@]}" \
      --mona_variant "$MONA_VARIANT" --mona_weights "$MONA_W" $BACKBONE
  done
  SRC="runs/${EXP}_seg/LN-INT/train/best_model.npz"
  if [[ -f "$SRC" ]]; then
    mkdir -p "runs/${EXP}_seg/LN-EXT/train"
    cp "$SRC" "runs/${EXP}_seg/LN-EXT/train/best_model.npz"
    python -m src.models.biomedclip.segmentation --exp "${EXP}_seg" \
      --dataset LN-EXT --seed "$SEED" --test \
      --mona_variant "$MONA_VARIANT" --mona_weights "$MONA_W" $BACKBONE
  fi

  # 6) retrieval (:213-236) — ROCO-v2-style CSV
  if [[ -n "${RETRIEVAL_CSV:-}" ]]; then
    python -m src.models.biomedclip.retrieval --exp "${EXP}_retrieval" \
      --seed "$SEED" --csv "$RETRIEVAL_CSV" --img_dir "${RETRIEVAL_IMG_DIR:-.}" \
      --mona_variant "$MONA_VARIANT" --mona_weights "$MONA_W" $BACKBONE
  fi
done
} 2>&1 | tee logs/biomedclip.log
