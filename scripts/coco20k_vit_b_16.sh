#!/bin/bash
# COCO-20K instance evaluation (weights path as $1) — TPU analogue of the
# reference scripts/coco20k_vit_b_16.sh. Bucketed batched eval by default.
set -e
if [ "$#" -lt 1 ]; then
  echo "usage: $0 <weights.npz|reference_weights.pt>" >&2
  exit 2
fi
DIR_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
DIR_DATASET="${DIR_DATASET:-${DIR_ROOT}/data/coco}"
P_CONFIG="${DIR_ROOT}/configs/coco2017_val_imagenet_pass_n500_vit_b_16.yaml"

python3 -m zutis_tpu.cli.coco20k_eval \
  --dir_dataset "${DIR_DATASET}" \
  --dir_ckpt "${DIR_ROOT}/ckpt" \
  --p_state_dict "$1" \
  --p_config "${P_CONFIG}" \
  --nms_type "hard" \
  --batch_images 8
