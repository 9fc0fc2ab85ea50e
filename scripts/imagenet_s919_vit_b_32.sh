#!/bin/bash
# Train (no args) or evaluate (weights path as $1) — TPU analogue of the
# reference scripts/imagenet_s919_vit_b_32.sh launcher.
set -e
DIR_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
P_CONFIG="${DIR_ROOT}/configs/imagenet_s919_imagenet_n500_vit_b_32.yaml"

if [ "$#" -eq 0 ]; then
  python3 -m zutis_tpu.cli.main --p_config "${P_CONFIG}"
else
  python3 -m zutis_tpu.cli.main --p_config "${P_CONFIG}" --p_state_dict "$1"
fi
