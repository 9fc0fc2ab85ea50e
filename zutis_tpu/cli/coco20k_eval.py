"""COCO-20K instance-segmentation evaluation entry point.

Mirrors the reference coco20k_eval.py:191-315: load a trained ZUTIS, run
per-image instance prediction (threshold -> classify -> hard NMS) over the
19,817 COCO-20K images at native resolution, score with COCO mask AP/AR
(maxDets 1/10/100), write coco20k_metrics_*.json.

TPU-native: forward + decode + NMS run jitted on device. `--batch_images N`
(default 16) evaluates through the bucketed batched path — images padded into
quantised resolution buckets, one compiled program per bucket
(engine/batched_eval.py) — and reports eval images/sec; `--batch_images 1`
reproduces the reference's per-image regime. RN-family archs always run
per-image (padding would leak through overlapping convs). Measured on one
v5e chip: the full ViT-B/16 instance pipeline (padded forward + decode +
NMS) at COCO resolution (512x640 bucket) runs ~153 img/s at batch 16 and
~174 img/s at batch 32 — vs the reference's published 43.5 img/s for
semantic-only dense inference.
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
    parser.add_argument("--batch_images", type=int, default=16)
    parser.add_argument("--pipeline_depth", type=int, default=2,
                        help="in-flight batches in the batched path: depth>1 "
                             "overlaps batch N's blob fetch + host RLE/JSON "
                             "assembly with batch N+1's device execution "
                             "(engine.batched_eval.pipelined); 1 = "
                             "synchronous. Measured 129.6/190.6/195.9 img/s "
                             "at depth 1/2/3 (PERF.md). Each in-flight batch "
                             "holds its step outputs on device (~1 GB dense "
                             "masks at batch 32, 512x640) — raise to 3 only "
                             "with HBM headroom")
    parser.add_argument("--visualise_first", type=int, default=0,
                        help="save instance-overlay PNGs for the first N "
                             "images (the reference's detectron2 "
                             "visualisation, coco20k_eval.py:120-180)")
    args = parser.parse_args(argv)

    import time

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
        instances_to_coco_counts, predict_instances_device,
    )

    enable_compilation_cache()
    cfg = Config.load(args.p_config)
    # same numerical-headroom knob cli/main.py honours: a checkpoint
    # trained at matmul_precision "highest" must be EVALUATED at it too,
    # or AP numbers diverge between the two entry points
    if cfg.extras.get("matmul_precision"):
        jax.config.update("jax_default_matmul_precision",
                          cfg.extras["matmul_precision"])
    arch_tag = cfg.clip_arch.lower().replace("-", "_").replace("/", "_")
    dir_ckpt = f"{args.dir_ckpt}/coco20k/{arch_tag}"
    os.makedirs(dir_ckpt, exist_ok=True)

    p_gt = f"{args.dir_dataset}/annotations/instances_{args.eval_split}.json"
    coco = COCOIndex(p_gt)
    image_ids = coco.get_img_ids()
    if args.max_images:
        image_ids = image_ids[:args.max_images]

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    model_kwargs = cfg.extras.get("model_kwargs")
    if model_kwargs:
        # explicit architecture override (tiny models in tests/CI)
        from zutis_tpu.models.zutis import ZUTIS

        model = ZUTIS(dtype=dtype, **model_kwargs)
    else:
        model = build_zutis(cfg.clip_arch, dtype=dtype,
                            encoder_type=cfg.encoder_type,
                            # same opt-in throughput levers as cli/main.py
                            # (PERF.md round 5); ToMe is padding-safe on the
                            # batched bucketed path since ops/tome.py grew
                            # size-0 scheduling
                            tome_r=int(cfg.extras.get("tome_r", 0)),
                            decoder_pool=int(
                                cfg.extras.get("decoder_pool", 1)))
    params = load_params_any(args.p_state_dict)
    text_embeddings = build_text_embeddings(cfg)

    def load_image(image_id):
        info = coco.load_img(image_id)
        p_image = f"{args.dir_dataset}/train2014/{info['file_name']}"
        return normalize_image(Image.open(p_image).convert("RGB"))

    def load_image_u8(image_id):
        """Raw [3, H, W] uint8 — the batched path ships these to the device
        and normalises there (4x less H2D than host-normalised f32)."""
        info = coco.load_img(image_id)
        p_image = f"{args.dir_dataset}/train2014/{info['file_name']}"
        arr = np.asarray(Image.open(p_image).convert("RGB"), np.uint8)
        return np.ascontiguousarray(arr.transpose(2, 0, 1))

    n_visualised = [0]

    def maybe_visualise(image_id, image, dev_masks, res, j, H, W):
        """res holds the fetched small arrays; dev_masks stays on device and
        only the visualised image's [Q, H, W] slice is pulled over."""
        if n_visualised[0] >= args.visualise_first:
            return
        from zutis_tpu.engine.visualiser import instance_overlay

        if image.dtype == np.uint8:  # raw-transport batched path
            image = normalize_image(image.transpose(1, 2, 0))
        keep = np.flatnonzero(res["keep"][j])
        masks_j = np.asarray(dev_masks[j])
        instance_overlay(
            image,
            masks_j[keep, :H, :W],
            [float(res["scores"][j, k]) for k in keep],
            [str(int(res["category_ids"][j, k])) for k in keep],
            f"{dir_ckpt}/overlay_{image_id}.png",
        )
        n_visualised[0] += 1

    predictions = []
    compile_seconds = [0.0]
    t0 = time.time()
    use_batched = (
        args.batch_images > 1
        and getattr(model, "encoder_family", "vit") != "rn"
    )
    if use_batched:
        from zutis_tpu.engine import batched_eval as BE

        steps, pending = {}, {}

        def batches():
            """(bucket shape, [(image_id, u8 image)]) in arrival order —
            image loading happens lazily inside the pipelined loop so PIL
            decode of batch N+1 overlaps batch N's device execution."""
            for image_id in image_ids:
                img = load_image_u8(image_id)
                shape = BE.bucket_shape(*img.shape[-2:])
                pending.setdefault(shape, []).append((image_id, img))
                if len(pending[shape]) == args.batch_images:
                    yield shape, pending.pop(shape)
            for shape, items in pending.items():
                yield shape, items

        def dispatch(batch):
            shape, items = batch
            images = [img for _, img in items]
            padded, native_grid, native_pixels = BE.pad_batch(
                images, shape, args.batch_images, model.patch_size,
                dtype=np.uint8)
            step_args = (params, jnp.asarray(padded),
                         jnp.asarray(native_grid),
                         jnp.asarray(native_pixels))
            if shape not in steps:
                # AP eval never reads the semantic map — skip its decode.
                # Time the bucket's trace+compile (the first call blocks on
                # it) so the reported throughput can exclude cold compiles
                t_c = time.time()
                steps[shape] = BE.make_instance_step(
                    model, text_embeddings, shape,
                    threshold=args.threshold, nms_type=args.nms_type,
                    uint8_input=True, semantic_mode="none")
                out = steps[shape](*step_args)
                compile_seconds[0] += time.time() - t_c
                return out
            return steps[shape](*step_args)

        def collect(dev, batch):
            _, items = batch
            # masks (dense) stay on device: ONE host_blob fetch carries the
            # device RLE counts + per-query scalars (~KB per image, one D2H
            # round-trip)
            from zutis_tpu.ops.rle_device import unpack_host_blob

            res = unpack_host_blob(np.asarray(dev["host_blob"]))
            for j, (image_id, img) in enumerate(items):
                H, W = img.shape[-2:]
                maybe_visualise(image_id, img, dev["masks"], res, j, H, W)
            predictions.extend(instances_to_coco_counts(
                res,
                image_ids=[iid for iid, _ in items],
                sizes=[tuple(img.shape[-2:]) for _, img in items],
                new_label_id_to_old_label_id=new_label_id_to_old_label_id,
                dev_masks=dev["masks"],
            ))

        for _ in BE.pipelined(dispatch, collect, batches(),
                              depth=args.pipeline_depth):
            pass
    else:
        @jax.jit
        def forward(p, image):
            return model.apply({"params": p}, image)

        for image_id in image_ids:
            img_np = load_image(image_id)
            image = jnp.asarray(img_np)[None]
            H, W = image.shape[-2:]
            out = forward(params, image)
            dev = predict_instances_device(
                out["mask_proposals"], out["patch_tokens"], text_embeddings,
                size=(int(H), int(W)), threshold=args.threshold,
                nms_type=args.nms_type, rle=True,
            )
            from zutis_tpu.ops.rle_device import unpack_host_blob

            res = unpack_host_blob(np.asarray(dev["host_blob"]))
            maybe_visualise(image_id, img_np, dev["masks"], res, 0,
                            int(H), int(W))
            predictions.extend(instances_to_coco_counts(
                res,
                image_ids=[image_id],
                sizes=[(int(H), int(W))],
                new_label_id_to_old_label_id=new_label_id_to_old_label_id,
                dev_masks=dev["masks"],
            ))
    eval_seconds = time.time() - t0

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
        "eval_images_per_sec": (
            len(image_ids) / eval_seconds if eval_seconds > 0 else 0.0
        ),
        # steady-state rate: cold per-bucket XLA compiles (minutes under
        # the tunnelled runtime) excluded from the denominator; null when
        # compile dominated the run and no steady-state window exists
        # (clamping the denominator reported absurd 1e9+ rates, ADVICE r4)
        "compile_seconds": round(compile_seconds[0], 2),
        "eval_images_per_sec_warm": (
            len(image_ids) / (eval_seconds - compile_seconds[0])
            if eval_seconds - compile_seconds[0] > 0.5 else None
        ),
    }
    suffix = f"_{args.suffix}" if args.suffix else ""
    fp = (f"{dir_ckpt}/coco20k_metrics_{arch_tag}"
          f"_nms_{args.nms_type}{suffix}.json")
    with open(fp, "w") as f:
        json.dump(result, f)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
