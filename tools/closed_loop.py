"""Closed-loop learning proof through the CLI (VERDICT r3 task 5).

The strongest accuracy evidence this environment permits: build a synthetic
colour-coded dataset (each category is a distinct colour; pseudo-masks are
the object blobs), train a small-but-real ZUTIS through the REAL CLI
machinery (retrieval-format index dataset -> copy-paste synthesis ->
Hungarian dice/BCE + CE criterion -> AdamW/PolyLR), then evaluate the final
checkpoint on a held-out synthetic COCO-format val set — and compare
against the UNTRAINED model on the same eval. Mirrors the reference's one
command end-to-end flow (reference main.py:105-162, trainer.py:105-375).

Writes CLOSED_LOOP_r04.json at the repo root:
  {untrained: {mIoU, AP}, trained: {mIoU, AP}, n_iters, wall_seconds}

Usage (real TPU, ~2-4 min):   timeout 1800 python tools/closed_loop.py
Quick CPU smoke:              JAX_PLATFORMS=cpu python tools/closed_loop.py \
                                  --n-iters 40 --out /tmp/cl.json
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

# distinct, saturated RGB per category (index 0 = background)
COLOURS = np.array([
    [0, 0, 0],        # background (unused as object colour)
    [255, 40, 40],    # "red"
    [40, 255, 40],    # "green"
    [60, 60, 255],    # "blue"
    [255, 255, 40],   # "yellow"
    [255, 40, 255],   # "magenta"
    [40, 255, 255],   # "cyan"
], np.uint8)
CATEGORIES = ["background", "red", "green", "blue", "yellow", "magenta",
              "cyan"]


def _blob_mask(rng, h, w):
    """A filled ellipse at random position/size."""
    cy = rng.uniform(0.3, 0.7) * h
    cx = rng.uniform(0.3, 0.7) * w
    ry = rng.uniform(0.12, 0.3) * h
    rx = rng.uniform(0.12, 0.3) * w
    yy, xx = np.mgrid[0:h, 0:w]
    return (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0)


def make_train_fixture(root, rng, n_per_cat=6, hw=96):
    from zutis_tpu.ops import rle as rle_ops

    dir_train = os.path.join(root, "archive")
    dir_pm = os.path.join(root, "cache", "pseudo_masks")
    os.makedirs(dir_train)
    os.makedirs(dir_pm)
    from PIL import Image

    cat_to_paths = {c: [] for c in CATEGORIES[1:]}
    for ci, cat in enumerate(CATEGORIES[1:], start=1):
        for i in range(n_per_cat):
            mask = _blob_mask(rng, hw, hw)
            img = rng.integers(0, 60, (hw, hw, 3)).astype(np.uint8)
            img[mask] = COLOURS[ci]
            p = os.path.join(dir_train, f"{cat}_{i}.jpg")
            Image.fromarray(img).save(p, quality=95)
            cat_to_paths[cat].append(p)
            with open(os.path.join(dir_pm, f"{cat}_{i}.json"), "w") as f:
                json.dump(rle_ops.encode(mask.astype(np.uint8)), f)
    cat_fp = os.path.join(root, "cache", "category_to_p_images.json")
    with open(cat_fp, "w") as f:
        json.dump(cat_to_paths, f)
    return cat_fp, dir_train


def make_val_fixture(root, rng, n_images=24, hw=96):
    """COCO-format val set: 1-3 colour blobs per image with instance + (via
    the dataset's GT rendering) semantic annotations."""
    from PIL import Image

    from zutis_tpu.ops import rle as rle_ops

    dir_val = os.path.join(root, "coco")
    os.makedirs(os.path.join(dir_val, "val2017"))
    os.makedirs(os.path.join(dir_val, "annotations"))
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, n_images + 1):
        img = rng.integers(0, 60, (hw, hw, 3)).astype(np.uint8)
        n_obj = int(rng.integers(1, 4))
        occupied = np.zeros((hw, hw), bool)
        for _ in range(n_obj):
            ci = int(rng.integers(1, len(CATEGORIES)))
            mask = _blob_mask(rng, hw, hw) & ~occupied
            if mask.sum() < 40:
                continue
            occupied |= mask
            img[mask] = COLOURS[ci]
            m8 = mask.astype(np.uint8)
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": ci,
                "segmentation": rle_ops.encode(m8),
                "area": int(mask.sum()), "iscrowd": 0,
                "bbox": rle_ops.to_bbox(m8),
            })
            ann_id += 1
        Image.fromarray(img).save(
            os.path.join(dir_val, "val2017", f"{img_id:012d}.jpg"),
            quality=95)
        images.append({"id": img_id, "height": hw, "width": hw,
                       "file_name": f"{img_id:012d}.jpg"})
    with open(os.path.join(dir_val, "annotations",
                           "instances_val2017.json"), "w") as f:
        json.dump({
            "images": images, "annotations": annotations,
            "categories": [{"id": i, "name": c}
                           for i, c in enumerate(CATEGORIES) if i > 0],
        }, f)
    return dir_val


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-iters", type=int, default=400)
    ap.add_argument("--out", type=str, default="CLOSED_LOOP_r04.json")
    ap.add_argument("--keep", action="store_true",
                    help="keep the working directory")
    ap.add_argument("--iter-log", type=int, default=0,
                    help="override the training log interval (diagnosis)")
    ap.add_argument("--lr", type=float, default=0.0,
                    help="override the base learning rate (diagnosis)")
    args = ap.parse_args(argv)

    import yaml

    rng = np.random.default_rng(0)
    root = tempfile.mkdtemp(prefix="closed_loop_")
    t_start = time.time()
    try:
        cat_fp, dir_train = make_train_fixture(root, rng)
        dir_val = make_val_fixture(root, rng)
        emb = rng.standard_normal((len(CATEGORIES), 64)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        emb_fp = os.path.join(root, "text_emb.npz")
        np.savez(emb_fp, embeddings=emb)

        cfg = {
            "dir_ckpt": os.path.join(root, "ckpt"),
            "dir_train_dataset": [dir_train],
            "p_filename_to_image_embedding": [],
            "dir_val_dataset": dir_val,
            "n_categories": len(CATEGORIES),
            "categories": CATEGORIES,
            "category_to_p_images_fp": cat_fp,
            "n_images": 6,
            "index_dataset_name": "index",
            "train_image_size": 96,
            "ignore_index": 255,
            "scale_range": [0.5, 1.0],
            "random_duplicate": True,
            "dataset_name": "coco2017",
            "split": "val",
            "train_dataloader_kwargs": {"batch_size": 8},
            "val_dataloader_kwargs": {"batch_size": 1},
            "clip_arch": "ViT-B/16",
            "n_iters": args.n_iters,
            "iter_eval": 10 * args.n_iters,  # no in-training eval
            "iter_log": args.iter_log or max(50, args.n_iters // 4),
            # f32 compute at TRUE f32 matmul precision: the proof is about
            # end-to-end learning and the tiny model costs nothing. At the
            # TPU default (bf16-mantissa dots even for f32 arrays) this
            # exact config NaN'd at ~step 190 in BOTH compute dtypes while
            # the bit-identical CPU run trained clean — the instability is
            # precision-induced, hence the explicit knob.
            "compute_dtype": "float32",
            "matmul_precision": "highest",
            "skip_pretrained": True,
            "text_embeddings_npz": emb_fp,
            "visualise": False,
            **({"base_lr": args.lr} if args.lr else {}),
            "model_kwargs": {
                "width": 192, "encoder_layers": 4, "encoder_heads": 6,
                "patch_size": 8, "text_dim": 64, "n_queries": 20,
                "n_decoder_layers": 3, "n_heads": 6,
                "input_resolution": 96,
            },
        }
        cfg_fp = os.path.join(root, "closed_loop.yaml")
        with open(cfg_fp, "w") as f:
            yaml.safe_dump(cfg, f)

        from zutis_tpu.cli.main import main as cli_main
        from zutis_tpu.core.config import Config, checkpoint_dir

        # ---- untrained baseline: random-init params, same eval path ----
        import jax
        import jax.numpy as jnp

        from zutis_tpu.models.weights import export_zutis
        from zutis_tpu.models.zutis import ZUTIS

        model = ZUTIS(dtype=jnp.bfloat16, **cfg["model_kwargs"])
        params0 = model.init(jax.random.PRNGKey(1),
                             jnp.zeros((1, 3, 96, 96)))["params"]
        p0_fp = os.path.join(root, "untrained.npz")
        np.savez(p0_fp, **export_zutis(jax.device_get(params0)))

        def eval_ckpt(ckpt_fp, tag):
            cli_main(["--p_config", cfg_fp, "--p_state_dict", ckpt_fp,
                      "--suffix", tag])
            c = Config.load(cfg_fp, p_state_dict=ckpt_fp, suffix=tag)
            dt = checkpoint_dir(c)
            with open(f"{dt}/eval_metrics.json") as f:
                rec = json.loads(f.read().splitlines()[-1])
            with open(f"{dt}/eval_coco_style_metrics.json") as f:
                coco = json.loads(f.read().splitlines()[-1])
            return {"mIoU": rec["Mean IoU"], "pixel_acc": rec["Pixel Acc"],
                    "AP": coco.get("AP", -1.0),
                    "AP50": coco.get("AP50", -1.0)}

        untrained = eval_ckpt(p0_fp, "untrained")
        print("untrained:", json.dumps(untrained), flush=True)

        # ---- train through the CLI, then evaluate the final model ----
        t_train = time.time()
        cli_main(["--p_config", cfg_fp, "--seed", "0"])
        train_seconds = time.time() - t_train
        c = Config.load(cfg_fp)
        final = os.path.join(checkpoint_dir(c), "final_model.npz")
        assert os.path.exists(final), final
        trained = eval_ckpt(final, "trained")
        print("trained:", json.dumps(trained), flush=True)

        report = {
            "n_iters": args.n_iters,
            "train_seconds": round(train_seconds, 1),
            "wall_seconds": round(time.time() - t_start, 1),
            "backend": jax.default_backend(),
            "untrained": untrained,
            "trained": trained,
        }
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print("CLOSED_LOOP " + json.dumps(report), flush=True)
        ok = trained["mIoU"] > max(0.25, 3 * max(untrained["mIoU"], 1e-3))
        print("CLOSED_LOOP " + ("PASS" if ok else
                                "FAIL: trained mIoU did not clear the "
                                "untrained baseline"), flush=True)
    finally:
        if not args.keep:
            shutil.rmtree(root, ignore_errors=True)
    os._exit(0 if ok else 1)


if __name__ == "__main__":
    main()
