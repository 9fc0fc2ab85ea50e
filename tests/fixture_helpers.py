"""Shared synthetic CLI fixture builder for the e2e tests.

One source of truth for the tiny train-archive + COCO-val + text-embedding
layout and the tiny-model config dict, used by test_cli_e2e.py and
test_cli_mesh.py (they previously carried near-identical 90-line copies
that had to be updated in lockstep)."""
import json

import numpy as np
import yaml
from PIL import Image

from zutis_tpu.ops import rle as rle_ops


def write_cli_fixture(root, n_val_images: int = 2):
    """Create the synthetic train archive, pseudo-masks, COCO val set and
    text embeddings under `root`. -> (categories, cat_fp, dir_train,
    dir_val, emb_fp)."""
    rng = np.random.RandomState(0)
    dir_train = root / "archive"
    dir_pm = root / "cache" / "pseudo_masks"
    dir_train.mkdir()
    dir_pm.mkdir(parents=True)
    categories = ["background", "square", "blob"]
    cat_to_paths = {c: [] for c in categories[1:]}
    for cat in categories[1:]:
        for i in range(3):
            h = w = 48
            img = rng.randint(0, 255, (h, w, 3), np.uint8)
            mask = np.zeros((h, w), np.uint8)
            mask[10:34, 8:30] = 1
            p = dir_train / f"{cat}_{i}.jpg"
            Image.fromarray(img).save(p)
            cat_to_paths[cat].append(str(p))
            with open(dir_pm / f"{cat}_{i}.json", "w") as f:
                json.dump(rle_ops.encode(mask), f)
    cat_fp = root / "cache" / "category_to_p_images.json"
    with open(cat_fp, "w") as f:
        json.dump(cat_to_paths, f)

    dir_val = root / "coco"
    (dir_val / "val2017").mkdir(parents=True)
    (dir_val / "annotations").mkdir()
    images, annotations = [], []
    for img_id in range(1, n_val_images + 1):
        arr = rng.randint(0, 255, (40, 40, 3), np.uint8)
        Image.fromarray(arr).save(dir_val / "val2017" / f"{img_id:012d}.jpg")
        m = np.zeros((40, 40), np.uint8)
        m[5:20, 5:25] = 1
        images.append({"id": img_id, "height": 40, "width": 40,
                       "file_name": f"{img_id:012d}.jpg"})
        annotations.append({
            "id": img_id, "image_id": img_id, "category_id": 1,
            "segmentation": rle_ops.encode(m), "area": int(m.sum()),
            "iscrowd": 0, "bbox": rle_ops.to_bbox(m),
        })
    with open(dir_val / "annotations" / "instances_val2017.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "square"},
                                  {"id": 2, "name": "blob"}]}, f)

    emb = rng.randn(3, 16).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb_fp = root / "text_emb.npz"
    np.savez(emb_fp, embeddings=emb)
    return categories, cat_fp, dir_train, dir_val, emb_fp


def base_cli_cfg(categories, cat_fp, dir_train, dir_val, emb_fp, dir_ckpt,
                 **overrides):
    """The tiny-model CLI config dict; pass keyword overrides for
    per-test deltas (n_iters, iter_eval, batch sizes, mesh_axes, ...)."""
    cfg = {
        "dir_ckpt": str(dir_ckpt),
        "dir_train_dataset": [str(dir_train)],
        "p_filename_to_image_embedding": [],
        "dir_val_dataset": str(dir_val),
        "n_categories": 3,
        "categories": categories,
        "category_to_p_images_fp": str(cat_fp),
        "n_images": 3,
        "index_dataset_name": "index",
        "train_image_size": 32,
        "ignore_index": 255,
        "scale_range": [0.5, 1.0],
        "use_advanced_copy_paste": False,
        "random_duplicate": True,
        "dataset_name": "coco2017",
        "split": "val",
        "train_dataloader_kwargs": {"batch_size": 2},
        "val_dataloader_kwargs": {"batch_size": 1},
        "clip_arch": "ViT-B/16",
        "n_iters": 3,
        "iter_eval": 3,
        "iter_log": 1,
        "skip_pretrained": True,
        "text_embeddings_npz": str(emb_fp),
        "model_kwargs": {
            "width": 32, "encoder_layers": 1, "encoder_heads": 2,
            "patch_size": 16, "text_dim": 16, "n_queries": 12,
            "n_decoder_layers": 2, "n_heads": 2, "input_resolution": 32,
        },
    }
    cfg.update(overrides)
    return cfg


def dump_cfg(cfg, fp):
    with open(fp, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(fp)
