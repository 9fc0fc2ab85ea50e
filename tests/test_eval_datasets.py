"""Eval dataset classes on synthetic on-disk fixtures (reference
datasets/coco20k.py, datasets/coca.py, datasets/imagenet_s.py)."""
import json

import numpy as np
import pytest
from PIL import Image

from zutis_tpu.data.datasets import (
    COCADataset,
    COCO20KDataset,
    ImageNetSDataset,
    get_eval_dataset,
)
from zutis_tpu.ops import rle as rle_ops


def test_coco20k_builds_sel20k_subset(tmp_path):
    """First touch builds instances_train2014_sel20k.json from the LOST
    filename list (reference datasets/coco20k.py:48-81)."""
    rng = np.random.RandomState(0)
    (tmp_path / "annotations").mkdir()
    (tmp_path / "images").mkdir()
    images, annotations = [], []
    for img_id in (7, 8, 9):
        name = f"COCO_train2014_{img_id:012d}.jpg"
        Image.fromarray(rng.randint(0, 255, (24, 30, 3), np.uint8)).save(
            tmp_path / "images" / name)
        images.append({"id": img_id, "height": 24, "width": 30,
                       "file_name": name})
        m = np.zeros((24, 30), np.uint8)
        m[3:10, 4:12] = 1
        annotations.append({
            "id": img_id, "image_id": img_id, "category_id": 1,
            "segmentation": rle_ops.encode(m), "area": int(m.sum()),
            "iscrowd": 0, "bbox": rle_ops.to_bbox(m),
        })
    with open(tmp_path / "annotations" / "instances_train2014.json",
              "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "thing"}]}, f)
    # the 20k filename list keeps 2 of 3 images
    with open(tmp_path / "coco_20k_filenames.txt", "w") as f:
        f.write("train2014/COCO_train2014_000000000007.jpg\n")
        f.write("train2014/COCO_train2014_000000000009.jpg\n")

    ds = COCO20KDataset(str(tmp_path))
    assert len(ds) == 2
    assert sorted(ds.image_ids) == [7, 9]
    s = ds[0]
    assert s["image"].shape == (3, 24, 30)
    assert s["image_size"] == (24, 30)
    # the built subset file is reused on the next construction
    ds2 = COCO20KDataset(str(tmp_path))
    assert sorted(ds2.image_ids) == [7, 9]


def test_coca_dataset_labels_from_directory(tmp_path):
    """Binary GT per category directory; 255 pixels take the directory's
    label id (reference datasets/coca.py:11-95)."""
    rng = np.random.RandomState(1)
    for cat in ("apple", "banjo"):
        (tmp_path / "image" / cat).mkdir(parents=True)
        (tmp_path / "binary" / cat).mkdir(parents=True)
        for i in range(2):
            Image.fromarray(
                rng.randint(0, 255, (20, 22, 3), np.uint8)
            ).save(tmp_path / "image" / cat / f"{i}.jpg")
            gt = np.zeros((20, 22), np.uint8)
            gt[4:12, 5:15] = 255
            Image.fromarray(gt).save(tmp_path / "binary" / cat / f"{i}.png")

    ds = COCADataset(str(tmp_path))
    assert len(ds) == 4
    assert ds.category_to_label_id == {"apple": 1, "banjo": 2}
    s0 = ds[0]
    assert set(np.unique(s0["semantic_mask"])) == {0, 1}
    s_banjo = ds[2]
    assert set(np.unique(s_banjo["semantic_mask"])) == {0, 2}


def test_imagenet_s_dataset(tmp_path):
    """R + G*256 label decode, 1024 longer-edge cap, original_size carried
    (reference datasets/imagenet_s.py:53-103)."""
    rng = np.random.RandomState(2)
    base = tmp_path / "ImageNetS50"
    (base / "validation" / "n01").mkdir(parents=True)
    (base / "validation-segmentation" / "n01").mkdir(parents=True)
    # a large image exercising the 1024 cap
    Image.fromarray(rng.randint(0, 255, (30, 1400, 3), np.uint8)).save(
        base / "validation" / "n01" / "a.JPEG")
    gt = np.zeros((30, 1400, 3), np.uint8)
    gt[..., 0] = 3   # R
    gt[5:10, :, 1] = 1  # G -> label 3 + 256
    Image.fromarray(gt).save(
        base / "validation-segmentation" / "n01" / "a.png")

    ds = ImageNetSDataset(str(tmp_path), 50, split="val")
    assert ds.name == "imagenet-s50" and ds.n_categories == 51
    s = ds[0]
    assert s["original_size"] == (30, 1400)
    assert s["image"].shape[-1] == 1024  # longer edge capped
    assert set(np.unique(s["semantic_mask"])) == {3, 3 + 256}

    via_factory = get_eval_dataset("imagenet-s", str(tmp_path), split="val",
                                   n_categories=51)
    assert via_factory.name == "imagenet-s50"
