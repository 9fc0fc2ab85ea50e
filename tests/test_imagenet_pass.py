"""ImageNet-1K / PASS index variants + advanced copy-paste (reference
datasets/imagenet.py, datasets/pass.py,
datasets/augmentations/advanced_copy_paste.py)."""
import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from zutis_tpu.data.advanced_copy_paste import AdvancedCopyPaste
from zutis_tpu.data.imagenet_index import (
    PASS,
    ImageNet1KDataset,
    combined_retrieval,
    imagenet_filename_to_path,
    imagenet_pseudo_mask_path,
)
from zutis_tpu.ops import rle as rle_ops

CATS = ["background", "cat", "dog"]


def _embedding(rng, d=8):
    e = rng.standard_normal(d).astype(np.float32)
    return e / np.linalg.norm(e)


@pytest.fixture(scope="module")
def imagenet_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("imagenet")
    rng = np.random.default_rng(0)
    bank = {}
    text = {c: _embedding(rng) for c in CATS[1:]}
    for wnid, cat in (("n01", "cat"), ("n02", "dog")):
        (root / "train" / wnid).mkdir(parents=True)
        (root / "train_pseudo_masks_selfmask" / wnid).mkdir(parents=True)
        for i in range(3):
            fname = f"{wnid}_{i}.JPEG"
            arr = rng.integers(0, 255, (40, 48, 3), np.uint8)
            Image.fromarray(arr.astype(np.uint8)).save(
                root / "train" / wnid / fname)
            m = np.zeros((40, 48), np.uint8)
            m[8:30, 10:40] = 1
            with open(root / "train_pseudo_masks_selfmask" / wnid /
                      f"{wnid}_{i}.json", "w") as f:
                json.dump(rle_ops.encode(m), f)
            # bank embeddings near the category's text embedding so
            # retrieval assigns them correctly
            e = text[cat] + 0.01 * rng.standard_normal(8).astype(np.float32)
            bank[fname] = (e / np.linalg.norm(e)).astype(np.float32)
    with open(root / "filename_to_ViT_L_14_336px_train_img_embedding.pkl",
              "wb") as f:
        pickle.dump(bank, f)
    return str(root), text


def test_pseudo_mask_path_layout():
    p = imagenet_pseudo_mask_path(
        "/data/ImageNet2012", "/data/ImageNet2012/train/n01/n01_0.JPEG")
    assert p == "/data/ImageNet2012/train_pseudo_masks_selfmask/n01/n01_0.json"
    assert imagenet_filename_to_path("/d", "n05_3.JPEG") == \
        "/d/train/n05/n05_3.JPEG"


def test_imagenet_retrieval_and_sample(imagenet_dir, tmp_path):
    root, text = imagenet_dir
    cache = str(tmp_path / "cat_to_p_images.json")
    ds = ImageNet1KDataset(
        dir_dataset=root, categories=CATS, category_to_p_images_fp=cache,
        cat_to_text_embedding=text, n_images=3, image_size=64, seed=3)
    assert os.path.exists(cache)
    assert len(ds) == 6 and not ds.missing_pseudo_masks()
    # retrieval got the right images per category
    with open(cache) as f:
        got = json.load(f)
    assert all("n01" in p for p in got["cat"])
    assert all("n02" in p for p in got["dog"])

    s1 = ds.sample(0, epoch=2)
    s2 = ds.sample(0, epoch=2)
    assert s1["image"].shape == (3, 64, 64)
    np.testing.assert_array_equal(s1["image"], s2["image"])  # deterministic
    # label ids come from the background-first category list
    present = set(np.unique(s1["semantic_mask"])) - {0, 255}
    assert present <= {1, 2}


def test_imagenet_advanced_copy_paste_mode(imagenet_dir, tmp_path):
    root, text = imagenet_dir
    cache = str(tmp_path / "c.json")
    ds = ImageNet1KDataset(
        dir_dataset=root, categories=CATS, category_to_p_images_fp=cache,
        cat_to_text_embedding=text, n_images=3, image_size=64,
        use_advanced_copy_paste=True, max_n_partitions=3, seed=1)
    s1 = ds.sample(4, epoch=0)
    s2 = ds.sample(4, epoch=0)
    np.testing.assert_array_equal(s1["image"], s2["image"])
    assert s1["instance_masks"].shape == (10, 64, 64)
    n_valid = int(s1["instance_valid"].sum())
    assert n_valid >= 1
    # one-hot instances are disjoint
    overlap = s1["instance_masks"][:n_valid].sum(0)
    assert overlap.max() <= 1.0


def test_advanced_copy_paste_grid_partition():
    acp = AdvancedCopyPaste(grid_size=96, max_n_partitions=3, min_distance=8)
    rng = np.random.default_rng(0)
    info = acp.partition_grid(rng, (2, 2), 16)
    # cells tile the canvas exactly
    area = sum(c["height"] * c["width"] for c in info.values())
    assert area == 96 * 96
    for c in info.values():
        assert 0 <= c["top"] < 96 and 0 <= c["left"] < 96


def test_advanced_copy_paste_semantics():
    acp = AdvancedCopyPaste(grid_size=48, max_n_partitions=3, min_distance=8)
    rng = np.random.default_rng(5)
    n_images, info, idxs = acp.generate_grid(rng)
    imgs = [np.full((3, 30, 30), float(i + 1), np.float32)
            for i in range(n_images)]
    masks = []
    for i in range(n_images):
        m = np.zeros((30, 30), np.int64)
        m[5:25, 5:25] = 1
        masks.append(m)
    out = acp.copy_paste(rng, imgs, masks, list(range(1, n_images + 1)),
                         info, idxs)
    assert out["image"].shape == (3, 48, 48)
    assert out["semantic_mask"].shape == (48, 48)
    assert out["instance_mask"].shape[0] == out["n_instances"]
    # pasted instances never overlap
    assert (out["instance_mask"].sum(0) <= 1).all()
    # the background object's pixels carry ITS category in the semantic
    # map (the comment used to claim this without asserting it)
    bg = out["instance_mask"][0] > 0
    assert bg.any()
    assert (out["semantic_mask"][bg] == 1).all()


def test_pass_bank_and_retrieval(tmp_path):
    rng = np.random.default_rng(2)
    d = tmp_path / "pass"
    (d / "images" / "0").mkdir(parents=True)
    paths = []
    for i in range(4):
        p = d / "images" / "0" / f"img{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (16, 16, 3), np.uint8).astype(np.uint8)
        ).save(p)
        paths.append(str(p))

    calls = []

    def encode_fn(chunk):
        calls.append(len(chunk))
        return np.stack([_embedding(np.random.default_rng(hash(c) % 2**31))
                         for c in chunk])

    ps = PASS(str(d))
    fp = ps.ensure_bank(encode_fn, batch_size=3)
    assert os.path.exists(fp) and sum(calls) == 4
    # cached: no second extraction
    ps.ensure_bank(None)

    text = {"cat": _embedding(np.random.default_rng(9))}
    got = ps.retrieve_images(text, n_images=2,
                             cache_fp=str(tmp_path / "pass_cache.json"))
    assert len(got["cat"]) == 2
    assert all(p.startswith(str(d / "images")) for p in got["cat"])
    pm = ps.pseudo_mask_paths(got)
    assert all(v.endswith(".json") for v in pm.values())


def test_combined_retrieval_two_banks(tmp_path):
    rng = np.random.default_rng(4)
    text = {"cat": _embedding(rng)}
    # bank A holds the 2 best matches, bank B one weaker match
    def mk_bank(fp, names, scales):
        bank = {}
        for n, s in zip(names, scales):
            noise = 0.3 * rng.standard_normal(8).astype(np.float32)
            e = s * text["cat"] + noise
            bank[n] = (e / np.linalg.norm(e)).astype(np.float32)
        with open(fp, "wb") as f:
            pickle.dump(bank, f)

    mk_bank(tmp_path / "a.pkl", ["a0.JPEG", "a1.JPEG"], [5.0, 5.0])
    mk_bank(tmp_path / "b.pkl", ["b0.jpg", "b1.jpg"], [5.0, 0.0])
    got = combined_retrieval(
        text, [str(tmp_path / "a.pkl"), str(tmp_path / "b.pkl")],
        [lambda fn: f"/A/{fn}", lambda fn: f"/B/{fn}"], n_images=3)
    assert len(got["cat"]) == 3
    assert any(p.startswith("/A/") for p in got["cat"])
    assert any(p.startswith("/B/") for p in got["cat"])
