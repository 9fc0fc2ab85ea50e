"""Pseudo-mask generation pipeline (data/pseudo_masks.py): SelfMask inference
at shorter-side resolution, bilateral refinement (host scipy or the device
solver), nearest-resize back, RLE JSON with round-trip assert (reference
datasets/index_dataset.py:177-277)."""
import json
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from zutis_tpu.data.pseudo_masks import generate_pseudo_masks
from zutis_tpu.models.selfmask import SelfMask
from zutis_tpu.ops import rle as rle_ops


@pytest.fixture(scope="module")
def tiny_selfmask():
    model = SelfMask(n_queries=4, patch_size=8, n_decoder_layers=1,
                     embed_dim=32, heads=2, base_grid=4, depth=1)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, 32, 32)))["params"]
    return model, params


def _images(tmp_path, n=2):
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        p = str(tmp_path / f"img{i}.jpg")
        # 50x70: not a patch multiple at the working resolution
        Image.fromarray(
            rng.randint(0, 255, (50, 70, 3), np.uint8)).save(p)
        paths.append(p)
    return paths


def test_generate_and_cache(tmp_path, tiny_selfmask):
    model, params = tiny_selfmask
    paths = _images(tmp_path)
    dir_pm = str(tmp_path / "pm")
    out = generate_pseudo_masks(paths, dir_pm, params, model=model,
                                image_size=32, use_bilateral_solver=True)
    assert sorted(out) == sorted(paths)
    mtimes = {}
    for p, pm in out.items():
        with open(pm) as f:
            rle = json.load(f)
        mask = rle_ops.decode(rle)
        assert mask.shape == (50, 70)  # original resolution
        assert set(np.unique(mask)) <= {0, 1}
        mtimes[pm] = os.path.getmtime(pm)
    # second call reuses the cache (files untouched)
    out2 = generate_pseudo_masks(paths, dir_pm, params, model=model,
                                 image_size=32)
    assert out2 == out
    for pm, t in mtimes.items():
        assert os.path.getmtime(pm) == t


def test_path_map_layout(tmp_path, tiny_selfmask):
    model, params = tiny_selfmask
    paths = _images(tmp_path, n=1)
    target = str(tmp_path / "wnid" / "deep" / "custom.json")
    out = generate_pseudo_masks(paths, "", params, model=model,
                                image_size=32,
                                path_map={paths[0]: target})
    assert out[paths[0]] == target and os.path.exists(target)


def test_device_bilateral_branch(tmp_path, tiny_selfmask, monkeypatch):
    model, params = tiny_selfmask
    paths = _images(tmp_path, n=1)
    monkeypatch.setenv("ZUTIS_TPU_BILATERAL", "device")
    out = generate_pseudo_masks(paths, str(tmp_path / "pm_dev"), params,
                                model=model, image_size=32)
    with open(out[paths[0]]) as f:
        mask = rle_ops.decode(json.load(f))
    assert mask.shape == (50, 70)
