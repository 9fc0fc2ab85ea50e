"""Per-host input pipeline: each host's stream is exactly its contiguous
slice of the single-host global stream (SURVEY.md section 2.4 DP row), so
multi-host data-parallel training sees the same data as one host."""
import json

import numpy as np
import pytest
from PIL import Image

from zutis_tpu.data.index_dataset import IndexDataset, batch_iterator
from zutis_tpu.ops import rle as rle_ops


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("idx")
    rng = np.random.RandomState(0)
    cat_to_p, p_to_pm = {"cat": []}, {}
    for i in range(4):
        p = str(root / f"img{i}.jpg")
        Image.fromarray(
            rng.randint(0, 255, (40, 40, 3), np.uint8)).save(p)
        m = np.zeros((40, 40), np.uint8)
        m[8:30, 8:26] = 1
        pm = str(root / f"img{i}.json")
        with open(pm, "w") as f:
            json.dump(rle_ops.encode(m), f)
        cat_to_p["cat"].append(p)
        p_to_pm[p] = pm
    return IndexDataset(
        categories=["background", "cat"],
        category_to_p_images=cat_to_p,
        p_image_to_p_pseudo_mask=p_to_pm,
        image_size=32, seed=5,
    )


def test_host_shards_tile_the_global_stream(dataset):
    global_it = batch_iterator(dataset, 4, seed=9, as_jax=False)
    host_its = [
        batch_iterator(dataset, 4, seed=9, as_jax=False,
                       process_index=h, process_count=2)
        for h in range(2)
    ]
    for _ in range(3):
        g = next(global_it)
        h0, h1 = next(host_its[0]), next(host_its[1])
        for k in g:
            np.testing.assert_array_equal(h0[k], g[k][:2])
            np.testing.assert_array_equal(h1[k], g[k][2:])


def test_resume_composes_with_host_sharding(dataset):
    a = batch_iterator(dataset, 4, seed=9, as_jax=False,
                       process_index=1, process_count=2)
    next(a)
    second = next(a)
    b = batch_iterator(dataset, 4, seed=9, as_jax=False, start_step=1,
                       process_index=1, process_count=2)
    resumed = next(b)
    for k in second:
        np.testing.assert_array_equal(second[k], resumed[k])
