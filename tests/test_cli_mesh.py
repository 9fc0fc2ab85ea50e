"""Mesh-wired CLI training end-to-end (VERDICT r3 task 1).

The reference trains with one command on one GPU (reference main.py:150-160);
the rebuild's same command generalises it: `mesh_axes: {data: 2, model: 4}`
in the YAML makes cli/main.py build a jax.sharding.Mesh, shard the full
TrainState by the TP rules, and run the ordinary jitted step under GSPMD.

Covered here, on the 8-virtual-device CPU backend (conftest):
  - train through the CLI on a 2x4 (data x model) mesh, full-state
    checkpoints every 2 steps;
  - preemption resume onto a DIFFERENT mesh factorisation (4x2) — the
    checkpoint gathers to host on save, so restore + shard_train_state
    re-shards onto any mesh;
  - the resumed mesh run's final params numerically match a single-device
    run of the same seed/config (GSPMD changes layout, not math).
"""
import json
import os
import shutil

import numpy as np
import pytest
import yaml
from PIL import Image

from zutis_tpu.ops import rle as rle_ops


def _write_fixture(root):
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
    for img_id in (1,):
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


def _base_cfg(root, categories, cat_fp, dir_train, dir_val, emb_fp,
              dir_ckpt):
    return {
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
        "train_dataloader_kwargs": {"batch_size": 4},
        "val_dataloader_kwargs": {"batch_size": 1},
        "clip_arch": "ViT-B/16",
        "n_iters": 4,
        "iter_eval": 1000,   # > n_iters: no in-training eval, pure train
        "iter_log": 2,
        "checkpoint_every": 2,
        "skip_pretrained": True,
        "text_embeddings_npz": str(emb_fp),
        "visualise": False,
        "model_kwargs": {
            "width": 32, "encoder_layers": 1, "encoder_heads": 2,
            "patch_size": 16, "text_dim": 16, "n_queries": 12,
            "n_decoder_layers": 2, "n_heads": 2, "input_resolution": 32,
        },
    }


def _final_npz(dir_ckpt):
    found = []
    for dirpath, _, filenames in os.walk(dir_ckpt):
        if "final_model.npz" in filenames:
            found.append(os.path.join(dirpath, "final_model.npz"))
    assert len(found) == 1, f"expected one final_model.npz, got {found}"
    return found[0]


def _max_rel_err(npz_a, npz_b):
    a = dict(np.load(npz_a))
    b = dict(np.load(npz_b))
    assert set(a) == set(b)
    worst = 0.0
    for k in a:
        x = a[k].astype(np.float64)
        y = b[k].astype(np.float64)
        denom = np.maximum(np.abs(y), 1.0)
        worst = max(worst, float(np.max(np.abs(x - y) / denom)))
    return worst


def test_cli_mesh_train_checkpoint_reshard_resume(tmp_path):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (conftest CPU backend)")

    from zutis_tpu.cli.main import main

    fixtures = _write_fixture(tmp_path)
    categories, cat_fp, dir_train, dir_val, emb_fp = fixtures

    # --- run A: 4 steps through the CLI on a 2x4 data x model mesh ---
    cfg_mesh = _base_cfg(tmp_path, *fixtures, dir_ckpt=tmp_path / "ckpt_mesh")
    cfg_mesh["mesh_axes"] = {"data": 2, "model": 4}
    cfg_fp_24 = tmp_path / "mesh24.yaml"
    with open(cfg_fp_24, "w") as f:
        yaml.safe_dump(cfg_mesh, f)
    main(["--p_config", str(cfg_fp_24), "--seed", "0"])
    final_mesh_full = _final_npz(tmp_path / "ckpt_mesh")
    dt = os.path.dirname(final_mesh_full)
    assert os.path.exists(f"{dt}/checkpoints/step_2")
    assert os.path.exists(f"{dt}/checkpoints/step_4")
    full_run_params = tmp_path / "mesh_full_run.npz"
    shutil.copy(final_mesh_full, full_run_params)

    # --- preemption: lose everything after step 2, resume on a 4x2 mesh ---
    os.remove(final_mesh_full)
    shutil.rmtree(f"{dt}/checkpoints/step_4")
    cfg_mesh["mesh_axes"] = {"data": 4, "model": 2}
    cfg_fp_42 = tmp_path / "mesh42.yaml"
    with open(cfg_fp_42, "w") as f:
        yaml.safe_dump(cfg_mesh, f)
    main(["--p_config", str(cfg_fp_42), "--seed", "0"])
    final_resumed = _final_npz(tmp_path / "ckpt_mesh")

    # --- run B: same seed/config, single device (no mesh) ---
    cfg_single = _base_cfg(tmp_path, *fixtures,
                           dir_ckpt=tmp_path / "ckpt_single")
    cfg_fp_1 = tmp_path / "single.yaml"
    with open(cfg_fp_1, "w") as f:
        yaml.safe_dump(cfg_single, f)
    main(["--p_config", str(cfg_fp_1), "--seed", "0"])
    final_single = _final_npz(tmp_path / "ckpt_single")

    # GSPMD only changes layout: mesh run == single-device run. Tolerance is
    # 5e-4, not 1e-4: sharded reductions sum in a different order, and after
    # 4 Adam steps the eps-dominated entries amplify that fp noise to ~1e-4
    # (measured 1.11e-4, order-dependent on prior-test allocator state). A
    # real sharding bug produces O(1) errors, so 5e-4 still discriminates.
    err_full = _max_rel_err(str(full_run_params), final_single)
    assert err_full < 5e-4, f"2x4 mesh vs single-device: rel err {err_full}"
    # resume onto the 4x2 mesh replays the same remaining stream: identical
    err_resumed = _max_rel_err(final_resumed, final_single)
    assert err_resumed < 5e-4, (
        f"resume-and-reshard vs single-device: rel err {err_resumed}"
    )
