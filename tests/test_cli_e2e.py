"""End-to-end CLI test on a tiny synthetic fixture: train a few iterations
through python -m zutis_tpu.cli.main machinery (in-process), then evaluate,
checking the reference artifact contract (config.json, training_metrics.json,
eval_metrics.json, instance predictions, final_model.npz)."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from zutis_tpu.ops import rle as rle_ops


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    from fixture_helpers import base_cli_cfg, dump_cfg, write_cli_fixture

    root = tmp_path_factory.mktemp("zutis_fixture")
    categories, cat_fp, dir_train, dir_val, emb_fp = write_cli_fixture(
        root, n_val_images=2)
    cfg = base_cli_cfg(categories, cat_fp, dir_train, dir_val, emb_fp,
                       root / "ckpt")
    cfg_fp = dump_cfg(cfg, root / "tiny.yaml")
    return root, cfg_fp


def test_train_then_eval(fixture_dir):
    root, cfg_fp = fixture_dir
    from zutis_tpu.cli.main import main

    main(["--p_config", cfg_fp, "--seed", "0"])

    ckpt_dirs = []
    for dirpath, dirnames, filenames in os.walk(root / "ckpt"):
        if "final_model.npz" in filenames:
            ckpt_dirs.append(dirpath)
    assert len(ckpt_dirs) == 1, "final_model.npz not written"
    dt = ckpt_dirs[0]
    assert os.path.exists(f"{dt}/config.json")
    assert os.path.exists(f"{dt}/training_metrics.json")
    with open(f"{dt}/training_metrics.json") as f:
        lines = [json.loads(line) for line in f.read().splitlines()]
    assert len(lines) == 3  # iter_log=1, 3 iters
    assert {"num_iter", "loss", "Mean IoU", "Pixel Acc"} <= set(lines[0])
    # eval ran at iter 3 (iter_eval=3): eval artifacts exist
    assert os.path.exists(f"{dt}/eval_metrics.json")
    assert os.path.exists(f"{dt}/eval_coco_style_metrics.json")
    assert os.path.exists(f"{dt}/instance_predictions_00003.json")
    # visualiser artifacts (reference trainer.py:204-240): triptych, query
    # grid and matched-pair figures every iter_log
    for stem in ("semantic", "queries", "matched"):
        assert os.path.exists(f"{dt}/{stem}_00003.png"), stem
    # eval throughput is reported (engine/trainer.py)
    with open(f"{dt}/eval_metrics.json") as f:
        eval_rec = json.loads(f.read().splitlines()[0])
    assert eval_rec.get("eval_images_per_sec", 0) > 0

    # evaluate from the saved checkpoint
    from zutis_tpu.cli.main import main as main2

    main2(["--p_config", cfg_fp, "--p_state_dict", f"{dt}/final_model.npz"])


def test_coco20k_eval_cli(fixture_dir, tmp_path):
    """coco20k_eval end-to-end: batched (bucketed) and per-image regimes
    produce identical AP metrics on the same fixture."""
    root, cfg_fp = fixture_dir
    rng = np.random.RandomState(3)

    d20k = tmp_path / "coco20k"
    (d20k / "train2014").mkdir(parents=True)
    (d20k / "annotations").mkdir()
    images, annotations = [], []
    for img_id, (h, w) in zip((1, 2, 3), ((40, 40), (40, 40), (33, 47))):
        arr = rng.randint(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(d20k / "train2014" / f"{img_id:012d}.jpg")
        m = np.zeros((h, w), np.uint8)
        m[4:20, 5:25] = 1
        images.append({"id": img_id, "height": h, "width": w,
                       "file_name": f"{img_id:012d}.jpg"})
        annotations.append({
            "id": img_id, "image_id": img_id, "category_id": 1,
            "segmentation": rle_ops.encode(m), "area": int(m.sum()),
            "iscrowd": 0, "bbox": rle_ops.to_bbox(m),
        })
    with open(d20k / "annotations" / "instances_train2014_sel20k.json",
              "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "square"},
                                  {"id": 2, "name": "blob"}]}, f)

    ckpt = None
    for dirpath, _, filenames in os.walk(root / "ckpt"):
        if "final_model.npz" in filenames:
            ckpt = f"{dirpath}/final_model.npz"
    if ckpt is None:  # standalone run: make a random tiny checkpoint
        import jax
        import jax.numpy as jnp
        import yaml as _yaml

        from zutis_tpu.models.weights import export_zutis
        from zutis_tpu.models.zutis import ZUTIS

        with open(cfg_fp) as f:
            mk = _yaml.safe_load(f)["model_kwargs"]
        model = ZUTIS(**mk)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))["params"]
        ckpt = str(tmp_path / "final_model.npz")
        np.savez(ckpt, **export_zutis(params))

    from zutis_tpu.cli.coco20k_eval import main as eval_main

    results = {}
    for tag, batch in (("batched", 4), ("per_image", 1)):
        eval_main([
            "--p_config", cfg_fp, "--p_state_dict", ckpt,
            "--dir_dataset", str(d20k), "--dir_ckpt",
            str(tmp_path / f"out_{tag}"), "--suffix", tag,
            "--batch_images", str(batch), "--visualise_first", "1",
        ])
        fps, pngs = [], []
        for dirpath, _, filenames in os.walk(tmp_path / f"out_{tag}"):
            fps += [f"{dirpath}/{fn}" for fn in filenames
                    if fn.endswith(".json")]
            pngs += [fn for fn in filenames if fn.startswith("overlay_")]
        assert len(fps) == 1
        assert len(pngs) == 1, "instance overlay PNG not written"
        with open(fps[0]) as f:
            results[tag] = json.load(f)
    for key in ("AP", "AP_50", "AP_75", "AR_100"):
        assert results["batched"][key] == results["per_image"][key], key
    assert results["batched"]["eval_images_per_sec"] > 0
