"""ToMe accuracy qualification on the closed-loop synthetic task
(VERDICT r4 task 3: "train once, eval with/without reduction").

Reuses tools/closed_loop.py's fixtures and CLI training to produce ONE
trained checkpoint (ToMe adds no parameters — ops/tome.py — so the same
checkpoint serves every merge ratio), then evaluates the dense
fixed-resolution program at a sweep of tome_r values on the held-out
synthetic val set:

  * semantic mIoU: dense forward -> predict_semantic at the native 96px ->
    RunningScore confusion (engine/metrics.py), the trainer's metric;
  * instance AP: predict_instances_device -> instances_to_coco (same
    new->old label map the Trainer passes) -> COCOEvaluator vs the
    fixture's COCO GT.

The val images are fixed 96x96, so the dense path IS the per-image program
(no bucketing/padding needed); r=0 is the exact baseline and every r > 0
row isolates the merging cost. Real-dataset accuracy at ViT-B/16 scale
remains environment-limited (no weights/datasets, VERDICT missing-1); this
is the strongest in-env accuracy probe for the lever.

Usage:
  CPU:  env PYTHONPATH= JAX_PLATFORMS=cpu python tools/tome_qualify.py \
            --n-iters 400 --out TOME_QUALIFY.json
  TPU:  PYTHONPATH=/root/.axon_site:/root/repo python tools/tome_qualify.py
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
sys.path.insert(0, os.path.dirname(__file__))


def dense_eval(model_kwargs, params, text, dir_val, tome_r, n_categories,
               decoder_pool=1):
    import jax
    import jax.numpy as jnp

    from zutis_tpu.data.datasets import get_eval_dataset
    from zutis_tpu.data.label_maps import new_label_id_to_old_label_id
    from zutis_tpu.engine.coco_eval import COCOEvaluator
    from zutis_tpu.engine.metrics import RunningScore
    from zutis_tpu.models.zutis import ZUTIS
    from zutis_tpu.postproc.instance import (
        instances_to_coco,
        predict_instances_device,
        predict_semantic,
    )

    model = ZUTIS(dtype=jnp.bfloat16, tome_r=tome_r,
                  decoder_pool=decoder_pool, **model_kwargs)
    dataset = get_eval_dataset("coco2017", dir_val, split="val")
    meter = RunningScore(n_categories)
    preds = []

    @jax.jit
    def forward(p, x):
        out = model.apply({"params": p}, x, inference=True)
        return out["patch_tokens"], out["mask_proposals"]

    B = 8
    idx = list(range(len(dataset)))
    for s0 in range(0, len(idx), B):
        items = [dataset[i] for i in idx[s0:s0 + B]]
        x = jnp.asarray(np.stack([s["image"] for s in items]))
        tokens, proposals = forward(params, x)
        hw = tuple(x.shape[-2:])
        sem = np.asarray(predict_semantic(tokens, text, size=hw))
        for j, s in enumerate(items):
            meter.update(np.asarray(s["semantic_mask"])[None], sem[j][None])
        dev = predict_instances_device(proposals, tokens, text, size=hw)
        preds.extend(instances_to_coco(
            {k: np.asarray(v) for k, v in dev.items()},
            image_ids=[s["image_id"] for s in items],
            new_label_id_to_old_label_id=new_label_id_to_old_label_id,
        ))

    scores, _ = meter.get_scores()
    with open(os.path.join(dir_val, "annotations",
                           "instances_val2017.json")) as f:
        gt = json.load(f)
    coco = COCOEvaluator(gt).evaluate(preds) if preds else {"AP": 0.0,
                                                            "AP50": 0.0}
    return {"tome_r": tome_r, "decoder_pool": decoder_pool,
            "mIoU": round(scores["Mean IoU"], 4),
            "pixel_acc": round(scores["Pixel Acc"], 4),
            "AP": round(coco["AP"], 4), "AP50": round(coco["AP50"], 4),
            "n_preds": len(preds)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-iters", type=int, default=400)
    ap.add_argument("--rs", type=str, default="0,2,4,6,8")
    # decoder-memory pooling sweep (models/zutis.py decoder_pool); the
    # same checkpoint serves every (r, pool) — neither lever adds params
    ap.add_argument("--pools", type=str, default="1")
    ap.add_argument("--out", type=str, default="TOME_QUALIFY.json")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args(argv)

    import yaml

    from closed_loop import CATEGORIES, make_train_fixture, make_val_fixture

    rng = np.random.default_rng(0)
    root = tempfile.mkdtemp(prefix="tome_qualify_")
    t0 = time.time()
    try:
        cat_fp, dir_train = make_train_fixture(root, rng)
        dir_val = make_val_fixture(root, rng)
        emb = rng.standard_normal((len(CATEGORIES), 64)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        emb_fp = os.path.join(root, "text_emb.npz")
        np.savez(emb_fp, embeddings=emb)
        model_kwargs = {
            "width": 192, "encoder_layers": 4, "encoder_heads": 6,
            "patch_size": 8, "text_dim": 64, "n_queries": 20,
            "n_decoder_layers": 3, "n_heads": 6, "input_resolution": 96,
        }
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
            "iter_eval": 10 * args.n_iters,
            "iter_log": max(50, args.n_iters // 4),
            # same numerical-headroom knobs the closed-loop proof needed
            "compute_dtype": "float32",
            "matmul_precision": "highest",
            "skip_pretrained": True,
            "text_embeddings_npz": emb_fp,
            "visualise": False,
            "model_kwargs": model_kwargs,
        }
        cfg_fp = os.path.join(root, "tome_qualify.yaml")
        with open(cfg_fp, "w") as f:
            yaml.safe_dump(cfg, f)

        from zutis_tpu.cli.main import main as cli_main
        from zutis_tpu.core.checkpoint import load_params_any
        from zutis_tpu.core.config import Config, checkpoint_dir

        t_train = time.time()
        cli_main(["--p_config", cfg_fp, "--seed", "0"])
        train_seconds = time.time() - t_train
        c = Config.load(cfg_fp)
        final = os.path.join(checkpoint_dir(c), "final_model.npz")
        assert os.path.exists(final), final
        params = load_params_any(final)

        import jax.numpy as jnp

        text = jnp.asarray(emb)
        rows = []
        for r in [int(r) for r in args.rs.split(",")]:
            for pool in [int(p) for p in args.pools.split(",")]:
                row = dense_eval(model_kwargs, params, text, dir_val, r,
                                 len(CATEGORIES), decoder_pool=pool)
                rows.append(row)
                print(json.dumps(row), flush=True)

        import jax

        report = {
            "n_iters": args.n_iters,
            "train_seconds": round(train_seconds, 1),
            "wall_seconds": round(time.time() - t0, 1),
            "backend": jax.default_backend(),
            "tokens": "145 (12x12 grid + CLS, patch 8 at 96px); final "
                      "count per r via ops.tome.merge_schedule(145, r, 4)",
            "rows": rows,
        }
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {args.out}", flush=True)
    finally:
        if args.keep:
            print(f"kept workdir {root}", flush=True)
        else:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
    os._exit(0)  # skip jax teardown (can hang under the tunnel)
