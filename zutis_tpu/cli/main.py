"""Train/eval entry point.

Usage mirrors the reference (main.py:17-26):
  python -m zutis_tpu.cli.main --p_config configs/<cfg>.yaml \
      [--p_state_dict weights.{npz,pt}] [--debug] [--seed N] \
      [--weight_ce_loss W] [--suffix S]

With --p_state_dict: evaluate on the config's validation dataset.
Without: train on the index dataset (retrieval + pseudo-masks + copy-paste
synthesis) with periodic eval, mirroring reference main.py:105-162.

TPU-native additions controlled from the config: compute_dtype (bfloat16),
checkpoint_every for full-state orbax checkpoints with exact resume, and
mesh_axes for DP/TP sharding: `mesh_axes: {data: 2, model: 4}` builds a
jax.sharding.Mesh over the first data*model local devices, shards the full
TrainState (params + AdamW moments) by the TP rules in parallel/mesh.py,
shards every batch's leading axis over `data`, and runs the ordinary jitted
train step under GSPMD — numerically equal to the single-device run
(tests/test_cli_mesh.py). Checkpoints gather to host on save, so a
preempted run can resume onto a DIFFERENT mesh factorisation.
"""
from __future__ import annotations

import json
import os
from argparse import ArgumentParser


def build_text_embeddings(cfg):
    """Plain (template-free) per-category CLIP text embeddings for the ZUTIS
    head (reference networks/zutis.py:35-38), always f32 (the convention:
    params/embeddings stay f32, activations cast per compute dtype). Cached
    per (arch, category-list hash). A `text_embeddings_npz` config extra
    short-circuits to precomputed embeddings (tests / offline runs)."""
    import jax.numpy as jnp
    import numpy as np

    override = cfg.extras.get("text_embeddings_npz")
    if override:
        return jnp.asarray(np.load(override)["embeddings"])

    from zutis_tpu.data.tokenizer import CLIPTokenizer
    from zutis_tpu.models.factory import (
        build_text_encoder, find_merges_file, load_clip_params,
    )
    from zutis_tpu.retrieval.text_embeddings import plain_category_embeddings

    import hashlib

    # hash the category LIST into the name: two presets with equal counts
    # (e.g. coca vs coco81, both 81) would otherwise thrash one cache file
    cat_hash = hashlib.sha1(
        "\x00".join(cfg.categories).encode()).hexdigest()[:10]
    cache_fp = os.path.join(
        cfg.clip_assets_dir or ".",
        f"text_emb_{cfg.clip_arch.replace('/', '_')}_"
        f"{len(cfg.categories)}cat_{cat_hash}.npz",
    )
    if os.path.exists(cache_fp):
        data = np.load(cache_fp, allow_pickle=True)
        if list(data["categories"]) == list(cfg.categories):
            return jnp.asarray(data["embeddings"])
    merges = find_merges_file(cfg.clip_assets_dir)
    assert merges, (
        f"BPE merges file not found under {cfg.clip_assets_dir!r}; place "
        f"bpe_simple_vocab_16e6.txt.gz there (see models/factory.py)"
    )
    tokenizer = CLIPTokenizer.from_file(merges)
    _, text_params = load_clip_params(cfg.clip_arch, cfg.clip_assets_dir)
    text_encoder = build_text_encoder(cfg.clip_arch)
    emb = plain_category_embeddings(
        text_encoder, text_params, tokenizer, cfg.categories)
    try:
        np.savez(cache_fp, embeddings=emb,
                 categories=np.array(cfg.categories, dtype=object))
    except OSError:
        pass
    return jnp.asarray(emb)


def main(argv=None):
    parser = ArgumentParser("zutis-tpu")
    parser.add_argument("--p_config", type=str, required=True)
    parser.add_argument("--p_state_dict", type=str, default="")
    parser.add_argument("--debug", "-d", action="store_true")
    parser.add_argument("--seed", "-s", default=0, type=int)
    parser.add_argument("--weight_ce_loss", type=float, default=1.0)
    parser.add_argument("--suffix", type=str, default="")
    parser.add_argument("--max_eval_images", type=int, default=None)
    parser.add_argument("--profile_dir", type=str, default="",
                        help="write a jax.profiler trace of train steps "
                             "10-20 here (Perfetto/TensorBoard)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from zutis_tpu.core.cache import enable_compilation_cache
    from zutis_tpu.core.checkpoint import load_params_any
    from zutis_tpu.core.config import Config, checkpoint_dir
    from zutis_tpu.data.datasets import get_eval_dataset
    from zutis_tpu.engine.trainer import Trainer
    from zutis_tpu.models.factory import build_zutis

    enable_compilation_cache()
    cfg = Config.load(
        args.p_config, p_state_dict=args.p_state_dict, debug=args.debug,
        seed=args.seed, weight_ce_loss=args.weight_ce_loss,
        suffix=args.suffix,
    )
    dir_ckpt = checkpoint_dir(cfg)
    if (os.path.exists(f"{dir_ckpt}/final_model.npz")
            and not args.p_state_dict):
        print(f"final model already exists at {dir_ckpt}/final_model.npz")
        return
    os.makedirs(dir_ckpt, exist_ok=True)
    cfg.to_json(f"{dir_ckpt}/config.json")

    # TPU runs f32 dots at bf16 mantissa by default; "highest" forces true
    # f32 matmuls — a numerical-headroom knob for configs that diverge
    # under the default (tools/closed_loop.py)
    if cfg.extras.get("matmul_precision"):
        jax.config.update("jax_default_matmul_precision",
                          cfg.extras["matmul_precision"])
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    model_kwargs = cfg.extras.get("model_kwargs")
    if model_kwargs:
        # explicit architecture override (tiny models in tests/CI)
        from zutis_tpu.models.zutis import ZUTIS

        model = ZUTIS(stop_gradient=cfg.stop_gradient, dtype=dtype,
                      **model_kwargs)
    else:
        model = build_zutis(cfg.clip_arch, stop_gradient=cfg.stop_gradient,
                            dtype=dtype, encoder_type=cfg.encoder_type,
                            # opt-in throughput levers, both measured in
                            # PERF.md: encoder token merging (ops/tome.py)
                            # and decoder-memory pooling (models/zutis.py)
                            tome_r=int(cfg.extras.get("tome_r", 0)),
                            decoder_pool=int(
                                cfg.extras.get("decoder_pool", 1)))
    text_embeddings = build_text_embeddings(cfg)

    val_dataset = get_eval_dataset(
        cfg.dataset_name, cfg.dir_val_dataset, split=cfg.split,
        n_categories=cfg.n_categories
        if cfg.dataset_name == "imagenet-s" else None,
    )

    trainer = Trainer(model, text_embeddings, dir_ckpt=dir_ckpt,
                      debug=args.debug)

    if args.p_state_dict:
        params = load_params_any(args.p_state_dict)
        scores = trainer.evaluate(params, val_dataset, num_iter=0,
                                  max_images=args.max_eval_images)
        print(json.dumps(scores, indent=2))
        return

    # ---- training path ----
    from zutis_tpu.data.index_dataset import (
        IndexDataset, batch_iterator, load_category_to_p_images,
    )
    from zutis_tpu.data.pseudo_masks import generate_pseudo_masks, \
        pseudo_mask_path
    from zutis_tpu.engine.optim import make_optimizer
    from zutis_tpu.engine.train_step import TrainState
    from zutis_tpu.models.factory import load_clip_params

    def ensure_pseudo_masks(missing, dir_pseudo, path_map=None):
        """Generate any missing pseudo-masks with SelfMask (reference
        index_dataset.py:257-277)."""
        if not missing:
            return
        from zutis_tpu.models.selfmask import SelfMask, \
            convert_selfmask_checkpoint
        from zutis_tpu.models.weights import load_torch_state_dict

        p_selfmask = os.path.join(cfg.clip_assets_dir, "selfmask_nq20.pt")
        assert os.path.exists(p_selfmask), (
            f"{len(missing)} pseudo-masks missing and no SelfMask weights at "
            f"{p_selfmask}"
        )
        selfmask_params = convert_selfmask_checkpoint(
            load_torch_state_dict(p_selfmask))
        generate_pseudo_masks(missing, dir_pseudo, selfmask_params,
                              path_map=path_map)

    if cfg.index_dataset_name == "imagenet":
        # ImageNet-only variant (reference datasets/imagenet.py): its own
        # wnid pseudo-mask layout, no random scaling, optional grid paste
        from zutis_tpu.data.imagenet_index import ImageNet1KDataset

        dataset = ImageNet1KDataset(
            dir_dataset=cfg.dir_train_dataset[0],
            categories=cfg.categories,
            ignore_index=cfg.ignore_index,
            category_to_p_images_fp=cfg.category_to_p_images_fp,
            n_images=cfg.n_images,
            image_size=cfg.train_image_size,
            use_advanced_copy_paste=cfg.use_advanced_copy_paste,
            seed=args.seed,
        )
        ensure_pseudo_masks(
            dataset.missing_pseudo_masks(), "",
            path_map=dataset.p_image_to_p_pseudo_mask,
        )
    else:
        category_to_p_images = load_category_to_p_images(
            cfg.category_to_p_images_fp)
        # pseudo-masks: reuse cached JSONs; generate the rest with SelfMask
        dir_pseudo = os.path.join(
            os.path.dirname(cfg.category_to_p_images_fp) or ".",
            "pseudo_masks")
        all_images = [p for ps in category_to_p_images.values() for p in ps]
        ensure_pseudo_masks(
            [p for p in all_images
             if not os.path.exists(pseudo_mask_path(dir_pseudo, p))],
            dir_pseudo,
        )
        p_image_to_p_pseudo_mask = {
            p: pseudo_mask_path(dir_pseudo, p) for p in all_images
        }
        dataset = IndexDataset(
            categories=cfg.categories,
            category_to_p_images=category_to_p_images,
            p_image_to_p_pseudo_mask=p_image_to_p_pseudo_mask,
            image_size=cfg.train_image_size,
            ignore_index=cfg.ignore_index,
            scale_range=cfg.scale_range,
            random_duplicate=cfg.random_duplicate,
            seed=args.seed,
            use_advanced_copy_paste=cfg.use_advanced_copy_paste,
        )
    batch_size = cfg.train_dataloader_kwargs.get("batch_size", 8)

    # ---- device mesh (DP x TP) from config mesh_axes ----
    mesh = None
    if cfg.mesh_axes:
        from zutis_tpu.parallel import create_mesh

        n_mesh = 1
        for size in cfg.mesh_axes.values():
            n_mesh *= int(size)
        devices = jax.devices()
        assert n_mesh <= len(devices), (
            f"mesh_axes {cfg.mesh_axes} needs {n_mesh} devices, "
            f"only {len(devices)} available"
        )
        mesh = create_mesh(
            {k: int(v) for k, v in cfg.mesh_axes.items()},
            devices=devices[:n_mesh],
        )
        data_par = dict(mesh.shape).get("data", 1)
        assert batch_size % data_par == 0, (
            f"batch_size {batch_size} must divide by the data axis "
            f"({data_par})"
        )

    # initialise params, encoder from pretrained CLIP unless told otherwise
    init_x = jnp.zeros((1, 3, cfg.train_image_size, cfg.train_image_size))
    params = model.init(jax.random.PRNGKey(args.seed), init_x)["params"]
    if not cfg.extras.get("skip_pretrained"):
        visual_params, _ = load_clip_params(cfg.clip_arch,
                                            cfg.clip_assets_dir)
        params = dict(params)
        params["encoder"] = jax.tree_util.tree_map(jnp.asarray,
                                                   visual_params)

    # reference base lr 5e-5 (utils/utils.py:179-192); test/diagnosis
    # configs may override through the extras
    tx = make_optimizer(base_lr=float(cfg.extras.get("base_lr", 5e-5)),
                        n_iters=cfg.n_iters)
    state = TrainState.create(params, tx)

    # preemption resume: restore the newest full-state checkpoint and
    # fast-forward the deterministic (seed, step) batch pipeline to it
    from zutis_tpu.core.checkpoint import latest_step_dir, restore_train_state

    ckpt_base = os.path.join(dir_ckpt, "checkpoints")
    resume_dir = latest_step_dir(ckpt_base)
    if resume_dir is not None:
        state = restore_train_state(resume_dir, state)
        print(f"resumed train state from {resume_dir} "
              f"(step {int(state.step)})")
    batches = batch_iterator(dataset, batch_size, seed=args.seed,
                             start_step=int(state.step),
                             process_index=jax.process_index(),
                             process_count=jax.process_count())

    import contextlib

    mesh_ctx = mesh if mesh is not None else contextlib.nullcontext()
    if mesh is not None:
        # restore (above) lands on host/default placement; sharding AFTER
        # restore is what lets a resumed run change mesh factorisation
        from zutis_tpu.parallel import shard_batch, shard_train_state

        state = shard_train_state(state, mesh)
        batches = (shard_batch(b, mesh) for b in batches)

    with mesh_ctx:
        trainer.fit(
            state, tx, batches, n_iters=cfg.n_iters,
            n_categories=val_dataset.n_categories,
            ignore_index=cfg.ignore_index,
            weight_ce_loss=args.weight_ce_loss,
            iter_eval=cfg.iter_eval, iter_log=cfg.iter_log,
            val_dataset=val_dataset,
            checkpoint_every=cfg.checkpoint_every or None,
            checkpoint_dir=ckpt_base,
            # the reference renders triptych/query/matched-pair figures every
            # iter_log (trainer.py:204-240)
            visualise=bool(cfg.extras.get("visualise", True)),
            profile_dir=args.profile_dir or None,
        )


if __name__ == "__main__":
    main()
