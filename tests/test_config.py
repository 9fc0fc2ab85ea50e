"""Config loading + run-name mangling (core/config.py; reference
main.py:26-51, utils/utils.py:95-145)."""
import yaml

from zutis_tpu.core.config import Config, checkpoint_dir, experiment_name


def _cfg(**kw):
    base = dict(
        dataset_name="coco2017", split="val", clip_arch="ViT-B/16",
        n_images=500, scale_range=(0.1, 1.0), seed=0,
        index_dataset_name="index",
        dir_train_dataset=["/d/ImageNet2012/train", "/d/pass/images"],
        train_dataloader_kwargs={"batch_size": 8},
    )
    base.update(kw)
    return Config(**base)


def test_experiment_name_reference_mangling():
    cfg = _cfg(random_duplicate=True)
    name = experiment_name(cfg)
    # arch tag, rd flag, n500, archive tags, scale range, seed
    assert name == "vit_b_16_rd_n500_imagenet_pass_sr10100_s0"
    assert checkpoint_dir(cfg) == "ckpt/coco2017/val/" + name + "/dt"


def test_experiment_name_flags():
    cfg = _cfg(stop_gradient=False, suffix="ablation", seed=3, debug=True,
               random_duplicate=False)
    name = experiment_name(cfg)
    assert "no_sg" in name and name.endswith("_debug")
    assert "_ablation_" in name and "_s3_" in name
    rn = _cfg(clip_arch="RN50", frozen_bn=True)
    assert "frozen_bn" in experiment_name(rn)

    ins = _cfg(dataset_name="imagenet-s", n_categories=919)
    assert checkpoint_dir(ins).startswith("ckpt/imagenet-s919/val/")


def test_shipped_configs_load_and_preset_resolves(tmp_path):
    for stem, n_cat, n_iters, n_entries in [
        # the 81-category coco table counts 'background' within 81; the
        # 919-class imagenet-s preset prepends it (920 entries)
        ("coco2017_val_imagenet_pass_n500_vit_b_16", 81, 20000, 81),
        ("imagenet_s919_imagenet_n500_vit_b_16", 919, 80000, 920),
    ]:
        cfg = Config.load(f"configs/{stem}.yaml")
        assert cfg.n_categories == n_cat and cfg.n_iters == n_iters
        assert len(cfg.categories) == n_entries
        assert cfg.categories[0] == "background"
        assert cfg.compute_dtype == "bfloat16"


def test_reference_schema_with_inline_categories(tmp_path):
    """A reference-style YAML (inline categories, no TPU keys) loads with
    unknown keys captured in extras."""
    raw = {
        "dir_ckpt": "c", "categories": ["background", "cat"],
        "n_categories": 2, "dataset_name": "coca", "split": "val",
        "clip_arch": "ViT-B/32", "n_iters": 5,
        "some_future_key": {"nested": 1},
    }
    fp = tmp_path / "ref.yaml"
    with open(fp, "w") as f:
        yaml.safe_dump(raw, f)
    cfg = Config.load(str(fp))
    assert cfg.categories == ["background", "cat"]
    assert cfg.extras["some_future_key"] == {"nested": 1}
    assert cfg.compute_dtype == "float32"  # TPU keys default sanely
