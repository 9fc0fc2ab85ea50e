"""Typed configuration, loading the reference's YAML schema unchanged.

The reference merges argparse flags with `yaml.safe_load` into a Namespace and
papers over missing keys with try/except AttributeError defaults
(reference main.py:26-33,66-84). Here the same YAML files (all five shipped
configs load verbatim) populate a dataclass with explicit defaults.
`experiment_name` reproduces `get_experim_name`'s run-name mangling
(reference utils/utils.py:95-145) so checkpoint directories line up.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import yaml


@dataclass
class Config:
    # CLI flags (reference main.py:18-26)
    p_config: str = ""
    p_state_dict: str = ""
    debug: bool = False
    seed: int = 0
    weight_ce_loss: float = 1.0
    suffix: str = ""

    # base directories
    dir_ckpt: str = "ckpt"
    dir_train_dataset: List[str] = field(default_factory=list)
    p_filename_to_image_embedding: List[str] = field(default_factory=list)
    dir_val_dataset: str = ""

    # categories — either the reference's inline list, or (shipped configs)
    # a preset name from data/category_lists.py
    n_categories: int = 0
    categories: List[str] = field(default_factory=list)
    categories_preset: str = ""
    category_to_p_images_fp: str = ""
    n_images: int = 500

    # index (training) dataset
    index_dataset_name: str = "index"
    # accepted for reference-YAML compatibility but a no-op: the reference
    # itself never reads this key outside its configs (grep over its tree)
    use_archive_purifier: bool = False
    train_image_size: int = 384
    ignore_index: int = 255
    scale_range: Tuple[float, float] = (0.1, 1.0)
    use_advanced_copy_paste: bool = False
    # no-op in the reference too: appears only in its configs
    iter_label_update: int = 0
    random_duplicate: bool = False

    # validation dataset
    dataset_name: str = "coco2017"
    split: str = "val"

    # dataloaders
    train_dataloader_kwargs: Dict[str, Any] = field(default_factory=dict)
    val_dataloader_kwargs: Dict[str, Any] = field(default_factory=dict)

    # model
    clip_arch: str = "ViT-B/16"
    encoder_type: str = "clip"
    frozen_bn: bool = True
    stop_gradient: bool = True
    # stored-but-never-read in the reference (networks/zutis.py:45 assigns
    # it; nothing consumes it) — kept for config compatibility
    decoder_image_n_dims: Optional[int] = None

    # optimisation
    n_iters: int = 20000
    iter_eval: int = 1000
    iter_log: int = 250

    # TPU-native additions (absent from reference configs; defaults keep the
    # reference YAMLs loading unchanged)
    clip_assets_dir: str = ""      # dir with CLIP .pt weights + BPE merges
    mesh_axes: Dict[str, int] = field(default_factory=dict)  # e.g. data/model
    compute_dtype: str = "float32"  # "bfloat16" for TPU speed
    checkpoint_every: int = 0       # orbax full-state checkpoints; 0 = off

    extras: Dict[str, Any] = field(default_factory=dict)

    @classmethod
    def load(cls, p_config: str, **overrides) -> "Config":
        with open(p_config) as f:
            raw: Dict[str, Any] = yaml.safe_load(f)
        # reference main.py:30-31 does args.update(base_args): the YAML
        # wins over argparse values; CLI overrides only fill keys the YAML
        # does not set (so a config pinning e.g. `seed:` keeps its
        # checkpoint-directory naming regardless of flag defaults)
        for k, v in overrides.items():
            raw.setdefault(k, v)
        raw["p_config"] = p_config
        names = {f.name for f in dataclasses.fields(cls)}
        known = {k: v for k, v in raw.items() if k in names}
        extras = {k: v for k, v in raw.items() if k not in names}
        cfg = cls(**known)
        cfg.extras = extras
        if isinstance(cfg.scale_range, list):
            cfg.scale_range = tuple(cfg.scale_range)
        if cfg.categories_preset and not cfg.categories:
            from zutis_tpu.data.category_lists import CATEGORY_PRESETS

            cfg.categories = list(CATEGORY_PRESETS[cfg.categories_preset])
        return cfg

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2, sort_keys=True)


def experiment_name(cfg: Config) -> str:
    """Reproduces the reference's run-name mangling
    (utils/utils.py:95-145)."""
    parts: List[str] = [
        cfg.clip_arch.lower().replace("/", "_").replace("-", "_")
        .replace("@", "_")
    ]
    if "RN" in cfg.clip_arch and cfg.frozen_bn:
        parts.append("frozen_bn")
    if cfg.dataset_name == "voc2012":
        parts.append(f"bs{cfg.train_dataloader_kwargs.get('batch_size', 8)}")
    if not cfg.stop_gradient:
        parts.append("no_sg")
    if cfg.random_duplicate:
        parts.append("rd")
    if cfg.index_dataset_name == "index":
        parts.append(f"n{cfg.n_images}")
        for p in cfg.dir_train_dataset:
            dir_name = p.split("/")[-2] if "/" in p else p
            if dir_name == "ImageNet2012":
                parts.append("imagenet")
            elif dir_name == "pass":
                parts.append("pass")
            else:
                # archives beyond the reference's two get their dir name
                parts.append(dir_name.replace("/", "_"))
    parts.append(
        f"sr{int(cfg.scale_range[0] * 100)}{int(cfg.scale_range[1] * 100)}"
    )
    if cfg.suffix:
        parts.append(cfg.suffix)
    parts.append(f"s{cfg.seed}")
    if cfg.debug:
        parts.append("debug")
    return "_".join(parts)


def checkpoint_dir(cfg: Config) -> str:
    name = experiment_name(cfg)
    if cfg.dataset_name == "imagenet-s":
        return (f"{cfg.dir_ckpt}/{cfg.dataset_name}{cfg.n_categories}/"
                f"{cfg.split}/{name}/dt")
    return f"{cfg.dir_ckpt}/{cfg.dataset_name}/{cfg.split}/{name}/dt"
