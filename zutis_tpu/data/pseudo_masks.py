"""Pseudo-mask generation: SelfMask inference + bilateral refinement ->
per-image COCO-RLE JSON files.

Behavioural contract (reference datasets/index_dataset.py:177-277
`generate_pseudo_masks` / `_get_pseudo_masks`): for each retrieved image,
resize the shorter side to 512, run SelfMask (single best mask), refine with
the bilateral solver at the resized resolution, nearest-resize the binary
mask back to the original size, RLE-encode to
`<dir_pseudo_masks>/<image-stem>.json`, and assert the written RLE decodes
back pixel-exactly (index_dataset.py:219-224). Existing files are reused.

TPU-first: SelfMask runs batched and jitted on device at a fixed padded
resolution. The bilateral refinement runs on host by default (scipy CG, the
reference's regime) or fully on device with ZUTIS_TPU_BILATERAL=device
(ops/bilateral_device.py: jittable grid CG + flood-fill components). The
host default is chosen BY MEASUREMENT (BILATERAL_QUALIFY.json: scipy
408.8 ms/image vs device 2232.5 ms/image on the real chip at 512x640 —
the solve is latency-bound VPU work, not MXU work)."""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from zutis_tpu.data.transforms import normalize_image, resize_edge
from zutis_tpu.models.selfmask import SelfMask, pad_to_patch_multiple
from zutis_tpu.ops import rle as rle_ops
from zutis_tpu.ops.bilateral import bilateral_solver_output


def pseudo_mask_path(dir_pseudo_masks: str, p_image: str) -> str:
    stem = os.path.splitext(os.path.basename(p_image))[0]
    return os.path.join(dir_pseudo_masks, f"{stem}.json")


def generate_pseudo_masks(
    p_images: List[str],
    dir_pseudo_masks: str,
    selfmask_params,
    model: Optional[SelfMask] = None,
    image_size: int = 512,
    use_bilateral_solver: bool = True,
    overwrite: bool = False,
    path_map: Optional[Dict[str, str]] = None,
) -> Dict[str, str]:
    """Returns {p_image: p_pseudo_mask_json}; generates missing entries.
    `path_map` overrides the flat `<dir>/<stem>.json` layout per image (the
    ImageNet variant stores under `{split}_pseudo_masks_selfmask/{wnid}/`,
    data/imagenet_index.py)."""
    import jax
    import jax.numpy as jnp

    model = model or SelfMask()
    out: Dict[str, str] = {}
    todo: List[str] = []
    for p in p_images:
        p_mask = (path_map[p] if path_map is not None
                  else pseudo_mask_path(dir_pseudo_masks, p))
        os.makedirs(os.path.dirname(p_mask) or ".", exist_ok=True)
        out[p] = p_mask
        if overwrite or not os.path.exists(p_mask):
            todo.append(p)
    if not todo:
        return out

    best_masks = jax.jit(
        lambda params, x: model.apply({"params": params}, x,
                                      method=SelfMask.best_masks)
    )

    for p_image in todo:
        pil = Image.open(p_image).convert("RGB")
        W0, H0 = pil.size
        resized = resize_edge(pil, image_size, edge="shorter")
        arr = normalize_image(resized)[None]  # [1, 3, h, w]
        padded = pad_to_patch_multiple(arr, model.patch_size)
        h, w = arr.shape[-2:]
        mask = np.asarray(
            best_masks(selfmask_params, jnp.asarray(padded))
        )[0, :h, :w]

        if use_bilateral_solver:
            if os.environ.get("ZUTIS_TPU_BILATERAL") == "device":
                from zutis_tpu.ops.bilateral_device import (
                    bilateral_solver_output_device,
                )

                _, refined = bilateral_solver_output_device(
                    jnp.asarray(np.asarray(resized), jnp.float32),
                    jnp.asarray(mask, jnp.float32))
                refined = np.asarray(refined)
            else:
                _, refined = bilateral_solver_output(
                    np.asarray(resized), mask.astype(np.float64))
            mask = refined.astype(np.uint8)

        # nearest-resize back to the original resolution
        mask_img = Image.fromarray(mask * 255).resize((W0, H0), Image.NEAREST)
        final = (np.asarray(mask_img) > 127).astype(np.uint8)

        encoded = rle_ops.encode(final)
        p_mask = out[p_image]
        with open(p_mask, "w") as f:
            json.dump(encoded, f)
        with open(p_mask) as f:
            roundtrip = rle_ops.decode(json.load(f))
        assert np.array_equal(roundtrip, final), \
            f"RLE round-trip mismatch for {p_image}"
    return out
