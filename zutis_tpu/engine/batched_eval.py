"""Bucketed batched evaluation: variable-resolution eval in a handful of
compiled programs.

The reference evaluates batch-1 at every image's native (H, W)
(trainer.py:294-375; coco20k_eval.py:241-268) — under XLA that means one
compile per distinct image shape (hundreds on COCO). Here images are padded
bottom/right into a small set of bucket shapes (multiples of
`bucket_quantum` pixels), run through `ZUTIS.forward_padded` in batches, and
decoded with per-sample dynamic-geometry resizes (ops/dynamic_shapes.py).
Each bucket shape compiles exactly once; outputs on every sample's valid
window equal the per-image program (tests/test_batched_eval.py proves it).

Decode details:
  - semantic: text-logit einsum at feature resolution, per-sample bilinear
    resize matrices from the native feature window to the bucket's pixel
    extent with the native scale (h_feat*up / H_i), argmax, host-side crop
    to (H_i, W_i). Rows/cols beyond each native extent are garbage and
    cropped — identical to reference zutis.py:356-372 on the valid region.
  - instance: proposal stats (confidence, masked-average tokens) masked to
    the valid feature window; proposals upsampled with the same per-sample
    matrices; binarised masks zeroed outside the native pixel window so NMS
    IoU/areas match the native program (reference zutis.py:374-470).
"""
from __future__ import annotations

import math
from typing import Dict, Iterator, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from zutis_tpu.ops.nms import mask_nms


def pipelined(dispatch, collect, work, depth: int = 2):
    """Overlap host-side fetch/assembly with device execution.

    jax dispatch is asynchronous: a jitted step call returns device handles
    immediately while the program runs. The synchronous eval loop
    (dispatch -> blocking blob fetch -> host RLE/JSON assembly -> next
    dispatch) therefore serialises ~150 ms of D2H + host work per batch with
    ~160 ms of device compute under the tunnelled runtime. Keeping `depth`
    dispatches in flight lets batch N's fetch + assembly run while the
    device executes batch N+1 (and N+1's H2D upload while N computes).

    dispatch(item) -> device handles; collect(handles, item) -> result.
    Yields collect results in `work` order. depth=1 degenerates to the
    synchronous loop.
    """
    from collections import deque

    q: deque = deque()
    for item in work:
        q.append((dispatch(item), item))
        if len(q) >= max(1, depth):
            handles, it = q.popleft()
            yield collect(handles, it)
    while q:
        handles, it = q.popleft()
        yield collect(handles, it)


def bucket_shape(
    h: int, w: int, quantum: int = 128, min_size: int = 128
) -> Tuple[int, int]:
    """Quantise a native pixel shape up to the enclosing bucket shape."""
    bh = max(min_size, int(math.ceil(h / quantum)) * quantum)
    bw = max(min_size, int(math.ceil(w / quantum)) * quantum)
    return bh, bw


def group_into_buckets(
    sizes: Sequence[Tuple[int, int]], quantum: int = 128,
) -> Dict[Tuple[int, int], List[int]]:
    """{bucket shape: [dataset indices]} preserving dataset order per bucket."""
    buckets: Dict[Tuple[int, int], List[int]] = {}
    for i, (h, w) in enumerate(sizes):
        buckets.setdefault(bucket_shape(h, w, quantum), []).append(i)
    return buckets


def iter_bucketed_batches(
    buckets: Dict[Tuple[int, int], List[int]], batch_size: int,
) -> Iterator[Tuple[Tuple[int, int], List[int]]]:
    for shape, idxs in buckets.items():
        for s in range(0, len(idxs), batch_size):
            yield shape, idxs[s:s + batch_size]


def pad_batch(
    images: List[np.ndarray],  # each [3, H_i, W_i]
    shape: Tuple[int, int],
    batch_size: int,
    patch_size: int,
    dtype=np.float32,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (padded [B, 3, Hb, Wb], native_grid [B, 2], native_pixels [B, 2]).
    Short batches are filled by repeating the first image (dropped after).
    dtype=np.uint8 pairs with make_instance_step(uint8_input=True): raw RGB
    crosses the host boundary and normalisation runs on device."""
    Hb, Wb = shape
    B = batch_size
    out = np.zeros((B, 3, Hb, Wb), dtype)
    native_grid = np.ones((B, 2), np.int32)
    native_pixels = np.ones((B, 2), np.int32)
    for i in range(B):
        img = images[i] if i < len(images) else images[0]
        _, h, w = img.shape
        out[i, :, :h, :w] = img
        native_grid[i] = (h // patch_size, w // patch_size)
        native_pixels[i] = (h, w)
    return out, native_grid, native_pixels


def pixel_valid_mask(
    native_pixels: jnp.ndarray, Hb: int, Wb: int
) -> jnp.ndarray:
    rows = jnp.arange(Hb)[None, :, None] < native_pixels[:, 0:1, None]
    cols = jnp.arange(Wb)[None, None, :] < native_pixels[:, 1:2, None]
    return rows & cols  # [B, Hb, Wb] bool


def _native_resize_mats(
    feat_pad: Tuple[int, int],
    native_feat: jnp.ndarray,  # [B, 2]
    native_pixels: jnp.ndarray,  # [B, 2]
    out_hw: Tuple[int, int],
):
    """Per-sample bilinear matrices mapping each native feature window to the
    bucket pixel extent with the NATIVE scale (in_i / out_i), so rows inside
    each native pixel window match the per-image resize exactly."""
    import jax as _jax

    hp, wp = feat_pad
    H, W = out_hw

    def mat(out_size, in_pad, n_in, n_out):
        from zutis_tpu.ops.dynamic_shapes import dynamic_resize_matrix

        return dynamic_resize_matrix(
            out_size, in_pad, n_in, "linear",
            scale=n_in.astype(jnp.float32) / n_out.astype(jnp.float32),
        )

    wh = _jax.vmap(lambda nf, npx: mat(H, hp, nf, npx))(
        native_feat[:, 0], native_pixels[:, 0])
    ww = _jax.vmap(lambda nf, npx: mat(W, wp, nf, npx))(
        native_feat[:, 1], native_pixels[:, 1])
    return wh, ww


def _semantic_argmax(model, text_embeddings, out_hw, params, images,
                     native_grid, native_pixels):
    out = model.apply(
        {"params": params}, images, native_grid,
        method=type(model).forward_padded,
    )
    logits = jnp.einsum(
        "nc,bhwc->bnhw", text_embeddings, out["patch_tokens"],
        preferred_element_type=jnp.float32,
    )
    feat_pad = logits.shape[-2:]
    wh, ww = _native_resize_mats(
        feat_pad, out["native_grid"], native_pixels, out_hw)
    up = jnp.einsum("boh,bchw->bcow", wh, logits)
    up = jnp.einsum("bow,bchw->bcho", ww, up)
    return jnp.argmax(up, axis=1).astype(jnp.int32)


def make_semantic_step(model, text_embeddings, out_hw: Tuple[int, int]):
    """jitted: (params, images, native_grid, native_pixels) ->
    semantic argmax [B, Hb, Wb] int32 (valid per-sample window only)."""

    @jax.jit
    def step(params, images, native_grid, native_pixels):
        return _semantic_argmax(model, text_embeddings, out_hw, params,
                                images, native_grid, native_pixels)

    return step


def make_semantic_confusion_step(
    model, text_embeddings, out_hw: Tuple[int, int], n_classes: int,
):
    """jitted: (params, images, native_grid, native_pixels, gt) ->
    [n_classes, n_classes] confusion histogram over every VALID gt pixel.
    gt arrives padded to the output bucket with -1 outside each sample's
    target window (and for short-batch filler slots), so the histogram
    equals per-image metric updates exactly while the dense semantic map
    never crosses the host boundary — under the tunnelled runtime the
    21 MB/flush argmax fetch was the semantic-eval bottleneck."""
    from zutis_tpu.engine.metrics import confusion_update

    @jax.jit
    def step(params, images, native_grid, native_pixels, gt):
        sem = _semantic_argmax(model, text_embeddings, out_hw, params,
                               images, native_grid, native_pixels)
        return confusion_update(gt, sem, n_classes)

    return step


def make_instance_step(
    model, text_embeddings, out_hw: Tuple[int, int],
    threshold: float = 0.5, temperature: float = 5.0,
    nms_type: str = "hard", nms_threshold: float = 0.3,
    uint8_input: bool = False,
    semantic_mode: str = "map",  # "map" | "confusion" | "none"
    n_classes: int = 0,  # required for semantic_mode="confusion"
):
    """jitted: -> dict(masks [B,Q,Hb,Wb] bool, rle {...}, host_blob
    [B, 4+per_image]
    int32, scores, category_ids, keep, + the semantic output) — reference
    predict("instance") semantics (networks/zutis.py:374-470) on each valid
    window. Hosts fetch `host_blob` ONCE (ops/rle_device.py pack/unpack —
    device RLE counts + every per-query scalar); `masks` stays device-side
    for visualisation slices and the cap-overflow fallback (per-mask dense
    slice fetch, instances_to_coco_counts dev_masks). uint8_input=True takes
    raw [B,3,Hb,Wb] uint8 RGB and normalises on device (4x less H2D than
    host-normalised f32).

    semantic_mode: "map" returns the dense argmax under "semantic";
    "confusion" takes a 5th argument gt [B,Ho,Wo] int32 (-1 outside target
    windows) and returns the [C,C] histogram under "confusion" (the
    Trainer's path — no dense map crosses the host boundary); "none" skips
    the semantic decode entirely (coco20k AP eval never uses it)."""

    @jax.jit
    def step(params, images, native_grid, native_pixels, gt=None):
        if uint8_input:
            from zutis_tpu.data.transforms import (
                IMAGENET_MEAN, IMAGENET_STD,
            )

            mean = jnp.asarray(IMAGENET_MEAN)[None, :, None, None]
            std = jnp.asarray(IMAGENET_STD)[None, :, None, None]
            images = (images.astype(jnp.float32) / 255.0 - mean) / std
        out = model.apply(
            {"params": params}, images, native_grid,
            method=type(model).forward_padded,
        )
        proposals = out["mask_proposals"][:, -1]  # [B, Q, h, w]
        valid = out["valid"].astype(proposals.dtype)  # [B, h, w]
        tokens = out["patch_tokens"]  # [B, h, w, c]

        from zutis_tpu.postproc.instance import classify_proposals

        binary = (proposals > threshold) & (valid[:, None] > 0)
        confidence, category_ids = classify_proposals(
            proposals, binary, tokens, text_embeddings, temperature)

        feat_pad = proposals.shape[-2:]
        wh, ww = _native_resize_mats(
            feat_pad, out["native_grid"], native_pixels, out_hw)
        up = jnp.einsum("boh,bqhw->bqow", wh, proposals)
        up = jnp.einsum("bow,bqhw->bqho", ww, up)
        pix_valid = pixel_valid_mask(native_pixels, *out_hw)
        masks = (up > threshold) & pix_valid[:, None]

        keep, out_scores = jax.vmap(
            lambda m, s, c: mask_nms(m, s, c, nms_threshold=nms_threshold,
                                     nms_type=nms_type)
        )(masks, confidence, category_ids)

        from zutis_tpu.ops.rle_device import (
            pack_host_blob, rle_encode_masks_device,
        )

        rle = rle_encode_masks_device(masks, keep, native_hw=native_pixels)
        # no bit-packing in the hot program: cap-overflow recovery fetches a
        # dense mask slice from "masks" instead (rare; postproc/instance.py
        # instances_to_coco_counts dev_masks fallback), saving a full
        # [B,Q,H,W] read + packed write per step
        out = {
            "masks": masks,
            "rle": rle,
            "host_blob": pack_host_blob(out_scores, category_ids, keep, rle),
            "scores": out_scores,
            "category_ids": category_ids, "keep": keep,
        }
        if semantic_mode != "none":
            logits = jnp.einsum(
                "nc,bhwc->bnhw", text_embeddings, tokens,
                preferred_element_type=jnp.float32,
            )
            sem = jnp.einsum("boh,bchw->bcow", wh, logits)
            sem = jnp.einsum("bow,bchw->bcho", ww, sem)
            semantic = jnp.argmax(sem, axis=1).astype(jnp.int32)
            if semantic_mode == "confusion":
                from zutis_tpu.engine.metrics import confusion_update

                out["confusion"] = confusion_update(gt, semantic, n_classes)
            else:
                out["semantic"] = semantic
        return out

    return step
