"""Inference post-processing: semantic argmax maps and instance decoding.

Behavioural contract (reference networks/zutis.py:340-470 `predict`):
  semantic: logits = text_embeddings . patch_tokens, bilinear-resize to the
    target size, argmax over categories (zutis.py:356-372).
  instance: take the last decoder layer's proposals; binarise at `threshold`
    (0.5); mask confidence = mean in-mask proposal probability; classify each
    query by the L2-normalised masked-average patch token against the text
    embeddings through sigmoid(sim * temperature=5); final confidence =
    mask confidence * max category probability; bilinear-upsample proposals to
    the image size and re-binarise; per-category hard NMS (zutis.py:374-470).

TPU-first: the whole instance path up to and including NMS runs on device
with static shapes ([Q] proposals per image); only the RLE/JSON assembly of
kept masks runs on host (instances_to_coco). The eval fast path packs each
mask's Fortran-order flatten to BITS on device (`pack_masks_fortran`), so the
host boundary carries 1 bit/pixel instead of 8 and the C++ word-scan codec
(native/rle.cc `rle_encode_packed_batch`) emits counts straight from the
packed words — the reference pays a full uint8 mask D2H plus pycocotools'
per-pixel C scan per prediction (networks/zutis.py:288-298).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from zutis_tpu.ops import rle as rle_ops
from zutis_tpu.ops.nms import mask_nms
from zutis_tpu.ops.resize import resize_2d


def predict_semantic(
    patch_tokens: jnp.ndarray,  # [b, h, w, text_dim]
    text_embeddings: jnp.ndarray,  # [n_cat, text_dim]
    size: Optional[tuple] = None,
    return_logits: bool = False,
) -> jnp.ndarray:
    """-> [b, H, W] argmax category ids (or [b, n_cat, H, W] logits)."""
    logits = jnp.einsum(
        "nc,bhwc->bnhw", text_embeddings, patch_tokens,
        preferred_element_type=jnp.float32,
    )
    if size is not None:
        logits = resize_2d(logits, size, mode="linear")
    if return_logits:
        return logits
    return jnp.argmax(logits, axis=1)


def col_stride_bits(h: int) -> int:
    """Rows per packed column after pack_masks_fortran's padding."""
    return -(-h // 8) * 8


def classify_proposals(
    proposals: jnp.ndarray,  # [b, Q, h, w] in [0, 1]
    binary: jnp.ndarray,  # [b, Q, h, w] bool (thresholded + validity-masked)
    patch_tokens: jnp.ndarray,  # [b, h, w, text_dim]
    text_embeddings: jnp.ndarray,  # [n_cat, text_dim]
    temperature: float = 5.0,
):
    """Reference zutis.py:374-430 query classification, shared by every
    instance decode (predict_instances_device, the batched eval step, the
    server): mask confidence = mean in-mask proposal probability; each
    query classified by its L2-normalised masked-average patch token
    against the text embeddings through sigmoid(sim * temperature); final
    confidence = mask confidence * max category probability.
    -> (confidence [b, Q], category_ids [b, Q])."""
    sizes = binary.sum(axis=(-2, -1)).astype(jnp.float32)
    confidence = (
        jnp.sum(proposals * binary, axis=(-2, -1)) / (sizes + 1e-7)
    )
    avg_tokens = jnp.einsum(
        "bhwc,bqhw->bqc", patch_tokens, binary.astype(patch_tokens.dtype),
        preferred_element_type=jnp.float32,
    ) / (sizes[..., None] + 1e-7)
    avg_tokens = avg_tokens / (
        jnp.linalg.norm(avg_tokens, axis=-1, keepdims=True) + 1e-7
    )
    cat_probs = jax.nn.sigmoid(
        jnp.einsum("nc,bqc->bqn", text_embeddings, avg_tokens,
                   preferred_element_type=jnp.float32) * temperature
    )
    category_ids = jnp.argmax(cat_probs, axis=-1)
    confidence = confidence * jnp.max(cat_probs, axis=-1)
    return confidence, category_ids


@partial(jax.jit, static_argnames=("size", "threshold", "temperature",
                                   "nms_type", "nms_threshold", "pack",
                                   "rle"))
def predict_instances_device(
    mask_proposals: jnp.ndarray,  # [b, L, Q, h, w] or [b, Q, h, w], in [0,1]
    patch_tokens: jnp.ndarray,  # [b, h, w, text_dim]
    text_embeddings: jnp.ndarray,  # [n_cat, text_dim]
    size: Optional[tuple] = None,  # (H, W) output size
    threshold: float = 0.5,
    temperature: float = 5.0,
    nms_type: str = "hard",
    nms_threshold: float = 0.3,
    pack: bool = False,
    rle: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Device-side instance decode + NMS. Returns per image (batched):
    masks [b, Q, H, W] bool, scores [b, Q], category_ids [b, Q],
    keep [b, Q] bool; pack=True adds masks_packed [b, Q, nbytes] uint8
    (Fortran-order bits, 8x less host traffic than bool masks); rle=True
    adds the device-computed RLE counts/bbox/area of the kept masks
    (ops/rle_device.py — kilobytes per image, the eval fast path); the
    cap-overflow fallback reads the dense `masks` entry (pass it as
    instances_to_coco_counts(dev_masks=...))."""
    if mask_proposals.ndim == 5:
        mask_proposals = mask_proposals[:, -1]
    b, q = mask_proposals.shape[:2]

    binary = mask_proposals > threshold  # [b, Q, h, w]
    confidence, category_ids = classify_proposals(
        mask_proposals, binary, patch_tokens, text_embeddings, temperature)

    if size is not None:
        up = resize_2d(mask_proposals, size, mode="linear")
        binary_out = up > threshold
    else:
        binary_out = binary

    keep, out_scores = jax.vmap(
        lambda m, s, c: mask_nms(m, s, c, nms_threshold=nms_threshold,
                                 nms_type=nms_type)
    )(binary_out, confidence, category_ids)
    out = {
        "masks": binary_out,
        "scores": out_scores,
        "category_ids": category_ids,
        "keep": keep,
    }
    if pack:
        # packed bits only on explicit request: packing costs a full
        # [b,Q,H,W] read + packed write per dispatch, and the rle path's
        # only residual consumer (the cap-overflow fallback in
        # instances_to_coco_counts) is served by the dense `masks` slice
        # already in the output dict (dev_masks=...), same as the batched
        # eval step
        out["masks_packed"] = pack_masks_fortran(binary_out)
        # static metadata the host decoders need; a scalar array so it rides
        # the jit output pytree (instances_to_coco_packed reads it — ADVICE
        # r3 paired the two APIs on this key)
        out["col_stride_bits"] = jnp.int32(
            col_stride_bits(binary_out.shape[-2]))
    if rle:
        from zutis_tpu.ops.rle_device import (
            pack_host_blob, rle_encode_masks_device,
        )

        rle_out = rle_encode_masks_device(binary_out, keep)
        out["rle"] = rle_out
        out["host_blob"] = pack_host_blob(
            out_scores, category_ids, keep, rle_out)
    return out


def pack_masks_fortran(masks: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W] bool -> [..., W * H8 / 8] uint8: np.packbits(bitorder=
    'big') of the Fortran-order (column-major) flatten, rows padded to
    H8 = ceil(H/8)*8 zeros so every column starts byte-aligned — the layout
    native/rle.cc `rle_encode_packed_batch` scans. Pure reshape/shift work
    that XLA fuses; output is 1/8 the bool mask's bytes."""
    H, W = masks.shape[-2:]
    h8 = -(-H // 8) * 8
    m = jnp.swapaxes(masks, -1, -2)  # [..., W, H]; C-ravel == F-order
    if h8 != H:
        pad = [(0, 0)] * (m.ndim - 1) + [(0, h8 - H)]
        m = jnp.pad(m, pad)
    bits = m.reshape(*m.shape[:-2], W * h8 // 8, 8)
    weights = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    return jnp.sum(
        bits.astype(jnp.int32) * weights, axis=-1).astype(jnp.uint8)


def _unpack_mask_fortran(
    packed_row: np.ndarray, col_stride_bits: int, h: int, w: int
) -> np.ndarray:
    """Host inverse of pack_masks_fortran for one mask (fallback path)."""
    bits = np.unpackbits(np.asarray(packed_row, np.uint8))
    cols = bits[: w * col_stride_bits].reshape(w, col_stride_bits)
    return cols[:, :h].T  # [h, w] row-major


def _compress(counts) -> str:
    return rle_ops._compress_counts([int(c) for c in counts])


def instances_to_coco_counts(
    res: Dict[str, np.ndarray],
    image_ids: List[int],
    sizes: List[tuple],  # native (H, W) per image
    label_id_to_category: Optional[Dict[int, str]] = None,
    new_label_id_to_old_label_id: Optional[Dict[int, int]] = None,
    dev_packed=None,  # DEVICE [b, Q, nbytes] packed bits for cap fallback
    col_stride_bits_packed: Optional[int] = None,
    dev_masks=None,  # DEVICE [b, Q, H, W] bool masks, alternative fallback
) -> List[dict]:
    """COCO prediction dicts from DEVICE-computed RLE counts
    (ops/rle_device.py): only kilobytes of counts/boxes per image cross the
    host boundary. Masks that overflowed the static device caps (rare:
    >k_cap kept, or more runs than max_runs) are recovered exactly via
    per-mask slice fetches from `dev_packed` (packed bits) or `dev_masks`
    (dense bool — lets the hot device program skip bit-packing entirely;
    the fetch costs one D2H per overflowing mask, a rare event counted in
    `overflow`). Same output contract and ordering as instances_to_coco."""
    scores = np.asarray(res["scores"])
    cats = np.asarray(res["category_ids"])
    keep = np.asarray(res["keep"])
    q_index = np.asarray(res["q_index"])
    valid = np.asarray(res["valid"])
    n_kept = np.asarray(res["n_kept"])
    counts = np.asarray(res["counts"])
    n_runs = np.asarray(res["n_runs"])
    overflow = np.asarray(res["overflow"])
    bbox = np.asarray(res["bbox"])
    area = np.asarray(res["area"])
    k_cap = q_index.shape[1]

    from zutis_tpu.native import counts_to_strings, native_encode_packed

    entries = []  # (bi, qi, image_id, hw, kind, slot)
    for bi, image_id in enumerate(image_ids):
        hw = (int(sizes[bi][0]), int(sizes[bi][1]))
        kept_q = np.flatnonzero(keep[bi])
        slot_of = {int(q): si for si, q in enumerate(q_index[bi])
                   if valid[bi, si]}
        for qi in kept_q:
            qi = int(qi)
            si = slot_of.get(qi)
            if si is not None and not overflow[bi, si]:
                if area[bi, si] == 0:
                    continue
                entries.append((bi, qi, image_id, hw, "counts", si))
            else:
                # cap overflow (si None happens only when n_kept > k_cap)
                entries.append((bi, qi, image_id, hw, "packed", -1))
    del n_kept  # q_index/valid already encode the cap truncation

    # batch-compress the counts-path masks
    c_entries = [e for e in entries if e[4] == "counts"]
    strings: List[str] = []
    if c_entries:
        cc = np.stack([counts[bi, si] for (bi, _, _, _, _, si) in c_entries])
        nn = np.asarray([n_runs[bi, si] + 1
                         for (bi, _, _, _, _, si) in c_entries])
        got = counts_to_strings(cc.astype(np.int64), nn)
        strings = (got if got is not None
                   else [_compress(cc[i][:nn[i]]) for i in range(len(cc))])
    s_iter = iter(strings)

    preds: List[dict] = []
    for bi, qi, image_id, hw, kind, si in entries:
        if kind == "counts":
            seg = {"size": [hw[0], hw[1]], "counts": next(s_iter)}
            box = [float(v) for v in bbox[bi, si]]
        elif dev_packed is not None:
            row = np.asarray(dev_packed[bi, qi])  # one mask's bits only
            enc = native_encode_packed(
                row[None], np.asarray([0]), col_stride_bits_packed,
                np.asarray([hw[0]]), np.asarray([hw[1]]))
            if enc is not None:
                (s,), bxs, ars = enc
                if ars[0] == 0:
                    continue
                seg = {"size": [hw[0], hw[1]], "counts": s}
                box = [float(v) for v in bxs[0]]
            else:
                m = _unpack_mask_fortran(row, col_stride_bits_packed, *hw)
                if m.sum() == 0:
                    continue
                seg = rle_ops.encode(m)
                box = rle_ops.to_bbox(m)
        else:
            assert dev_masks is not None, (
                "device RLE cap overflow needs dev_packed or dev_masks"
            )
            # one dense mask slice crosses the boundary (rare path)
            m = np.asarray(dev_masks[bi, qi])[: hw[0], : hw[1]].astype(
                np.uint8)
            if m.sum() == 0:
                continue
            seg = rle_ops.encode(m)
            box = rle_ops.to_bbox(m)
        cid = int(cats[bi, qi])
        label_id = (new_label_id_to_old_label_id[cid]
                    if new_label_id_to_old_label_id is not None else cid)
        pred = {
            "category_id": label_id,
            "segmentation": seg,
            "score": float(scores[bi, qi]),
            "image_id": image_id,
            "image_size": hw,
            "bbox": box,
        }
        if label_id_to_category is not None:
            pred["pred_class"] = label_id_to_category[label_id]
        preds.append(pred)
    return preds


def instances_to_coco_packed(
    device_out: Dict[str, np.ndarray],
    image_ids: List[int],
    sizes: List[tuple],  # native (H, W) per image
    label_id_to_category: Optional[Dict[int, str]] = None,
    new_label_id_to_old_label_id: Optional[Dict[int, int]] = None,
) -> List[dict]:
    """COCO prediction dicts from packed-bit masks: only `masks_packed`
    [b, Q, nbytes] uint8 (plus the small score/keep arrays) crosses the host
    boundary. Encodes each image's native (H, W) window with the C++ packed
    codec; falls back to numpy unpack + the Python codec without a toolchain.
    Same output contract as instances_to_coco."""
    packed = np.asarray(device_out["masks_packed"])
    scores = np.asarray(device_out["scores"])
    cats = np.asarray(device_out["category_ids"])
    keep = np.asarray(device_out["keep"])
    b, q = keep.shape
    col_stride_bits = int(device_out["col_stride_bits"])

    sel, hs, ws, meta = [], [], [], []
    for bi, image_id in enumerate(image_ids):
        H, W = sizes[bi]
        for qi in np.flatnonzero(keep[bi]):
            sel.append(bi * q + qi)
            hs.append(H)
            ws.append(W)
            meta.append((bi, int(qi), image_id, (int(H), int(W))))
    if not sel:
        return []

    flat = packed.reshape(b * q, -1)
    from zutis_tpu.native import native_encode_packed

    enc = native_encode_packed(
        flat, np.asarray(sel), col_stride_bits, np.asarray(hs),
        np.asarray(ws))
    preds: List[dict] = []
    if enc is not None:
        strings, bboxes, areas = enc
        for i, (bi, qi, image_id, hw) in enumerate(meta):
            if areas[i] == 0:
                continue
            cid = int(cats[bi, qi])
            label_id = (new_label_id_to_old_label_id[cid]
                        if new_label_id_to_old_label_id is not None else cid)
            pred = {
                "category_id": label_id,
                "segmentation": {"size": list(hw), "counts": strings[i]},
                "score": float(scores[bi, qi]),
                "image_id": image_id,
                "image_size": hw,
                "bbox": [float(v) for v in bboxes[i]],
            }
            if label_id_to_category is not None:
                pred["pred_class"] = label_id_to_category[label_id]
            preds.append(pred)
        return preds
    # no native toolchain: unpack on host and reuse the numpy codec
    for bi, qi, image_id, hw in meta:
        m = _unpack_mask_fortran(flat[bi * q + qi], col_stride_bits, *hw)
        if m.sum() == 0:
            continue
        cid = int(cats[bi, qi])
        label_id = (new_label_id_to_old_label_id[cid]
                    if new_label_id_to_old_label_id is not None else cid)
        pred = {
            "category_id": label_id,
            "segmentation": rle_ops.encode(m),
            "score": float(scores[bi, qi]),
            "image_id": image_id,
            "image_size": hw,
            "bbox": rle_ops.to_bbox(m),
        }
        if label_id_to_category is not None:
            pred["pred_class"] = label_id_to_category[label_id]
        preds.append(pred)
    return preds


def instances_to_coco(
    device_out: Dict[str, np.ndarray],
    image_ids: List[int],
    label_id_to_category: Optional[Dict[int, str]] = None,
    new_label_id_to_old_label_id: Optional[Dict[int, int]] = None,
) -> List[dict]:
    """Host-side assembly of COCO-style prediction dicts (RLE + bbox) from
    the device NMS output — the reference's per-prediction dict layout
    (networks/zutis.py:288-298)."""
    preds: List[dict] = []
    masks = np.asarray(device_out["masks"])
    scores = np.asarray(device_out["scores"])
    cats = np.asarray(device_out["category_ids"])
    keep = np.asarray(device_out["keep"])
    for bi, image_id in enumerate(image_ids):
        hw = masks.shape[-2:]
        for qi in np.flatnonzero(keep[bi]):
            m = masks[bi, qi].astype(np.uint8)
            if m.sum() == 0:
                continue
            cid = int(cats[bi, qi])
            if new_label_id_to_old_label_id is not None:
                label_id = new_label_id_to_old_label_id[cid]
            else:
                label_id = cid
            pred = {
                "category_id": label_id,
                "segmentation": rle_ops.encode(m),
                "score": float(scores[bi, qi]),
                "image_id": image_id,
                "image_size": tuple(hw),
                "bbox": rle_ops.to_bbox(m),
            }
            if label_id_to_category is not None:
                pred["pred_class"] = label_id_to_category[label_id]
            preds.append(pred)
    return preds
