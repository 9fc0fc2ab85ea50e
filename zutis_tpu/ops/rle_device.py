"""Device-side COCO RLE: kept-mask compaction + run boundary extraction.

The reference encodes every prediction's full uint8 mask on the host with
pycocotools' C scan (networks/zutis.py:288-298) — a dense D2H transfer per
query. Here the TPU does everything after NMS:

  1. compact: gather the <=k_cap kept masks to the front (NMS keeps ~5-20 of
     the 100 queries), so later stages touch 1/4 of the pixels and the host
     boundary carries only kept data;
  2. runs: find each mask's column-major run boundaries with vector ops —
     a shifted-compare marks transitions, `col_cap` min-extraction sweeps
     pull the per-column transition rows (no scatter, no big sort: TPU
     scatters serialise and a full Fortran-order sort would touch H*W keys),
     and one small sort over the [W * col_cap] candidates yields the global
     boundary list;
  3. sidecars: tight bbox + area per kept mask from plain reductions.

The host receives a few KB per image (counts + indices + boxes) instead of
megabytes of mask bytes, turns counts into COCO strings (native/rle.cc), and
falls back to the packed-bits path only for masks that overflow the static
caps (counted in `overflow`/`n_kept` so the fallback is exact, never lossy).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _counts_one(mask, h_i, w_i, col_cap: int, max_runs: int):
    """One mask [H, W] bool (zeroed outside the (h_i, w_i) window) ->
    (counts [max_runs+1] i32, n_trans i32, overflow bool, bbox [4] i32
    xyxy, area i32). counts[:n_trans+1] is the COCO run-length sequence of
    the window's Fortran-order flatten (leading zero-run included)."""
    H, W = mask.shape
    rows = jnp.arange(H, dtype=jnp.int32)[:, None]  # [H, 1]
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]  # [1, W]
    inside = (rows < h_i) & (cols < w_i)
    m = mask & inside

    # F-order predecessor: (r-1, c) for r>0; (h_i-1, c-1) for r==0 (0 at the
    # very start) — so runs continue across column boundaries exactly as in
    # the flat column-major scan
    lastrow = jnp.take_along_axis(
        m, jnp.broadcast_to(jnp.maximum(h_i - 1, 0), (1, W)), axis=0)[0]
    prev_row0 = jnp.concatenate(
        [jnp.zeros((1,), lastrow.dtype), lastrow[:-1]])
    prev = jnp.concatenate([prev_row0[None, :], m[:-1, :]], axis=0)
    trans = (m != prev) & inside
    colcnt = jnp.sum(trans, axis=0, dtype=jnp.int32)  # [W]

    # per-column transition rows, ascending, via col_cap min-extractions
    key = jnp.where(trans, rows, H)  # [H, W] int32
    colpos = []
    for _ in range(col_cap):
        cur = jnp.min(key, axis=0)  # [W]
        colpos.append(cur)
        key = jnp.where(rows == cur[None, :], H, key)
    colpos = jnp.stack(colpos, axis=0)  # [col_cap, W]

    n = (h_i * w_i).astype(jnp.int32)
    pos = jnp.where(colpos < H, cols * h_i + colpos, n)  # [col_cap, W]
    pos = jnp.sort(pos.reshape(-1))[:max_runs]
    boundaries = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), pos, n[None]])
    counts = jnp.diff(boundaries)  # [max_runs + 1]
    n_trans = jnp.sum(colcnt)
    overflow = (n_trans > max_runs) | jnp.any(colcnt > col_cap)

    col_any = jnp.any(m, axis=0)
    row_any = jnp.any(m, axis=1)
    area = jnp.sum(m, dtype=jnp.int32)
    big = jnp.int32(1 << 30)
    xmin = jnp.min(jnp.where(col_any, cols[0], big))
    xmax = jnp.max(jnp.where(col_any, cols[0], -1))
    ymin = jnp.min(jnp.where(row_any, rows[:, 0], big))
    ymax = jnp.max(jnp.where(row_any, rows[:, 0], -1))
    bbox = jnp.where(
        area > 0, jnp.stack([xmin, ymin, xmax, ymax]), jnp.zeros(4, jnp.int32)
    )
    return counts, n_trans, overflow, bbox, area


def rle_encode_masks_device(
    masks: jnp.ndarray,  # [B, Q, H, W] bool, zeroed outside native windows
    keep: jnp.ndarray,  # [B, Q] bool (NMS output)
    native_hw: Optional[jnp.ndarray] = None,  # [B, 2] int32; None -> (H, W)
    k_cap: int = 16,
    col_cap: int = 8,
    max_runs: int = 2048,
) -> Dict[str, jnp.ndarray]:
    """Compact kept masks and extract their RLE counts on device. Returns
      q_index [B, k_cap]  query id of each compacted slot (kept first)
      valid   [B, k_cap]  slot holds a kept mask
      n_kept  [B]         total kept (> k_cap -> host falls back for extras)
      counts  [B, k_cap, max_runs+1], n_runs [B, k_cap]
      overflow[B, k_cap]  per-slot cap overflow -> host falls back
      bbox    [B, k_cap, 4] xyxy, area [B, k_cap]
    """
    B, Q, H, W = masks.shape
    if native_hw is None:
        native_hw = jnp.broadcast_to(
            jnp.asarray([H, W], jnp.int32)[None], (B, 2))
    order = jnp.argsort(jnp.where(keep, 0, 1), axis=1, stable=True)
    q_index = order[:, :k_cap]
    valid = jnp.take_along_axis(keep, q_index, axis=1)
    n_kept = jnp.sum(keep, axis=1).astype(jnp.int32)
    sel = jnp.take_along_axis(
        masks, q_index[:, :, None, None], axis=1)  # [B, k_cap, H, W]

    per_mask = jax.vmap(
        lambda mk, hw: jax.vmap(
            lambda m: _counts_one(m, hw[0], hw[1], col_cap, max_runs)
        )(mk)
    )
    counts, n_runs, overflow, bbox, area = per_mask(sel, native_hw)
    return {
        "q_index": q_index.astype(jnp.int32),
        "valid": valid,
        "n_kept": n_kept,
        "counts": counts,
        "n_runs": n_runs.astype(jnp.int32),
        "overflow": overflow,
        "bbox": bbox,
        "area": area,
    }


# The tunnelled dev runtime charges ~30 ms PER D2H fetch regardless of size
# (CLAUDE.md); eleven per-array fetches of the eval outputs cost more than
# the whole device program. Everything the host needs therefore ships as ONE
# flat int32 blob with a self-describing header, fetched in a single
# transfer. (On PCIe hosts this is merely tidy; under the tunnel it is 3x
# end-to-end eval throughput.)

N_ESC = 8  # per-slot escape capacity for counts >= 2^16

_BLOB_FIELDS = (
    # name, shape-lambda (B, Q, K, R) -> shape, encoding
    ("scores", lambda B, Q, K, R: (B, Q), "f32"),
    ("category_ids", lambda B, Q, K, R: (B, Q), "i32"),
    ("keep", lambda B, Q, K, R: (B, Q), "bool"),
    ("q_index", lambda B, Q, K, R: (B, K), "i32"),
    ("valid", lambda B, Q, K, R: (B, K), "bool"),
    ("n_kept", lambda B, Q, K, R: (B,), "i32"),
    # counts ship as PAIRED uint16 halves (two runs per int32 lane): run
    # lengths almost always fit 16 bits, and the counts array is ~95% of
    # the blob — the tunnel moves D2H at ~36 MB/s, so halving it is ~25%
    # end-to-end eval throughput at batch 32. The rare >= 2^16 runs
    # (leading/trailing empty spans) ride a small escape table; slots with
    # more than N_ESC big runs flag `overflow` and take the exact
    # dense-mask fallback like any other cap overflow.
    ("counts16", lambda B, Q, K, R: (B, K, (R + 2) // 2), "i32"),
    ("esc_pos", lambda B, Q, K, R: (B, K, N_ESC), "i32"),
    ("esc_hi", lambda B, Q, K, R: (B, K, N_ESC), "i32"),
    ("n_runs", lambda B, Q, K, R: (B, K), "i32"),
    ("overflow", lambda B, Q, K, R: (B, K), "bool"),
    ("bbox", lambda B, Q, K, R: (B, K, 4), "i32"),
    ("area", lambda B, Q, K, R: (B, K), "i32"),
)


def pack_host_blob(scores, category_ids, keep, rle: Dict) -> jnp.ndarray:
    """-> [B, 4 + per_image] int32, BATCH-MAJOR: each row is a per-image
    header (Q, k_cap, max_runs, 0) followed by that image's eval outputs
    in _BLOB_FIELDS order (f32 scores bitcast, counts as paired uint16 +
    escapes).

    Batch-major matters for data-parallel eval: a flat 1-D blob (the old
    layout) ravels across the batch axis, so under a DP mesh GSPMD must
    all-gather every field onto every device before the concat (measured
    42 all-gathers per batch at DP=2, __graft_entry__.dryrun_multichip).
    With the batch axis leading, the whole pack shards trivially on
    `data` and the program stays collective-free; each host can fetch its
    own addressable rows."""
    B, Q = scores.shape
    K = rle["q_index"].shape[1]
    R = rle["counts"].shape[2] - 1
    counts = rle["counts"].astype(jnp.int32)  # [B, K, R+1], values >= 0

    big = counts >= (1 << 16)
    # positions of the first N_ESC big counts, in ascending position order.
    # NOT lax.top_k: GSPMD partitions top_k as an all-gather + global sort
    # even when the sorted axis is unsharded, which breaks the
    # collective-free data-parallel eval program (dryrun_multichip). A
    # cumsum rank + N_ESC masked-min reductions shards trivially on batch.
    R1 = R + 1
    idx = jnp.arange(R1, dtype=jnp.int32)
    rank = jnp.cumsum(big, axis=-1) - 1  # rank of each big entry, 0-based
    order = jnp.stack(
        [jnp.min(jnp.where(big & (rank == j), idx, R1), axis=-1)
         for j in range(N_ESC)], axis=-1)  # [B, K, N_ESC], R1 = none
    is_big = order < R1
    order_c = jnp.minimum(order, R1 - 1)
    esc_pos = jnp.where(is_big, order_c, -1).astype(jnp.int32)
    esc_hi = jnp.where(
        is_big,
        jnp.take_along_axis(counts, order_c, axis=-1) >> 16,
        0,
    ).astype(jnp.int32)
    esc_overflow = jnp.sum(big, axis=-1) > N_ESC

    lo = counts & 0xFFFF
    if (R + 1) % 2:
        lo = jnp.pad(lo, ((0, 0), (0, 0), (0, 1)))
    counts16 = lo[..., 0::2] | (lo[..., 1::2] << 16)

    vals = {"scores": scores, "category_ids": category_ids, "keep": keep,
            **rle,
            "counts16": counts16, "esc_pos": esc_pos, "esc_hi": esc_hi,
            "overflow": rle["overflow"] | esc_overflow}
    header = jnp.broadcast_to(
        jnp.asarray([Q, K, R, 0], jnp.int32)[None], (B, 4))
    parts = [header]
    for name, _, enc in _BLOB_FIELDS:
        v = vals[name]
        if enc == "f32":
            v = jax.lax.bitcast_convert_type(
                v.astype(jnp.float32), jnp.int32)
        else:
            v = v.astype(jnp.int32)
        parts.append(v.reshape(B, -1))
    return jnp.concatenate(parts, axis=1)


def unpack_host_blob(blob: np.ndarray) -> Dict[str, np.ndarray]:
    """Host inverse of pack_host_blob (operates on the fetched numpy);
    accepts the [B, 4 + per_image] batch-major blob — or any row subset
    of one (a DP host's addressable rows) — and reconstructs full int32
    `counts` from the uint16 pairs + escapes."""
    blob = np.asarray(blob)
    assert blob.ndim == 2, "host blob is batch-major [B, 4 + per_image]"
    B = blob.shape[0]
    Q, K, R = (int(v) for v in blob[0, :3])
    out: Dict[str, np.ndarray] = {}
    o = 4
    for name, shape_fn, enc in _BLOB_FIELDS:
        shp = shape_fn(B, Q, K, R)
        n = int(np.prod(shp[1:], dtype=np.int64))
        a = blob[:, o:o + n].reshape(shp)
        o += n
        if enc == "f32":
            a = a.view(np.float32)
        elif enc == "bool":
            a = a.astype(bool)
        out[name] = a
    c16 = out.pop("counts16")
    lo = np.empty((B, K, c16.shape[-1] * 2), np.int64)
    lo[..., 0::2] = c16 & 0xFFFF
    lo[..., 1::2] = (c16 >> 16) & 0xFFFF
    counts = lo[..., : R + 1]
    esc_pos = out.pop("esc_pos")
    esc_hi = out.pop("esc_hi")
    b_i, k_i, e_i = np.nonzero(esc_pos >= 0)
    counts[b_i, k_i, esc_pos[b_i, k_i, e_i]] += (
        esc_hi[b_i, k_i, e_i].astype(np.int64) << 16
    )
    out["counts"] = counts.astype(np.int32)
    return out
