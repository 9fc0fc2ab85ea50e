"""Retrieval over large CLIP image-embedding banks, sharded across a mesh.

Behavioural contract (reference datasets/index_dataset.py:94-175): the
concatenated ImageNet2012+PASS embedding banks (~8.7 GB fp32, unit-norm
ViT-L/14@336px embeddings keyed by filename) are scored against per-category
prompt-engineered text embeddings; the top `n_images` filenames per category
become the training set (cached as a category->paths JSON).

TPU-first re-design (SURVEY.md section 2.4): bank rows shard across the mesh
('data' axis); each chip computes its local [C, N/shard] similarity matmul on
the MXU and a local top-k; the k winners per shard are all-gathered (k*shards
candidates, tiny) and merged with one final top-k. Host code only touches
filenames.
"""
from __future__ import annotations

import json
import pickle
from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def load_bank_pkl(paths: Sequence[str]) -> Tuple[np.ndarray, List[str]]:
    """Load one or more reference-format {filename: embedding} pickles into
    a single [N, D] float32 matrix + filename list (reference
    index_dataset.py:142-158 concatenates the banks)."""
    mats, names = [], []
    for p in paths:
        with open(p, "rb") as f:
            d: Dict[str, np.ndarray] = pickle.load(f)
        names.extend(d.keys())
        mats.append(np.stack(list(d.values())).astype(np.float32))
    return np.concatenate(mats, axis=0), names


def topk_local(text_emb: jnp.ndarray, bank: jnp.ndarray, k: int):
    """Single-device scoring: [C, D] x [N, D]^T -> top-k values+indices."""
    sims = jnp.einsum("cd,nd->cn", text_emb, bank,
                      preferred_element_type=jnp.float32)
    return jax.lax.top_k(sims, k)


def topk_sharded(
    text_emb: np.ndarray,  # [C, D]
    bank: np.ndarray,  # [N, D]
    k: int,
    mesh: Mesh,
    axis: str = "data",
) -> Tuple[np.ndarray, np.ndarray]:
    """Mesh-sharded retrieval: returns (values [C, k], indices [C, k]) into
    the full bank. Bank rows are padded to a multiple of the axis size and
    placed shard-per-device; the final merge runs on the tiny gathered
    candidate set."""
    n_shards = mesh.shape[axis]
    n, d = bank.shape
    pad = (-n) % n_shards
    if pad:
        bank = np.concatenate([bank, np.zeros((pad, d), bank.dtype)], axis=0)
    shard_rows = bank.shape[0] // n_shards

    bank_sharded = jax.device_put(
        bank, NamedSharding(mesh, P(axis, None))
    )
    text_rep = jax.device_put(text_emb, NamedSharding(mesh, P()))

    # per-shard k: a shard with fewer rows than k contributes ALL its rows,
    # which keeps the two-stage merge exact (the global top-k can then never
    # want a row a shard withheld); plain top_k(k > shard_rows) would raise
    k_loc = min(k, shard_rows)
    assert k <= n, f"top-{k} from a bank of {n} rows"

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=(P(axis), P(axis)),
    )
    def local_topk(text, bank_shard):
        sims = jnp.einsum("cd,nd->cn", text, bank_shard,
                          preferred_element_type=jnp.float32)
        # pad rows score -inf, NOT their zero dot product: legitimate
        # similarities can be negative, and a 0-scoring pad row inside the
        # local top-k would displace real candidates from the merge
        shard_id = jax.lax.axis_index(axis)
        global_idx = shard_id * shard_rows + jnp.arange(shard_rows)
        sims = jnp.where(global_idx[None, :] < n, sims, -jnp.inf)
        vals, idx = jax.lax.top_k(sims, k_loc)
        idx = idx + shard_id * shard_rows  # into global row space
        # leading axis must be the sharded one for out_specs
        return vals[None], idx[None]

    vals, idx = local_topk(text_rep, bank_sharded)  # [shards, C, k_loc]
    vals = jnp.transpose(vals, (1, 0, 2)).reshape(text_emb.shape[0], -1)
    idx = jnp.transpose(idx, (1, 0, 2)).reshape(text_emb.shape[0], -1)
    merged_vals, merged_pos = jax.lax.top_k(vals, k)
    merged_idx = jnp.take_along_axis(idx, merged_pos, axis=1)
    # -inf entries can only appear if k exceeded the REAL row count
    valid = np.isfinite(np.asarray(merged_vals))
    return (np.asarray(merged_vals), np.where(valid,
                                              np.asarray(merged_idx), -1))


def retrieve_category_paths(
    cat_to_text_embedding: Dict[str, np.ndarray],
    bank: np.ndarray,
    filenames: List[str],
    n_images: int,
    mesh: Mesh | None = None,
    cache_fp: str | None = None,
) -> Dict[str, List[str]]:
    """Top-`n_images` filenames per category (reference
    index_dataset.py:160-174), optionally cached to JSON."""
    cats = list(cat_to_text_embedding)
    text = np.stack([cat_to_text_embedding[c] for c in cats]).astype(
        np.float32)
    if mesh is not None and int(np.prod(list(mesh.shape.values()))) > 1:
        _, idx = topk_sharded(text, bank, n_images, mesh)
    else:
        _, idx = jax.jit(topk_local, static_argnums=2)(
            jnp.asarray(text), jnp.asarray(bank), n_images)
        idx = np.asarray(idx)
    out = {
        c: [filenames[j] for j in idx[i] if j >= 0]
        for i, c in enumerate(cats)
    }
    if cache_fp:
        with open(cache_fp, "w") as f:
            json.dump(out, f)
    return out
