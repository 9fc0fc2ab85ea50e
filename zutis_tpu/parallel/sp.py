"""Sequence parallelism: ring attention and Ulysses-style head-scatter.

No reference counterpart (SURVEY.md section 2.4: the reference's attention is
dense single-device O(n^2)); this is the planned TPU-native path for
high-resolution dense inference, where ViT token counts grow quadratically
with image side (a 1024px ViT-B/16 image is 4096 patch tokens, 16k decoder
memory tokens after the x2 upsample).

Two standard schemes over a mesh axis, both exact (same math as dense
attention, fp32 online-softmax accumulation):

  - `ring_attention`: Q stays put; K/V blocks rotate around the ring via
    `jax.lax.ppermute` (ICI neighbour exchange), each step folding its block
    into the running (max, sum, acc) online-softmax state. Communication is
    overlapped with the per-block attention compute by XLA's latency-hiding
    scheduler; memory per chip is O(s_local^2) not O(s^2).
  - `ulysses_attention`: `all_to_all` re-shards from sequence-sharded
    [b, h, s/P, d] to head-sharded [b, h/P, s, d], runs ordinary dense
    attention per chip on full sequences of its head subset, and re-shards
    back. One collective each way; requires P to divide the head count.

Both are plain per-shard functions meant to be called INSIDE `shard_map`
(see `make_ring_attention` / `make_ulysses_attention` for jitted wrappers
over a mesh); tests/test_sequence_parallel.py checks exactness vs the dense
single-device result on the 8-device CPU mesh.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from zutis_tpu.ops.attention import dot_product_attention

_NEG_INF = -1e30


def _block_stats(q, k, v, scale):
    """Unnormalised attention over one K/V block: returns (acc, m, l) for
    the online-softmax merge. Shapes: q [b,h,sq,d]; k,v [b,h,sk,d]."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)  # [b,h,sq,1]
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return acc, m, l


def ring_attention(
    q: jnp.ndarray,  # [b, h, s_local, d] — this chip's query block
    k: jnp.ndarray,  # [b, h, s_local, d]
    v: jnp.ndarray,  # [b, h, s_local, d]
    axis_name: str,
) -> jnp.ndarray:
    """Exact attention over the full (sharded) key sequence via a K/V ring.
    Call inside shard_map with q/k/v sequence-sharded on `axis_name`."""
    n = jax.lax.psum(1, axis_name)
    scale = q.shape[-1] ** -0.5

    def fold(acc, m, l, k_blk, v_blk):
        a_i, m_i, l_i = _block_stats(q, k_blk, v_blk, scale)
        m_new = jnp.maximum(m, m_i)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(m_i - m_new)
        return acc * alpha + a_i * beta, m_new, l * alpha + l_i * beta

    def step(i, carry):
        acc, m, l, k_blk, v_blk = carry
        acc, m, l = fold(acc, m, l, k_blk, v_blk)
        # rotate K/V to the next chip
        perm = [(j, (j + 1) % n) for j in range(n)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return acc, m, l, k_blk, v_blk

    b, h, sq, d = q.shape
    # pcast-to-varying: the zero-init carries must carry the same
    # device-varying type as the loop outputs under shard_map typing
    acc0 = jax.lax.pcast(
        jnp.zeros((b, h, sq, d), jnp.float32), axis_name, to="varying")
    m0 = jax.lax.pcast(
        jnp.full((b, h, sq, 1), _NEG_INF, jnp.float32), axis_name,
        to="varying")
    l0 = jax.lax.pcast(
        jnp.zeros((b, h, sq, 1), jnp.float32), axis_name, to="varying")
    # rotate only n-1 times: the loop folds blocks 0..n-2, the LAST block
    # folds outside the loop with no trailing ppermute pair (a rotation
    # after the final fold is dead ICI traffic the while-loop body can't
    # DCE)
    acc, m, l, k_blk, v_blk = jax.lax.fori_loop(
        0, n - 1, step, (acc0, m0, l0, k, v))
    acc, _, l = fold(acc, m, l, k_blk, v_blk)
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ulysses_attention(
    q: jnp.ndarray,  # [b, h, s_local, d] sequence-sharded
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
) -> jnp.ndarray:
    """All-to-all to head-sharded [b, h/P, s, d], dense attention, and back.
    Head count must be divisible by the axis size."""
    n = jax.lax.psum(1, axis_name)
    h = q.shape[1]
    assert h % n == 0, f"heads {h} not divisible by axis size {n}"

    def scatter_heads(x):
        # [b, h, s/P, d] -> [b, h/P, s, d]: head tile i stays on device i,
        # sequence blocks concatenate in device (= sequence) order
        return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2,
                                  tiled=True)

    def gather_heads(x):
        # [b, h/P, s, d] -> [b, h, s/P, d]
        return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1,
                                  tiled=True)

    qh, kh, vh = scatter_heads(q), scatter_heads(k), scatter_heads(v)
    out = dot_product_attention(qh, kh, vh, impl="xla")
    return gather_heads(out)


def make_ring_attention(mesh: Mesh, axis: str = "model"):
    """Jitted [b,h,s,d] attention with the sequence sharded over `axis`."""
    from jax import shard_map

    spec = P(None, None, axis, None)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    def fn(q, k, v):
        return ring_attention(q, k, v, axis)

    return fn


def make_ulysses_attention(mesh: Mesh, axis: str = "model"):
    from jax import shard_map

    spec = P(None, None, axis, None)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    def fn(q, k, v):
        return ulysses_attention(q, k, v, axis)

    return fn
