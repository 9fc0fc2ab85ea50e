"""Fused FlashAttention-style Pallas TPU kernel.

Why: XLA's einsum-softmax-einsum attention materialises the [b, h, sq, sk]
float32 logits in HBM (for the ZUTIS encoder at 384px that is ~1 GB per layer
at batch 64) — the round-trips dominate the forward wall-clock (reference hot
path: networks/zutis.py:472-532, 12 encoder blocks + 6 cross-attn layers).
This kernel keeps the logits in VMEM: each grid cell owns one (block_q, d)
query tile and the full (sk, d) K/V for its (batch, head), loops over key
blocks with the online-softmax recurrence, and only the (sq, d) output ever
touches HBM.

Layout notes (pallas_guide.md): key blocks are multiples of 128 lanes; sq is
padded to block_q and sk to block_k, with padded keys masked to -inf inside
the kernel. K/V for one (b, h) are at most a few MB for every sequence this
model produces (<= ~16k tokens at 2x-upsampled 1024px inference), so they fit
VMEM whole and the kernel needs no second-level DMA pipeline; beyond that the
sequence-parallel path (parallel/sp.py) shards sk across chips first.

`kv_mask` ([b, sk] bool/int) marks valid keys — used by the bucketed batched
evaluator to make padded images attend only to real patch tokens.

Differentiation: `flash_attention` carries a custom VJP whose backward
recomputes standard attention with XLA einsums (sequences are short enough
that the O(sq*sk) backward logits fit comfortably at training shapes).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_block_k(sk_pad: int, max_block: int = 1024) -> int:
    """Largest multiple of 128 that divides sk_pad and is <= max_block."""
    best = 128
    for m in range(128, min(sk_pad, max_block) + 1, 128):
        if sk_pad % m == 0:
            best = m
    return best


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, heads: int,
                  block_k: int, scale: float):
    """One grid cell = one (batch, q-block) pair, ALL heads. The head loop is
    a static Python unroll (few heads, keeps grid cells coarse enough to
    amortise per-cell overhead); the k loop is the online-softmax recurrence.
    Dots take bf16 operands with float32 accumulation (MXU-native) — never
    upcast inputs before the matmul."""
    sk_pad = k_ref.shape[2]
    nk = sk_pad // block_k

    for h in range(heads):
        q = q_ref[0, h]  # [block_q, d], compute dtype
        block_q, d = q.shape

        def body(i, carry, h=h):
            acc, m_run, l_run = carry
            kblk = k_ref[0, h, pl.ds(i * block_k, block_k), :]
            vblk = v_ref[0, h, pl.ds(i * block_k, block_k), :]
            s = jax.lax.dot_general(
                q, kblk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [block_q, block_k] f32
            valid = mask_ref[0, :, pl.ds(i * block_k, block_k)] > 0
            s = jnp.where(valid, s, _NEG_INF)
            m_new = jnp.maximum(m_run, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)  # [block_q, block_k]
            alpha = jnp.exp(m_run - m_new)  # [block_q, 1]
            l_new = l_run * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v_ref.dtype), vblk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [block_q, d]
            acc = acc * alpha + pv
            return acc, m_new, l_new

        acc0 = jnp.zeros((block_q, d), jnp.float32)
        m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((block_q, 1), jnp.float32)
        acc, _, l_fin = jax.lax.fori_loop(0, nk, body, (acc0, m0, l0))
        o_ref[0, h] = (acc / jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)


def _flash_forward(
    q: jnp.ndarray,  # [b, h, sq, d]
    k: jnp.ndarray,  # [b, h, sk, d]
    v: jnp.ndarray,  # [b, h, sk, d]
    kv_mask: Optional[jnp.ndarray],  # [b, sk] bool/int, or None
    block_q: int,
    interpret: bool,
) -> jnp.ndarray:
    b, h, sq, d = q.shape
    sk = k.shape[2]
    scale = d ** -0.5

    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(sk, 128)
    block_k = _pick_block_k(sk_pad)

    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
    if kv_mask is None:
        mask = jnp.broadcast_to(
            (jnp.arange(sk_pad) < sk).astype(jnp.int32)[None], (b, sk_pad)
        )
    else:
        mask = kv_mask.astype(jnp.int32)
        if sk_pad != sk:
            mask = jnp.pad(mask, ((0, 0), (0, sk_pad - sk)))
    # [b, 1, sk_pad]: trailing block dims match the array dims exactly,
    # satisfying Mosaic's (8, 128)-divisible-or-full tiling rule.
    mask = mask[:, None, :]

    # Heads per grid cell: as many as keep resident K+V under the VMEM
    # budget — coarse cells amortise per-cell overhead (the dominant cost at
    # short sequences), while long sequences fall back to fewer heads.
    kv_bytes_per_head = 2 * sk_pad * d * q.dtype.itemsize
    # resident K/V budget per grid cell; the 16 MB scoped-vmem limit must
    # also hold q/out blocks and Mosaic's double buffering, so stay well
    # under half of it (overridable for tuning)
    budget = int(os.environ.get("ZUTIS_TPU_FLASH_VMEM_BUDGET",
                                6 * 1024 * 1024))
    head_block = h
    while head_block > 1 and (
        head_block * kv_bytes_per_head > budget or h % head_block != 0
    ):
        head_block -= 1

    grid = (b, h // head_block, sq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, heads=head_block, block_k=block_k,
                          scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, head_block, block_q, d),
                         lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, head_block, sk_pad, d),
                         lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, head_block, sk_pad, d),
                         lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk_pad), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, head_block, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * sk_pad * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * sq_pad * sk_pad,
        ),
        # every grid cell is independent (the softmax recurrence lives inside
        # the kernel's fori_loop) — let Mosaic schedule the grid in parallel
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v, mask)
    return out[:, :, :sq, :]


def _xla_reference(q, k, v, kv_mask):
    """Plain-XLA attention with the same masking semantics (used by the
    backward pass and as the test oracle)."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :] > 0, s, _NEG_INF)
    w = jax.nn.softmax(s, axis=-1)
    return w, jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash(q, k, v, kv_mask, block_q, interpret):
    return _flash_forward(q, k, v, kv_mask, block_q, interpret)


def _flash_fwd(q, k, v, kv_mask, block_q, interpret):
    out = _flash_forward(q, k, v, kv_mask, block_q, interpret)
    return out, (q, k, v, kv_mask)


def _flash_bwd(block_q, interpret, residuals, g):
    q, k, v, kv_mask = residuals
    scale = q.shape[-1] ** -0.5
    w, _ = _xla_reference(q, k, v, kv_mask)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", w, g32,
                    preferred_element_type=jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g32, v.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    ds = w * (dp - jnp.sum(w * dp, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    *,
    block_q: int = 128,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused attention: softmax(q k^T / sqrt(d), masked to valid keys) v.

    q: [b, h, sq, d]; k, v: [b, h, sk, d]; kv_mask: optional [b, sk].
    Runs the Pallas kernel compiled on TPU, interpreted elsewhere (CPU tests).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_q = min(block_q, _round_up(q.shape[2], 128))
    out = _flash(q, k, v, kv_mask, block_q, interpret)
    if kv_mask is not None:
        # all-keys-masked items: inside the kernel every key block scores
        # the same -1e30, the running max saturates there and p = exp(0)
        # for EVERY key — the output would be the mean of V over invalid
        # (zero-padded) keys. Zero those items instead, matching the XLA
        # paths' masked-row convention.
        any_valid = jnp.any(kv_mask > 0, axis=-1)  # [b]
        out = out * any_valid[:, None, None, None].astype(out.dtype)
    return out
