"""Flash-attention kernel tuning probe (round-3 perf work).

Measures kernel variants against the shipped XLA path on the bench program's
encoder attention shape (b=64 h=12 sq=sk=577 d=64 bf16). Run one variant per
invocation under tools/pallas_qualify.sh-style watchdogs:

    timeout 420 PYTHONPATH=/root/.axon_site:/root/repo python tools/pallas_tune.py <variant> [block_q]

Variants:
  ship       — the shipped ops/flash_attention.py kernel (baseline: 6.05 ms)
  single     — single-shot softmax kernel (no online recurrence: whole K/V in
               VMEM per cell, one masked softmax), per-head unrolled dots,
               additive -inf mask bias, q pre-scaled outside the kernel
  batched    — same but per-cell dots batched over heads via dot_general
               batch dims (one wide MXU issue instead of `heads` small ones)
  headgrid   — one head per grid cell (grid b*h*nq), minimal per-cell state
  xla        — the shipped clamped-softmax XLA path (baseline: 4.85 ms)

Timing: forced fetch, 20 iters.
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np


import os

_EXP_MODE = os.environ.get("TUNE_EXP", "exp")  # exp | mul | bf16


def _exp(s):
    """softmax exponential with selectable timing-probe modes: 'mul' replaces
    exp with a multiply (correctness-breaking, isolates VPU-exp cost), 'bf16'
    computes exp at bf16 precision."""
    import jax.numpy as jnp

    if _EXP_MODE == "mul":
        return s * 1.0002
    if _EXP_MODE == "bf16":
        return jnp.exp(s.astype(jnp.bfloat16)).astype(jnp.float32)
    return jnp.exp(s)


def make_single(block_q: int, heads_per_cell: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, heads: int):
        # one (batch, q-block) cell; single-shot softmax over the whole key
        # axis (K/V resident in VMEM). bias_ref: [1, 1, sk] additive f32.
        bias = bias_ref[0, 0]  # [sk]
        for h in range(heads):
            q = q_ref[0, h]  # [block_q, d] bf16, pre-scaled
            s = jax.lax.dot_general(
                q, k_ref[0, h],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [block_q, sk]
            s = s + bias[None, :]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = _exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, h],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, h] = (pv / l).astype(o_ref.dtype)

    def kernel_batched(q_ref, k_ref, v_ref, bias_ref, o_ref):
        bias = bias_ref[0, 0]
        q = q_ref[0]  # [h, block_q, d]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [h, block_q, sk]
        s = s + bias[None, None, :]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [h, block_q, d]
        o_ref[0] = (pv / l).astype(o_ref.dtype)

    def fn(q, k, v):
        b, h, sq, d = q.shape
        sk = k.shape[2]
        scale = d ** -0.5
        q = (q.astype(jnp.float32) * scale).astype(q.dtype)
        sq_pad = ((sq + block_q - 1) // block_q) * block_q
        sk_pad = ((sk + 127) // 128) * 128
        if sq_pad != sq:
            q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
        if sk_pad != sk:
            k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
        bias = jnp.where(jnp.arange(sk_pad) < sk, 0.0, -1e30).astype(
            jnp.float32
        )[None, None, :]  # [1, 1, sk_pad]

        if heads_per_cell == "batched":
            kern = kernel_batched
            grid = (b, sq_pad // block_q)
            qspec = pl.BlockSpec((1, h, block_q, d), lambda bi, qi: (bi, 0, qi, 0),
                                 memory_space=pltpu.VMEM)
            kvspec = pl.BlockSpec((1, h, sk_pad, d), lambda bi, qi: (bi, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
            bspec = pl.BlockSpec((1, 1, sk_pad), lambda bi, qi: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
            sem = ("parallel", "parallel")
        elif heads_per_cell == "grid":
            kern = functools.partial(kernel, heads=1)
            grid = (b, h, sq_pad // block_q)
            qspec = pl.BlockSpec((1, 1, block_q, d),
                                 lambda bi, hi, qi: (bi, hi, qi, 0),
                                 memory_space=pltpu.VMEM)
            kvspec = pl.BlockSpec((1, 1, sk_pad, d),
                                  lambda bi, hi, qi: (bi, hi, 0, 0),
                                  memory_space=pltpu.VMEM)
            bspec = pl.BlockSpec((1, 1, sk_pad), lambda bi, hi, qi: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
            sem = ("parallel", "parallel", "parallel")
        else:  # unrolled heads in one cell
            kern = functools.partial(kernel, heads=h)
            grid = (b, sq_pad // block_q)
            qspec = pl.BlockSpec((1, h, block_q, d), lambda bi, qi: (bi, 0, qi, 0),
                                 memory_space=pltpu.VMEM)
            kvspec = pl.BlockSpec((1, h, sk_pad, d), lambda bi, qi: (bi, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
            bspec = pl.BlockSpec((1, 1, sk_pad), lambda bi, qi: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
            sem = ("parallel", "parallel")

        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[qspec, kvspec, kvspec, bspec],
            out_specs=qspec,
            out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d), q.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * sq_pad * sk_pad * d,
                bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
                transcendentals=b * h * sq_pad * sk_pad,
            ),
            compiler_params=pltpu.CompilerParams(dimension_semantics=sem),
        )(q, k, v, bias)
        return out[:, :, :sq, :]

    return fn


def make_fastsm(block_q: int, sum_mode: str):
    """Max-free clamped softmax (the XLA path's trick, ops/attention.py:64-80)
    inside a Pallas cell: skips the row-max lane reduction entirely. sum_mode
    'mxu' computes the row sum as p @ ones (MXU), 'lane' as jnp.sum (VPU)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
        bias = bias_ref[0, 0]  # [sk]
        q = q_ref[0, 0]  # [block_q, d] bf16, pre-scaled
        s = jax.lax.dot_general(
            q, k_ref[0, 0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, sk]
        s = jnp.clip(s, -80.0, 80.0) + bias[None, :]
        p = _exp(s).astype(v_ref.dtype)  # bf16 weights (XLA path parity)
        if sum_mode == "mxu":
            ones = jnp.ones((s.shape[1], 128), v_ref.dtype)
            l = jax.lax.dot_general(
                p, ones,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[:, :1]  # [block_q, 1]
        else:
            l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p, v_ref[0, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0] = (pv / l).astype(o_ref.dtype)

    def fn(q, k, v):
        b, h, sq, d = q.shape
        sk = k.shape[2]
        scale = d ** -0.5
        q = (q.astype(jnp.float32) * scale).astype(q.dtype)
        sq_pad = ((sq + block_q - 1) // block_q) * block_q
        sk_pad = ((sk + 127) // 128) * 128
        if sq_pad != sq:
            q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
        if sk_pad != sk:
            k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
        bias = jnp.where(jnp.arange(sk_pad) < sk, 0.0, -200.0).astype(
            jnp.float32)[None, None, :]
        grid = (b, h, sq_pad // block_q)
        qspec = pl.BlockSpec((1, 1, block_q, d),
                             lambda bi, hi, qi: (bi, hi, qi, 0),
                             memory_space=pltpu.VMEM)
        kvspec = pl.BlockSpec((1, 1, sk_pad, d),
                              lambda bi, hi, qi: (bi, hi, 0, 0),
                              memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((1, 1, sk_pad), lambda bi, hi, qi: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[qspec, kvspec, kvspec, bspec],
            out_specs=qspec,
            out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d), q.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * sq_pad * sk_pad * d,
                bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
                transcendentals=b * h * sq_pad * sk_pad,
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel")),
        )(q, k, v, bias)
        return out[:, :, :sq, :]

    return fn


def make_kt(block_q: int):
    """fastsm geometry, but K arrives PRE-TRANSPOSED as [b, h, d, sk] so the
    in-kernel dot is MXU-layout-native on both operands (no per-cell Mosaic
    transpose of the key block — suspected dominant cost of the r2 kernel)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dots_only = os.environ.get("TUNE_DOTS_ONLY", "0") == "1"

    def kernel(q_ref, kt_ref, v_ref, bias_ref, o_ref):
        bias = bias_ref[0, 0]  # [sk]
        q = q_ref[0, 0]  # [block_q, d] bf16, pre-scaled
        s = jax.lax.dot_general(
            q, kt_ref[0, 0],  # [d, sk]
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, sk]
        if dots_only:  # timing probe: pure MXU chain, no softmax at all
            p = s.astype(v_ref.dtype)
            l = 1.0
        else:
            s = jnp.clip(s, -80.0, 80.0) + bias[None, :]
            p = _exp(s).astype(v_ref.dtype)
            l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p, v_ref[0, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0] = (pv / l).astype(o_ref.dtype)

    def fn(q, k, v):
        b, h, sq, d = q.shape
        sk = k.shape[2]
        scale = d ** -0.5
        q = (q.astype(jnp.float32) * scale).astype(q.dtype)
        sq_pad = ((sq + block_q - 1) // block_q) * block_q
        sk_pad = ((sk + 127) // 128) * 128
        if sq_pad != sq:
            q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
        if sk_pad != sk:
            k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
        kt = k.transpose(0, 1, 3, 2)  # [b, h, d, sk] — one XLA pass in HBM
        bias = jnp.where(jnp.arange(sk_pad) < sk, 0.0, -200.0).astype(
            jnp.float32)[None, None, :]
        grid = (b, h, sq_pad // block_q)
        qspec = pl.BlockSpec((1, 1, block_q, d),
                             lambda bi, hi, qi: (bi, hi, qi, 0),
                             memory_space=pltpu.VMEM)
        ktspec = pl.BlockSpec((1, 1, d, sk_pad),
                              lambda bi, hi, qi: (bi, hi, 0, 0),
                              memory_space=pltpu.VMEM)
        vspec = pl.BlockSpec((1, 1, sk_pad, d),
                             lambda bi, hi, qi: (bi, hi, 0, 0),
                             memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((1, 1, sk_pad), lambda bi, hi, qi: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[qspec, ktspec, vspec, bspec],
            out_specs=qspec,
            out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d), q.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * sq_pad * sk_pad * d,
                bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
                transcendentals=b * h * sq_pad * sk_pad,
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel")),
        )(q, kt, v, bias)
        return out[:, :, :sq, :]

    return fn


def main() -> None:
    variant = sys.argv[1]
    block_q = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    import jax
    import jax.numpy as jnp

    from zutis_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    b, h, sq, sk, d = 64, 12, 577, 577, 64
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, sq, d).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, h, sk, d).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, h, sk, d).astype(np.float32), jnp.bfloat16)

    if variant == "xla":
        from zutis_tpu.ops.attention import dot_product_attention
        fn = jax.jit(lambda q, k, v: dot_product_attention(q, k, v, impl="xla"))
    elif variant == "jaxflash":
        # jax's own tuned TPU flash kernel (library dependency, not a copy);
        # pad seq to a block multiple and mask padded keys via segment ids.
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, SegmentIds, flash_attention as jax_flash)

        blk = block_q

        def fn_impl(q, k, v):
            b_, h_, sq_, d_ = q.shape
            sk_ = k.shape[2]
            # the pad width and kv segment ids below are derived from sq_;
            # they are only correct for self-attention shapes
            assert sq_ == sk_, "jaxflash variant assumes sq == sk"
            pad = ((sq_ + blk - 1) // blk) * blk
            qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad - sq_), (0, 0)))
            kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad - sk_), (0, 0)))
            vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad - sk_), (0, 0)))
            seg_q = (jnp.arange(pad) < sq_).astype(jnp.int32)[None]
            seg_q = jnp.broadcast_to(seg_q, (b_, pad))
            seg = SegmentIds(q=seg_q, kv=seg_q)
            bs = BlockSizes(
                block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
                block_q_major_dkv=blk, block_k_major_dkv=blk,
                block_k_dkv=blk, block_q_dkv=blk,
                block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
            )
            out = jax_flash(qp, kp, vp, segment_ids=seg,
                            sm_scale=d_ ** -0.5, block_sizes=bs)
            return out[:, :, :sq_, :]

        fn = jax.jit(fn_impl)
    elif variant == "ship":
        from zutis_tpu.ops.flash_attention import flash_attention
        fn = jax.jit(lambda q, k, v: flash_attention(q, k, v, interpret=False))
    elif variant in ("fastsm-mxu", "fastsm-lane"):
        fn = jax.jit(make_fastsm(block_q, variant.split("-")[1]))
    elif variant == "kt":
        fn = jax.jit(make_kt(block_q))
    else:
        mode = {"single": "unroll", "batched": "batched",
                "headgrid": "grid"}[variant]
        fn = jax.jit(make_single(block_q, mode))

    print(f"variant={variant} block_q={block_q} dispatching...", flush=True)
    out = fn(q, k, v)
    s = float(jnp.sum(out.astype(jnp.float32)))
    print(f"RESULT_DISPATCH_OK sum={s:.3f}", flush=True)

    # correctness vs f32 reference
    qs, ks, vs = (t.astype(jnp.float32) for t in (q, k, v))
    logits = jnp.einsum("bhqd,bhkd->bhqk", qs, ks) * (d ** -0.5)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), vs)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    print(f"RESULT_MAXERR {err:.6f}", flush=True)

    out = fn(q, k, v)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(20):
        out = fn(q, k, v)
    float(jnp.sum(out.astype(jnp.float32)))
    ms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"RESULT_OK variant={variant} block_q={block_q} ms={ms:.2f}",
          flush=True)


if __name__ == "__main__":
    main()
