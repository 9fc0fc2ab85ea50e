"""Data-parallel inference on the mesh (VERDICT r4 task 4): the bucketed
batched-eval step sharded over the data axis must (a) match the
single-device program — bit-identical on every integer/bool output (masks,
keep, ids, all RLE blob fields); float scores are allowed reduction-order
noise from the per-shard compilation (bf16 matmul accumulation) — and
(b) compile with ZERO cross-device collectives: replicated params +
batch-sharded inputs need no communication until the host gathers results,
so a collective in the module would mean a per-image synchronisation
sneaked into the serving path. The batch-major host blob
(ops/rle_device.py) exists precisely for (b): a flat 1-D blob raveled
across batch forced GSPMD to all-gather every field (42 all-gathers at
DP=2 measured before the layout change).

Reference workload: the eval loop trainer.py:294-375 at SURVEY.md section
2.4's multi-chip target.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zutis_tpu.engine.batched_eval import (
    make_instance_step,
    make_semantic_confusion_step,
)
from zutis_tpu.models import ZUTIS
from zutis_tpu.parallel import create_mesh, shard_batch
from zutis_tpu.parallel.mesh import replicate

COLLECTIVES = ("all-reduce", "all-gather", "collective-permute",
               "all-to-all", "reduce-scatter")


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    model = ZUTIS(width=64, encoder_layers=2, encoder_heads=4, patch_size=16,
                  text_dim=32, n_queries=16, n_decoder_layers=2, n_heads=4,
                  input_resolution=32)
    b, H, n_cat = 8, 32, 4
    imgs = jnp.asarray(rng.randn(b, 3, H, H).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs[:1])["params"]
    text = rng.randn(n_cat, 32).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    grid = jnp.full((b, 2), H // 16, jnp.int32)
    pix = jnp.full((b, 2), H, jnp.int32)
    gt = jnp.asarray(rng.randint(0, n_cat, (b, H, H)).astype(np.int32))
    return model, params, jnp.asarray(text), imgs, grid, pix, gt, H, n_cat


def _count_collectives(hlo_text: str) -> dict:
    return {c: hlo_text.count(c) for c in COLLECTIVES if c in hlo_text}


def test_semantic_eval_dp_equal_and_collective_free(setup):
    model, params, text, imgs, grid, pix, gt, H, n_cat = setup
    step = make_semantic_confusion_step(model, text, (H, H), n_cat)
    ref = np.asarray(step(params, imgs, grid, pix, gt))
    for data_par in (2, 8):
        mesh = create_mesh({"data": data_par},
                           devices=jax.devices()[:data_par])
        with mesh:
            p = replicate(params, mesh)
            sb = shard_batch({"i": imgs, "g": grid, "p": pix, "t": gt}, mesh)
            out = np.asarray(step(p, sb["i"], sb["g"], sb["p"], sb["t"]))
            # the confusion histogram is a batch SUM: integer counts, so
            # the cross-device reduction is still exact
            np.testing.assert_array_equal(out, ref)
            hlo = step.lower(
                p, sb["i"], sb["g"], sb["p"], sb["t"]).compile().as_text()
        found = _count_collectives(hlo)
        # the [C, C] histogram reduce is the ONE allowed collective (a
        # constant-size all-reduce per BATCH, not per image); nothing else
        assert set(found) <= {"all-reduce"}, found


def test_instance_eval_dp_bit_equal(setup):
    from zutis_tpu.ops.rle_device import unpack_host_blob

    model, params, text, imgs, grid, pix, gt, H, n_cat = setup
    step = make_instance_step(model, text, (H, H), semantic_mode="map")
    ref = {k: np.asarray(v) for k, v in
           step(params, imgs, grid, pix).items() if k != "rle"}

    def assert_matches(got: np.ndarray, want: np.ndarray, label: str):
        """Integer/bool outputs (masks, keep, ids, every RLE blob field)
        must be BIT-equal under DP; float scores may differ by
        reduction-order noise from the per-shard compilation (bf16
        matmul accumulation — measured 3.8e-04 at these shapes)."""
        if want.dtype.kind == "f":
            np.testing.assert_allclose(
                got, want, rtol=0, atol=1e-3, err_msg=label)
        else:
            np.testing.assert_array_equal(got, want, err_msg=label)

    mesh = create_mesh({"data": 8})
    with mesh:
        p = replicate(params, mesh)
        sb = shard_batch({"i": imgs, "g": grid, "p": pix}, mesh)
        out = step(p, sb["i"], sb["g"], sb["p"])
        for k, v in out.items():
            if k == "rle":
                continue
            if k == "host_blob":
                u_ref = unpack_host_blob(ref[k])
                u_out = unpack_host_blob(np.asarray(v))
                for fk, fv in u_ref.items():
                    assert_matches(u_out[fk], fv, f"host_blob[{fk}]")
            else:
                assert_matches(np.asarray(v), ref[k], k)
        hlo = step.lower(p, sb["i"], sb["g"], sb["p"]).compile().as_text()
    found = _count_collectives(hlo)
    # per-sample instance decode (NMS, RLE counts, blob pack) must not
    # introduce any cross-device traffic: a collective here would scale
    # serving latency with the mesh, not the batch
    assert not found, found
