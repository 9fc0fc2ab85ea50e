"""Bucketed batched evaluation == per-image evaluation (SURVEY.md section 7
hard part 2; VERDICT round-1 item 2).

A tiny ViT ZUTIS runs three images of different native resolutions (a) one
at a time at native shape — the reference's evaluation regime
(trainer.py:294-375) — and (b) padded together into one bucket through
`forward_padded` + the batched decode steps. Outputs on each valid window
must agree."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zutis_tpu.engine import batched_eval as BE
from zutis_tpu.models.zutis import ZUTIS
from zutis_tpu.postproc import predict_instances_device, predict_semantic

SIZES = [(48, 48), (32, 48), (37, 33)]  # (H, W) native pixel sizes
BUCKET = (48, 48)


@pytest.fixture(scope="module")
def setup():
    model = ZUTIS(width=32, encoder_layers=2, encoder_heads=2, patch_size=16,
                  text_dim=16, n_queries=8, n_decoder_layers=2, n_heads=2,
                  input_resolution=32)
    rng = np.random.RandomState(0)
    imgs = [rng.randn(3, h, w).astype(np.float32) for h, w in SIZES]
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(imgs[0][None])
    )["params"]
    text = rng.randn(5, 16).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    return model, params, imgs, jnp.asarray(text)


def _padded_inputs(imgs):
    padded, native_grid, native_pixels = BE.pad_batch(
        imgs, BUCKET, batch_size=len(imgs), patch_size=16)
    return (jnp.asarray(padded), jnp.asarray(native_grid),
            jnp.asarray(native_pixels))


def test_forward_padded_matches_per_image(setup):
    model, params, imgs, text = setup
    padded, native_grid, native_pixels = _padded_inputs(imgs)
    out_b = model.apply({"params": params}, padded, native_grid,
                        method=ZUTIS.forward_padded)
    for i, img in enumerate(imgs):
        out_1 = model.apply({"params": params}, jnp.asarray(img[None]),
                            inference=True)
        h, w = np.asarray(out_b["native_grid"][i])
        np.testing.assert_allclose(
            np.asarray(out_b["patch_tokens"])[i, :h, :w],
            np.asarray(out_1["patch_tokens"])[0], atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out_b["mask_proposals"])[i, -1, :, :h, :w],
            np.asarray(out_1["mask_proposals"])[0, -1], atol=2e-4,
        )


def test_semantic_step_matches_per_image(setup):
    model, params, imgs, text = setup
    padded, native_grid, native_pixels = _padded_inputs(imgs)
    step = BE.make_semantic_step(model, text, BUCKET)
    sem_b = np.asarray(step(params, padded, native_grid, native_pixels))
    for i, (img, (H, W)) in enumerate(zip(imgs, SIZES)):
        out_1 = model.apply({"params": params}, jnp.asarray(img[None]),
                            inference=True)
        sem_1 = np.asarray(predict_semantic(
            out_1["patch_tokens"], text, size=(H, W)))[0]
        np.testing.assert_array_equal(sem_b[i, :H, :W], sem_1)


def test_instance_step_matches_per_image(setup):
    model, params, imgs, text = setup
    padded, native_grid, native_pixels = _padded_inputs(imgs)
    step = BE.make_instance_step(model, text, BUCKET, threshold=0.4)
    out_b = {k: np.asarray(v) for k, v in step(
        params, padded, native_grid, native_pixels).items()}
    for i, (img, (H, W)) in enumerate(zip(imgs, SIZES)):
        out_1 = model.apply({"params": params}, jnp.asarray(img[None]),
                            inference=True)
        dev = predict_instances_device(
            out_1["mask_proposals"], out_1["patch_tokens"], text,
            size=(H, W), threshold=0.4)
        np.testing.assert_array_equal(
            out_b["keep"][i], np.asarray(dev["keep"])[0])
        np.testing.assert_array_equal(
            out_b["category_ids"][i], np.asarray(dev["category_ids"])[0])
        np.testing.assert_allclose(
            out_b["scores"][i], np.asarray(dev["scores"])[0], atol=1e-4)
        np.testing.assert_array_equal(
            out_b["masks"][i, :, :H, :W], np.asarray(dev["masks"])[0])
        assert not out_b["masks"][i, :, H:, :].any()
        assert not out_b["masks"][i, :, :, W:].any()


def test_bucketing_helpers():
    sizes = [(480, 640), (500, 600), (375, 500), (129, 129)]
    buckets = BE.group_into_buckets(sizes, quantum=128)
    assert buckets[(512, 640)] == [0, 1]
    assert buckets[(384, 512)] == [2]
    assert buckets[(256, 256)] == [3]
    batches = list(BE.iter_bucketed_batches(buckets, batch_size=1))
    assert len(batches) == 4


def test_uint8_input_step_matches_f32(setup):
    """make_instance_step(uint8_input=True) takes raw uint8 RGB and
    normalises on device — outputs match the host-normalised f32 path
    (coco20k_eval's raw-transport batched regime)."""
    from zutis_tpu.data.transforms import normalize_image

    model, params, _, text = setup
    rng = np.random.RandomState(3)
    raw = [rng.randint(0, 256, (h, w, 3), np.uint8) for h, w in SIZES]
    f32 = [normalize_image(r) for r in raw]
    u8 = [np.ascontiguousarray(r.transpose(2, 0, 1)) for r in raw]

    pf, gf, xf = BE.pad_batch(f32, BUCKET, len(f32), 16)
    pu, gu, xu = BE.pad_batch(u8, BUCKET, len(u8), 16, dtype=np.uint8)
    assert pu.dtype == np.uint8
    step_f = BE.make_instance_step(model, text, BUCKET, threshold=0.4)
    step_u = BE.make_instance_step(model, text, BUCKET, threshold=0.4,
                                   uint8_input=True)
    out_f = step_f(params, jnp.asarray(pf), jnp.asarray(gf), jnp.asarray(xf))
    out_u = step_u(params, jnp.asarray(pu), jnp.asarray(gu), jnp.asarray(xu))
    np.testing.assert_array_equal(np.asarray(out_f["keep"]),
                                  np.asarray(out_u["keep"]))
    np.testing.assert_array_equal(np.asarray(out_f["masks"]),
                                  np.asarray(out_u["masks"]))
    np.testing.assert_allclose(np.asarray(out_f["scores"]),
                               np.asarray(out_u["scores"]), atol=2e-5)
    # semantic argmax: compare on valid windows only (padding is garbage by
    # design) and allow the rare exact-tie flip the ~1e-7 normalisation fp
    # difference can cause in a tiny random model
    sem_f = np.asarray(out_f["semantic"])
    sem_u = np.asarray(out_u["semantic"])
    for i, (H, W) in enumerate(SIZES):
        a, b = sem_f[i, :H, :W], sem_u[i, :H, :W]
        assert (a != b).mean() < 5e-3, f"image {i}: {(a != b).mean():.4f}"


def test_pipelined_matches_synchronous():
    """pipelined(dispatch, collect, work) yields collect(dispatch(x), x) in
    work order for every depth, including short work lists and depth 1."""
    for depth in (1, 2, 3, 5):
        for n in (0, 1, 2, 4, 7):
            trace = []

            def dispatch(x):
                trace.append(("d", x))
                return x * 10

            def collect(h, x):
                trace.append(("c", x))
                assert h == x * 10
                return h + x

            out = list(BE.pipelined(dispatch, collect, range(n), depth=depth))
            assert out == [x * 10 + x for x in range(n)]
            # every item is dispatched exactly once, collected exactly once,
            # dispatch precedes its own collect, and at most `depth`
            # dispatches are in flight at any point
            in_flight = 0
            for kind, _ in trace:
                in_flight += 1 if kind == "d" else -1
                assert 0 <= in_flight <= max(1, depth)


def test_pipelined_overlap_order():
    """At depth 2, item N+1 is dispatched BEFORE item N is collected — the
    property that lets the host fetch overlap device execution."""
    trace = []
    list(BE.pipelined(lambda x: trace.append(("d", x)),
                      lambda h, x: trace.append(("c", x)),
                      range(3), depth=2))
    assert trace == [("d", 0), ("d", 1), ("c", 0), ("d", 2), ("c", 1),
                     ("c", 2)]
