"""Batched dense-inference server (engine/server.py): batching, ordering,
parity with direct inference, async futures."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zutis_tpu.engine.server import InferenceServer
from zutis_tpu.models.zutis import ZUTIS
from zutis_tpu.ops import rle as rle_ops


@pytest.fixture(scope="module")
def server_parts():
    model = ZUTIS(width=32, encoder_layers=1, encoder_heads=2, patch_size=16,
                  text_dim=16, n_queries=6, n_decoder_layers=1, n_heads=2,
                  input_resolution=32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, 32, 32)))["params"]
    rng = np.random.RandomState(0)
    text = rng.randn(4, 16).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    images = [rng.randn(3, 32, 32).astype(np.float32) for _ in range(7)]
    return model, params, jnp.asarray(text), images


def test_sync_infer_batches_and_pads(server_parts):
    model, params, text, images = server_parts
    srv = InferenceServer(model, params, text, image_size=32, batch_size=4,
                          threshold=0.4)
    results = srv.infer(images)  # 7 images -> batches of 4 + padded 3
    assert len(results) == 7
    for r in results:
        assert r["semantic"].shape == (4, 4)  # 32px / patch16 x2 upsample
        for inst in r["instances"]:
            rle = inst["segmentation"]
            decoded = rle_ops.decode(rle)
            assert decoded.shape == tuple(rle["size"])

    # identical inputs at different batch positions give identical outputs
    dup = srv.infer([images[0], images[3], images[0]])
    np.testing.assert_array_equal(dup[0]["semantic"], dup[2]["semantic"])
    np.testing.assert_array_equal(dup[0]["semantic"],
                                  results[0]["semantic"])


def test_async_submit_matches_sync(server_parts):
    model, params, text, images = server_parts
    srv = InferenceServer(model, params, text, image_size=32, batch_size=4,
                          threshold=0.4, max_wait_ms=20)
    srv.start()
    try:
        futures = [srv.submit(img) for img in images]
        got = [f.result(timeout=120) for f in futures]
    finally:
        srv.stop()
    want = srv.infer(images)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["semantic"], w["semantic"])
        assert len(g["instances"]) == len(w["instances"])
        for gi, wi in zip(g["instances"], w["instances"]):
            assert gi["category_id"] == wi["category_id"]
            np.testing.assert_allclose(gi["score"], wi["score"], rtol=1e-6)


def test_uint8_transport_matches_float_path(server_parts):
    model, params, text, images = server_parts
    from zutis_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    rng = np.random.RandomState(7)
    raw = [rng.randint(0, 256, (3, 32, 32)).astype(np.uint8)
           for _ in range(3)]
    norm = [((r.transpose(1, 2, 0) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
             ).transpose(2, 0, 1).astype(np.float32) for r in raw]

    srv_u8 = InferenceServer(model, params, text, image_size=32,
                             batch_size=4, threshold=0.4,
                             uint8_transport=True)
    srv_f32 = InferenceServer(model, params, text, image_size=32,
                              batch_size=4, threshold=0.4)
    got = srv_u8.infer(raw)
    want = srv_f32.infer(norm)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["semantic"], w["semantic"])


def test_stop_resolves_queued_futures(server_parts):
    """stop() must not strand submitted Futures: anything still queued when
    the worker exits gets cancelled so a waiter blocked in fut.result()
    errors out instead of hanging forever."""
    import concurrent.futures

    model, params, text, images = server_parts
    srv = InferenceServer(model, params, text, image_size=32, batch_size=4,
                          threshold=0.4)
    srv.start()
    srv.stop()
    # re-start, enqueue while stopped-worker scenario: stop with items
    # racing the worker exit
    srv.start()
    futs = [srv.submit(images[0]) for _ in range(6)]
    srv.stop()
    for f in futs:
        # every future is RESOLVED: a result, an exception, or cancelled
        try:
            f.result(timeout=30)
        except (concurrent.futures.CancelledError, Exception):
            pass
        assert f.done() or f.cancelled()
