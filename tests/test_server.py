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
    from zutis_tpu.data.transforms import normalize_image

    rng = np.random.RandomState(7)
    raw = [rng.randint(0, 256, (3, 32, 32)).astype(np.uint8)
           for _ in range(3)]
    # the f32 end-to-end helper, not a float64 hand-roll: the device path
    # normalises in f32 and a float64 reference can flip argmax ties
    norm = [normalize_image(r.transpose(1, 2, 0)) for r in raw]

    srv_u8 = InferenceServer(model, params, text, image_size=32,
                             batch_size=4, threshold=0.4,
                             uint8_transport=True)
    srv_f32 = InferenceServer(model, params, text, image_size=32,
                              batch_size=4, threshold=0.4)
    got = srv_u8.infer(raw)
    want = srv_f32.infer(norm)
    for g, w in zip(got, want):
        # ~1e-7 normalisation fp differences can flip rare argmax ties
        # (same budget as test_batched_eval's uint8 parity test)
        assert (g["semantic"] != w["semantic"]).mean() < 5e-3


def test_mesh_sharded_server_matches_and_collective_free(server_parts):
    """mesh= shards each server batch over the data axis (VERDICT r4 task
    7): outputs must match the single-device server (semantic/masks/keep/
    ids bit-equal; scores tolerance-checked — per-shard compilation changes
    reduction order), and the compiled step must contain ZERO collectives
    at every DP width: replicated params + batch-sharded images need no
    cross-device traffic, so serving latency scales with the batch, never
    with the mesh."""
    from zutis_tpu.parallel.mesh import create_mesh, shard_batch

    model, params, text, images = server_parts
    imgs8 = (images + images)[:8]
    srv = InferenceServer(model, params, text, image_size=32, batch_size=8,
                          threshold=0.4)
    want = srv.infer(imgs8)

    collectives = ("all-reduce", "all-gather", "collective-permute",
                   "all-to-all", "reduce-scatter")
    for dp in (2, 8):
        mesh = create_mesh({"data": dp}, devices=jax.devices()[:dp])
        srv_m = InferenceServer(model, params, text, image_size=32,
                                batch_size=8, threshold=0.4, mesh=mesh)
        with mesh:
            got = srv_m.infer(imgs8)
            batch = shard_batch(
                {"x": jnp.asarray(np.stack(imgs8))}, mesh)["x"]
            hlo = srv_m._step.lower(
                srv_m._params, srv_m._text, batch).compile().as_text()
        found = {c: hlo.count(c) for c in collectives if c in hlo}
        assert not found, f"DP={dp}: serving step has collectives {found}"
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g["semantic"], w["semantic"])
            assert len(g["instances"]) == len(w["instances"])
            for gi, wi in zip(g["instances"], w["instances"]):
                assert gi["category_id"] == wi["category_id"]
                np.testing.assert_allclose(
                    gi["score"], wi["score"], rtol=0, atol=1e-5)
                if "segmentation" in gi:
                    assert gi["segmentation"] == wi["segmentation"]


def test_stop_resolves_queued_futures(server_parts):
    """stop() must not strand submitted Futures: anything still queued when
    the worker exits gets cancelled so a waiter blocked in fut.result()
    errors out instead of hanging forever."""
    import concurrent.futures

    import threading

    model, params, text, images = server_parts
    srv = InferenceServer(model, params, text, image_size=32, batch_size=4,
                          threshold=0.4)
    # deterministic: the worker blocks inside infer on the first batch, so
    # the later submissions are STILL QUEUED when stop() drains the queue
    gate = threading.Event()
    real_infer = srv.infer

    def blocking_infer(imgs):
        gate.wait(timeout=30)
        return real_infer(imgs)

    srv.infer = blocking_infer
    srv.start()
    first = srv.submit(images[0])
    import time as _t

    _t.sleep(0.2)  # let the worker pick `first` up and block in infer
    queued = [srv.submit(images[0]) for _ in range(3)]
    stopper = threading.Thread(target=srv.stop)
    stopper.start()
    gate.set()  # release the worker; stop() joins it then drains
    stopper.join(timeout=30)
    assert not stopper.is_alive()
    first.result(timeout=30)  # the in-flight batch still resolves
    for f in queued:
        # queued-at-stop futures are specifically CANCELLED (a waiter in
        # result() raises instead of hanging forever)
        try:
            f.result(timeout=30)
        except concurrent.futures.CancelledError:
            continue
        # the worker may legitimately have batched some in before stop
        assert f.done()
