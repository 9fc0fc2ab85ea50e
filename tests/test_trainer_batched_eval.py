"""Trainer.evaluate bucketed batching == per-image evaluation on fake
datasets, including the ImageNet-S regime where predictions are resized to
each image's ORIGINAL size (reference trainer.py:322-324,
datasets/imagenet_s.py:86)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zutis_tpu.engine.trainer import Trainer
from zutis_tpu.models.zutis import ZUTIS


class FakeSemanticDataset:
    """Mixed-resolution semantic dataset; imagenet-s style carries an
    original_size larger than the (capped) input image."""

    def __init__(self, name, sizes, orig_sizes=None, n_categories=4,
                 seed=0):
        self.name = name
        self.n_categories = n_categories
        rng = np.random.RandomState(seed)
        self.samples = []
        for i, (h, w) in enumerate(sizes):
            oh, ow = (orig_sizes[i] if orig_sizes else (h, w))
            self.samples.append({
                "image": rng.randn(3, h, w).astype(np.float32),
                "semantic_mask": rng.randint(
                    0, n_categories, (oh, ow)).astype(np.int32),
                "original_size": (oh, ow),
            })

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


@pytest.fixture(scope="module")
def model_and_params():
    model = ZUTIS(width=32, encoder_layers=1, encoder_heads=2, patch_size=16,
                  text_dim=16, n_queries=6, n_decoder_layers=1, n_heads=2,
                  input_resolution=32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, 48, 48)))["params"]
    rng = np.random.RandomState(1)
    text = rng.randn(4, 16).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    return model, params, jnp.asarray(text)


def _miou_both_paths(model, params, text, dataset, batch_images=4):
    out = {}
    for tag, batch in (("batched", batch_images), ("per_image", 1)):
        trainer = Trainer(model, text)
        scores = trainer.evaluate(params, dataset, batch_images=batch)
        out[tag] = scores
    return out


def test_mixed_resolution_semantic_eval_matches(model_and_params):
    model, params, text = model_and_params
    ds = FakeSemanticDataset(
        "coca", sizes=[(48, 48), (32, 48), (37, 33), (48, 37), (33, 47)])
    got = _miou_both_paths(model, params, text, ds)
    assert got["batched"]["Mean IoU"] == got["per_image"]["Mean IoU"]
    assert got["batched"]["Pixel Acc"] == got["per_image"]["Pixel Acc"]


def test_imagenet_s_original_size_eval_matches(model_and_params):
    """Predictions resize to the ORIGINAL size (exceeding the input bucket)
    before scoring — exercises the separate output-bucket path."""
    model, params, text = model_and_params
    ds = FakeSemanticDataset(
        "imagenet-s919",
        sizes=[(48, 48), (32, 32), (37, 33)],
        orig_sizes=[(70, 65), (50, 41), (37, 33)],
    )
    got = _miou_both_paths(model, params, text, ds, batch_images=2)
    assert got["batched"]["Mean IoU"] == got["per_image"]["Mean IoU"]
    assert got["batched"]["Pixel Acc"] == got["per_image"]["Pixel Acc"]


def test_rn_exact_shape_batched_eval_matches_per_image():
    """RN family: exact-shape grouped batching (no padding) must reproduce
    per-image evaluation bit-identically."""
    model = ZUTIS(encoder_family="rn", rn_layers=(1, 1, 1, 1), rn_width=8,
                  width=256, text_dim=16, input_resolution=64,
                  n_queries=6, n_decoder_layers=1, n_heads=2)
    params = model.init(jax.random.PRNGKey(2),
                        jnp.zeros((1, 3, 64, 64)))["params"]
    rng = np.random.RandomState(3)
    text = rng.randn(4, 16).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    text = jnp.asarray(text)
    ds = FakeSemanticDataset(
        "coca", sizes=[(64, 64), (64, 96), (64, 64), (64, 96), (64, 64)],
        seed=4)
    out = {}
    for tag, batch in (("batched", 3), ("per_image", 1)):
        trainer = Trainer(model, text)
        out[tag] = trainer.evaluate(params, ds, batch_images=batch)
    assert out["batched"]["Mean IoU"] == out["per_image"]["Mean IoU"]
    assert out["batched"]["Pixel Acc"] == out["per_image"]["Pixel Acc"]


def test_repeated_evaluate_retraces_nothing(model_and_params, monkeypatch):
    """VERDICT r2 task 8: the ~20 in-training evaluate() calls of a real run
    must not re-trace — one trace per shape and one bucketed step per key
    for the Trainer's LIFETIME."""
    from zutis_tpu.engine import batched_eval as BE

    model, params, text = model_and_params
    ds = FakeSemanticDataset(
        "coca", sizes=[(48, 48), (32, 48), (48, 48), (32, 48)], seed=7)
    trainer = Trainer(model, text)

    made = []
    orig = BE.make_semantic_confusion_step

    def counting_maker(*a, **k):
        made.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(BE, "make_semantic_confusion_step", counting_maker)

    # bucketed regime: step makers run once per key, not once per call
    first = trainer.evaluate(params, ds, batch_images=2)
    n_made = len(made)
    assert n_made >= 1
    second = trainer.evaluate(params, ds, batch_images=2)
    assert len(made) == n_made, "evaluate() rebuilt bucketed steps"
    assert first["Mean IoU"] == second["Mean IoU"]

    # per-image regime: the shared jitted forward traces once per shape
    trainer.evaluate(params, ds, batch_images=1)
    traces = trainer._eval_trace_count
    assert traces >= 1
    trainer.evaluate(params, ds, batch_images=1)
    assert trainer._eval_trace_count == traces, "evaluate() re-traced"
