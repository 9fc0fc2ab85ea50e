"""Both CLI entries plumb the opt-in throughput levers (tome_r /
decoder_pool config extras, PERF.md round 5) into build_zutis.

The reference CLIs build the published architectures from the config alone
(main.py:30-47, coco20k_eval.py argparse); our lever extras ride the same
config, so BOTH entry points must honour them — cli/main.py for training
and cli/coco20k_eval.py for the bucketed batched eval (where ToMe is
padding-safe since ops/tome.py grew size-0 scheduling)."""
import json

import pytest

from fixture_helpers import base_cli_cfg, dump_cfg, write_cli_fixture


class _Captured(Exception):
    pass


@pytest.fixture()
def lever_cfg(tmp_path):
    categories, cat_fp, dir_train, dir_val, emb_fp = write_cli_fixture(
        tmp_path, n_val_images=1)
    cfg = base_cli_cfg(categories, cat_fp, dir_train, dir_val, emb_fp,
                       tmp_path / "ckpt", tome_r=3, decoder_pool=2)
    del cfg["model_kwargs"]  # force the build_zutis (published-arch) branch
    return dump_cfg(cfg, tmp_path / "lever.yaml")


def _capture_build(monkeypatch):
    from zutis_tpu.models import factory

    seen = {}

    def fake_build(clip_arch, **kwargs):
        seen.update(kwargs, clip_arch=clip_arch)
        raise _Captured

    monkeypatch.setattr(factory, "build_zutis", fake_build)
    return seen


def test_train_cli_passes_levers(lever_cfg, monkeypatch):
    from zutis_tpu.cli.main import main

    seen = _capture_build(monkeypatch)
    with pytest.raises(_Captured):
        main(["--p_config", str(lever_cfg)])
    assert seen["tome_r"] == 3 and seen["decoder_pool"] == 2


def test_coco20k_eval_cli_passes_levers(lever_cfg, tmp_path, monkeypatch):
    from zutis_tpu.cli.coco20k_eval import main as eval_main

    d20k = tmp_path / "coco20k"
    (d20k / "annotations").mkdir(parents=True)
    with open(d20k / "annotations" / "instances_train2014_sel20k.json",
              "w") as f:
        json.dump({"images": [], "annotations": [],
                   "categories": [{"id": 1, "name": "square"}]}, f)

    seen = _capture_build(monkeypatch)
    with pytest.raises(_Captured):
        eval_main(["--p_config", str(lever_cfg),
                   "--p_state_dict", str(tmp_path / "none.npz"),
                   "--dir_dataset", str(d20k),
                   "--dir_ckpt", str(tmp_path / "out")])
    assert seen["tome_r"] == 3 and seen["decoder_pool"] == 2
