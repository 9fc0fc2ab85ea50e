"""Real-artifact parity harness (VERDICT r2 task 4).

Given REAL released checkpoints and sample images, this converts the torch
weights with zutis_tpu's converters, runs this stack's forward/predict, runs
the torch side where available, and writes a JSON diff report asserting fp
tolerance — the missing proof that one transposed kernel or renamed key
can't survive the synthetic-oracle tests.

Modes (see README "Parity against released checkpoints"):

  clip --pt ViT-B-16.pt [--image f.jpg ...]
      OpenAI CLIP archives are TorchScript: the .pt itself IS the reference
      program. Compares its encode_image pooled embedding against our
      CLIPViT pooled path on the same (CLIP-preprocessed) images — full
      artifact-to-artifact parity with no reference source needed.

  selfmask --pt selfmask_nq20.pt [--image f.jpg ...]
      Converts the released SelfMask checkpoint
      (reference utils/utils.py:159-161) and runs our forward. With
      --reference-dir <checkout of NoelShin/zutis> it also builds the
      reference torch SelfMask, loads the same checkpoint strictly, and
      compares mask/objectness outputs.

  zutis --pt checkpoint.pt [--image f.jpg ...]
      Converts a reference-trained ZUTIS state dict (trainer.py checkpoint)
      and runs our forward + semantic predict; with --reference-dir the
      reference networks.zutis forward runs on the same inputs
      (reference networks/zutis.py:472-532).

  --dry-run  (any mode, no assets needed)
      Synthesizes a checkpoint from the in-repo torch oracles
      (tests/torch_oracle.py), saves it to a real .pt, and runs the SAME
      load -> convert -> forward -> compare code path — executable in this
      environment, proving the harness plumbing end-to-end.

Report: JSON lines per compared tensor {name, shape, max_abs, max_rel, ok}
plus a summary; exit code 1 when any comparison exceeds tolerance.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

# defaults match the empirical fp32 reassociation noise of the in-suite
# torch-oracle parity tests (tests/test_selfmask_parity.py: rtol 2e-3,
# atol 7e-4 on sigmoid outputs); tighten with --tol-abs/--tol-rel
TOL_ABS = 2e-3
TOL_REL = 5e-3


def _compare(report, name, ours, theirs):
    ours = np.asarray(ours, np.float64)
    theirs = np.asarray(theirs, np.float64)
    if ours.shape != theirs.shape:
        report["tensors"].append({
            "name": name, "ok": False,
            "error": f"shape {ours.shape} vs {theirs.shape}",
        })
        return
    diff = np.abs(ours - theirs)
    # elementwise np.allclose criterion: |d| <= atol + rtol * |ref|
    bad = diff > report["tol_abs"] + report["tol_rel"] * np.abs(theirs)
    denom = np.maximum(np.abs(theirs), 1e-6)
    entry = {
        "name": name,
        "shape": list(ours.shape),
        "max_abs": float(diff.max()) if diff.size else 0.0,
        "max_rel": float((diff / denom).max()) if diff.size else 0.0,
        "mismatch_frac": float(bad.mean()) if diff.size else 0.0,
        "ok": bool(~bad.any()),
    }
    report["tensors"].append(entry)


def _load_images(paths, resolution=None):
    """resolution set: CLIP preprocessing (resize + center crop +
    normalize); None: native-size normalize (first image's size wins —
    parity runs compare one shape at a time)."""
    from PIL import Image

    if resolution is not None:
        from zutis_tpu.retrieval.image_embeddings import clip_preprocess

        return np.stack([
            clip_preprocess(Image.open(p).convert("RGB"), resolution)
            for p in paths
        ])
    from zutis_tpu.data.transforms import normalize_image

    imgs = [normalize_image(Image.open(p).convert("RGB")) for p in paths]
    assert len({i.shape for i in imgs}) == 1, (
        "native-size parity compares one image shape per run"
    )
    return np.stack(imgs)


def _synthetic_batch(rng, n=2, size=224):
    return rng.randn(n, 3, size, size).astype(np.float32) * 0.5


def _clip_vit_from_sd(sd):
    """Infer the ViT architecture from a CLIP state dict's shapes and
    convert — works for every released OpenAI ViT variant."""
    from zutis_tpu.models import weights as W
    from zutis_tpu.models.vit import CLIPViT

    width, _, patch, _ = sd["visual.conv1.weight"].shape
    layers = len({
        k.split(".")[3] for k in sd
        if k.startswith("visual.transformer.resblocks.")
    })
    out_dim = sd["visual.proj"].shape[1]
    grid = int(round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5))
    model = CLIPViT(width=width, layers=layers, heads=width // 64,
                    patch_size=patch, output_dim=out_dim,
                    input_resolution=grid * patch)
    return model, W.convert_clip_visual(sd)


# ---------------------------------------------------------------- clip mode

def run_clip(args, report):
    import jax.numpy as jnp
    import torch

    from zutis_tpu.models.weights import load_torch_state_dict

    if args.dry_run:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tests"))
        from torch_oracle import TorchCLIPViT

        torch.manual_seed(0)
        oracle = TorchCLIPViT(width=64, layers=2, heads=4, patch=16,
                              out_dim=32)
        oracle.eval()
        sd = {f"visual.{k}".replace("visual.resblocks",
                                    "visual.transformer.resblocks"): v
              for k, v in oracle.state_dict().items()}
        pt = os.path.join(tempfile.mkdtemp(), "clip_dryrun.pt")
        torch.save(sd, pt)
        args.pt = pt

    sd = load_torch_state_dict(args.pt)
    if args.dry_run:
        # the tiny oracle's head_dim is not 64, so skip shape inference
        from zutis_tpu.models import weights as W
        from zutis_tpu.models.vit import CLIPViT

        model = CLIPViT(width=64, layers=2, heads=4, patch_size=16,
                        output_dim=32, input_resolution=224)
        params = W.convert_clip_visual(sd)
        size = 64  # dense forward at a non-native grid (pos-emb interp)
    else:
        model, params = _clip_vit_from_sd(sd)
        size = model.input_resolution

    if args.image:
        x = _load_images(args.image, resolution=size)
    else:
        x = _synthetic_batch(np.random.RandomState(0), size=size)

    if args.dry_run:
        with torch.no_grad():
            want = oracle(torch.from_numpy(x))[0].numpy()
        got = np.asarray(model.apply({"params": params}, jnp.asarray(x))[0])
        _compare(report, "dense_tokens", got, want)
        return

    # the OpenAI archive is TorchScript — run it directly as the reference
    ref = torch.jit.load(args.pt, map_location="cpu").eval()
    with torch.no_grad():
        want = ref.encode_image(torch.from_numpy(x)).float().numpy()
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(x), method=type(model).encode_image))
    _compare(report, "encode_image", got, want)


# ------------------------------------------------------------ selfmask mode

def run_selfmask(args, report):
    import jax.numpy as jnp
    import torch

    from zutis_tpu.models.selfmask import (
        SelfMask, convert_selfmask_checkpoint,
    )
    from zutis_tpu.models.weights import load_torch_state_dict

    oracle = None
    if args.dry_run:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tests"))
        from torch_oracle import TorchSelfMask

        # mirror tests/test_selfmask_parity.py's oracle conditions exactly
        torch.manual_seed(0)
        oracle = TorchSelfMask(dim=32, heads=2, depth=2, patch=8, grid=4,
                               n_queries=5, dec_layers=2)
        oracle.eval()
        sd = dict(oracle.state_dict())
        pt = os.path.join(tempfile.mkdtemp(), "selfmask_dryrun.pt")
        torch.save(sd, pt)
        args.pt = pt
        model = SelfMask(embed_dim=32, heads=2, depth=2, patch_size=8,
                         base_grid=4, n_queries=5, n_decoder_layers=2)
        x = np.random.RandomState(0).randn(2, 3, 32, 40).astype(np.float32)
    else:
        from zutis_tpu.models.selfmask import pad_to_patch_multiple

        model = SelfMask()  # released nq20 configuration (DeiT-S/8)
        x = (_load_images(args.image) if args.image
             else _synthetic_batch(np.random.RandomState(1), size=64))
        x = pad_to_patch_multiple(x, model.patch_size)

    sd = load_torch_state_dict(args.pt)
    params = convert_selfmask_checkpoint(sd)
    out = model.apply({"params": params}, jnp.asarray(x))
    masks, obj = out["mask_pred"], out["objectness"]

    if oracle is not None:
        with torch.no_grad():
            want_masks, want_obj = oracle(torch.from_numpy(x))
        _compare(report, "mask_pred", np.asarray(masks), want_masks.numpy())
        _compare(report, "objectness", np.asarray(obj), want_obj.numpy())
        return
    if args.reference_dir:
        want_masks, want_obj = _reference_selfmask(args, x)
        _compare(report, "mask_pred", np.asarray(masks), want_masks)
        _compare(report, "objectness", np.asarray(obj), want_obj)
    else:
        report["note"] = (
            "no --reference-dir: converted checkpoint ran through our "
            "forward only; activation stats recorded"
        )
        report["activation_stats"] = {
            "mask_pred_mean": float(np.asarray(masks).mean()),
            "objectness_mean": float(np.asarray(obj).mean()),
        }


def _reference_selfmask(args, x):
    """Build the reference torch SelfMask from a NoelShin/zutis checkout,
    strictly load the checkpoint, and forward."""
    import torch

    sys.path.insert(0, args.reference_dir)
    from networks.selfmask.selfmask import SelfMask as RefSelfMask  # noqa

    ref = RefSelfMask()
    ref.load_state_dict(
        torch.load(args.pt, map_location="cpu"), strict=True)
    ref.eval()
    with torch.no_grad():
        out = ref(torch.from_numpy(x))
    return out["mask_pred"].numpy(), out["objectness"].squeeze(-1).numpy()


# --------------------------------------------------------------- zutis mode

def run_zutis(args, report):
    import jax.numpy as jnp
    import torch

    from zutis_tpu.models.weights import convert_zutis, load_torch_state_dict
    from zutis_tpu.models.zutis import ZUTIS

    if args.dry_run:
        # round-trip through the REFERENCE state-dict layout: init our
        # model, export with save_torch_checkpoint (the layout the
        # reference's strict load_state_dict accepts — tested in
        # tests/test_models_parity.py), reload + convert, and the two
        # parameter sets must produce identical forwards
        import jax

        from zutis_tpu.models.weights import save_torch_checkpoint

        model = ZUTIS(width=32, encoder_layers=2, encoder_heads=2,
                      patch_size=16, text_dim=16, n_queries=6,
                      n_decoder_layers=2, n_heads=2, input_resolution=32)
        x = _synthetic_batch(np.random.RandomState(2), n=1, size=32)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        pt = os.path.join(tempfile.mkdtemp(), "zutis_dryrun.pt")
        save_torch_checkpoint(params, pt)
        args.pt = pt
        want = model.apply({"params": params}, jnp.asarray(x))
    else:
        model = None

    sd = load_torch_state_dict(args.pt)
    params2 = convert_zutis(sd)
    if model is None:
        from zutis_tpu.models.factory import build_zutis

        assert args.clip_arch, "--clip-arch required for real zutis parity"
        model = build_zutis(args.clip_arch)
        x = (_load_images(args.image) if args.image
             else _synthetic_batch(np.random.RandomState(2), n=1,
                                   size=model.input_resolution))
    got = model.apply({"params": params2}, jnp.asarray(x))

    if args.dry_run:
        for k in ("mask_proposals", "patch_tokens"):
            _compare(report, k, np.asarray(got[k]), np.asarray(want[k]))
        return
    if args.reference_dir:
        sys.path.insert(0, args.reference_dir)
        from networks.zutis import ZUTIS as RefZUTIS  # noqa

        ref = RefZUTIS()
        ref.load_state_dict(torch.load(args.pt, map_location="cpu"),
                            strict=True)
        ref.eval()
        with torch.no_grad():
            out = ref(torch.from_numpy(x))
        _compare(report, "mask_proposals",
                 np.asarray(got["mask_proposals"]),
                 out["mask_pred"].numpy())
        _compare(report, "patch_tokens",
                 np.asarray(got["patch_tokens"]),
                 out["patch_tokens"].numpy())
    else:
        report["note"] = (
            "no --reference-dir: converted checkpoint ran through our "
            "forward only"
        )
        report["activation_stats"] = {
            k: float(np.asarray(v).mean()) for k, v in got.items()
        }


def main(argv=None):
    ap = argparse.ArgumentParser("zutis-tpu real-artifact parity harness")
    ap.add_argument("mode", choices=["clip", "selfmask", "zutis"])
    ap.add_argument("--pt", type=str, default=None,
                    help="path to the released checkpoint")
    ap.add_argument("--image", type=str, nargs="*", default=None)
    ap.add_argument("--reference-dir", type=str, default=None,
                    help="checkout of NoelShin/zutis to run the torch side")
    ap.add_argument("--clip-arch", type=str, default=None,
                    help="architecture tag for zutis mode (e.g. ViT-B/16)")
    ap.add_argument("--tol-abs", type=float, default=TOL_ABS)
    ap.add_argument("--tol-rel", type=float, default=TOL_REL)
    ap.add_argument("--report", type=str, default=None,
                    help="write the JSON report here (default stdout)")
    ap.add_argument("--dry-run", action="store_true",
                    help="synthesize a checkpoint from the in-repo torch "
                         "oracles and exercise the identical code path")
    args = ap.parse_args(argv)
    if not args.dry_run and not args.pt:
        ap.error("--pt is required without --dry-run")

    report = {"mode": args.mode, "dry_run": bool(args.dry_run),
              "tol_abs": args.tol_abs, "tol_rel": args.tol_rel,
              "tensors": []}
    {"clip": run_clip, "selfmask": run_selfmask,
     "zutis": run_zutis}[args.mode](args, report)
    report["ok"] = all(t.get("ok", True) for t in report["tensors"])
    text = json.dumps(report, indent=2)
    if args.report:
        with open(args.report, "w") as f:
            f.write(text)
    print(text)
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
