"""Checkpoint import: OpenAI-CLIP / reference-ZUTIS torch state_dicts -> flax
param trees for zutis_tpu models.

The reference loads OpenAI CLIP weights through `clip.load` +
`build_model(state_dict)` (reference networks/clip_arch.py:590-627) and saves
trained ZUTIS weights with `torch.save(network.state_dict())`
(trainer.py:246,252). This module maps those layouts onto ours:

  torch Linear weight [out, in]      -> flax Dense kernel [in, out] (transpose)
  torch MHA in_proj_weight [3d, d]   -> split q/k/v Dense kernels
  torch Conv2d weight OIHW           -> flax Conv kernel HWIO
  torch LayerNorm weight/bias        -> LayerNorm32/LayerNorm_0 scale/bias
  torch Embedding weight             -> flax Embed embedding

Only numpy in/out here; `load_torch_state_dict` handles .pt files (both plain
and TorchScript archives) when torch is importable."""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor without importing torch at module scope
    return np.asarray(x.detach().cpu().float().numpy())


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = model.state_dict()
    except Exception:
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        if "state_dict" in sd and isinstance(sd["state_dict"], Mapping):
            sd = sd["state_dict"]
    return {k: _np(v) for k, v in sd.items() if hasattr(v, "detach") or
            isinstance(v, np.ndarray)}


def _ln(sd: Mapping[str, Any], prefix: str) -> dict:
    return {"LayerNorm_0": {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }}


def _dense(sd: Mapping[str, Any], prefix: str) -> dict:
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).T,
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _mha(sd: Mapping[str, Any], prefix: str) -> dict:
    """torch nn.MultiheadAttention -> our MultiHeadAttention params."""
    out = {}
    w = _np(sd[f"{prefix}.in_proj_weight"])
    b = _np(sd[f"{prefix}.in_proj_bias"])
    d = w.shape[1]
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        out[name] = {"kernel": w[i * d:(i + 1) * d].T,
                     "bias": b[i * d:(i + 1) * d]}
    out["out_proj"] = _dense(sd, f"{prefix}.out_proj")
    return out


def _resblock(sd: Mapping[str, Any], prefix: str) -> dict:
    return {
        "ln_1": _ln(sd, f"{prefix}.ln_1"),
        "attn": _mha(sd, f"{prefix}.attn"),
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
        "mlp_c_fc": _dense(sd, f"{prefix}.mlp.c_fc"),
        "mlp_c_proj": _dense(sd, f"{prefix}.mlp.c_proj"),
    }


def convert_clip_visual(sd: Mapping[str, Any], prefix: str = "visual.") -> dict:
    """CLIP ViT visual tower -> CLIPViT params."""
    p = prefix
    rb = f"{p}transformer.resblocks."
    n_layers = len({k[len(rb):].split(".")[0] for k in sd if k.startswith(rb)})
    params = {
        "conv1": {"kernel": _np(sd[f"{p}conv1.weight"]).transpose(2, 3, 1, 0)},
        "class_embedding": _np(sd[f"{p}class_embedding"]),
        "positional_embedding": _np(sd[f"{p}positional_embedding"]),
        "ln_pre": _ln(sd, f"{p}ln_pre"),
        "ln_post": _ln(sd, f"{p}ln_post"),
        "proj": _np(sd[f"{p}proj"]),
    }
    for i in range(n_layers):
        params[f"resblocks_{i}"] = _resblock(sd, f"{p}transformer.resblocks.{i}")
    return params


def _frozen_bn(sd: Mapping[str, Any], prefix: str) -> dict:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
        "running_mean": _np(sd[f"{prefix}.running_mean"]),
        "running_var": _np(sd[f"{prefix}.running_var"]),
    }


def _conv(sd: Mapping[str, Any], key: str) -> dict:
    # torch Conv2d OIHW -> flax HWIO
    return {"kernel": _np(sd[key]).transpose(2, 3, 1, 0)}


def _bottleneck(sd: Mapping[str, Any], prefix: str) -> dict:
    out = {}
    for i in (1, 2, 3):
        out[f"conv{i}"] = _conv(sd, f"{prefix}.conv{i}.weight")
        out[f"bn{i}"] = _frozen_bn(sd, f"{prefix}.bn{i}")
    if f"{prefix}.downsample.0.weight" in sd:
        # reference clip_arch.py:36-42: Sequential("-1" avgpool, "0" conv,
        # "1" bn) — avgpool has no params, so torch keys are .0/.1
        out["downsample_conv"] = _conv(sd, f"{prefix}.downsample.0.weight")
        out["downsample_bn"] = _frozen_bn(sd, f"{prefix}.downsample.1")
    return out


def convert_clip_rn_visual(
    sd: Mapping[str, Any], prefix: str = "visual."
) -> dict:
    """CLIP ModifiedResNet visual tower -> ModifiedResNet params
    (reference clip_arch.py:156-221 layout)."""
    p = prefix
    params: Dict[str, Any] = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = _conv(sd, f"{p}conv{i}.weight")
        params[f"bn{i}"] = _frozen_bn(sd, f"{p}bn{i}")
    for stage in (1, 2, 3, 4):
        bi = 0
        while f"{p}layer{stage}.{bi}.conv1.weight" in sd:
            params[f"layer{stage}_{bi}"] = _bottleneck(
                sd, f"{p}layer{stage}.{bi}"
            )
            bi += 1
        assert bi > 0, f"no blocks found for layer{stage}"
    params["attnpool"] = {
        "positional_embedding": _np(sd[f"{p}attnpool.positional_embedding"]),
        "attn": {
            "q_proj": _dense(sd, f"{p}attnpool.q_proj"),
            "k_proj": _dense(sd, f"{p}attnpool.k_proj"),
            "v_proj": _dense(sd, f"{p}attnpool.v_proj"),
            "out_proj": _dense(sd, f"{p}attnpool.c_proj"),
        },
    }
    return params


def convert_dino_encoder(sd: Mapping[str, Any]) -> dict:
    """Official DINO ViT checkpoint (keys `patch_embed.proj.*`, `blocks.N.*`,
    `cls_token`, `pos_embed`, `norm.*`) -> DeiTEncoder params (the encoder
    the reference's encoder_type="dino" arm downloads,
    utils/utils.py:293-310)."""
    enc: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _np(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd["patch_embed.proj.bias"]),
        },
        "cls_token": _np(sd["cls_token"]).reshape(1, 1, -1),
        "pos_embed": _np(sd["pos_embed"])[0],
        "norm": _ln(sd, "norm"),
    }
    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        p = f"blocks.{i}"
        qkv_w = _np(sd[f"{p}.attn.qkv.weight"])
        qkv_b = _np(sd[f"{p}.attn.qkv.bias"])
        d = qkv_w.shape[1]
        attn = {}
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            attn[name] = {"kernel": qkv_w[j * d:(j + 1) * d].T,
                          "bias": qkv_b[j * d:(j + 1) * d]}
        attn["out_proj"] = _dense(sd, f"{p}.attn.proj")
        enc[f"blocks_{i}"] = {
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "attn": attn,
            "fc1": _dense(sd, f"{p}.mlp.fc1"),
            "fc2": _dense(sd, f"{p}.mlp.fc2"),
        }
        i += 1
    return enc


def convert_clip_text(sd: Mapping[str, Any]) -> dict:
    n_layers = len({
        k.split(".")[2] for k in sd if k.startswith("transformer.resblocks.")
    })
    params = {
        "token_embedding": {"embedding": _np(sd["token_embedding.weight"])},
        "positional_embedding": _np(sd["positional_embedding"]),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": _np(sd["text_projection"]),
    }
    for i in range(n_layers):
        params[f"resblocks_{i}"] = _resblock(sd, f"transformer.resblocks.{i}")
    return params


def _mlp3(sd: Mapping[str, Any], prefix: str, n: int = 3) -> dict:
    return {f"layers_{i}": _dense(sd, f"{prefix}.layers.{i}") for i in range(n)}


def convert_zutis(sd: Mapping[str, Any]) -> dict:
    """Reference ZUTIS state_dict (trainer.py checkpoint) -> ZUTIS params."""
    n_dec = len({
        k.split(".")[2] for k in sd if k.startswith("decoder.layers.")
    })
    dec = {"norm": _ln(sd, "decoder.norm")}
    for i in range(n_dec):
        p = f"decoder.layers.{i}"
        dec[f"layers_{i}"] = {
            "self_attn": _mha(sd, f"{p}.self_attn"),
            "cross_attn": _mha(sd, f"{p}.multihead_attn"),
            "linear1": _dense(sd, f"{p}.linear1"),
            "linear2": _dense(sd, f"{p}.linear2"),
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "norm3": _ln(sd, f"{p}.norm3"),
        }
    is_rn = "encoder.bn1.running_mean" in sd
    return {
        "encoder": (
            convert_clip_rn_visual(sd, prefix="encoder.")
            if is_rn
            else convert_clip_visual(sd, prefix="encoder.")
        ),
        "ffn1": _mlp3(sd, "ffn1"),
        "ffn2": _mlp3(sd, "ffn2"),
        "decoder": dec,
        "query_embed": _np(sd["query_embed"]),
    }


def save_torch_checkpoint(params: Mapping[str, Any], path: str) -> None:
    """Write a torch-loadable reference-layout checkpoint: the reference's
    own `torch.load(...)` + `load_state_dict(strict=True)` (trainer.py:302)
    accepts the result, completing the parity bridge in both directions."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_zutis(params).items()}
    torch.save(sd, path)


_FLAX_RAW_PREFIX = "__flax_raw__/"


def _flatten_tree(tree: Mapping[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, Mapping):
            out.update(_flatten_tree(v, f"{key}/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten_tree(flat: Mapping[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def export_zutis(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of convert_zutis: flax ZUTIS params -> reference-layout
    state_dict (numpy), for .pt-compatible export (SURVEY.md section 5,
    checkpoint/resume row).

    The reference .pt layout only exists for the ViT encoder (the reference
    loads RN/DINO weights from their own upstream checkpoints,
    networks/zutis.py:51-57); RN/DINO-encoder ZUTIS params are exported as
    the raw flax tree under a `__flax_raw__/` key prefix so Trainer
    checkpoints round-trip for every encoder family (import side:
    core/checkpoint.load_params_any)."""
    enc_tree = params["encoder"]
    if "class_embedding" not in enc_tree:  # RN or DINO encoder
        return _flatten_tree(params, _FLAX_RAW_PREFIX)
    sd: Dict[str, np.ndarray] = {}

    def put_dense(prefix, d):
        sd[f"{prefix}.weight"] = np.asarray(d["kernel"]).T
        sd[f"{prefix}.bias"] = np.asarray(d["bias"])

    def put_ln(prefix, d):
        sd[f"{prefix}.weight"] = np.asarray(d["LayerNorm_0"]["scale"])
        sd[f"{prefix}.bias"] = np.asarray(d["LayerNorm_0"]["bias"])

    def put_mha(prefix, d):
        w = np.concatenate([np.asarray(d[n]["kernel"]).T
                            for n in ("q_proj", "k_proj", "v_proj")], 0)
        b = np.concatenate([np.asarray(d[n]["bias"])
                            for n in ("q_proj", "k_proj", "v_proj")], 0)
        sd[f"{prefix}.in_proj_weight"] = w
        sd[f"{prefix}.in_proj_bias"] = b
        put_dense(f"{prefix}.out_proj", d["out_proj"])

    enc = params["encoder"]
    sd["encoder.conv1.weight"] = np.asarray(enc["conv1"]["kernel"]).transpose(3, 2, 0, 1)
    sd["encoder.class_embedding"] = np.asarray(enc["class_embedding"])
    sd["encoder.positional_embedding"] = np.asarray(enc["positional_embedding"])
    sd["encoder.proj"] = np.asarray(enc["proj"])
    put_ln("encoder.ln_pre", enc["ln_pre"])
    put_ln("encoder.ln_post", enc["ln_post"])
    i = 0
    while f"resblocks_{i}" in enc:
        rb = enc[f"resblocks_{i}"]
        p = f"encoder.transformer.resblocks.{i}"
        put_ln(f"{p}.ln_1", rb["ln_1"])
        put_ln(f"{p}.ln_2", rb["ln_2"])
        put_mha(f"{p}.attn", rb["attn"])
        put_dense(f"{p}.mlp.c_fc", rb["mlp_c_fc"])
        put_dense(f"{p}.mlp.c_proj", rb["mlp_c_proj"])
        i += 1
    for ffn in ("ffn1", "ffn2"):
        for j in range(3):
            put_dense(f"{ffn}.layers.{j}", params[ffn][f"layers_{j}"])
    dec = params["decoder"]
    put_ln("decoder.norm", dec["norm"])
    i = 0
    while f"layers_{i}" in dec:
        dl = dec[f"layers_{i}"]
        p = f"decoder.layers.{i}"
        put_mha(f"{p}.self_attn", dl["self_attn"])
        put_mha(f"{p}.multihead_attn", dl["cross_attn"])
        put_dense(f"{p}.linear1", dl["linear1"])
        put_dense(f"{p}.linear2", dl["linear2"])
        put_ln(f"{p}.norm1", dl["norm1"])
        put_ln(f"{p}.norm2", dl["norm2"])
        put_ln(f"{p}.norm3", dl["norm3"])
        i += 1
    sd["query_embed"] = np.asarray(params["query_embed"])
    return sd
