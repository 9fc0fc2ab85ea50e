"""Device mesh and sharding layer — a new first-class component with no
reference counterpart (the reference is strictly single-GPU, SURVEY.md
section 2.4; this layer realises its rebuild plan).

Axes:
  data  — batch sharding (DP): per-device batch shards, gradient all-reduce
          rides ICI via XLA's GSPMD partitioner.
  model — tensor parallelism (TP): attention q/k/v/out and MLP kernels shard
          over heads/hidden so each chip holds 1/|model| of the big matmuls;
          activations all-reduce after out-projections.

Sequence parallelism for dense high-res inference shards the patch-token axis
(see parallel/sp.py). PP/EP are out of scope for ZUTIS-scale models
(SURVEY.md section 2.4).

Everything routes through jax.sharding.NamedSharding: placing params/batches
with these specs and calling the ordinary jitted step lets GSPMD insert the
collectives — the TPU-native equivalent of the NCCL layer the reference
never had.
"""
from __future__ import annotations

import re
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    axis_sizes: Dict[str, int], devices: Optional[Sequence] = None
) -> Mesh:
    """axis_sizes e.g. {"data": 2, "model": 4}; product must equal #devices."""
    devices = list(devices if devices is not None else jax.devices())
    names = tuple(axis_sizes)
    shape = tuple(axis_sizes[n] for n in names)
    n = int(np.prod(shape))
    assert n == len(devices), f"mesh {axis_sizes} needs {n} devices, " \
                              f"got {len(devices)}"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, names)


# param-path regex -> PartitionSpec factory (axis name substituted at call)
_TP_RULES = [
    # attention projections: qkv shard output features, out shards input
    (r".*(q_proj|k_proj|v_proj)/kernel$", lambda m: P(None, m)),
    (r".*(q_proj|k_proj|v_proj)/bias$", lambda m: P(m)),
    (r".*out_proj/kernel$", lambda m: P(m, None)),
    # transformer MLPs: expand shards output, contract shards input
    (r".*(mlp_c_fc|linear1)/kernel$", lambda m: P(None, m)),
    (r".*(mlp_c_fc|linear1)/bias$", lambda m: P(m)),
    (r".*(mlp_c_proj|linear2)/kernel$", lambda m: P(m, None)),
    # ffn1/ffn2 3-layer MLPs: shard the 256-wide hidden layers
    (r".*ffn[12]/layers_0/kernel$", lambda m: P(None, m)),
    (r".*ffn[12]/layers_0/bias$", lambda m: P(m)),
    (r".*ffn[12]/layers_1/kernel$", lambda m: P(m, None)),
]


def param_partition_spec(path: str, model_axis: str = "model") -> P:
    for pattern, spec_fn in _TP_RULES:
        if re.match(pattern, path):
            return spec_fn(model_axis)
    return P()  # replicated



def params_sharding_tree(params, mesh: Mesh, model_axis: str = "model"):
    """Pytree of NamedShardings matching `params` via the TP rules."""

    def spec_for(keypath, leaf):
        path = "/".join(
            k.key if hasattr(k, "key") else str(k) for k in keypath
        )
        spec = param_partition_spec(path, model_axis)
        # drop sharding for dims not divisible by the axis size
        axis_size = mesh.shape[model_axis] if model_axis in mesh.shape else 1
        fixed = []
        for dim, name in enumerate(spec):
            if name is not None and leaf.shape[dim] % axis_size != 0:
                fixed.append(None)
            else:
                fixed.append(name)
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh, model_axis: str = "model"):
    shardings = params_sharding_tree(params, mesh, model_axis)
    return jax.device_put(params, shardings)


def shard_train_state(state, mesh: Mesh, model_axis: str = "model"):
    """Place a full TrainState (params + optimiser moments + step) on the
    mesh. The TP rules match on path TAILS (`.*kernel$` etc.), so the AdamW
    mu/nu moments — whose paths end with the same param paths — shard
    identically to their params; scalars (step, count) and unmatched leaves
    replicate. Because checkpoints restore to host arrays first
    (core/checkpoint.py), `restore_train_state` + this call re-shards a run
    onto ANY mesh factorisation, including one different from the mesh it
    was saved under (tests/test_cli_mesh.py)."""
    return jax.device_put(
        state, params_sharding_tree(state, mesh, model_axis))


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Shard every leaf's leading (batch) dimension over the data axis."""

    def place(x):
        spec = P(data_axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(
        tree, NamedSharding(mesh, P())
    )
