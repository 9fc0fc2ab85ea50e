"""Full train-state checkpointing with resume (orbax).

The reference only saves bare model weights (`torch.save(state_dict)`,
trainer.py:246,252) — training cannot actually resume mid-run. Here the whole
TrainState (params + optimiser moments + step) checkpoints atomically via
orbax; combined with the deterministic (seed, step) data pipeline
(data/index_dataset.py) a preempted run restarts bit-exactly from the last
checkpoint (SURVEY.md section 5, failure detection / elastic recovery row).

A reference-layout export (.npz of the torch-style state_dict) is kept for
parity tooling (models/weights.export_zutis)."""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def save_train_state(path: str, state) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()


def restore_train_state(path: str, target) -> Optional[object]:
    """Restore into the structure of `target` (an abstract or concrete
    TrainState); returns None when no checkpoint exists."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=jax.device_get(target))


def latest_step_dir(base: str) -> Optional[str]:
    """Find the newest step_<N> checkpoint directory under `base`."""
    if not os.path.isdir(base):
        return None
    steps = []
    for name in os.listdir(base):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_")[1]), name))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(base, max(steps)[1])


def load_params_any(path: str):
    """Load ZUTIS params from .npz (our export) or .pt (reference torch
    state_dict)."""
    from zutis_tpu.models.weights import (
        _FLAX_RAW_PREFIX, _unflatten_tree, convert_zutis,
        load_torch_state_dict,
    )

    if path.endswith(".npz"):
        sd = {k: v for k, v in np.load(path).items()}
        if any(k.startswith(_FLAX_RAW_PREFIX) for k in sd):
            # RN/DINO-encoder export: the raw flax tree, no layout convert
            return _unflatten_tree({
                k[len(_FLAX_RAW_PREFIX):]: v for k, v in sd.items()})
        return convert_zutis(sd)
    return convert_zutis(load_torch_state_dict(path))
