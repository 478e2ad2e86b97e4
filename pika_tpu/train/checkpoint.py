"""Checkpointing with Orbax — params + optimizer state + data cursor.

Upgrades the reference's whole-model pickle per epoch per rank
(``torch.save(model)``, trainer/train_transducer_bmuf_otfaug.py:362-366)
to proper functional checkpoints: the full TrainState (params, optimizer
state, batch stats) plus training metadata (epoch, batch cursor, RNG seed)
so resume continues exactly, optimizer momentum included — the reference
loses optimizer/BMUF state on resume (SURVEY.md §5.4).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(directory: str, step: int, state: Any, metadata: Optional[dict] = None) -> str:
    """Save a pytree state under ``directory/step``; returns the path."""
    path = os.path.join(os.path.abspath(directory), str(step))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "state"), state, force=True)
    ckptr.wait_until_finished()
    if metadata is not None:
        import json

        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(metadata, f)
    return path


def restore_checkpoint(directory: str, step: Optional[int] = None, target: Any = None):
    """Restore (state, metadata) from ``directory/step`` (latest if None).

    ``target`` is a pytree of the same structure (with ShapeDtypeStructs or
    concrete arrays) used to interpret the stored arrays.
    """
    directory = os.path.abspath(directory)
    if step is None:
        steps = [int(d) for d in os.listdir(directory) if d.isdigit()]
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {directory}")
        step = max(steps)
    path = os.path.join(directory, str(step))
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        state = ckptr.restore(os.path.join(path, "state"), abstract)
    else:
        state = ckptr.restore(os.path.join(path, "state"))
    meta_path = os.path.join(path, "metadata.json")
    metadata = None
    if os.path.exists(meta_path):
        import json

        with open(meta_path) as f:
            metadata = json.load(f)
    return state, metadata
