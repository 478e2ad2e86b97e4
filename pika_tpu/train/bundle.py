"""Model bundles: config + parameters saved together.

The reference pickles whole ``nn.Module`` objects (``torch.save(model)``)
so the architecture rides along with the weights.  The functional
equivalent: a JSON-serialized config dataclass next to the Orbax params
checkpoint.  ``load_bundle`` reconstructs the model and parameters from a
directory without any other context.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp

from pika_tpu.models.las import LAS, LASConfig
from pika_tpu.models.transducer import Transducer, TransducerConfig

_KINDS = {
    "transducer": (Transducer, TransducerConfig),
    "las": (LAS, LASConfig),
}


def save_bundle(directory: str, kind: str, config, variables, metadata: Optional[dict] = None) -> str:
    """Write a bundle.  Multi-host: EVERY process must call this (Orbax's
    ``Checkpointer.save`` runs cross-process barriers; the primary host
    writes, the rest synchronize — gating the call on process 0 deadlocks
    the save barrier against the other hosts' next collective)."""
    import jax

    directory = os.path.abspath(directory)
    is_primary = jax.process_index() == 0
    if is_primary:
        os.makedirs(directory, exist_ok=True)
        with open(os.path.join(directory, "model.json"), "w") as f:
            json.dump(
                {"kind": kind, "config": dataclasses.asdict(config), "metadata": metadata or {}},
                f, indent=2,
            )
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(directory, "variables"), dict(variables), force=True)
    ckptr.wait_until_finished()
    return directory


def load_bundle(directory: str) -> Tuple[Any, Any, dict]:
    """Returns (model, variables, metadata)."""
    directory = os.path.abspath(directory)
    with open(os.path.join(directory, "model.json")) as f:
        spec = json.load(f)
    model_cls, cfg_cls = _KINDS[spec["kind"]]
    # tolerate version skew: a bundle saved by a newer build may carry
    # config fields this build does not know — dropping them (loudly) is
    # strictly better than refusing to load the parameters
    known = {f.name for f in dataclasses.fields(cfg_cls)}
    unknown = sorted(set(spec["config"]) - known)
    if unknown:
        print(f"load_bundle: ignoring unknown config fields {unknown} "
              f"(saved by a newer build?)", file=sys.stderr)
    cfg = cfg_cls(**{k: v for k, v in spec["config"].items() if k in known})
    model = model_cls(cfg)
    ckptr = ocp.StandardCheckpointer()
    variables = ckptr.restore(os.path.join(directory, "variables"))
    return model, variables, spec.get("metadata", {})
