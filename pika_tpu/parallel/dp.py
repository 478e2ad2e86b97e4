"""Per-step data parallelism — the idiomatic TPU default.

Where the reference's fastest-sync mode is BMUF with sync_period 1
(or BlockAdam, trainer/bmuf.py:147-150), the idiomatic TPU form is plain
synchronous data parallelism: params replicated, batch sharded over the
``data`` mesh axis, and XLA inserting the gradient all-reduce over ICI
automatically under ``jit``.  No explicit collectives needed.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh

from pika_tpu.parallel.mesh import data_sharding, replicated


def jit_dp(step_fn: Callable, mesh: Mesh, donate_state: bool = True):
    """Jit a ``(state, batch, key) -> (state, metrics)`` step for DP:
    state/key replicated, batch sharded on its leading axis."""
    state_sh = replicated(mesh)
    batch_sh = data_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh, state_sh),
        out_shardings=(state_sh, state_sh),
        donate_argnums=(0,) if donate_state else (),
    )
