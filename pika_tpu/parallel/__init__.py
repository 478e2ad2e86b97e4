"""Distributed training: device mesh helpers, per-step data parallelism,
and BMUF block-update strategies over ICI collectives."""

from pika_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated,
    shard_batch,
    replicate_tree,
)
from pika_tpu.parallel.dp import jit_dp
from pika_tpu.parallel.bmuf import (
    BMUFConfig,
    BMUFState,
    bmuf_init,
    make_bmuf_round,
    scale_by_adam_float,
)
