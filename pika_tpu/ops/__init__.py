from pika_tpu.ops.rnnt_loss import (
    rnnt_loss_numpy,
    rnnt_loss_from_logprobs,
    rnnt_loss_fused,
    rnnt_alpha,
    rnnt_beta,
    rnnt_occupancy,
)
from pika_tpu.ops.edit_distance import edit_distance_jax, edit_distance_batch_jax
