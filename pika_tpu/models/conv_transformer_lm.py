"""Convolutional-transformer prediction network (transducer decoder).

Re-implementation of trainer/model/rnnt_conv_transformer_lm.py: per layer a
causal Conv1d (kernel 5, left-padded so position u sees only ≤ u) + ReLU,
then a transformer layer with causal + padding mask; final LayerNorm and a
linear projection to the joint dimension.

The embedding table is owned by the parent ``Transducer`` and passed in as
embedded inputs — mirroring the reference's shared ``self.embed``
(trainer/model/transducer.py:52-68).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from pika_tpu.models.transformer import (
    LN_EPS,
    TransformerEncoderLayer,
    causal_mask,
)


class ConvTransformerLM(nn.Module):
    output_dim: int
    d_model: int = 512
    num_layers: int = 2
    heads: int = 8
    d_ff: int = 2048
    dropout_rate: float = 0.1
    kernel_size: int = 5
    max_relative_positions: int = 0

    @nn.compact
    def __call__(
        self,
        emb: jnp.ndarray,
        pad_positions: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """emb: (B, U, E) embedded tokens; pad_positions: (B, U) bool."""
        b, u, _ = emb.shape
        mask = jnp.broadcast_to(causal_mask(u), (b, u, u))
        if pad_positions is not None:
            mask = mask | pad_positions[:, None, :]
        out = emb
        k = self.kernel_size
        for i in range(self.num_layers):
            # causal conv: left-pad k-1, VALID — position u never sees u+1
            padded = jnp.pad(out, ((0, 0), (k - 1, 0), (0, 0)))
            out = nn.Conv(self.d_model, kernel_size=(k,), padding="VALID", name=f"conv_{i}")(padded)
            out = nn.relu(out)
            out = TransformerEncoderLayer(
                self.d_model, self.heads, self.d_ff, self.dropout_rate,
                max_relative_positions=self.max_relative_positions,
                name=f"transformer_{i}",
            )(out, mask=mask, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm")(out)
        return nn.Dense(self.output_dim, name="linear_out")(out)
