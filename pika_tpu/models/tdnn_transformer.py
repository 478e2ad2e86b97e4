"""TDNN-Transformer transducer encoder.

TPU-native re-implementation of the reference encoder
(trainer/model/rnnt_tdnn_transformer.py): 9 time-convolutions with full
feature mixing (the reference expresses these as Conv2d with kernel
(3, nhid); here they are 1-D dilated convolutions in NHC layout — the
natural XLA/MXU form), ReLU→BatchNorm after each, one transformer layer
after every 3rd conv (heads 16/16/8), final BatchNorm + linear.

Layer plan (rnnt_tdnn_transformer.py:44-57):
  conv 0-2: dilation 1;  conv 3-(L-2): dilation 3;  conv L-1: dilation 3,
  stride 4 (4× time subsampling).  All VALID padding, so the model consumes
  ``sum(2*dilation)`` = 42 context frames for the default 9-layer config —
  matching the recipe's ``--model_lctx 21 --model_rctx 21 --model_stride 4``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pika_tpu.models.transformer import TransformerEncoderLayer

BN_MOMENTUM = 0.9  # flax momentum = 1 - torch momentum (0.1)
BN_EPS = 1e-5


def _conv_out_len(length, kernel: int, dilation: int, stride: int):
    extent = (kernel - 1) * dilation + 1
    return (length - extent) // stride + 1


class TDNNTransformerEncoder(nn.Module):
    output_dim: int
    tdnn_nhid: int = 1024
    tdnn_layers: int = 9
    filter_size: int = 3
    heads: Sequence[int] = (16, 16, 8)
    transformer_dropout: float = 0.2
    attn_chunk: int = 0  # query-block chunked attention (O(T*chunk) memory)
    attn_flash: bool = False        # Pallas flash-attention core (exact;
    #                                 taken only on deterministic passes)
    attn_cheap_dropout: bool = False  # head-shared bits-threshold dropout
    remat: bool = False  # jax.checkpoint each transformer layer: recompute
    #                      activations in the backward pass instead of
    #                      holding the (B,H,T,T) attention tensors in HBM —
    #                      the long-sequence memory/FLOP trade (SURVEY §5.7)

    def _dilations_strides(self):
        dil = [1] * 3 + [3] * (self.tdnn_layers - 4) + [3]
        stride = [1] * (self.tdnn_layers - 1) + [4]
        return dil, stride

    def output_length(self, in_len):
        """Output frame count given input frames (jit-safe on arrays)."""
        dil, stride = self._dilations_strides()
        out = in_len
        for d, s in zip(dil, stride):
            out = _conv_out_len(out, self.filter_size, d, s)
        return out

    @property
    def context(self) -> int:
        """Total consumed context frames = model_lctx + model_rctx."""
        dil, _ = self._dilations_strides()
        return sum(2 * d for d in dil)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.tdnn_layers <= 4:
            raise ValueError("tdnn_layers must be > 4")
        nhid = self.tdnn_nhid
        x = nn.relu(nn.Dense(nhid, name="fc_in")(x))
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, name="bn_in")(x)
        dil, stride = self._dilations_strides()
        t_layer = 0
        for l, (d, s) in enumerate(zip(dil, stride)):
            x = nn.Conv(
                features=nhid,
                kernel_size=(self.filter_size,),
                strides=(s,),
                kernel_dilation=(d,),
                padding="VALID",
                name=f"conv_{l}",
            )(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                             epsilon=BN_EPS, name=f"bn_{l}")(x)
            if (l + 1) % 3 == 0 and t_layer < len(self.heads):
                layer_cls = (nn.remat(TransformerEncoderLayer,
                                      static_argnums=(3,))
                             if self.remat else TransformerEncoderLayer)
                x = layer_cls(
                    nhid, self.heads[t_layer], nhid * 4,
                    self.transformer_dropout,
                    attn_q_chunk=self.attn_chunk,
                    attn_flash=self.attn_flash,
                    attn_cheap_dropout=self.attn_cheap_dropout,
                    name=f"transformer_{t_layer}",
                )(x, None, not train)
                t_layer += 1
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, name="bn_final")(x)
        return nn.Dense(self.output_dim, name="fc_out")(x)
