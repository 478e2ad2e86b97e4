"""Model zoo: LSTM (lax.scan), transformer blocks, TDNN-Transformer encoder,
conv-transformer prediction net, the generic Transducer, and the LAS rescorer."""

from pika_tpu.models.lstm import LSTM, lstm_cell_step, lstm_stack_step
from pika_tpu.models.transformer import (
    PositionalEncoding,
    MultiHeadedAttention,
    PositionwiseFeedForward,
    TransformerEncoderLayer,
    causal_mask,
    padding_mask,
    sinusoidal_positions,
)
from pika_tpu.models.tdnn_transformer import TDNNTransformerEncoder
from pika_tpu.models.conv_transformer_lm import ConvTransformerLM
from pika_tpu.models.transducer import Transducer, TransducerConfig, init_transducer
from pika_tpu.models.las import LAS, LASConfig, init_las
