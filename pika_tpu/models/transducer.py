"""Generic RNN-Transducer: encoder + prediction net + gated joint network.

TPU-native re-design of trainer/model/transducer.py.  The joint network is
*factorized*: ``fc1([x; y]) = fc1_x(x) + fc1_y(y)`` (same algebra, never
materializes the (B, T, U, 2H) concat), and the pre-activations are exposed
via :meth:`joint_factors` so the fused Pallas transducer loss can compute
per-(t,u) logits tile-by-tile without ever writing (B, T, U, V) to HBM.

Joint (transducer.py:98-111):
    h(t, u)   = tanh(fc1_x·x_t + fc1_y·y_u + b1) * sigmoid(g_x·x_t + g_y·y_u + bg)
    z(t, u)   = W2 · h(t, u) + b2
    out(t, u) = log_softmax(z)

Label convention (transducer.py:88-92): blank = 0 doubles as SOS, which is
prepended to targets before the prediction net, so dec output has U+1 steps.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pika_tpu.models.conv_transformer_lm import ConvTransformerLM
from pika_tpu.models.lstm import LSTM
from pika_tpu.models.tdnn_transformer import TDNNTransformerEncoder


@dataclasses.dataclass(frozen=True)
class TransducerConfig:
    input_dim: int
    vocab_size: int          # output_dim: labels 0..V-1, blank = 0
    hid_dim: int = 512       # rnn_size / joint dim
    encoder_type: str = "rnn"          # 'rnn' | 'tdnn_transformer'
    decoder_type: str = "rnn"          # 'rnn' | 'transformer'
    enc_layers: int = 2
    dec_layers: int = 2
    embd_dim: int = 300
    dropout: float = 0.0
    brnn: bool = False
    tdnn_nhid: int = 1024
    tdnn_layers: int = 9
    tdnn_transformer_dropout: float = 0.2  # rnnt_tdnn_transformer.py:64
    remat: bool = False      # rematerialize encoder transformer layers
    attn_chunk: int = 0      # chunked encoder attention (0 = full T x T)
    attn_flash: bool = False        # Pallas flash-attention (exact; only
    #                                 taken on deterministic passes)
    attn_cheap_dropout: bool = False  # head-shared bits-threshold attention
    #                                   dropout (unbiased; 16x fewer bits)
    dec_d_model: int = 512
    dec_heads: int = 8
    dec_d_ff: int = 2048
    # pruned-loss training (ops/rnnt_pruned.py): adds two cheap linear
    # heads whose ADDITIVE joint picks the per-frame label band that the
    # full gated joint is evaluated on.  Off by default — the flag only
    # adds parameters; the full-lattice fused loss stays available.
    simple_joint: bool = False

    @property
    def pad_id(self) -> int:
        # embedding has vocab_size+1 rows; the extra last row is padding
        # (reference: nn.Embedding(output_dim+1, ..., padding_idx=-1))
        return self.vocab_size


class Transducer(nn.Module):
    config: TransducerConfig

    def setup(self):
        cfg = self.config
        if cfg.encoder_type == "rnn":
            self.encoder = LSTM(
                cfg.hid_dim, num_layers=cfg.enc_layers,
                bidirectional=cfg.brnn, dropout_rate=cfg.dropout, name="encoder",
            )
        else:
            self.encoder = TDNNTransformerEncoder(
                output_dim=cfg.hid_dim, tdnn_nhid=cfg.tdnn_nhid,
                tdnn_layers=cfg.tdnn_layers,
                transformer_dropout=cfg.tdnn_transformer_dropout,
                remat=cfg.remat,
                attn_chunk=cfg.attn_chunk,
                attn_flash=cfg.attn_flash,
                attn_cheap_dropout=cfg.attn_cheap_dropout,
                name="encoder",
            )
        self.embed = nn.Embed(cfg.vocab_size + 1, cfg.embd_dim, name="embed")
        if cfg.decoder_type == "rnn":
            self.decoder = LSTM(
                cfg.hid_dim, num_layers=cfg.dec_layers, dropout_rate=cfg.dropout,
                name="decoder",
            )
        else:
            self.decoder = ConvTransformerLM(
                output_dim=cfg.hid_dim, d_model=cfg.dec_d_model,
                num_layers=cfg.dec_layers, heads=cfg.dec_heads,
                d_ff=cfg.dec_d_ff, dropout_rate=cfg.dropout, name="decoder",
            )
        h = cfg.hid_dim
        self.fc1_x = nn.Dense(h, use_bias=False, name="fc1_x")
        self.fc1_y = nn.Dense(h, name="fc1_y")
        self.gate_x = nn.Dense(h, use_bias=False, name="gate_x")
        self.gate_y = nn.Dense(h, name="gate_y")
        self.fc2 = nn.Dense(cfg.vocab_size, name="fc2")
        if cfg.simple_joint:
            self.simple_am = nn.Dense(cfg.vocab_size, name="simple_am")
            self.simple_lm = nn.Dense(cfg.vocab_size, name="simple_lm")

    # ---- components --------------------------------------------------

    def encode(self, x: jnp.ndarray, x_len: Optional[jnp.ndarray] = None, train: bool = False) -> jnp.ndarray:
        """Run the encoder: (B, T, D) → (B, T', H)."""
        if self.config.encoder_type == "rnn":
            out, _ = self.encoder(x, lengths=x_len, deterministic=not train)
            return out
        return self.encoder(x, train=train)

    def encoder_out_len(self, x_len):
        if self.config.encoder_type == "rnn":
            return x_len
        return self.encoder.output_length(x_len)

    def predict(
        self,
        y: jnp.ndarray,
        y_len: Optional[jnp.ndarray] = None,
        train: bool = False,
        prepend_sos: bool = True,
    ) -> jnp.ndarray:
        """Prediction network over labels: (B, U) → (B, U+1, H).

        Pads (positions ≥ y_len) are mapped to the padding embedding row
        before the net, matching padding_idx semantics.
        """
        cfg = self.config
        b, u = y.shape
        if prepend_sos:
            sos = jnp.zeros((b, 1), dtype=y.dtype)
            y_in = jnp.concatenate([sos, y], axis=1)
            in_len = None if y_len is None else y_len + 1
        else:
            y_in = y
            in_len = y_len
        u_in = y_in.shape[1]
        if in_len is not None:
            pad_pos = jnp.arange(u_in)[None, :] >= in_len[:, None]
            y_in = jnp.where(pad_pos, cfg.pad_id, y_in)
        else:
            pad_pos = None
        emb = self.embed(jnp.clip(y_in, 0, cfg.pad_id))
        if cfg.decoder_type == "rnn":
            out, _ = self.decoder(emb, deterministic=not train)
            return out
        return self.decoder(emb, pad_positions=pad_pos, deterministic=not train)

    def predict_step(self, y_tok: jnp.ndarray, state: Tuple[jnp.ndarray, jnp.ndarray]):
        """One incremental prediction-net step (RNN decoder only):
        y_tok (B,) int32, state = (h, c) each (layers, B, H) → (out, new_state)."""
        from pika_tpu.models.lstm import lstm_stack_step

        emb = self.embed(jnp.clip(y_tok, 0, self.config.pad_id))
        dec_params = self.variables["params"]["decoder"]
        top, h, c = lstm_stack_step(dec_params, self.config.dec_layers, emb, state[0], state[1])
        return top, (h, c)

    def predict_last(self, tokens: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
        """Prediction-net state after a full prefix: (B, Um) tokens with
        per-row lengths → (B, H) output at position ``lens`` (SOS included).
        The transformer decoder's incremental step — a full re-forward with
        the state gathered at the prefix end (transducer_decoder.py:152-171).
        """
        dec = self.predict(tokens, lens)
        return jnp.take_along_axis(dec, lens[:, None, None], axis=1)[:, 0, :]

    def joint_factors(self, enc_out: jnp.ndarray, dec_out: jnp.ndarray):
        """Pre-activations for the fused loss: returns
        (ax, gx) over T and (ay, gy) over U (biases folded into the y side)."""
        ax = self.fc1_x(enc_out)
        gx = self.gate_x(enc_out)
        ay = self.fc1_y(dec_out)
        gy = self.gate_y(dec_out)
        return ax, gx, ay, gy

    def joint_step(self, enc_hid: jnp.ndarray, dec_hid: jnp.ndarray) -> jnp.ndarray:
        """Joint over aligned pairs: enc_hid/dec_hid (..., H) → logits (..., V).

        Used by greedy/beam decoding where each beam has one (t, u) pair
        (decoder/transducer_decoder.py:173-177)."""
        ax, gx = self.joint_enc_factors(enc_hid)
        ay, gy = self.joint_dec_factors(dec_hid)
        return self.joint_from_factors(ax, gx, ay, gy)

    def joint_enc_factors(self, enc_out: jnp.ndarray):
        """Encoder-side joint pre-activations (ax, gx) over all frames.

        Decode-loop hoist: these depend only on the encoder output, so the
        decoders compute them ONCE per utterance and gather per-beam frames
        inside the loop instead of re-projecting every step."""
        return self.fc1_x(enc_out), self.gate_x(enc_out)

    def joint_dec_factors(self, dec_hid: jnp.ndarray):
        """Prediction-side joint pre-activations (ay, gy); biases live here."""
        return self.fc1_y(dec_hid), self.gate_y(dec_hid)

    def joint_from_factors(self, ax, gx, ay, gy) -> jnp.ndarray:
        """Logits from cached factors — identical algebra to joint_step."""
        return self.fc2(jnp.tanh(ax + ay) * jax.nn.sigmoid(gx + gy))

    def joint_logits(self, enc_out: jnp.ndarray, dec_out: jnp.ndarray) -> jnp.ndarray:
        """Full lattice logits (B, T, U+1, V) — oracle/debug path only; the
        training hot path uses the fused Pallas loss over joint_factors."""
        ax, gx, ay, gy = self.joint_factors(enc_out, dec_out)
        pre = ax[:, :, None, :] + ay[:, None, :, :]
        gate = gx[:, :, None, :] + gy[:, None, :, :]
        return self.fc2(jnp.tanh(pre) * jax.nn.sigmoid(gate))

    def simple_factors(self, enc_out: jnp.ndarray, dec_out: jnp.ndarray):
        """Additive-joint heads for pruned-loss training: (am (B, T, V),
        lm (B, U+1, V)) with ``logit(t, u) = am[t] + lm[u]``
        (ops/rnnt_pruned.py; requires config.simple_joint)."""
        return self.simple_am(enc_out), self.simple_lm(dec_out)

    def joint_params(self):
        """(W2, b2) of the output projection, for the fused loss kernel."""
        p = self.variables["params"]["fc2"]
        return p["kernel"], p["bias"]

    # ---- full forward -------------------------------------------------

    def __call__(
        self,
        x: jnp.ndarray,
        y: jnp.ndarray,
        x_len: Optional[jnp.ndarray] = None,
        y_len: Optional[jnp.ndarray] = None,
        softmax: bool = True,
        train: bool = False,
    ) -> jnp.ndarray:
        """Full-lattice forward: log-probs (B, T', U+1, V)."""
        enc = self.encode(x, x_len, train=train)
        dec = self.predict(y, y_len, train=train)
        if self.config.simple_joint and self.is_initializing():
            # touch the pruned-loss heads so init creates their params
            self.simple_factors(enc, dec)
        out = self.joint_logits(enc, dec)
        if softmax:
            out = jax.nn.log_softmax(out, axis=-1)
        return out


def init_transducer(key, cfg: TransducerConfig, max_t: int = 8, max_u: int = 4):
    """Initialize parameters with dummy shapes; returns (model, variables)."""
    model = Transducer(cfg)
    x = jnp.zeros((1, max_t, cfg.input_dim), jnp.float32)
    y = jnp.zeros((1, max_u), jnp.int32)
    variables = model.init(
        {"params": key, "dropout": jax.random.fold_in(key, 1)},
        x, y,
        jnp.array([max_t]), jnp.array([max_u]),
    )
    return model, variables
