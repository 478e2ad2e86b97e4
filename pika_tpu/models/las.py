"""LAS (Listen-Attend-Spell) seq2seq model — the N-best rescorer.

TPU-native re-design of trainer/model/las.py (OpenNMT-derived): an LSTM
encoder, an optional pyramid-LSTM downsampler, and an input-feeding
attention decoder.  The reference steps Python per target token
(las.py:649-683); here the decoder is one ``lax.scan`` whose carry is
(stacked-LSTM state, input-feed vector), with the per-step attention a
batched matmul against the whole encoder context.

Covered features (flags of train_las_bmuf_otfaug.py:363-470):
  * dot / general / mlp (Bahdanau) attention with length masking
    (modules/global_attention.py:41-248)
  * coverage attention (global_attention.py:116-117,196-199 +
    las.py:670-673): keys see the accumulated attention mass from the
    second step on
  * source/target/both context gates (modules/context_gate.py)
  * pyramid downsampler (las.py:190-245)
  * scheduled sampling (InputFeedSamplingRNNDecoder, las.py:705-804)
  * decoder-only LM pretraining path (las.py:92-116)
  * enc_proj / dec_proj heads for CTC-aux and NLL losses

Conventions (egs/train_las_rescorer_bmuf_otfaug.sh:72-75): SOS=0, EOS is a
real vocabulary id, pad = ``pad_idx``; the embedding table has
``output_dim + 1`` rows with the extra row for padding.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pika_tpu.models.lstm import LSTM, lstm_cell_step


@dataclasses.dataclass(frozen=True)
class LASConfig:
    input_dim: int
    output_dim: int
    pad_idx: int
    rnn_size: int = 512
    enc_layers: int = 4
    dec_layers: int = 1
    embd_dim: int = 100
    brnn: bool = False
    dropout: float = 0.0
    attn_type: str = "mlp"              # 'dot' | 'general' | 'mlp'
    coverage_attn: bool = False         # global_attention.py:116-117,196-199
    rnn_type: str = "LSTM"              # 'LSTM' | 'SRU' (las.py:533-541)
    context_gate: Optional[str] = None  # None | 'source' | 'target' | 'both'
    use_downsampler: bool = False
    downsampler_layers: int = 1
    downsampler_rate: int = 2


class PyramidLSTM(nn.Module):
    """Temporal downsampling LSTM: stack ``rate`` consecutive frames then
    run an LSTM (las.py:190-245)."""

    hid_dim: int
    num_layers: int = 1
    rate: int = 2
    brnn: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths=None, deterministic: bool = True):
        b, t, d = x.shape
        out_len = (t - 1) // self.rate + 1
        pad = out_len * self.rate - t
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        x = x.reshape(b, out_len, d * self.rate)
        new_lengths = None if lengths is None else (lengths - 1) // self.rate + 1
        out, hidden = LSTM(
            self.hid_dim, self.num_layers, bidirectional=self.brnn,
            dropout_rate=self.dropout, name="rnn",
        )(x, lengths=new_lengths, deterministic=deterministic)
        return out, hidden, new_lengths


class LAS(nn.Module):
    """All decoder-side per-step parameters are created explicitly in
    ``setup`` so the token loop can be a plain ``jax.lax.scan`` over pure
    functions (no flax-module calls inside the scan body)."""

    config: LASConfig

    def setup(self):
        cfg = self.config
        h = cfg.rnn_size
        if cfg.rnn_type == "SRU":
            from pika_tpu.models.sru import SRU as _SRU

            dirs = 2 if cfg.brnn else 1
            self.encoder = _SRU(cfg.input_dim, h // dirs, cfg.enc_layers,
                                bidirectional=cfg.brnn,
                                dropout_rate=cfg.dropout, name="encoder")
        else:
            self.encoder = LSTM(h, cfg.enc_layers, bidirectional=cfg.brnn,
                                dropout_rate=cfg.dropout, name="encoder")
        self.enc_proj = nn.Dense(cfg.output_dim, name="enc_proj")
        if cfg.use_downsampler:
            self.downsampler = PyramidLSTM(
                h, cfg.downsampler_layers, cfg.downsampler_rate,
                cfg.brnn, cfg.dropout, name="downsampler",
            )
        self.embed = nn.Embed(cfg.output_dim + 1, cfg.embd_dim, name="embed")
        self.dec_proj = nn.Dense(cfg.output_dim, name="dec_proj")
        self.out_dropout = nn.Dropout(cfg.dropout)

        init_d = nn.initializers.lecun_normal()
        # input-feed stacked LSTM cells
        self.cell_wih = [
            self.param(f"dec_cell_{i}_wih", init_d,
                       (cfg.embd_dim + h if i == 0 else h, 4 * h))
            for i in range(cfg.dec_layers)
        ]
        self.cell_whh = [
            self.param(f"dec_cell_{i}_whh", nn.initializers.orthogonal(), (h, 4 * h))
            for i in range(cfg.dec_layers)
        ]
        self.cell_b = [
            self.param(f"dec_cell_{i}_b", nn.initializers.zeros, (4 * h,))
            for i in range(cfg.dec_layers)
        ]
        # attention parameters
        if cfg.attn_type == "general":
            self.attn_in = self.param("attn_linear_in", init_d, (h, h))
        elif cfg.attn_type == "mlp":
            self.attn_wq = self.param("attn_linear_query", init_d, (h, h))
            self.attn_bq = self.param("attn_linear_query_b", nn.initializers.zeros, (h,))
            self.attn_uc = self.param("attn_linear_context", init_d, (h, h))
            self.attn_v = self.param("attn_v", init_d, (h, 1))
        self.attn_out_w = self.param("attn_linear_out", init_d, (2 * h, h))
        if cfg.attn_type == "mlp":
            self.attn_out_b = self.param("attn_linear_out_b", nn.initializers.zeros, (h,))
        if cfg.coverage_attn:
            # linear_cover: Linear(1, dim, bias=False)
            # (global_attention.py:116-117) — projects each source
            # position's accumulated attention mass into the key space
            self.attn_cover_w = self.param("attn_linear_cover", init_d, (1, h))
        # context gate parameters
        if cfg.context_gate:
            in_dim = cfg.embd_dim + h  # gate sees [emb; feed] like _input_size
            self.gate_w = self.param("gate_w", init_d, (in_dim + 2 * h, h))
            self.gate_b = self.param("gate_b", nn.initializers.zeros, (h,))
            self.gate_src_w = self.param("gate_src_w", init_d, (h, h))
            self.gate_src_b = self.param("gate_src_b", nn.initializers.zeros, (h,))
            self.gate_tgt_w = self.param("gate_tgt_w", init_d, (in_dim + h, h))
            self.gate_tgt_b = self.param("gate_tgt_b", nn.initializers.zeros, (h,))

    # -- attention / gate as pure functions ------------------------------

    def _attend(self, query, context, ctx_pre, context_lengths,
                cover=None, cover_active=True):
        """query (B, H); context (B, T, H); ctx_pre = precomputed mlp
        context projection (or None).  ``cover`` (B, T) is the accumulated
        attention mass per source position; when coverage attention is on
        and ``cover_active`` (the reference applies coverage only from the
        second step — state.coverage starts None, las.py:644-645), the keys
        become ``tanh(context + linear_cover(cover))``
        (global_attention.py:196-199)."""
        cfg = self.config
        if cfg.coverage_attn and cover is not None:
            ctx_cov = jnp.tanh(context + cover[..., None] * self.attn_cover_w[0])
            context = jnp.where(cover_active, ctx_cov, context)
            if cfg.attn_type == "mlp":
                # the precomputed projection was of the unmodified keys;
                # coverage changes them per step, so reproject
                ctx_pre = jnp.einsum("bth,ho->bto", context, self.attn_uc)
        if cfg.attn_type == "general":
            scores = jnp.einsum("bh,bth->bt", query @ self.attn_in, context)
        elif cfg.attn_type == "dot":
            scores = jnp.einsum("bh,bth->bt", query, context)
        else:  # mlp
            wq = query @ self.attn_wq + self.attn_bq
            wquh = jnp.tanh(wq[:, None, :] + ctx_pre)
            scores = jnp.einsum("bth,ho->bto", wquh, self.attn_v)[..., 0]
        if context_lengths is not None:
            mask = jnp.arange(context.shape[1])[None, :] >= context_lengths[:, None]
            scores = jnp.where(mask, -1e18, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        c = jnp.einsum("bt,bth->bh", attn, context)
        out = jnp.concatenate([c, query], axis=-1) @ self.attn_out_w
        if cfg.attn_type == "mlp":
            out = out + self.attn_out_b
        else:
            out = jnp.tanh(out)
        return out, attn

    def _apply_gate(self, emb_feed, dec_state, attn_state):
        mode = self.config.context_gate
        z = jax.nn.sigmoid(
            jnp.concatenate([emb_feed, dec_state, attn_state], -1) @ self.gate_w + self.gate_b
        )
        proj_src = attn_state @ self.gate_src_w + self.gate_src_b
        proj_tgt = jnp.concatenate([emb_feed, dec_state], -1) @ self.gate_tgt_w + self.gate_tgt_b
        if mode == "source":
            return jnp.tanh(proj_tgt + z * proj_src)
        if mode == "target":
            return jnp.tanh(z * proj_tgt + proj_src)
        # BothContextGate: tanh((1-z)*target + z*source) (context_gate.py:86-88)
        return jnp.tanh((1.0 - z) * proj_tgt + z * proj_src)

    def _cells(self, x, h, c):
        new_h, new_c = [], []
        for li in range(self.config.dec_layers):
            hh, cc = lstm_cell_step(self.cell_wih[li], self.cell_whh[li], self.cell_b[li], x, h[li], c[li])
            new_h.append(hh)
            new_c.append(cc)
            x = hh
        return x, jnp.stack(new_h), jnp.stack(new_c)

    # -- encoder ----------------------------------------------------------

    def encode(self, src, lengths=None, train: bool = False):
        if self.config.rnn_type == "SRU":
            # SRU has no packed-sequence support (las.py:536-537); state
            # init for the decoder comes from the last c per layer.
            enc_out, c = self.encoder(src, deterministic=not train)
            layers = self.config.dec_layers
            dirs = 2 if self.config.brnn else 1
            h_like = jnp.tile(c[-1][None], (self.config.enc_layers * dirs, 1, 1))
            h_like = h_like[..., : self.config.rnn_size // dirs]
            hidden = (h_like, h_like)
        else:
            enc_out, hidden = self.encoder(src, lengths=lengths, deterministic=not train)
        ds_out, ds_hidden, ds_lengths = enc_out, hidden, lengths
        if self.config.use_downsampler:
            ds_out, ds_hidden, ds_lengths = self.downsampler(
                enc_out, lengths, deterministic=not train
            )
        return enc_out, hidden, ds_out, ds_hidden, ds_lengths

    def _init_dec_hidden(self, enc_hidden):
        """_fix_enc_hidden: merge directions, take last dec_layers
        (las.py:503-519)."""
        cfg = self.config
        h, c = enc_hidden
        if cfg.brnn:
            h = jnp.concatenate([h[0::2], h[1::2]], axis=-1)
            c = jnp.concatenate([c[0::2], c[1::2]], axis=-1)
        return h[-cfg.dec_layers:], c[-cfg.dec_layers:]

    # -- decoder ----------------------------------------------------------

    def decode(
        self,
        tgt_in: jnp.ndarray,
        context: jnp.ndarray,
        enc_hidden,
        context_lengths=None,
        sampling_prob: float = 0.0,
        sampling_key=None,
    ):
        cfg = self.config
        b, u = tgt_in.shape
        emb = self.embed(jnp.clip(tgt_in, 0, cfg.output_dim))
        h0, c0 = self._init_dec_hidden(enc_hidden)
        feed0 = jnp.zeros((b, cfg.rnn_size), emb.dtype)
        ctx_pre = None
        if cfg.attn_type == "mlp":
            ctx_pre = jnp.einsum("bth,ho->bto", context, self.attn_uc)
        # materialize the projection head's params before the scan so they
        # can be read as plain arrays inside the scan body
        _ = self.dec_proj(feed0)
        dp_k = self.dec_proj.variables["params"]["kernel"]
        dp_b = self.dec_proj.variables["params"]["bias"]
        emb_table = self.embed.embedding
        # sampling_prob may be a traced scalar; gate only on key presence
        # (toss < 0.0 is never true, so prob=0 is a no-op)
        use_sampling = sampling_key is not None
        key0 = sampling_key if sampling_key is not None else jax.random.PRNGKey(0)

        cover0 = jnp.zeros((b, context.shape[1]), emb.dtype)

        def step(carry, inp):
            h, c, feed, cover, key = carry
            emb_t, tok_t, idx = inp
            if use_sampling:
                key, k1 = jax.random.split(key)
                toss = jax.random.uniform(k1)
                prev_logits = feed @ dp_k + dp_b
                sampled = jnp.argmax(prev_logits, axis=-1).astype(tok_t.dtype)
                replace = (tok_t < cfg.pad_idx) & (tok_t > 1)
                use = (toss < sampling_prob) & (idx > 0)
                tok_eff = jnp.where(use & replace, sampled, tok_t)
                emb_t = jnp.where(
                    (use & replace)[:, None],
                    emb_table[jnp.clip(tok_eff, 0, cfg.output_dim)],
                    emb_t,
                )
            emb_feed = jnp.concatenate([emb_t, feed], axis=-1)
            rnn_out, h, c = self._cells(emb_feed, h, c)
            attn_out, attn = self._attend(
                rnn_out, context, ctx_pre, context_lengths,
                cover=cover if cfg.coverage_attn else None,
                cover_active=idx > 0,
            )
            if cfg.coverage_attn:
                # coverage = coverage + attn (las.py:670-673; starting at
                # zeros, step 0 leaves it == attn, the reference's init)
                cover = cover + attn
            out = self._apply_gate(emb_feed, rnn_out, attn_out) if cfg.context_gate else attn_out
            return (h, c, out, cover, key), (out, attn)

        (_, _, _, _, _), (outs, attns) = jax.lax.scan(
            step, (h0, c0, feed0, cover0, key0),
            (jnp.swapaxes(emb, 0, 1), jnp.swapaxes(tgt_in, 0, 1), jnp.arange(u)),
        )
        return jnp.swapaxes(outs, 0, 1), jnp.swapaxes(attns, 0, 1)

    def pretrain_decode(self, tgt_in: jnp.ndarray):
        """Decoder-only LM pretraining: no attention, zero feed
        (las.py:92-116)."""
        cfg = self.config
        b, _ = tgt_in.shape
        emb = self.embed(jnp.clip(tgt_in, 0, cfg.output_dim))
        h0 = jnp.zeros((cfg.dec_layers, b, cfg.rnn_size))
        c0 = jnp.zeros((cfg.dec_layers, b, cfg.rnn_size))
        feed0 = jnp.zeros((b, cfg.rnn_size), emb.dtype)

        def step(carry, emb_t):
            h, c, out = carry
            x, h, c = self._cells(jnp.concatenate([emb_t, out], -1), h, c)
            return (h, c, x), x

        _, outs = jax.lax.scan(step, (h0, c0, feed0), jnp.swapaxes(emb, 0, 1))
        return jnp.swapaxes(outs, 0, 1)

    # -- full forward -------------------------------------------------------

    def __call__(
        self,
        src: jnp.ndarray,
        tgt: jnp.ndarray,
        lengths=None,
        enable_dec: bool = True,
        enable_enc: bool = True,
        train: bool = False,
        sampling_prob: float = 0.0,
        sampling_key=None,
    ):
        """Returns (dec_outputs (B, U-1, H), attns, enc_out); the decoder
        consumes ``tgt[:, :-1]`` (las.py:70-71)."""
        tgt_in = tgt[:, :-1]
        if not enable_enc:
            return self.pretrain_decode(tgt_in), None, None
        enc_out, hidden, ds_out, ds_hidden, ds_lengths = self.encode(src, lengths, train)
        if not enable_dec:
            return None, None, enc_out
        outputs, attns = self.decode(
            tgt_in, ds_out, ds_hidden, ds_lengths, sampling_prob, sampling_key
        )
        if train and self.config.dropout > 0:
            outputs = self.out_dropout(outputs, deterministic=False)
        return outputs, attns, enc_out

    def output_logits(self, dec_outputs):
        return self.dec_proj(dec_outputs)

    def encoder_logits(self, enc_out):
        return self.enc_proj(enc_out)


def init_las(key, cfg: LASConfig, max_t: int = 12, max_u: int = 6):
    model = LAS(cfg)
    src = jnp.zeros((1, max_t, cfg.input_dim), jnp.float32)
    tgt = jnp.zeros((1, max_u), jnp.int32)

    def init_fn(mdl):
        out, _, enc = mdl(src, tgt, jnp.array([max_t]))
        mdl.output_logits(out)
        mdl.encoder_logits(enc)  # materialize the CTC-aux head too

    variables = model.init({"params": key}, method=init_fn)
    return model, variables
