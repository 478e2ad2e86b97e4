"""Transformer building blocks: pre-norm encoder layer, sinusoidal
positions, multi-head attention with optional clipped relative positions.

Functional equivalents of the reference's OpenNMT-derived modules
(trainer/model/modules/{transformer,multi_headed_attn,position_ffn}.py):

  * pre-norm residual layout: ``x + dropout(attn(LN(x)))`` then a
    post-norm FFN block ``LN → Linear → ReLU → Linear → +residual``
    (transformer.py:61-100, position_ffn.py:28-39)
  * masking fills logits with a large negative before softmax
    (multi_headed_attn.py:215-217); mask semantics: True = masked out
  * clipped relative-position embeddings added to keys (and values)
    (multi_headed_attn.py:9-41,186-229)

The attention core is a single einsum chain that XLA maps onto the MXU;
no handwritten kernel needed at these sequence lengths (≤ ~500 frames).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LN_EPS = 1e-6


def sinusoidal_positions(max_len: int, dim: int) -> np.ndarray:
    """Sinusoidal positional encodings (transformer.py:15-58)."""
    if dim % 2 != 0:
        raise ValueError(f"odd dim {dim} not supported for sin/cos encoding")
    pe = np.zeros((max_len, dim), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, dim, 2, dtype=np.float32) * -(math.log(10000.0) / dim))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class PositionalEncoding(nn.Module):
    dim: int
    dropout_rate: float = 0.0
    max_len: int = 5000

    @nn.compact
    def __call__(self, emb: jnp.ndarray, step: Optional[int] = None, deterministic: bool = True):
        if self.dim % 2 != 0:
            # the sin/cos interleave below needs an even model dim; fail
            # clearly (reference: sinusoidal_positions' ValueError,
            # modules/transformer.py:20-22) instead of a reshape mismatch
            raise ValueError(
                f"PositionalEncoding needs an even dim, got {self.dim}")
        # computed with jnp ops, NOT jnp.asarray(numpy table): a numpy
        # table lowers to a (max_len, dim) inline literal in the program
        # (10MB+ of MLIR at d_model 512), which breaks remote-compile
        # transports and bloats every cache key
        position = jnp.arange(self.max_len, dtype=jnp.float32)[:, None]
        div_term = jnp.exp(jnp.arange(0, self.dim, 2, dtype=jnp.float32)
                           * -(math.log(10000.0) / self.dim))
        ang = position * div_term
        pe = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1).reshape(
            self.max_len, self.dim)
        emb = emb * math.sqrt(self.dim)
        if step is None:
            emb = emb + pe[None, : emb.shape[1], :]
        else:
            emb = emb + pe[step][None, None, :]
        return nn.Dropout(self.dropout_rate)(emb, deterministic=deterministic)


def relative_positions_matrix(length: int, max_relative_positions: int) -> jnp.ndarray:
    """Clipped relative position ids shifted to [0, 2*max] (multi_headed_attn.py:9-25)."""
    r = jnp.arange(length)
    dist = r[None, :] - r[:, None]
    clipped = jnp.clip(dist, -max_relative_positions, max_relative_positions)
    return clipped + max_relative_positions


class MultiHeadedAttention(nn.Module):
    """Scaled dot-product MHA; ``mask`` is (B, Tq, Tk) bool, True = disallow.

    The attention matmuls run in ``mm_dtype`` (bf16 by default — the MXU's
    native mode, ~2x f32 throughput) with float32 score accumulation and a
    float32 softmax; set ``mm_dtype=None`` for full f32.
    """

    head_count: int
    model_dim: int
    dropout_rate: float = 0.1
    max_relative_positions: int = 0
    mm_dtype: Optional[jnp.dtype] = jnp.bfloat16
    # q_chunk > 0: scan over query blocks of this size with a
    # rematerialized body — never holds the full (B, H, T, T) score
    # tensor (or the (T, T, d_head) relative-position lookup) in HBM.
    # Exact same math as the full path; only the dropout RNG pattern
    # differs.  Pair with encoder remat for O(T·chunk) attention memory.
    q_chunk: int = 0
    # use_flash: route the softmax(QK^T)V core through the Pallas TPU
    # flash-attention kernel (online softmax, no (B, H, T, T) tensor ever
    # in HBM, fused fwd AND bwd).  Taken only when it is exact: no mask,
    # no relative positions, self-attention, and no attention-prob dropout
    # to apply (deterministic or dropout_rate 0, or cheap_dropout=False
    # falls back).  Off by default.
    use_flash: bool = False
    # cheap_dropout: in the full path, replace nn.Dropout on the (B,H,T,T)
    # probabilities with the chunked path's raw-bits threshold mask shared
    # across heads — identical expectation (unbiased), head-correlated
    # noise, 16x fewer random bits and no bernoulli->uniform broadcast
    # chain.  Off by default (reference RNG parity).
    cheap_dropout: bool = False

    @nn.compact
    def __call__(
        self,
        key: jnp.ndarray,
        value: jnp.ndarray,
        query: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        h, dim = self.head_count, self.model_dim
        d_head = dim // h
        b, tq = query.shape[0], query.shape[1]
        tk = key.shape[1]

        def split_heads(x):
            x = x.reshape(x.shape[0], x.shape[1], h, d_head).transpose(0, 2, 1, 3)
            return x.astype(self.mm_dtype) if self.mm_dtype is not None else x

        k = split_heads(nn.Dense(dim, name="linear_keys")(key))
        v = split_heads(nn.Dense(dim, name="linear_values")(value))
        q = split_heads(nn.Dense(dim, name="linear_query")(query))

        q = q / jnp.asarray(math.sqrt(d_head), q.dtype)

        m = self.max_relative_positions
        use_rel = m > 0 and tq == tk

        if self.q_chunk > 0 and tq > self.q_chunk:
            return self._chunked(q, k, v, mask, use_rel, deterministic,
                                 query.dtype, b, tq, tk, dim, d_head)

        no_prob_dropout = deterministic or self.dropout_rate == 0.0
        if (self.use_flash and mask is None and not use_rel and tq == tk
                and no_prob_dropout and jax.default_backend() == "tpu"):
            ctx = self._flash(q, k, v, b, tq, d_head, query.dtype)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, tq, dim)
            return nn.Dense(dim, name="final_linear")(ctx)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        if use_rel:
            rel_ids = relative_positions_matrix(tk, m)
            rel_k = nn.Embed(2 * m + 1, d_head, name="relative_positions_embeddings")(rel_ids)
            # scores += q · rel_k for each (query pos, key pos)
            scores = scores + jnp.einsum("bhqd,qkd->bhqk", q, rel_k)

        if mask is not None:
            scores = jnp.where(mask[:, None, :, :], -1e18, scores)

        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        if self.cheap_dropout and not deterministic and self.dropout_rate > 0:
            # see _chunked: unbiased bits-threshold dropout, mask shared
            # across heads — 16x fewer random bits than nn.Dropout on the
            # full (B, H, T, T) probabilities
            keep = 1.0 - self.dropout_rate
            thr = jnp.uint32(int(round(keep * 0xFFFFFFFF)))
            bits = jax.random.bits(self.make_rng("dropout"),
                                   (attn.shape[0], 1) + attn.shape[2:],
                                   jnp.uint32)
            attn = jnp.where(bits < thr, attn / keep, 0).astype(v.dtype)
        else:
            attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=jnp.float32)
        ctx = ctx.astype(query.dtype).transpose(0, 2, 1, 3).reshape(b, tq, dim)
        return nn.Dense(dim, name="final_linear")(ctx)

    def _flash(self, q, k, v, b, t, d_head, out_dtype):
        """Pallas TPU flash-attention core on (B, H, T, d) inputs already
        scaled by 1/sqrt(d_head).  Sequences are padded to the kernel's
        block multiple; padded positions ride a different segment id so
        they cannot absorb attention mass from real positions."""
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, SegmentIds, flash_attention)

        blk = 512 if t >= 512 else 128
        tp = -(-t // blk) * blk
        pad = ((0, 0), (0, 0), (0, tp - t), (0, 0))
        qp, kp, vp = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        seg = None
        if tp != t:
            ids = (jnp.arange(tp) >= t).astype(jnp.int32)[None, :]
            ids = jnp.broadcast_to(ids, (b, tp))
            seg = SegmentIds(q=ids, kv=ids)
        sizes = BlockSizes(
            block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
            block_q_major_dkv=blk, block_k_major_dkv=blk,
            block_k_dkv=blk, block_q_dkv=blk,
            block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
        )
        ctx = flash_attention(qp, kp, vp, segment_ids=seg, causal=False,
                              sm_scale=1.0, block_sizes=sizes)
        return ctx[:, :, :t].astype(out_dtype)

    def _chunked(self, q, k, v, mask, use_rel, deterministic, out_dtype,
                 b, tq, tk, dim, d_head):
        """Query-block scan: per block the scores are (B, H, qc, Tk) and the
        relative-position bias comes from a gather over the small
        (B, H, qc, 2m+1) q·E products — nothing quadratic in T is ever
        materialized.  The block body is rematerialized, so the backward
        pass recomputes instead of saving per-block probabilities."""
        qc = self.q_chunk
        m = self.max_relative_positions
        n_chunks = -(-tq // qc)
        tq_p = n_chunks * qc
        h = self.head_count

        q_p = jnp.pad(q, ((0, 0), (0, 0), (0, tq_p - tq), (0, 0)))
        # (n, B, H, qc, d) scan xs
        q_x = q_p.reshape(b, h, n_chunks, qc, d_head).transpose(2, 0, 1, 3, 4)

        rel_prod = None
        if use_rel:
            rel_table = nn.Embed(2 * m + 1, d_head,
                                 name="relative_positions_embeddings")(
                jnp.arange(2 * m + 1))
            rel_prod = jnp.einsum("nbhqd,rd->nbhqr", q_x, rel_table,
                                  preferred_element_type=jnp.float32)

        mask_x = None
        if mask is not None:
            mask_p = jnp.pad(mask, ((0, 0), (0, tq_p - tq), (0, 0)))
            mask_x = mask_p.reshape(b, n_chunks, qc, tk).transpose(1, 0, 2, 3)

        drop = (not deterministic) and self.dropout_rate > 0
        keys_x = (jax.random.split(self.make_rng("dropout"), n_chunks)
                  if drop else jnp.zeros((n_chunks, 2), jnp.uint32))
        starts_x = jnp.arange(n_chunks) * qc
        k_pos = jnp.arange(tk)

        def body(_, xs):
            q_c, rel_c, mask_c, key_c, start = xs
            scores = jnp.einsum("bhqd,bhkd->bhqk", q_c, k,
                                preferred_element_type=jnp.float32)
            if use_rel:
                dist = k_pos[None, :] - (start + jnp.arange(qc))[:, None]
                rel_ids = jnp.clip(dist, -m, m) + m          # (qc, Tk)
                scores = scores + jnp.take_along_axis(
                    rel_c, rel_ids[None, None], axis=-1)
            if mask_c is not None:
                scores = jnp.where(mask_c[:, None, :, :], -1e18, scores)
            attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
            if drop:
                # Two deliberate deltas from nn.Dropout, both for memory in
                # the rematerialized backward (where several iterations'
                # buffers coexist): (a) raw-bits threshold compare instead
                # of bernoulli — the bernoulli->uniform chain contains
                # full-shape constant broadcasts that XLA hoists out of the
                # scan loop, one 1.5GB live buffer per hoisted op at T=6000
                # (observed); (b) the mask is shared across heads (16x
                # smaller) — still unbiased dropout noise on the attention
                # probabilities, just correlated between heads.
                keep = 1.0 - self.dropout_rate
                thr = jnp.uint32(int(round(keep * 0xFFFFFFFF)))
                bits = jax.random.bits(
                    key_c, (attn.shape[0], 1) + attn.shape[2:], jnp.uint32)
                attn = jnp.where(bits < thr, attn / keep, 0).astype(v.dtype)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                             preferred_element_type=jnp.float32)
            return None, ctx

        xs = (q_x, rel_prod, mask_x, keys_x, starts_x)
        _, ctx = jax.lax.scan(jax.checkpoint(body), None, xs)
        # (n, B, H, qc, d) -> (B, H, Tq, d)
        ctx = ctx.transpose(1, 2, 0, 3, 4).reshape(b, h, tq_p, d_head)[:, :, :tq]
        ctx = ctx.astype(out_dtype).transpose(0, 2, 1, 3).reshape(b, tq, dim)
        return nn.Dense(dim, name="final_linear")(ctx)


class PositionwiseFeedForward(nn.Module):
    """LN → Linear(d_ff) → ReLU → dropout → Linear(d_model) → dropout → +x."""

    d_model: int
    d_ff: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        inter = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm")(x)
        inter = nn.relu(nn.Dense(self.d_ff, name="w_1")(inter))
        inter = nn.Dropout(self.dropout_rate)(inter, deterministic=deterministic)
        out = nn.Dense(self.d_model, name="w_2")(inter)
        out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)
        return out + x


class TransformerEncoderLayer(nn.Module):
    """Pre-norm self-attention block + FFN (transformer.py:61-100)."""

    d_model: int
    heads: int
    d_ff: int
    dropout_rate: float
    max_relative_positions: int = 0
    attn_q_chunk: int = 0   # see MultiHeadedAttention.q_chunk
    attn_flash: bool = False         # see MultiHeadedAttention.use_flash
    attn_cheap_dropout: bool = False  # see MultiHeadedAttention.cheap_dropout

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None, deterministic: bool = True) -> jnp.ndarray:
        x_norm = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm")(x)
        ctx = MultiHeadedAttention(
            self.heads, self.d_model, self.dropout_rate,
            self.max_relative_positions, q_chunk=self.attn_q_chunk,
            use_flash=self.attn_flash,
            cheap_dropout=self.attn_cheap_dropout,
            name="self_attn",
        )(x_norm, x_norm, x_norm, mask=mask, deterministic=deterministic)
        out = nn.Dropout(self.dropout_rate)(ctx, deterministic=deterministic) + x
        return PositionwiseFeedForward(self.d_model, self.d_ff, self.dropout_rate, name="feed_forward")(
            out, deterministic=deterministic
        )


def causal_mask(length: int) -> jnp.ndarray:
    """(1, L, L) bool mask, True above the diagonal (future positions)."""
    return jnp.triu(jnp.ones((1, length, length), dtype=bool), k=1)


def padding_mask(tokens: jnp.ndarray, padding_idx: int) -> jnp.ndarray:
    """(B, L, L) bool: key position is padding (conv_transformer_lm 64-69)."""
    pad = tokens == padding_idx  # (B, L)
    return jnp.broadcast_to(pad[:, None, :], (tokens.shape[0], tokens.shape[1], tokens.shape[1]))
