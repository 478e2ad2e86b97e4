"""LAS forward/backward rescoring of RNN-T N-best + score fusion.

Replaces the per-hypothesis Python loop of decode_transducer.py:137-164 and
decoder/transducer_decoder.py:219-253 with a single batched teacher-forced
scoring pass over all (utterance × n-best) hypotheses, and the rerank
fusion of egs/local/nbest_rerank.py (length-normalized weighted sum of
RNN-T + forward-LAS + backward-LAS scores).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pika_tpu.models.las import LAS


def _build_targets(tokens, lens, sos: int, eos: int, pad: int, reverse: bool):
    """hyps (N, Um) + lens (N,) → tgt (N, Um+2) = [SOS] hyp [EOS] [pad...]."""
    n, um = tokens.shape
    idx = jnp.arange(um)[None, :]
    if reverse:
        rev = lens[:, None] - 1 - idx
        src = jnp.take_along_axis(tokens, jnp.clip(rev, 0, um - 1), axis=1)
    else:
        src = tokens
    body = jnp.where(idx < lens[:, None], src, pad)
    tgt = jnp.concatenate(
        [jnp.full((n, 1), sos, tokens.dtype), body, jnp.full((n, 1), pad, tokens.dtype)],
        axis=1,
    )
    # place EOS right after the hypothesis
    pos = jnp.arange(um + 2)[None, :]
    tgt = jnp.where(pos == (lens + 1)[:, None], eos, tgt)
    return tgt


def las_score_hyps(
    model: LAS,
    variables,
    enc_out: jnp.ndarray,    # (B, T, C) LAS encoder input: the shared
                             # transducer encoder output (reference
                             # configuration) OR decode features for an
                             # independently-trained rescorer — whichever
                             # matches model.config.input_dim
    enc_lens: jnp.ndarray,   # (B,)
    tokens: jnp.ndarray,     # (B, N, Um) -1/pad padded
    lens: jnp.ndarray,       # (B, N)
    sos: int,
    eos: int,
    reverse: bool = False,
):
    """Teacher-forced per-hypothesis LAS log-prob.

    Returns (total (B, N), per_token (B, N, Um+1)) — per-token scores cover
    the hypothesis tokens plus the EOS step (matching the reference's
    ``las_rescore`` which sums log-probs of tgt[1:], transducer_decoder.py:219-237).
    """
    b, n, um = tokens.shape
    cfg = model.config
    pad = cfg.pad_idx
    flat_tokens = jnp.clip(tokens, 0, cfg.output_dim).reshape(b * n, um)
    flat_lens = lens.reshape(b * n)
    tgt = _build_targets(flat_tokens, flat_lens, sos, eos, pad, reverse)

    enc_rep = jnp.repeat(enc_out, n, axis=0)          # (B*N, T, C)
    len_rep = jnp.repeat(enc_lens, n, axis=0)
    outputs, _, _ = model.apply(variables, enc_rep, tgt, len_rep)
    logits = model.apply(variables, outputs, method=LAS.output_logits)
    lp = jax.nn.log_softmax(logits, axis=-1)          # (B*N, Um+1, V)
    targets = tgt[:, 1:]
    tok_scores = jnp.take_along_axis(lp, jnp.clip(targets, 0, cfg.output_dim - 1)[..., None], axis=-1)[..., 0]
    valid = jnp.arange(um + 1)[None, :] <= flat_lens[:, None]  # tokens + EOS
    tok_scores = jnp.where(valid & (targets != pad), tok_scores, 0.0)
    total = tok_scores.sum(axis=1)
    return total.reshape(b, n), tok_scores.reshape(b, n, um + 1)


def rerank_nbest(
    rnnt_scores: jnp.ndarray,           # (B, N)
    lens: jnp.ndarray,                  # (B, N)
    fw_scores: Optional[jnp.ndarray] = None,
    bw_scores: Optional[jnp.ndarray] = None,
    rnnt_scale: float = 1.0,
    fw_scale: float = 0.3,
    bw_scale: float = 0.7,
):
    """Length-normalized fusion; returns (best_idx (B,), fused (B, N)).
    Mirrors egs/local/nbest_rerank.py:28-39 (norm by hyp length, 0.001 for
    empty hypotheses)."""
    score = rnnt_scale * rnnt_scores
    if fw_scores is not None:
        score = score + fw_scale * fw_scores
    if bw_scores is not None:
        score = score + bw_scale * bw_scores
    norm = jnp.where(lens == 0, 0.001, lens.astype(score.dtype))
    fused = score / norm
    return jnp.argmax(fused, axis=1), fused
