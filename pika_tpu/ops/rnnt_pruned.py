"""Pruned RNN-T loss — banded-lattice transducer training.

Shrinks the loss roofline itself.  The full fused loss is already at ~97%
of its matmul bound (BASELINE.md), because it computes the joint output
projection over EVERY (t, u) lattice cell: 3·2·B·T·(U+1)·H·V MACs for
fwd+bwd.  The pruned loss computes the full nonlinear joint only on a
per-frame band of ``s_range`` label positions chosen from a cheap additive
"simple" joint — the publicly documented k2/icefall pruned-transducer
recipe ("Pruned RNN-T for fast, memory-efficient ASR training",
Interspeech 2022), re-derived here for XLA.  The reference has no
counterpart: it trains the full lattice with warp-rnnt
(trainer/train_transducer_bmuf_otfaug.py:58,97-99).

Pieces:

1. **Simple joint**: ``logit(t, u, v) = am[t, v] + lm[u, v]`` from two
   cheap linear heads.  Its per-(t, u) normalizer
   ``logsumexp_v(am + lm) = log(exp(am) @ exp(lm)^T)`` is ONE batched
   (T, V) x (V, U+1) matmul in exp space (max-subtracted for stability) —
   the (B, T, U+1, V) lattice never exists.
2. **rnnt_loss_simple**: the standard DP (``rnnt_alpha``) on those
   channels; trained as an auxiliary term so the simple heads stay
   predictive of good alignments.
3. **prune_ranges**: per-(b, t) band starts from the simple-loss
   posterior occupancy — windowed-occupancy argmax, then a monotone clip
   scan enforcing ``0 <= s_begin[t+1] - s_begin[t] <= s_range - 1``,
   ``s_begin[0] = 0``, and an end envelope that keeps ``u_len`` reachable
   by the last valid row.  All under ``stop_gradient``.
4. **rnnt_loss_pruned**: gathers the prediction-side joint factors on the
   band, computes the full gated joint on (B, T, s_range) cells
   chunk-by-chunk (``jax.checkpoint`` per chunk keeps autodiff residuals
   at band-channel size), and runs a banded DP with per-row shifts.

Feasibility: a banded path can emit at most ``s_range - 1`` labels per
frame, so utterances with ``(T-1) * (s_range-1) < U`` have no in-band
path; their pruned loss is returned as 0 (the simple loss still trains
them).  The flagship regime (T' ≈ 250, U ≈ 40, s_range 5) is far from the
bound.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pika_tpu.ops.rnnt_loss import (NEG, _cum_logsumexp, rnnt_alpha,
                                    rnnt_occupancy)


# ---------------------------------------------------------------------------
# 1-2. simple (additive) joint + its loss
# ---------------------------------------------------------------------------

def simple_channels(am: jnp.ndarray, lm: jnp.ndarray, labels: jnp.ndarray):
    """(blank_lp, emit_lp), each (B, T, U+1), of the additive joint.

    am: (B, T, V) float32; lm: (B, U+1, V) float32; labels: (B, U).
    """
    b = labels.shape[0]
    v = am.shape[-1]
    labels_ext = jnp.concatenate(
        [labels, jnp.zeros((b, 1), labels.dtype)], axis=1)
    labels_ext = jnp.clip(labels_ext, 0, v - 1).astype(jnp.int32)

    # normalizer as an exp-space matmul (MXU), max-subtracted per row
    amx = jax.lax.stop_gradient(jnp.max(am, axis=-1))
    lmx = jax.lax.stop_gradient(jnp.max(lm, axis=-1))
    ea = jnp.exp(am - amx[..., None])
    el = jnp.exp(lm - lmx[..., None])
    z = jnp.einsum("btv,buv->btu", ea, el,
                   preferred_element_type=jnp.float32)
    lse = jnp.log(jnp.maximum(z, 1e-30)) + amx[:, :, None] + lmx[:, None, :]

    am_blank = am[..., 0][:, :, None]                        # (B, T, 1)
    lm_blank = lm[..., 0][:, None, :]                        # (B, 1, U+1)
    am_y = jnp.take_along_axis(am, labels_ext[:, None, :], axis=2)  # (B,T,U+1)
    lm_y = jnp.take_along_axis(
        lm, labels_ext[:, :, None], axis=2)[..., 0][:, None, :]     # (B,1,U+1)
    blank_lp = am_blank + lm_blank - lse
    emit_lp = am_y + lm_y - lse
    return blank_lp, emit_lp


def rnnt_loss_simple(
    am: jnp.ndarray,
    lm: jnp.ndarray,
    labels: jnp.ndarray,
    t_len: jnp.ndarray,
    u_len: jnp.ndarray,
):
    """Per-utterance RNN-T loss of the additive joint.  Returns
    (losses (B,), (blank_lp, emit_lp)) — the channels feed
    ``prune_ranges``."""
    blank_lp, emit_lp = simple_channels(am, lm, labels)
    alpha = rnnt_alpha(blank_lp, emit_lp, u_len)
    b = am.shape[0]
    bi = jnp.arange(b)
    tl = jnp.maximum(t_len, 1)
    loss = -(alpha[bi, tl - 1, u_len] + blank_lp[bi, tl - 1, u_len])
    return jnp.where(t_len > 0, loss, 0.0), (blank_lp, emit_lp)


# ---------------------------------------------------------------------------
# 3. band selection
# ---------------------------------------------------------------------------

def prune_ranges(
    blank_lp: jnp.ndarray,
    emit_lp: jnp.ndarray,
    labels: jnp.ndarray,
    t_len: jnp.ndarray,
    u_len: jnp.ndarray,
    s_range: int,
) -> jnp.ndarray:
    """Band starts s_begin (B, T) int32 from simple-joint posteriors.

    Guarantees (used by the banded DP):
      * ``s_begin[:, 0] == 0``
      * ``0 <= s_begin[:, t+1] - s_begin[:, t] <= s_range - 1``
      * ``s_begin <= max(0, u_len + 1 - s_range)``
      * when feasible, the last valid row's band covers ``u_len``
        (end envelope); infeasible utterances stay monotone but cannot
        cover — the loss guards them to 0.
    """
    blank_lp = jax.lax.stop_gradient(blank_lp)
    emit_lp = jax.lax.stop_gradient(emit_lp)
    b, t_max, u1 = blank_lp.shape

    g_blank, g_emit = rnnt_occupancy(blank_lp, emit_lp, labels, t_len, u_len)
    gamma = -(g_blank + g_emit)                   # posterior mass, >= 0
    cs = jnp.cumsum(gamma, axis=2)
    # window sum W[., s] = cs[min(s + r - 1, U)] - cs[s - 1]
    hi = jnp.minimum(jnp.arange(u1) + s_range - 1, u1 - 1)
    w_hi = jnp.take(cs, hi, axis=2)
    w_lo = jnp.concatenate([jnp.zeros((b, t_max, 1)), cs[..., :-1]], axis=2)
    s_raw = jnp.argmax(w_hi - w_lo, axis=2).astype(jnp.int32)   # (B, T)

    cap = jnp.maximum(u_len + 1 - s_range, 0).astype(jnp.int32)  # (B,)
    t_pos = jnp.arange(t_max, dtype=jnp.int32)[None, :]
    remaining = jnp.maximum(t_len[:, None] - 1 - t_pos, 0)
    env = jnp.maximum(cap[:, None] - remaining * (s_range - 1), 0)

    def step(prev, x):
        raw, e, c = x
        lo = jnp.maximum(prev, e)
        hi_ = jnp.minimum(prev + s_range - 1, c)
        s = jnp.minimum(jnp.maximum(raw, lo), jnp.maximum(hi_, lo))
        return s, s

    xs = (s_raw[:, 1:].swapaxes(0, 1), env[:, 1:].swapaxes(0, 1),
          jnp.broadcast_to(cap, (t_max - 1, b)))
    _, rows = jax.lax.scan(step, jnp.zeros((b,), jnp.int32), xs)
    s_begin = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32), rows.swapaxes(0, 1)], axis=1)
    return jax.lax.stop_gradient(s_begin)


# ---------------------------------------------------------------------------
# 4. banded joint channels + banded DP
# ---------------------------------------------------------------------------

def _band_chunk(ax_c, gx_c, sb_c, ay, gy, w2, b2, labels_ext, s_range: int):
    """Full gated joint on one T-chunk's band: returns (lse, z_blank,
    z_label), each (B, Tc, s_range).  Mirrors rnnt_loss._chunk_channels
    with the prediction-side factors gathered at u = s_begin + j."""
    b, tc, h = ax_c.shape
    u1 = ay.shape[1]
    u_idx = jnp.clip(sb_c[..., None] + jnp.arange(s_range), 0, u1 - 1)
    flat = u_idx.reshape(b, tc * s_range)
    ay_b = jnp.take_along_axis(ay, flat[..., None], axis=1).reshape(
        b, tc, s_range, h)
    gy_b = jnp.take_along_axis(gy, flat[..., None], axis=1).reshape(
        b, tc, s_range, h)
    lbl_b = jnp.take_along_axis(labels_ext, flat, axis=1).reshape(
        b, tc, s_range)
    pre = ax_c[:, :, None, :] + ay_b
    gate = gx_c[:, :, None, :] + gy_b
    hh = jnp.tanh(pre) * jax.nn.sigmoid(gate)
    z = jnp.einsum("btsh,hv->btsv", hh, w2,
                   preferred_element_type=jnp.float32) + b2
    lse = jax.scipy.special.logsumexp(z, axis=-1)
    zb = z[..., 0]
    zy = jnp.take_along_axis(z, lbl_b[..., None].astype(jnp.int32),
                             axis=-1)[..., 0]
    return lse, zb, zy


def _pruned_channels(ax, gx, ay, gy, w2, b2, labels_ext, s_begin,
                     s_range: int, chunk: int):
    b, t_max, h = ax.shape
    n_chunks = -(-t_max // chunk)
    pad_t = n_chunks * chunk - t_max

    def ck3(x):
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
        return x.reshape(b, n_chunks, chunk, x.shape[2]).swapaxes(0, 1)

    sb = jnp.pad(s_begin, ((0, 0), (0, pad_t)))
    sb_ck = sb.reshape(b, n_chunks, chunk).swapaxes(0, 1)

    fn = jax.checkpoint(
        lambda c: _band_chunk(c[0], c[1], c[2], ay, gy, w2, b2,
                              labels_ext, s_range))
    lse, zb, zy = jax.lax.map(fn, (ck3(ax), ck3(gx), sb_ck))

    def unck(x):
        x = x.swapaxes(0, 1).reshape(b, n_chunks * chunk, s_range)
        return x[:, :t_max]

    return unck(lse), unck(zb), unck(zy)


def rnnt_alpha_banded(blank_b, emit_b, s_begin, t_len, u_len):
    """Forward DP restricted to the band.  blank_b/emit_b: (B, T, s)
    log-probs at lattice cell (t, u = s_begin[t] + j).  Returns alpha
    (B, T, s); off-band paths carry NEG."""
    b, t_max, s = blank_b.shape
    j = jnp.arange(s)
    u_grid = s_begin[..., None] + j[None, None, :]
    cell_ok = u_grid <= u_len[:, None, None]
    emit_ok = (u_grid < u_len[:, None, None]) & cell_ok
    # beta-style masking: invalid emits contribute 0 inside the row solve
    # (their source/target cells are NEG-killed; u-invalidity is monotone
    # in j, so a masked emit can never ferry mass to a valid cell)
    g = jnp.where(emit_ok, emit_b, 0.0)

    g0_shift = jnp.concatenate([jnp.zeros((b, 1)), g[:, 0, :-1]], axis=1)
    alpha0 = jnp.cumsum(g0_shift, axis=1)
    alpha0 = jnp.where(cell_ok[:, 0], alpha0, NEG)

    d = s_begin[:, 1:] - s_begin[:, :-1]                     # (B, T-1)

    def step(alpha_prev, inp):
        blank_prev_row, g_row, d_row, cellok_row, t_idx = inp
        idx = j[None, :] + d_row[:, None]
        in_range = idx < s
        safe = jnp.clip(idx, 0, s - 1)
        fa = jnp.take_along_axis(alpha_prev, safe, axis=1)
        fb = jnp.take_along_axis(blank_prev_row, safe, axis=1)
        time_ok = (t_idx < t_len)[:, None]
        f = jnp.where(in_range & time_ok, fa + fb, NEG)
        f = jnp.maximum(f, NEG)
        g_shift = jnp.concatenate([jnp.zeros((b, 1)), g_row[:, :-1]], axis=1)
        big_g = jnp.cumsum(g_shift, axis=1)
        x = big_g + _cum_logsumexp(f - big_g, axis=1)
        x = jnp.where(cellok_row & time_ok, jnp.maximum(x, NEG), NEG)
        return x, x

    t_ids = jnp.arange(1, t_max)
    xs = (blank_b[:, :-1].swapaxes(0, 1), g[:, 1:].swapaxes(0, 1),
          d.swapaxes(0, 1), cell_ok[:, 1:].swapaxes(0, 1), t_ids)
    _, rows = jax.lax.scan(step, alpha0, xs)
    return jnp.concatenate([alpha0[:, None], rows.swapaxes(0, 1)], axis=1)


def rnnt_loss_pruned(
    ax: jnp.ndarray,
    gx: jnp.ndarray,
    ay: jnp.ndarray,
    gy: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    labels: jnp.ndarray,
    t_len: jnp.ndarray,
    u_len: jnp.ndarray,
    s_begin: jnp.ndarray,
    s_range: int,
    chunk: int = 64,
) -> jnp.ndarray:
    """Per-utterance pruned RNN-T loss over the factorized gated joint
    (same factor convention as ``rnnt_loss_fused``).  ``s_begin`` comes
    from ``prune_ranges`` (or zeros with s_range > U for an exact run).
    Differentiable by autodiff: the band channels recompute per chunk
    (jax.checkpoint), the DP's residuals are band-sized."""
    b = labels.shape[0]
    labels_ext = jnp.concatenate(
        [labels, jnp.zeros((b, 1), labels.dtype)], axis=1)
    labels_ext = jnp.clip(labels_ext, 0, w2.shape[1] - 1).astype(jnp.int32)
    lse, zb, zy = _pruned_channels(ax, gx, ay, gy, w2, b2, labels_ext,
                                   s_begin, s_range, chunk)
    blank_b = zb - lse
    emit_b = zy - lse
    alpha = rnnt_alpha_banded(blank_b, emit_b, s_begin, t_len, u_len)
    bi = jnp.arange(b)
    tl = jnp.maximum(t_len, 1)
    j_exit = u_len - s_begin[bi, tl - 1]
    safe_j = jnp.clip(j_exit, 0, s_range - 1)
    a_exit = alpha[bi, tl - 1, safe_j]
    bl_exit = blank_b[bi, tl - 1, safe_j]
    ok = (j_exit >= 0) & (j_exit < s_range) & (t_len > 0) & (a_exit > NEG / 2)
    return jnp.where(ok, -(a_exit + bl_exit), 0.0)


# ---------------------------------------------------------------------------
# NumPy oracle
# ---------------------------------------------------------------------------

def rnnt_loss_pruned_numpy(log_probs, labels, t_len, u_len, s_begin,
                           s_range: int):
    """Literal banded DP oracle: the full-lattice DP with off-band cells
    removed.  log_probs: (B, T, U+1, V) numpy."""
    b, t_max, u1, _ = log_probs.shape
    losses = np.zeros(b, np.float64)
    for i in range(b):
        t_i, u_i = int(t_len[i]), int(u_len[i])
        lp = log_probs[i].astype(np.float64)
        alpha = np.full((t_i, u_i + 1), -np.inf)

        def in_band(t, u):
            return s_begin[i, t] <= u < s_begin[i, t] + s_range

        if in_band(0, 0):
            alpha[0, 0] = 0.0
        for t in range(t_i):
            for u in range(u_i + 1):
                if not in_band(t, u):
                    alpha[t, u] = -np.inf
                    continue
                cands = [alpha[t, u]] if (t, u) == (0, 0) else []
                if t > 0 and in_band(t - 1, u):
                    cands.append(alpha[t - 1, u] + lp[t - 1, u, 0])
                if u > 0 and in_band(t, u - 1):
                    cands.append(alpha[t, u - 1] + lp[t, u - 1, labels[i, u - 1]])
                if cands:
                    alpha[t, u] = np.logaddexp.reduce(cands)
        final = alpha[t_i - 1, u_i] + lp[t_i - 1, u_i, 0]
        losses[i] = -final if np.isfinite(final) else 0.0
    return losses
