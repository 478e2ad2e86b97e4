"""RNN-Transducer loss — TPU-native replacement for warp-rnnt CUDA.

The reference calls ``warp_rnnt.RNNTLoss(blank=0, reduction='sum')`` on a
fully materialized (B, T, U+1, V) log-prob lattice
(trainer/train_transducer_bmuf_otfaug.py:58,97-99).  Here the loss comes in
three tiers:

1. ``rnnt_loss_numpy``          — slow, literal DP; the test oracle.
2. ``rnnt_loss_from_logprobs``  — vectorized XLA DP over a given lattice
   (scan over T; the within-row recurrence is solved in closed form with a
   cumulative log-sum-exp, so each row is one associative_scan, not a U-loop).
3. ``rnnt_loss_fused``          — the production path: consumes the
   *factorized* joint pre-activations (ax, gx over T; ay, gy over U) plus
   the output projection, computes only three per-(t,u) channels
   (logsumexp, blank logit, label logit) chunk-by-chunk, and never writes
   the (B, T, U, V) logits to HBM.  custom_vjp recomputes channels per
   chunk in the backward pass.  This removes the reference's ``TU_limit``
   memory hack at its root (SURVEY.md §5.7).

DP convention (blank = 0):
    alpha[t, u] = logaddexp(alpha[t-1, u] + blank(t-1, u),
                            alpha[t, u-1] + emit(t, u-1))
    loss_b      = -(alpha[T_b-1, U_b] + blank(T_b-1, U_b))
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e30


# ---------------------------------------------------------------------------
# 1. NumPy oracle
# ---------------------------------------------------------------------------

def rnnt_loss_numpy(log_probs: np.ndarray, labels: np.ndarray, t_len: np.ndarray, u_len: np.ndarray) -> np.ndarray:
    """Literal per-element DP; returns per-utterance negative log-likelihood."""
    b, t_max, u1_max, _ = log_probs.shape
    losses = np.zeros(b, dtype=np.float64)
    for i in range(b):
        t_i, u_i = int(t_len[i]), int(u_len[i])
        lp = log_probs[i].astype(np.float64)
        alpha = np.full((t_i, u_i + 1), -np.inf)
        alpha[0, 0] = 0.0
        for t in range(t_i):
            for u in range(u_i + 1):
                cands = []
                if t > 0:
                    cands.append(alpha[t - 1, u] + lp[t - 1, u, 0])
                if u > 0:
                    cands.append(alpha[t, u - 1] + lp[t, u - 1, labels[i, u - 1]])
                if cands:
                    alpha[t, u] = np.logaddexp.reduce(cands)
        losses[i] = -(alpha[t_i - 1, u_i] + lp[t_i - 1, u_i, 0])
    return losses


# ---------------------------------------------------------------------------
# 2. XLA DP over (blank, emit) channel lattices
# ---------------------------------------------------------------------------

def _cum_logsumexp(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jax.lax.associative_scan(jnp.logaddexp, x, axis=axis)


def _row_update(alpha_prev, blank_prev, emit_row):
    """Solve alpha[t, :] given alpha[t-1, :] in closed form.

    Recurrence x_u = logaddexp(f_u, x_{u-1} + g_{u-1}) with
    f = alpha_prev + blank_prev, g = emit_row has solution
    x = G + cumlogsumexp(f - G), where G_u = sum_{j<u} g_j.
    """
    f = alpha_prev + blank_prev
    g_shift = jnp.concatenate([jnp.zeros_like(emit_row[..., :1]), emit_row[..., :-1]], axis=-1)
    big_g = jnp.cumsum(g_shift, axis=-1)
    return big_g + _cum_logsumexp(f - big_g, axis=-1)


def rnnt_alpha(blank_lp: jnp.ndarray, emit_lp: jnp.ndarray, u_len: jnp.ndarray) -> jnp.ndarray:
    """Forward DP.  blank_lp: (B, T, U+1); emit_lp: (B, T, U+1) where
    emit_lp[..., u] is the log-prob of emitting label u+1 (last column is
    masked).  Returns alpha (B, T, U+1)."""
    b, t_max, u1 = blank_lp.shape
    u_pos = jnp.arange(u1)[None, :]
    emit_lp = jnp.where(u_pos[:, None, :] < u_len[:, None, None], emit_lp, NEG)

    # row 0: cumulative emissions
    g_shift = jnp.concatenate([jnp.zeros((b, 1)), emit_lp[:, 0, :-1]], axis=-1)
    alpha0 = jnp.cumsum(g_shift, axis=-1)
    alpha0 = jnp.where(u_pos <= u_len[:, None], alpha0, NEG)

    def step(alpha_prev, lps):
        blank_prev, emit_row = lps
        alpha_t = _row_update(alpha_prev, blank_prev, emit_row)
        alpha_t = jnp.maximum(alpha_t, NEG)  # keep padding finite
        return alpha_t, alpha_t

    blank_tm = jnp.swapaxes(blank_lp, 0, 1)
    emit_tm = jnp.swapaxes(emit_lp, 0, 1)
    _, rows = jax.lax.scan(step, alpha0, (blank_tm[:-1], emit_tm[1:]))
    return jnp.concatenate([alpha0[None], rows], axis=0).swapaxes(0, 1)


def rnnt_beta(blank_lp: jnp.ndarray, emit_lp: jnp.ndarray, t_len: jnp.ndarray, u_len: jnp.ndarray) -> jnp.ndarray:
    """Backward DP: beta[t, u] = log P(path from (t, u) to the end),
    including the final blank at (T-1, U).  beta[0, 0] = log-likelihood.

    Within-row reverse recurrence beta[t,u] = logaddexp(f_u, beta[t,u+1] +
    emit(t,u)) is solved in closed form: reversing u, x'_v =
    logaddexp(f'_v, x'_{v-1} + g'_v) has solution x' = G' +
    cumlogsumexp(f' - G') with *inclusive* G' = cumsum(g').  Emissions at
    invalid columns are masked to 0 in G' (paths through them are already
    killed by f' = NEG at the invalid cells).
    """
    b, t_max, u1 = blank_lp.shape
    u_pos = jnp.arange(u1)[None, :]
    # emissions used inside the row recurrence: 0 where invalid
    g_valid = jnp.where(u_pos[:, None, :] < u_len[:, None, None], emit_lp, 0.0)

    def rev_step(beta_next, inputs):
        blank_row, g_row, t_idx = inputs
        time_ok = (t_idx < (t_len - 1))[:, None]
        f = jnp.where(time_ok, blank_row + beta_next, NEG)
        exit_cell = (t_idx == (t_len - 1))[:, None] & (u_pos == u_len[:, None])
        f = jnp.where(exit_cell, blank_row, f)
        f = jnp.where(u_pos > u_len[:, None], NEG, f)
        f = jnp.maximum(f, NEG)
        f_rev = f[..., ::-1]
        g_rev = g_row[..., ::-1]
        big_g = jnp.cumsum(g_rev, axis=-1)  # inclusive
        x_rev = big_g + _cum_logsumexp(f_rev - big_g, axis=-1)
        beta_t = jnp.maximum(x_rev[..., ::-1], NEG)
        return beta_t, beta_t

    blank_tm = jnp.swapaxes(blank_lp, 0, 1)
    g_tm = jnp.swapaxes(g_valid, 0, 1)
    t_ids = jnp.arange(t_max)
    init = jnp.full((b, u1), NEG)
    _, rows = jax.lax.scan(
        rev_step, init, (blank_tm, g_tm, t_ids), reverse=True
    )
    return rows.swapaxes(0, 1)


def _gather_channels(log_probs: jnp.ndarray, labels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(blank_lp, emit_lp) from a full lattice.  emit column u uses label
    y_{u+1}; the final column (u = U) has no emission and is NEG-masked by
    the DP."""
    blank_lp = log_probs[..., 0]
    b, t, u1, _ = log_probs.shape
    lbl = jnp.concatenate([labels, jnp.zeros((b, 1), labels.dtype)], axis=1)
    lbl = jnp.clip(lbl, 0, log_probs.shape[-1] - 1)
    emit_lp = jnp.take_along_axis(log_probs, lbl[:, None, :, None].astype(jnp.int32), axis=-1)[..., 0]
    emit_lp = jnp.broadcast_to(emit_lp, (b, t, u1))
    return blank_lp, emit_lp


def rnnt_loss_from_logprobs(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    t_len: jnp.ndarray,
    u_len: jnp.ndarray,
) -> jnp.ndarray:
    """Per-utterance RNN-T loss from a full (B, T, U+1, V) log-prob lattice.

    Differentiable via JAX autodiff (the scan is reverse-mode friendly);
    use ``rnnt_loss_fused`` for the memory-efficient training path.
    """
    blank_lp, emit_lp = _gather_channels(log_probs, labels)
    alpha = rnnt_alpha(blank_lp, emit_lp, u_len)
    b = log_probs.shape[0]
    bi = jnp.arange(b)
    # t_len <= 0 would wrap the gather to the last padded row and return a
    # garbage-but-finite loss; clamp the index and zero the loss instead
    tl = jnp.maximum(t_len, 1)
    final_alpha = alpha[bi, tl - 1, u_len]
    final_blank = blank_lp[bi, tl - 1, u_len]
    return jnp.where(t_len > 0, -(final_alpha + final_blank), 0.0)


def rnnt_occupancy(
    blank_lp: jnp.ndarray,
    emit_lp: jnp.ndarray,
    labels: jnp.ndarray,
    t_len: jnp.ndarray,
    u_len: jnp.ndarray,
    alpha: jnp.ndarray = None,
):
    """Posterior occupancy gradients of the summed loss w.r.t. the channel
    log-probs: returns (g_blank, g_emit), each (B, T, U+1), where
    dL/d blank_lp = g_blank etc.  Used by the fused backward pass."""
    b, t_max, u1 = blank_lp.shape
    if alpha is None:
        alpha = rnnt_alpha(blank_lp, emit_lp, u_len)
    beta = rnnt_beta(blank_lp, emit_lp, t_len, u_len)
    bi = jnp.arange(b)
    tl = jnp.maximum(t_len, 1)  # empty utterances: `valid` zeroes every cell
    log_like = alpha[bi, tl - 1, u_len] + blank_lp[bi, tl - 1, u_len]

    t_pos = jnp.arange(t_max)[None, :, None]
    u_pos = jnp.arange(u1)[None, None, :]
    valid = (t_pos < t_len[:, None, None]) & (u_pos <= u_len[:, None, None])

    # blank: alpha[t,u] + beta[t+1,u]; at the exit cell beta_next := 0
    beta_next_t = jnp.concatenate([beta[:, 1:], jnp.full((b, 1, u1), NEG)], axis=1)
    exit_cell = (t_pos == (t_len[:, None, None] - 1)) & (u_pos == u_len[:, None, None])
    beta_next_t = jnp.where(exit_cell, 0.0, beta_next_t)
    g_blank = -jnp.exp(jnp.clip(alpha + blank_lp + beta_next_t - log_like[:, None, None], NEG, 30.0))
    g_blank = jnp.where(valid, g_blank, 0.0)

    # emit: alpha[t,u] + beta[t,u+1]
    beta_next_u = jnp.concatenate([beta[:, :, 1:], jnp.full((b, t_max, 1), NEG)], axis=2)
    g_emit = -jnp.exp(jnp.clip(alpha + emit_lp + beta_next_u - log_like[:, None, None], NEG, 30.0))
    g_emit = jnp.where(valid & (u_pos < u_len[:, None, None]), g_emit, 0.0)
    return g_blank, g_emit


# ---------------------------------------------------------------------------
# 3. Fused streaming loss over joint factors
# ---------------------------------------------------------------------------

def _chunk_channels(ax_c, gx_c, ay, gy, w2, b2, labels_ext):
    """Per-(t,u) channels for a chunk of T: returns (lse, z_blank, z_label),
    each (B, Tc, U+1).  ``labels_ext`` is labels with a trailing 0 column.

    This is the function the Pallas kernel replaces: everything here lives
    tile-resident in VMEM on TPU; XLA's version materializes only
    (B, Tc, U+1, V) transiently per chunk.
    """
    pre = ax_c[:, :, None, :] + ay[:, None, :, :]
    gate = gx_c[:, :, None, :] + gy[:, None, :, :]
    h = jnp.tanh(pre) * jax.nn.sigmoid(gate)
    z = jnp.einsum("btuh,hv->btuv", h, w2, preferred_element_type=jnp.float32) + b2
    lse = jax.scipy.special.logsumexp(z, axis=-1)
    z_blank = z[..., 0]
    z_label = jnp.take_along_axis(
        z, labels_ext[:, None, :, None].astype(jnp.int32), axis=-1
    )[..., 0]
    z_label = jnp.broadcast_to(z_label, z_blank.shape)
    return lse, z_blank, z_label


def _all_channels(ax, gx, ay, gy, w2, b2, labels_ext, chunk: int):
    t_max = ax.shape[1]
    n_chunks = -(-t_max // chunk)
    pad_t = n_chunks * chunk - t_max
    ax_p = jnp.pad(ax, ((0, 0), (0, pad_t), (0, 0)))
    gx_p = jnp.pad(gx, ((0, 0), (0, pad_t), (0, 0)))
    ax_ck = ax_p.reshape(ax.shape[0], n_chunks, chunk, ax.shape[2]).swapaxes(0, 1)
    gx_ck = gx_p.reshape(gx.shape[0], n_chunks, chunk, gx.shape[2]).swapaxes(0, 1)

    def one(c):
        return _chunk_channels(c[0], c[1], ay, gy, w2, b2, labels_ext)

    lse, zb, zy = jax.lax.map(one, (ax_ck, gx_ck))
    def unck(x):
        x = x.swapaxes(0, 1).reshape(ax.shape[0], n_chunks * chunk, -1)
        return x[:, :t_max]
    return unck(lse), unck(zb), unck(zy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def rnnt_loss_fused(ax, gx, ay, gy, w2, b2, labels, t_len, u_len, chunk=32, backend="xla"):
    loss, _ = _fused_fwd_impl(ax, gx, ay, gy, w2, b2, labels, t_len, u_len, chunk, backend)
    return loss


def _fused_fwd_impl(ax, gx, ay, gy, w2, b2, labels, t_len, u_len, chunk, backend):
    b = labels.shape[0]
    labels_ext = jnp.concatenate([labels, jnp.zeros((b, 1), labels.dtype)], axis=1)
    labels_ext = jnp.clip(labels_ext, 0, w2.shape[1] - 1)
    if backend == "pallas":
        from pika_tpu.ops.rnnt_pallas import joint_channels_pallas, kernel_blocks

        lse, zb, zy = joint_channels_pallas(ax, gx, ay, gy, w2, b2, labels_ext,
                                            **kernel_blocks(bwd=False))
    else:
        lse, zb, zy = _all_channels(ax, gx, ay, gy, w2, b2, labels_ext, chunk)
    blank_lp = zb - lse
    emit_lp = zy - lse
    alpha = rnnt_alpha(blank_lp, emit_lp, u_len)
    bi = jnp.arange(b)
    tl = jnp.maximum(t_len, 1)
    loss = -(alpha[bi, tl - 1, u_len] + blank_lp[bi, tl - 1, u_len])
    loss = jnp.where(t_len > 0, loss, 0.0)
    return loss, (lse, zb, zy, labels_ext, alpha)


def _fused_fwd(ax, gx, ay, gy, w2, b2, labels, t_len, u_len, chunk, backend):
    loss, (lse, zb, zy, labels_ext, alpha) = _fused_fwd_impl(
        ax, gx, ay, gy, w2, b2, labels, t_len, u_len, chunk, backend
    )
    # alpha rides along as a residual: one (B, T, U+1) f32 buffer (the same
    # footprint as each saved channel) saves the backward one sequential
    # T-length forward scan
    return loss, (ax, gx, ay, gy, w2, b2, labels_ext, t_len, u_len,
                  lse, zb, zy, alpha)


def _fused_bwd(chunk, backend, res, g_loss):
    ax, gx, ay, gy, w2, b2, labels_ext, t_len, u_len, lse, zb, zy, alpha = res
    blank_lp = zb - lse
    emit_lp = zy - lse
    labels = labels_ext[:, :-1]
    g_blank, g_emit = rnnt_occupancy(blank_lp, emit_lp, labels, t_len, u_len,
                                     alpha=alpha)
    # scale per-utterance upstream gradient
    g_blank = g_blank * g_loss[:, None, None]
    g_emit = g_emit * g_loss[:, None, None]
    # channel cotangents: L = f(zb - lse, zy - lse)
    d_zb = g_blank
    d_zy = g_emit
    d_lse = -(g_blank + g_emit)

    def match_dtypes(grads):
        """custom_vjp cotangents must match primal dtypes (bf16 inputs
        under mixed precision get bf16 cotangents)."""
        return tuple(
            g.astype(p.dtype) for g, p in zip(grads, (ax, gx, ay, gy, w2, b2))
        )

    if backend == "pallas":
        from pika_tpu.ops.rnnt_pallas import joint_channels_pallas_bwd, kernel_blocks

        grads = joint_channels_pallas_bwd(
            ax, gx, ay, gy, w2, b2, labels_ext, lse, d_lse, d_zb, d_zy,
            **kernel_blocks(bwd=True)
        )
        return match_dtypes(grads) + (None, None, None)

    # chunked recompute-and-vjp over T
    t_max = ax.shape[1]
    n_chunks = -(-t_max // chunk)
    pad_t = n_chunks * chunk - t_max

    def pad_ck(x):
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
        return x.reshape(x.shape[0], n_chunks, chunk, x.shape[2]).swapaxes(0, 1)

    ax_ck, gx_ck = pad_ck(ax), pad_ck(gx)
    dl_ck = pad_ck(d_lse)
    db_ck = pad_ck(d_zb)
    dy_ck = pad_ck(d_zy)

    def bwd_one(c):
        ax_c, gx_c, dl_c, db_c, dy_c = c
        _, vjp = jax.vjp(
            lambda a, g, ayy, gyy, w, bb: _chunk_channels(a, g, ayy, gyy, w, bb, labels_ext),
            ax_c, gx_c, ay, gy, w2, b2,
        )
        return vjp((dl_c, db_c, dy_c))

    d_axc, d_gxc, d_ay, d_gy, d_w2, d_b2 = jax.lax.map(
        bwd_one, (ax_ck, gx_ck, dl_ck, db_ck, dy_ck)
    )

    def unck(x):
        x = x.swapaxes(0, 1).reshape(ax.shape[0], n_chunks * chunk, -1)
        return x[:, :t_max]

    d_ax = unck(d_axc)
    d_gx = unck(d_gxc)
    return match_dtypes(
        (d_ax, d_gx, d_ay.sum(0), d_gy.sum(0), d_w2.sum(0), d_b2.sum(0))
    ) + (None, None, None)


rnnt_loss_fused.defvjp(_fused_fwd, _fused_bwd)
