"""Pallas TPU kernels for the fused RNN-T joint — the warp-rnnt replacement.

Computes, for every lattice cell (t, u), only the three channels the
transducer DP needs — logsumexp over the vocabulary, the blank logit, and
the target-label logit — without ever writing the (B, T, U, V) logits to
HBM.  The joint's gated-MLP hidden vector h(t, u) lives tile-resident in
VMEM; the (rows, H) @ (H, V-tile) projection runs on the MXU in bf16 with
f32 accumulation; the logsumexp is maintained online (flash-attention
style) across V tiles.

Memory per batch:  the FORWARD materializes 3·B·T·U floats instead of
B·T·U·V — for the flagship config (V = 6268) a ~2000x reduction in lattice
HBM traffic, removing the reference's TU_limit OOM hack at its root
(loader/otf_utt_loader.py:245-247).  The BACKWARD additionally caches the
joint hidden h as (B, U1, T, H) bf16 in HBM (see joint_channels_pallas_bwd)
— still ~V/H ≈ 6x smaller than the logits lattice, but the term that
matters when sizing batches.

Grid layout (forward + grad-in kernel): (B, T-tiles, U-tiles, V-tiles),
V innermost so the online max/sum accumulators live in VMEM scratch.
The weight-gradient kernel inverts the grid (V outermost) so each dW2
tile stays resident while all (b, t, u) tiles accumulate into it.

Channel outputs are produced (B, U1, T)-transposed so T is the lane
dimension; the wrapper transposes back.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def kernel_blocks(bwd: bool) -> dict:
    """Tile-size overrides for the fused-joint kernels, from the
    environment (perf experiments without code edits):
      PIKA_LOSS_BLOCK_T / PIKA_LOSS_BLOCK_U — both kernels
      PIKA_LOSS_BLOCK_V — forward only (the backward's V-tile is adaptive
      to the scoped-VMEM budget unless PIKA_LOSS_BLOCK_V_BWD is set).
    Defaults match the shipped values (128, 8, 512 fwd / adaptive bwd)."""
    import os

    out = {}
    if os.environ.get("PIKA_LOSS_BLOCK_T"):
        out["block_t"] = int(os.environ["PIKA_LOSS_BLOCK_T"])
    if os.environ.get("PIKA_LOSS_BLOCK_U"):
        out["block_u"] = int(os.environ["PIKA_LOSS_BLOCK_U"])
    key = "PIKA_LOSS_BLOCK_V_BWD" if bwd else "PIKA_LOSS_BLOCK_V"
    if os.environ.get(key):
        out["block_v"] = int(os.environ[key])
    return out


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(labels_ref,  # scalar prefetch: (B, U1p) int32 in SMEM
                ax_ref, gx_ref, ay_ref, gy_ref, w2_ref, b2_ref,
                lse_ref, zb_ref, zy_ref,
                h_scr, m_scr, s_scr, zb_scr, zy_scr,
                *, block_u: int, block_v: int, mm_dtype):
    b = pl.program_id(0)
    ui = pl.program_id(2)
    vi = pl.program_id(3)
    nv = pl.num_programs(3)
    block_t = ax_ref.shape[1]

    @pl.when(vi == 0)
    def _init():
        # upcast to f32: Mosaic's bf16 transcendental lowering is flaky,
        # and the gate math wants f32 anyway.  h strips are stacked
        # u-major into one (block_u*block_t, H) matrix so the projection
        # below is a single large MXU matmul instead of block_u small ones.
        ax = ax_ref[0].astype(jnp.float32)
        gx = gx_ref[0].astype(jnp.float32)
        for u in range(block_u):
            pre = jnp.tanh(ax + ay_ref[0, u, :].astype(jnp.float32)[None, :])
            gate = jax.nn.sigmoid(gx + gy_ref[0, u, :].astype(jnp.float32)[None, :])
            h_scr[pl.ds(u * block_t, block_t), :] = (pre * gate).astype(mm_dtype)
        m_scr[...] = jnp.full_like(m_scr, NEG)
        s_scr[...] = jnp.zeros_like(s_scr)
        zy_scr[...] = jnp.zeros_like(zy_scr)

    w2 = w2_ref[...]
    b2 = b2_ref[0]
    # one large (rows, H) @ (H, Vt) MXU matmul; per-u bookkeeping on
    # static row slices (no reshapes — Mosaic-friendly)
    z_all = jax.lax.dot_general(
        h_scr[...], w2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2[None, :]
    col0 = jax.lax.broadcasted_iota(jnp.int32, (block_t, block_v), 1) + vi * block_v
    for u in range(block_u):
        z = z_all[u * block_t : (u + 1) * block_t, :]
        m_old = m_scr[u]
        m_new = jnp.maximum(m_old, jnp.max(z, axis=1))
        s_scr[u] = s_scr[u] * jnp.exp(m_old - m_new) + jnp.sum(
            jnp.exp(z - m_new[:, None]), axis=1
        )
        m_scr[u] = m_new
        label = labels_ref[b, ui * block_u + u]
        zy_scr[u] = zy_scr[u] + jnp.sum(jnp.where(col0 == label, z, 0.0), axis=1)

        @pl.when(vi == 0)
        def _blank():
            zb_scr[u] = z[:, 0]

    @pl.when(vi == nv - 1)
    def _flush():
        lse_ref[0] = m_scr[...] + jnp.log(s_scr[...])
        zb_ref[0] = zb_scr[...]
        zy_ref[0] = zy_scr[...]


def _pad_inputs(ax, gx, ay, gy, w2, b2, labels_ext, block_t, block_u, block_v):
    b, t, h = ax.shape
    u1 = ay.shape[1]
    v = w2.shape[1]
    tp, u1p, vp = _ceil_to(t, block_t), _ceil_to(u1, block_u), _ceil_to(v, block_v)
    ax = jnp.pad(ax, ((0, 0), (0, tp - t), (0, 0)))
    gx = jnp.pad(gx, ((0, 0), (0, tp - t), (0, 0)))
    ay = jnp.pad(ay, ((0, 0), (0, u1p - u1), (0, 0)))
    gy = jnp.pad(gy, ((0, 0), (0, u1p - u1), (0, 0)))
    w2 = jnp.pad(w2, ((0, 0), (0, vp - v)))
    # padded vocab columns get a hugely negative bias so they vanish in lse
    b2 = jnp.pad(b2, (0, vp - v), constant_values=NEG)
    labels_ext = jnp.pad(labels_ext, ((0, 0), (0, u1p - u1)))
    return ax, gx, ay, gy, w2, b2, labels_ext, (t, u1, v, tp, u1p, vp)


@functools.partial(
    jax.jit, static_argnames=("block_t", "block_u", "block_v", "mm_dtype")
)
def joint_channels_pallas(
    ax, gx, ay, gy, w2, b2, labels_ext,
    block_t: int = 128, block_u: int = 8, block_v: int = 512,
    mm_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(lse, z_blank, z_label), each (B, T, U+1) float32.

    block_v stays fixed at 512: the forward's scratch is only the three
    online accumulators (no dh tile), and 512 compiles and runs fine at
    every measured shape incl. B32/Tp250 and B8/Tp1500 — the adaptive
    shrink in joint_channels_pallas_bwd is for the backward's dh scratch.
    """
    b = ax.shape[0]
    h = ax.shape[2]
    ax, gx, ay, gy, w2, b2, labels_ext, (t, u1, v, tp, u1p, vp) = _pad_inputs(
        ax, gx, ay, gy, w2, b2, labels_ext, block_t, block_u, block_v
    )
    w2 = w2.astype(mm_dtype)
    grid = (b, tp // block_t, u1p // block_u, vp // block_v)

    out_shape = [jax.ShapeDtypeStruct((b, u1p, tp), jnp.float32)] * 3
    out_spec = pl.BlockSpec(
        (1, block_u, block_t), lambda bb, ti, ui, vi, *_: (bb, ui, ti),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_t, h), lambda bb, ti, ui, vi, *_: (bb, ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_t, h), lambda bb, ti, ui, vi, *_: (bb, ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_u, h), lambda bb, ti, ui, vi, *_: (bb, ui, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_u, h), lambda bb, ti, ui, vi, *_: (bb, ui, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, block_v), lambda bb, ti, ui, vi, *_: (0, vi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_v), lambda bb, ti, ui, vi, *_: (0, vi), memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 3,
        scratch_shapes=[
            pltpu.VMEM((block_u * block_t, h), mm_dtype),  # stacked h strips
            pltpu.VMEM((block_u, block_t), jnp.float32),   # running max
            pltpu.VMEM((block_u, block_t), jnp.float32),   # running sumexp
            pltpu.VMEM((block_u, block_t), jnp.float32),   # blank logits
            pltpu.VMEM((block_u, block_t), jnp.float32),   # label logits
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, block_u=block_u, block_v=block_v, mm_dtype=mm_dtype
    )
    lse_t, zb_t, zy_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(labels_ext, ax, gx, ay, gy, w2, b2.reshape(1, -1))

    def untr(x):  # (B, U1p, Tp) → (B, T, U1)
        return x.swapaxes(1, 2)[:, :t, :u1]

    return untr(lse_t), untr(zb_t), untr(zy_t)


# ---------------------------------------------------------------------------
# backward kernel 1: gradients to ax/gx/ay/gy
# ---------------------------------------------------------------------------

def _bwd_in_kernel(labels_ref,
                   h_ref, ax_ref, gx_ref, ay_ref, gy_ref, w2_ref, b2_ref,
                   lse_ref, dl_ref, db_ref, dy_ref,
                   dax_ref, dgx_ref, day_ref, dgy_ref,
                   dh_scr,
                   *, block_u: int, block_v: int, mm_dtype):
    b = pl.program_id(0)
    ti = pl.program_id(1)
    ui = pl.program_id(2)
    vi = pl.program_id(3)
    nv = pl.num_programs(3)
    block_t = ax_ref.shape[1]

    @pl.when(vi == 0)
    def _init():
        dh_scr[...] = jnp.zeros_like(dh_scr)

    w2 = w2_ref[...]
    b2 = b2_ref[0]
    col0 = jax.lax.broadcasted_iota(jnp.int32, (block_t, block_v), 1) + vi * block_v
    for u in range(block_u):
        # h(t, u) cached to HBM once by the wrapper (bf16) — removes the
        # per-tile tanh/sigmoid recompute of round 1
        z = jax.lax.dot_general(
            h_ref[0, u], w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + b2[None, :]
        p = jnp.exp(jnp.minimum(z - lse_ref[0, u, :][:, None], 40.0))
        dz = dl_ref[0, u, :][:, None] * p
        dz = jnp.where(col0 == 0, dz + db_ref[0, u, :][:, None], dz)
        label = labels_ref[b, ui * block_u + u]
        dz = jnp.where(col0 == label, dz + dy_ref[0, u, :][:, None], dz)
        dh_scr[u] = (dh_scr[u].astype(jnp.float32) + jax.lax.dot_general(
            dz.astype(mm_dtype), w2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )).astype(dh_scr.dtype)

    @pl.when(vi == nv - 1)
    def _flush():
        ax = ax_ref[0].astype(jnp.float32)
        gx = gx_ref[0].astype(jnp.float32)
        dax_acc = jnp.zeros((block_t, ax_ref.shape[2]), jnp.float32)
        dgx_acc = jnp.zeros((block_t, ax_ref.shape[2]), jnp.float32)
        for u in range(block_u):
            th = jnp.tanh(ax + ay_ref[0, u, :].astype(jnp.float32)[None, :])
            ga = jax.nn.sigmoid(gx + gy_ref[0, u, :].astype(jnp.float32)[None, :])
            dh = dh_scr[u].astype(jnp.float32)
            dpre = dh * ga * (1.0 - th * th)
            dgate = dh * th * ga * (1.0 - ga)
            dax_acc += dpre
            dgx_acc += dgate
            day_ref[0, 0, u, :] = jnp.sum(dpre, axis=0)
            dgy_ref[0, 0, u, :] = jnp.sum(dgate, axis=0)

        @pl.when(ui == 0)
        def _set():
            dax_ref[0] = dax_acc
            dgx_ref[0] = dgx_acc

        @pl.when(ui != 0)
        def _acc():
            dax_ref[0] = dax_ref[0] + dax_acc
            dgx_ref[0] = dgx_ref[0] + dgx_acc


# ---------------------------------------------------------------------------
# backward kernel 2: gradients to w2 / b2 (V-major grid, dW2 tile resident)
# ---------------------------------------------------------------------------

def _bwd_w_kernel(labels_ref,
                  h_ref, w2_ref, b2_ref,
                  lse_ref, dl_ref, db_ref, dy_ref,
                  dw2_ref, db2_ref,
                  *, block_u: int, block_v: int, mm_dtype):
    vi = pl.program_id(0)
    b = pl.program_id(1)
    ti = pl.program_id(2)
    ui = pl.program_id(3)
    block_t = h_ref.shape[2]
    first = (b == 0) & (ti == 0) & (ui == 0)

    @pl.when(first)
    def _init():
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    w2 = w2_ref[...]
    b2 = b2_ref[0]
    col0 = jax.lax.broadcasted_iota(jnp.int32, (block_t, block_v), 1) + vi * block_v
    dw_acc = jnp.zeros_like(dw2_ref)
    db_acc = jnp.zeros((1, block_v), jnp.float32)
    for u in range(block_u):
        # cached h removes the V-outermost grid's per-(u, v-tile)
        # tanh/sigmoid recompute (it ran nv times per cell in round 1)
        h = h_ref[0, u]
        z = jax.lax.dot_general(
            h, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + b2[None, :]
        # clamp like _bwd_in_kernel: padded rows carry lse = 0, so an
        # unclamped exp can overflow to inf and 0*inf = NaN poisons dW2
        p = jnp.exp(jnp.minimum(z - lse_ref[0, u, :][:, None], 40.0))
        dz = dl_ref[0, u, :][:, None] * p
        dz = jnp.where(col0 == 0, dz + db_ref[0, u, :][:, None], dz)
        label = labels_ref[b, ui * block_u + u]
        dz = jnp.where(col0 == label, dz + dy_ref[0, u, :][:, None], dz)
        dw_acc = dw_acc + jax.lax.dot_general(
            h, dz.astype(mm_dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db_acc = db_acc + jnp.sum(dz, axis=0)[None, :]
    dw2_ref[...] = dw2_ref[...] + dw_acc
    db2_ref[...] = db2_ref[...] + db_acc


def joint_channels_pallas_bwd(
    ax, gx, ay, gy, w2, b2, labels_ext, lse, d_lse, d_zb, d_zy,
    block_t: int = 128, block_u: int = 8, block_v: int = 0,
    mm_dtype=jnp.bfloat16,
):
    """Gradients (d_ax, d_gx, d_ay, d_gy, d_w2, d_b2) given channel
    cotangents.  ``lse`` is re-used from the forward pass; z is recomputed
    tile-by-tile."""
    if block_v == 0:
        # Mosaic's scoped-VMEM stack for these kernels grows slowly with
        # the total B*Tp extent and crosses the 16MB limit at block_v=512
        # past B*Tp~2k (observed: B16/Tp256@512 overflows by 832K,
        # B8/Tp768@512 and B24/Tp768@256 overflow by <1MB; B8/Tp256@512,
        # B8/Tp768@256 and B24/Tp768@128 fit); shrink the V-tile for long
        # utterances / big batches.  (block_t must stay a multiple of 128
        # and block_v's floor is 128 — they are minor dims of the
        # channel/weight blocks.)
        btp = ax.shape[0] * _ceil_to(ax.shape[1], block_t)
        block_v = 512 if btp <= 2048 else (256 if btp <= 8192 else 128)
    # VMEM budget note: the input-grad kernel's dh scratch plus the
    # double-buffered h/ax/gx/w2 inputs and dax/dgx output accumulators sit
    # close to the 16MB scoped-VMEM limit; see the scratch_shapes comment.
    bsz, t, h = ax.shape
    u1 = ay.shape[1]
    v = w2.shape[1]
    ax_p, gx_p, ay_p, gy_p, w2_p, b2_p, labels_p, (t_, u1_, v_, tp, u1p, vp) = _pad_inputs(
        ax, gx, ay, gy, w2, b2, labels_ext, block_t, block_u, block_v
    )
    w2_p = w2_p.astype(mm_dtype)

    def tr(x):  # (B, T, U1) → (B, U1p, Tp) padded transpose
        x = jnp.pad(x, ((0, 0), (0, tp - t), (0, u1p - u1)))
        return x.swapaxes(1, 2)

    lse_t, dl_t, db_t, dy_t = tr(lse), tr(d_lse), tr(d_zb), tr(d_zy)
    nt, nu, nv = tp // block_t, u1p // block_u, vp // block_v

    # h(t, u) computed ONCE (one fused XLA elementwise pass, bf16 to HBM)
    # and consumed by both backward kernels, instead of recomputing
    # tanh/sigmoid per grid cell — in the V-outermost weight-grad kernel
    # the recompute ran nv times per (b, t, u) tile (ROUND1 follow-up).
    h_cache = (
        jnp.tanh(ax_p[:, None, :, :] + ay_p[:, :, None, :])
        * jax.nn.sigmoid(gx_p[:, None, :, :] + gy_p[:, :, None, :])
    ).astype(mm_dtype)  # (B, U1p, Tp, H)

    x_spec = pl.BlockSpec((1, block_t, h), lambda bb, ti, ui, vi, *_: (bb, ti, 0), memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((1, block_u, h), lambda bb, ti, ui, vi, *_: (bb, ui, 0), memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((1, block_u, block_t, h), lambda bb, ti, ui, vi, *_: (bb, ui, ti, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((h, block_v), lambda bb, ti, ui, vi, *_: (0, vi), memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, block_v), lambda bb, ti, ui, vi, *_: (0, vi), memory_space=pltpu.VMEM)
    chan_spec = pl.BlockSpec((1, block_u, block_t), lambda bb, ti, ui, vi, *_: (bb, ui, ti), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, nt, nu, nv),
        in_specs=[h_spec, x_spec, x_spec, y_spec, y_spec, w_spec, bias_spec,
                  chan_spec, chan_spec, chan_spec, chan_spec],
        out_specs=[
            pl.BlockSpec((1, block_t, h), lambda bb, ti, ui, vi, *_: (bb, ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_t, h), lambda bb, ti, ui, vi, *_: (bb, ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_u, h), lambda bb, ti, ui, vi, *_: (bb, ti, ui, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_u, h), lambda bb, ti, ui, vi, *_: (bb, ti, ui, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            # dh accumulates in mm_dtype: an f32 accumulator was tried with
            # the VMEM freed by the h cache but still exceeds the 16MB
            # scoped-VMEM limit by ~0.6MB (bf16's ~0.4% accumulation error
            # over ~a dozen V tiles is far below SGD noise; f32 in tests)
            pltpu.VMEM((block_u, block_t, h), mm_dtype),
        ],
    )
    kernel = functools.partial(
        _bwd_in_kernel, block_u=block_u, block_v=block_v, mm_dtype=mm_dtype
    )
    d_ax, d_gx, d_ay_part, d_gy_part = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bsz, tp, h), jnp.float32),
            jax.ShapeDtypeStruct((bsz, tp, h), jnp.float32),
            jax.ShapeDtypeStruct((bsz, nt, u1p, h), jnp.float32),
            jax.ShapeDtypeStruct((bsz, nt, u1p, h), jnp.float32),
        ],
        interpret=_interpret(),
    )(labels_p, h_cache, ax_p, gx_p, ay_p, gy_p, w2_p, b2_p.reshape(1, -1),
      lse_t, dl_t, db_t, dy_t)

    grid_spec_w = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nv, bsz, nt, nu),
        in_specs=[
            pl.BlockSpec((1, block_u, block_t, h), lambda vi, bb, ti, ui, *_: (bb, ui, ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, block_v), lambda vi, bb, ti, ui, *_: (0, vi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_v), lambda vi, bb, ti, ui, *_: (0, vi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_u, block_t), lambda vi, bb, ti, ui, *_: (bb, ui, ti), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_u, block_t), lambda vi, bb, ti, ui, *_: (bb, ui, ti), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_u, block_t), lambda vi, bb, ti, ui, *_: (bb, ui, ti), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_u, block_t), lambda vi, bb, ti, ui, *_: (bb, ui, ti), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((h, block_v), lambda vi, bb, ti, ui, *_: (0, vi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_v), lambda vi, bb, ti, ui, *_: (0, vi), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[],
    )
    kernel_w = functools.partial(
        _bwd_w_kernel, block_u=block_u, block_v=block_v, mm_dtype=mm_dtype
    )
    d_w2, d_b2 = pl.pallas_call(
        kernel_w,
        grid_spec=grid_spec_w,
        out_shape=[
            jax.ShapeDtypeStruct((h, vp), jnp.float32),
            jax.ShapeDtypeStruct((1, vp), jnp.float32),
        ],
        interpret=_interpret(),
    )(labels_p, h_cache, w2_p, b2_p.reshape(1, -1),
      lse_t, dl_t, db_t, dy_t)

    return (
        d_ax[:, :t],
        d_gx[:, :t],
        d_ay_part.sum(axis=1)[:, :u1],
        d_gy_part.sum(axis=1)[:, :u1],
        d_w2[:, :v],
        d_b2[0, :v],
    )
