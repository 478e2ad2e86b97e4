"""Pallas fused-joint kernels vs the XLA reference (interpret mode on CPU;
the same code compiles with Mosaic on a real TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pika_tpu.ops.rnnt_loss import _chunk_channels, rnnt_loss_fused
from pika_tpu.ops.rnnt_pallas import joint_channels_pallas, joint_channels_pallas_bwd


def _case(rng, b=2, t=40, u1=11, h=32, v=70):
    ax = rng.standard_normal((b, t, h)).astype(np.float32) * 0.5
    gx = rng.standard_normal((b, t, h)).astype(np.float32) * 0.5
    ay = rng.standard_normal((b, u1, h)).astype(np.float32) * 0.5
    gy = rng.standard_normal((b, u1, h)).astype(np.float32) * 0.5
    w2 = rng.standard_normal((h, v)).astype(np.float32) * 0.2
    b2 = rng.standard_normal(v).astype(np.float32) * 0.1
    labels_ext = rng.integers(1, v, (b, u1)).astype(np.int32)
    return tuple(map(jnp.asarray, (ax, gx, ay, gy, w2, b2, labels_ext)))


BLOCKS = dict(block_t=16, block_u=4, block_v=32)


def test_pallas_fwd_matches_xla(rng):
    args = _case(rng)
    ref = _chunk_channels(args[0], args[1], args[2], args[3], args[4], args[5], args[6])
    got = joint_channels_pallas(*args, mm_dtype=jnp.float32, **BLOCKS)
    for name, r, g in zip(("lse", "zb", "zy"), ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=2e-5, atol=2e-5, err_msg=name)


def test_pallas_fwd_bf16_close(rng):
    args = _case(rng)
    ref = _chunk_channels(*args)
    got = joint_channels_pallas(*args, mm_dtype=jnp.bfloat16, **BLOCKS)
    for name, r, g in zip(("lse", "zb", "zy"), ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=0.05, atol=0.05, err_msg=name)


def test_pallas_bwd_matches_xla_vjp(rng):
    args = _case(rng, b=1, t=20, u1=6, h=16, v=40)
    ax, gx, ay, gy, w2, b2, labels_ext = args
    lse, zb, zy = _chunk_channels(*args)
    d_lse = jnp.asarray(rng.standard_normal(lse.shape).astype(np.float32) * 0.1)
    d_zb = jnp.asarray(rng.standard_normal(zb.shape).astype(np.float32) * 0.1)
    d_zy = jnp.asarray(rng.standard_normal(zy.shape).astype(np.float32) * 0.1)

    _, vjp = jax.vjp(
        lambda a, g, ayy, gyy, w, bb: _chunk_channels(a, g, ayy, gyy, w, bb, labels_ext),
        ax, gx, ay, gy, w2, b2,
    )
    ref = vjp((d_lse, d_zb, d_zy))
    got = joint_channels_pallas_bwd(
        ax, gx, ay, gy, w2, b2, labels_ext, lse, d_lse, d_zb, d_zy,
        mm_dtype=jnp.float32, block_t=8, block_u=2, block_v=16,
    )
    names = ("d_ax", "d_gx", "d_ay", "d_gy", "d_w2", "d_b2")
    for name, r, g in zip(names, ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-4, err_msg=name)


def test_fused_loss_pallas_backend(rng):
    """End-to-end: rnnt_loss_fused(backend='pallas') == backend='xla'."""
    b, t, u, h, v = 2, 24, 5, 16, 50
    ax = jnp.asarray(rng.standard_normal((b, t, h)).astype(np.float32) * 0.5)
    gx = jnp.asarray(rng.standard_normal((b, t, h)).astype(np.float32) * 0.5)
    ay = jnp.asarray(rng.standard_normal((b, u + 1, h)).astype(np.float32) * 0.5)
    gy = jnp.asarray(rng.standard_normal((b, u + 1, h)).astype(np.float32) * 0.5)
    w2 = jnp.asarray(rng.standard_normal((h, v)).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.standard_normal(v).astype(np.float32) * 0.1)
    labels = jnp.asarray(rng.integers(1, v, (b, u)).astype(np.int32))
    t_len = jnp.asarray([t, t - 5], jnp.int32)
    u_len = jnp.asarray([u, u - 2], jnp.int32)

    import pika_tpu.ops.rnnt_pallas as rp

    orig_fwd, orig_bwd = rp.joint_channels_pallas, rp.joint_channels_pallas_bwd
    rp.joint_channels_pallas = lambda *a, **k: orig_fwd(*a, mm_dtype=jnp.float32, **BLOCKS)
    rp.joint_channels_pallas_bwd = lambda *a, **k: orig_bwd(
        *a, mm_dtype=jnp.float32, block_t=8, block_u=2, block_v=16
    )
    try:
        loss_x = rnnt_loss_fused(ax, gx, ay, gy, w2, b2, labels, t_len, u_len, 8, "xla")
        loss_p = rnnt_loss_fused(ax, gx, ay, gy, w2, b2, labels, t_len, u_len, 8, "pallas")
        np.testing.assert_allclose(np.asarray(loss_p), np.asarray(loss_x), rtol=1e-4)

        gx_fn = jax.grad(lambda *d: rnnt_loss_fused(*d, labels, t_len, u_len, 8, "xla").sum(), argnums=(0, 2, 4))
        gp_fn = jax.grad(lambda *d: rnnt_loss_fused(*d, labels, t_len, u_len, 8, "pallas").sum(), argnums=(0, 2, 4))
        for r, g in zip(gx_fn(ax, gx, ay, gy, w2, b2), gp_fn(ax, gx, ay, gy, w2, b2)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=5e-4, atol=5e-5)
    finally:
        rp.joint_channels_pallas, rp.joint_channels_pallas_bwd = orig_fwd, orig_bwd


def test_bwd_adaptive_block_v_long_t(rng):
    """The backward kernels shrink block_v for long padded T (Mosaic's
    scoped-VMEM stack grows with Tp and crosses the 16MB limit at
    block_v=512 past Tp=512 — observed on v5e).  Check the adaptive
    default kicks in and the gradients still match the XLA backward."""
    args = _case(rng, b=1, t=520, u1=6, h=16, v=40)
    ax, gx, ay, gy, w2, b2, labels_ext = args
    labels = labels_ext[:, :-1]
    t_len = jnp.asarray([517], jnp.int32)
    u_len = jnp.asarray([4], jnp.int32)

    def loss(backend, *diff):
        return rnnt_loss_fused(*diff, labels, t_len, u_len, 16, backend).sum()

    gx_ref = jax.grad(lambda *d: loss("xla", *d), argnums=(0, 2, 4))(
        ax, gx, ay, gy, w2, b2)
    # default block_v=0 -> adaptive path (256 for Tp=640); mm stays bf16,
    # hence the looser tolerance
    gx_pal = jax.grad(lambda *d: loss("pallas", *d), argnums=(0, 2, 4))(
        ax, gx, ay, gy, w2, b2)
    for r, g in zip(gx_ref, gx_pal):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=0.05, atol=0.05)
