"""Pruned RNN-T loss: oracle parity, full-band exactness, band validity,
and gradient agreement when the band covers the whole lattice."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pika_tpu.ops.rnnt_loss import rnnt_loss_from_logprobs, rnnt_loss_numpy
from pika_tpu.ops.rnnt_pruned import (
    prune_ranges,
    rnnt_loss_pruned,
    rnnt_loss_pruned_numpy,
    rnnt_loss_simple,
    simple_channels,
)


def _rand_case(rng, b=3, t=7, u=4, v=5, h=6):
    ax = jnp.asarray(rng.standard_normal((b, t, h)).astype(np.float32))
    gx = jnp.asarray(rng.standard_normal((b, t, h)).astype(np.float32))
    ay = jnp.asarray(rng.standard_normal((b, u + 1, h)).astype(np.float32))
    gy = jnp.asarray(rng.standard_normal((b, u + 1, h)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((h, v)).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal((v,)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, v, (b, u)).astype(np.int32))
    t_len = jnp.asarray([t, t - 2, t - 1], np.int32)[:b]
    u_len = jnp.asarray([u, u - 1, u - 2], np.int32)[:b]
    return ax, gx, ay, gy, w2, b2, labels, t_len, u_len


def _full_logprobs(ax, gx, ay, gy, w2, b2):
    pre = ax[:, :, None, :] + ay[:, None, :, :]
    gate = gx[:, :, None, :] + gy[:, None, :, :]
    z = jnp.einsum("btuh,hv->btuv", ax.dtype.type(1) * jnp.tanh(pre)
                   * jax.nn.sigmoid(gate), w2) + b2
    return jax.nn.log_softmax(z, axis=-1)


def _rand_band(rng, b, t, u1, s_range, t_len, u_len):
    """Random valid monotone band: s_begin[0] = 0, steps in
    [0, s_range-1], capped so the last valid row covers u_len."""
    sb = np.zeros((b, t), np.int32)
    for i in range(b):
        cap = max(0, int(u_len[i]) + 1 - s_range)
        for tt in range(1, t):
            remaining = max(int(t_len[i]) - 1 - tt, 0)
            env = max(cap - remaining * (s_range - 1), 0)
            lo = max(sb[i, tt - 1], env)
            hi = min(sb[i, tt - 1] + s_range - 1, cap)
            sb[i, tt] = rng.integers(lo, max(hi, lo) + 1)
    return jnp.asarray(sb)


def test_simple_loss_matches_materialized_lattice():
    rng = np.random.default_rng(0)
    b, t, u, v = 3, 6, 4, 5
    am = jnp.asarray(rng.standard_normal((b, t, v)).astype(np.float32))
    lm = jnp.asarray(rng.standard_normal((b, u + 1, v)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, v, (b, u)).astype(np.int32))
    t_len = jnp.asarray([t, t - 1, t - 2], np.int32)
    u_len = jnp.asarray([u, u - 1, u - 2], np.int32)
    loss, _ = rnnt_loss_simple(am, lm, labels, t_len, u_len)
    lattice = jax.nn.log_softmax(am[:, :, None, :] + lm[:, None, :, :], -1)
    want = rnnt_loss_numpy(np.asarray(lattice), np.asarray(labels),
                           np.asarray(t_len), np.asarray(u_len))
    np.testing.assert_allclose(np.asarray(loss), want, rtol=1e-4)


def test_pruned_full_band_matches_full_loss():
    """s_range covering the whole label axis + zero band starts must
    reproduce the full-lattice loss exactly (same paths)."""
    rng = np.random.default_rng(1)
    ax, gx, ay, gy, w2, b2, labels, t_len, u_len = _rand_case(rng)
    b, t = ax.shape[0], ax.shape[1]
    u1 = ay.shape[1]
    sb = jnp.zeros((b, t), jnp.int32)
    got = rnnt_loss_pruned(ax, gx, ay, gy, w2, b2, labels, t_len, u_len,
                           sb, s_range=u1, chunk=3)
    lp = _full_logprobs(ax, gx, ay, gy, w2, b2)
    want = rnnt_loss_from_logprobs(lp, labels, t_len, u_len)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4)


@pytest.mark.parametrize("s_range", [2, 3])
def test_pruned_matches_numpy_banded_oracle(s_range):
    rng = np.random.default_rng(2 + s_range)
    ax, gx, ay, gy, w2, b2, labels, t_len, u_len = _rand_case(rng)
    b, t = ax.shape[0], ax.shape[1]
    sb = _rand_band(rng, b, t, ay.shape[1], s_range,
                    np.asarray(t_len), np.asarray(u_len))
    got = rnnt_loss_pruned(ax, gx, ay, gy, w2, b2, labels, t_len, u_len,
                           sb, s_range=s_range, chunk=4)
    lp = np.asarray(_full_logprobs(ax, gx, ay, gy, w2, b2), np.float64)
    want = rnnt_loss_pruned_numpy(lp, np.asarray(labels), np.asarray(t_len),
                                  np.asarray(u_len), np.asarray(sb), s_range)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4)


def test_pruned_full_band_gradients_match_full_loss():
    rng = np.random.default_rng(5)
    ax, gx, ay, gy, w2, b2, labels, t_len, u_len = _rand_case(rng)
    b, t = ax.shape[0], ax.shape[1]
    u1 = ay.shape[1]
    sb = jnp.zeros((b, t), jnp.int32)

    def f_pruned(args):
        return rnnt_loss_pruned(*args, labels, t_len, u_len, sb,
                                s_range=u1, chunk=3).sum()

    def f_full(args):
        lp = _full_logprobs(*args)
        return rnnt_loss_from_logprobs(lp, labels, t_len, u_len).sum()

    args = (ax, gx, ay, gy, w2, b2)
    g_p = jax.grad(f_pruned)(args)
    g_f = jax.grad(f_full)(args)
    for a, bb, name in zip(g_p, g_f, "ax gx ay gy w2 b2".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_prune_ranges_invariants():
    rng = np.random.default_rng(7)
    b, t, u, v = 4, 12, 6, 5
    am = jnp.asarray(rng.standard_normal((b, t, v)).astype(np.float32))
    lm = jnp.asarray(rng.standard_normal((b, u + 1, v)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, v, (b, u)).astype(np.int32))
    t_len = jnp.asarray([t, t - 3, t - 1, 5], np.int32)
    u_len = jnp.asarray([u, u - 1, u - 2, 3], np.int32)
    s_range = 3
    _, (blank_lp, emit_lp) = rnnt_loss_simple(am, lm, labels, t_len, u_len)
    sb = np.asarray(prune_ranges(blank_lp, emit_lp, labels, t_len, u_len,
                                 s_range))
    assert (sb[:, 0] == 0).all()
    d = sb[:, 1:] - sb[:, :-1]
    assert (d >= 0).all() and (d <= s_range - 1).all()
    for i in range(b):
        cap = max(0, int(u_len[i]) + 1 - s_range)
        assert sb[i].max() <= cap
        last = int(t_len[i]) - 1
        # feasible here: coverage of u_len by the last valid row
        assert sb[i, last] + s_range - 1 >= int(u_len[i])


def test_pruned_loss_trains_e2e():
    """A full pruned objective (pruned + 0.5*simple) on a tiny transducer
    must decrease under SGD — the integration smoke test."""
    from pika_tpu.models import TransducerConfig, init_transducer
    from pika_tpu.models.transducer import Transducer

    rng = np.random.default_rng(9)
    cfg = TransducerConfig(input_dim=6, vocab_size=5, hid_dim=8,
                           enc_layers=1, dec_layers=1, embd_dim=8,
                           simple_joint=True)
    model, variables = init_transducer(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((2, 9, 6)).astype(np.float32))
    x_len = jnp.asarray([9, 7], np.int32)
    labels = jnp.asarray(rng.integers(1, 5, (2, 3)).astype(np.int32))
    u_len = jnp.asarray([3, 2], np.int32)
    s_range = 2

    def loss_fn(params):
        vs = {"params": params}
        enc = model.apply(vs, x, x_len, method=Transducer.encode)
        dec = model.apply(vs, labels, u_len, method=Transducer.predict)
        am, lm = model.apply(vs, enc, dec, method=Transducer.simple_factors)
        simple, (blp, elp) = rnnt_loss_simple(am, lm, labels, x_len, u_len)
        sb = prune_ranges(blp, elp, labels, x_len, u_len, s_range)
        axx, gxx, ayy, gyy = model.apply(vs, enc, dec,
                                         method=Transducer.joint_factors)
        w2, b2 = model.apply(vs, method=Transducer.joint_params)
        pruned = rnnt_loss_pruned(axx, gxx, ayy, gyy, w2, b2, labels,
                                  x_len, u_len, sb, s_range, chunk=4)
        return pruned.sum() + 0.5 * simple.sum()

    params = variables["params"]
    l0 = float(loss_fn(params))
    g = jax.grad(loss_fn)(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
    for _ in range(12):
        g = jax.grad(loss_fn)(params)
        params = jax.tree_util.tree_map(lambda p, gg: p - 0.05 * gg,
                                        params, g)
    l1 = float(loss_fn(params))
    assert np.isfinite(l0) and np.isfinite(l1) and l1 < l0, (l0, l1)
