"""RNN-T loss tests: oracle parity, gradient checks, fused-vs-lattice."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pika_tpu.ops.rnnt_loss import (
    rnnt_loss_numpy,
    rnnt_loss_from_logprobs,
    rnnt_loss_fused,
    rnnt_alpha,
    rnnt_beta,
    rnnt_occupancy,
    _gather_channels,
)


def _random_case(rng, b=3, t=11, u=5, v=7):
    logits = rng.standard_normal((b, t, u + 1, v)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    labels = rng.integers(1, v, (b, u)).astype(np.int32)
    t_len = np.array([t, t - 3, t - 1], dtype=np.int32)[:b]
    u_len = np.array([u, u - 2, 1], dtype=np.int32)[:b]
    return lp, labels, t_len, u_len


def test_loss_matches_numpy_oracle(rng):
    lp, labels, t_len, u_len = _random_case(rng)
    expected = rnnt_loss_numpy(lp, labels, t_len, u_len)
    got = np.asarray(
        rnnt_loss_from_logprobs(jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(t_len), jnp.asarray(u_len))
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_loss_degenerate_single_label(rng):
    # T=1, U=1: p = emit(0,0) * ... cannot: with T=1 path must emit then blank
    lp, labels, _, _ = _random_case(rng, b=1, t=1, u=1)
    t_len = np.array([1], np.int32)
    u_len = np.array([1], np.int32)
    expected = -(lp[0, 0, 0, labels[0, 0]] + lp[0, 0, 1, 0])
    got = float(rnnt_loss_from_logprobs(jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(t_len), jnp.asarray(u_len))[0])
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_alpha_beta_consistency(rng):
    """Sum over any anti-diagonal of alpha+beta equals the log-likelihood."""
    lp, labels, t_len, u_len = _random_case(rng)
    blank_lp, emit_lp = _gather_channels(jnp.asarray(lp), jnp.asarray(labels))
    alpha = rnnt_alpha(blank_lp, emit_lp, jnp.asarray(u_len))
    beta = rnnt_beta(blank_lp, emit_lp, jnp.asarray(t_len), jnp.asarray(u_len))
    ll = np.asarray(beta[:, 0, 0])
    loss = rnnt_loss_numpy(lp, labels, t_len, u_len)
    np.testing.assert_allclose(-ll, loss, rtol=1e-4)
    # occupancy of the full lattice: logsumexp over cells of one diagonal
    for i in range(lp.shape[0]):
        a = np.asarray(alpha[i])
        bt = np.asarray(beta[i])
        # check a middle diagonal d = t + u inside the valid region
        d = min(int(t_len[i]) - 1, 2)
        cells = [(d - u, u) for u in range(0, min(d, int(u_len[i])) + 1) if 0 <= d - u < int(t_len[i])]
        vals = [a[t, u] + bt[t, u] for t, u in cells]
        got_ll = np.logaddexp.reduce(vals)
        np.testing.assert_allclose(got_ll, ll[i], rtol=1e-4)


def test_autodiff_grad_matches_occupancy(rng):
    """Autodiff through the alpha scan equals the closed-form occupancy."""
    lp, labels, t_len, u_len = _random_case(rng, b=2, t=6, u=3, v=5)
    labels_j = jnp.asarray(labels)
    t_j, u_j = jnp.asarray(t_len[:2]), jnp.asarray(u_len[:2])

    def loss_sum(lp_arr):
        return rnnt_loss_from_logprobs(lp_arr, labels_j, t_j, u_j).sum()

    grad = np.asarray(jax.grad(loss_sum)(jnp.asarray(lp)))
    blank_lp, emit_lp = _gather_channels(jnp.asarray(lp), labels_j)
    g_blank, g_emit = rnnt_occupancy(blank_lp, emit_lp, labels_j, t_j, u_j)
    g_blank, g_emit = np.asarray(g_blank), np.asarray(g_emit)
    np.testing.assert_allclose(grad[..., 0], g_blank, rtol=1e-3, atol=1e-5)
    # emit grads: scatter g_emit onto the label entries
    scatter = np.zeros_like(grad)
    for i in range(2):
        for t in range(6):
            for u in range(3):
                scatter[i, t, u, labels[i, u]] += g_emit[i, t, u]
    scatter[..., 0] += g_blank
    np.testing.assert_allclose(grad, scatter, rtol=1e-3, atol=1e-5)


def test_grad_is_proper_distribution(rng):
    """-sum_v dL/d lp(t,u,v) telescopes: total occupancy of row t sums to 1."""
    lp, labels, t_len, u_len = _random_case(rng, b=1, t=5, u=2, v=4)
    t_j, u_j = jnp.asarray(t_len[:1]), jnp.asarray(u_len[:1])

    def loss_sum(lp_arr):
        return rnnt_loss_from_logprobs(lp_arr, jnp.asarray(labels), t_j, u_j).sum()

    grad = np.asarray(jax.grad(loss_sum)(jnp.asarray(lp)))[0]
    # every path takes exactly T blank transitions and U emissions,
    # so total occupancy = T + U
    np.testing.assert_allclose(-grad.sum(), float(t_len[0] + u_len[0]), rtol=1e-3)
    # blank occupancy alone = T (each frame is exited by exactly one blank)
    blank_total = -grad[:, :, 0].sum()
    emit_total = -(grad.sum() - grad[:, :, 0].sum())
    np.testing.assert_allclose(blank_total, float(t_len[0]), rtol=1e-3)
    np.testing.assert_allclose(emit_total, float(u_len[0]), rtol=1e-3)


def _factors_case(rng, b=2, t=9, u=4, h=8, v=6):
    ax = rng.standard_normal((b, t, h)).astype(np.float32)
    gx = rng.standard_normal((b, t, h)).astype(np.float32)
    ay = rng.standard_normal((b, u + 1, h)).astype(np.float32)
    gy = rng.standard_normal((b, u + 1, h)).astype(np.float32)
    w2 = rng.standard_normal((h, v)).astype(np.float32) * 0.3
    b2 = rng.standard_normal(v).astype(np.float32) * 0.1
    labels = rng.integers(1, v, (b, u)).astype(np.int32)
    t_len = np.array([t, t - 2], np.int32)
    u_len = np.array([u, u - 1], np.int32)
    return tuple(map(jnp.asarray, (ax, gx, ay, gy, w2, b2, labels, t_len, u_len)))


def _lattice_loss(ax, gx, ay, gy, w2, b2, labels, t_len, u_len):
    pre = ax[:, :, None, :] + ay[:, None, :, :]
    gate = gx[:, :, None, :] + gy[:, None, :, :]
    z = jnp.einsum("btuh,hv->btuv", jnp.tanh(pre) * jax.nn.sigmoid(gate), w2) + b2
    lp = jax.nn.log_softmax(z, axis=-1)
    return rnnt_loss_from_logprobs(lp, labels, t_len, u_len)


@pytest.mark.parametrize("chunk", [3, 32])
def test_fused_matches_lattice_value(rng, chunk):
    args = _factors_case(rng)
    expected = np.asarray(_lattice_loss(*args))
    got = np.asarray(rnnt_loss_fused(*args, chunk))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_fused_matches_lattice_grads(rng):
    args = _factors_case(rng)
    diff_args = args[:6]
    rest = args[6:]

    def f_lattice(*d):
        return _lattice_loss(*d, *rest).sum()

    def f_fused(*d):
        return rnnt_loss_fused(*d, *rest, 4).sum()

    g_lat = jax.grad(f_lattice, argnums=tuple(range(6)))(*diff_args)
    g_fus = jax.grad(f_fused, argnums=tuple(range(6)))(*diff_args)
    for a, b in zip(g_lat, g_fus):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=1e-4)


def test_fused_weighted_grads(rng):
    """Per-utterance upstream weights must scale gradients correctly."""
    args = _factors_case(rng)
    w = jnp.asarray([0.5, 2.0])

    def f_lattice(ax):
        return (w * _lattice_loss(ax, *args[1:])).sum()

    def f_fused(ax):
        return (w * rnnt_loss_fused(ax, *args[1:], 4)).sum()

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_fused)(args[0])),
        np.asarray(jax.grad(f_lattice)(args[0])),
        rtol=2e-3, atol=1e-4,
    )


def test_zero_length_utterance_yields_zero_loss_and_grad(rng):
    """t_len = 0 (reachable: <400-sample audio produces 0 frames) must not
    wrap the final-cell gather into padding — loss is 0, gradients are 0."""
    import jax

    b, t, u1, v, h = 2, 4, 3, 5, 8
    ax = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)
    gx = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)
    ay = jnp.asarray(rng.standard_normal((b, u1, h)), jnp.float32)
    gy = jnp.asarray(rng.standard_normal((b, u1, h)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((h, v)), jnp.float32)
    b2 = jnp.zeros((v,), jnp.float32)
    labels = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
    t_len = jnp.asarray([0, 4], jnp.int32)
    u_len = jnp.asarray([2, 2], jnp.int32)

    def total(ax):
        return rnnt_loss_fused(ax, gx, ay, gy, w2, b2, labels, t_len, u_len,
                               backend="xla").sum()

    losses = rnnt_loss_fused(ax, gx, ay, gy, w2, b2, labels, t_len, u_len,
                             backend="xla")
    assert float(losses[0]) == 0.0
    assert np.isfinite(float(losses[1])) and float(losses[1]) > 0.0
    g = jax.grad(total)(ax)
    assert float(jnp.abs(g[0]).max()) == 0.0   # empty utt contributes nothing
    assert float(jnp.abs(g[1]).max()) > 0.0
