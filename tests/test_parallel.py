"""Distributed strategy tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from pika_tpu.parallel import (
    BMUFConfig,
    bmuf_init,
    make_bmuf_round,
    make_mesh,
    jit_dp,
    shard_batch,
    replicate_tree,
)

N_DEV = 8


def _quadratic_local_step(lr=0.1):
    """Local SGD on loss = 0.5 * sum((w - target)^2) per batch item."""

    def local_step(params, opt_state, extra, batch, key):
        del key

        def loss_fn(p):
            return 0.5 * jnp.sum((p["w"][None, :] - batch) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, extra, {"loss": loss}

    tx = optax.sgd(lr)
    return local_step, tx


def _numpy_bmuf_reference(w0, batches, lr, bm, blr, sync_period, delta_prev):
    """Literal transcription of BmufTrainer.update_and_sync semantics."""
    locals_ = []
    for dev in range(N_DEV):
        w = w0.copy()
        for s in range(sync_period):
            b = batches[s, dev]
            grad = (w[None, :] - b).sum(axis=0)
            w = w - lr * grad
        locals_.append(w)
    delta = np.mean([w0 - w for w in locals_], axis=0)
    delta_prev = bm * delta_prev + blr * (1 - bm) * delta
    w_new = w0 - (1 + bm) * delta_prev
    return w_new, delta_prev


def test_bmuf_matches_reference_formula(rng):
    dim, per_dev, sync = 5, 3, 4
    mesh = make_mesh(N_DEV)
    cfg = BMUFConfig(variant="bmuf", block_momentum=0.9, block_lr=1.0, sync_period=sync)
    w0 = rng.standard_normal(dim).astype(np.float32)
    params = {"w": jnp.asarray(w0)}
    state = bmuf_init(params, cfg)
    local_step, tx = _quadratic_local_step(lr=0.05)
    round_fn = make_bmuf_round(local_step, tx.init, cfg, mesh)

    batches = rng.standard_normal((sync, N_DEV * per_dev, dim)).astype(np.float32)
    new_state, _, ok, metrics = round_fn(state, (), jnp.asarray(batches), jax.random.PRNGKey(0))
    assert bool(ok)

    ref_batches = batches.reshape(sync, N_DEV, per_dev, dim)
    w_ref, dp_ref = _numpy_bmuf_reference(
        w0, ref_batches, 0.05, 0.9, 1.0, sync, np.zeros(dim, np.float32)
    )
    np.testing.assert_allclose(np.asarray(new_state.params["w"]), w_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.delta_prev["w"]), dp_ref, rtol=1e-5)

    # second round exercises momentum accumulation
    batches2 = rng.standard_normal((sync, N_DEV * per_dev, dim)).astype(np.float32)
    state2, _, ok2, _ = round_fn(new_state, (), jnp.asarray(batches2), jax.random.PRNGKey(1))
    w_ref2, _ = _numpy_bmuf_reference(
        w_ref, batches2.reshape(sync, N_DEV, per_dev, dim), 0.05, 0.9, 1.0, sync, dp_ref
    )
    np.testing.assert_allclose(np.asarray(state2.params["w"]), w_ref2, rtol=1e-5)


def test_bmuf_zero_momentum_equals_averaged_local(rng):
    """bm=0, blr=1: global params = mean of local workers' params."""
    dim, sync = 4, 2
    mesh = make_mesh(N_DEV)
    cfg = BMUFConfig(variant="bmuf", block_momentum=0.0, block_lr=1.0, sync_period=sync)
    w0 = rng.standard_normal(dim).astype(np.float32)
    state = bmuf_init({"w": jnp.asarray(w0)}, cfg)
    local_step, tx = _quadratic_local_step(lr=0.1)
    round_fn = make_bmuf_round(local_step, tx.init, cfg, mesh)
    batches = rng.standard_normal((sync, N_DEV, dim)).astype(np.float32)
    new_state, _, ok, _ = round_fn(state, (), jnp.asarray(batches), jax.random.PRNGKey(0))
    ref = batches.reshape(sync, N_DEV, 1, dim)
    w_ref, _ = _numpy_bmuf_reference(w0, ref, 0.1, 0.0, 1.0, sync, np.zeros(dim, np.float32))
    np.testing.assert_allclose(np.asarray(new_state.params["w"]), w_ref, rtol=1e-5)


def test_blockadam_converges(rng):
    """BlockAdam drives a quadratic to its optimum (targets' mean)."""
    dim = 3
    mesh = make_mesh(N_DEV)
    cfg = BMUFConfig(variant="blockadam", block_lr=0.05, sync_period=1)
    target = rng.standard_normal(dim).astype(np.float32)
    state = bmuf_init({"w": jnp.zeros(dim)}, cfg)
    local_step, tx = _quadratic_local_step(lr=0.05)
    round_fn = make_bmuf_round(local_step, tx.init, cfg, mesh)
    batches = np.broadcast_to(target, (1, N_DEV, dim)).astype(np.float32)
    for i in range(300):
        state, _, ok, _ = round_fn(state, (), jnp.asarray(batches), jax.random.PRNGKey(i))
    np.testing.assert_allclose(np.asarray(state.params["w"]), target, atol=1e-2)


def test_bmufadam_round_runs_and_improves(rng):
    dim = 3
    mesh = make_mesh(N_DEV)
    cfg = BMUFConfig(variant="bmufadam", block_momentum=0.5, block_lr=1.0, sync_period=2)
    target = rng.standard_normal(dim).astype(np.float32)
    state = bmuf_init({"w": jnp.zeros(dim)}, cfg)

    from pika_tpu.parallel import scale_by_adam_float

    tx = optax.chain(scale_by_adam_float(0.9, 0.999, 1e-8), optax.scale(-0.05))

    def local_step(params, opt_state, extra, batch, key):
        def loss_fn(p):
            return 0.5 * jnp.sum((p["w"][None, :] - batch) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, extra, {"loss": loss}

    round_fn = make_bmuf_round(local_step, tx.init, cfg, mesh)
    batches = np.broadcast_to(target, (2, N_DEV, dim)).astype(np.float32)
    loss0 = None
    for i in range(100):
        state, _, ok, metrics = round_fn(state, (), jnp.asarray(batches), jax.random.PRNGKey(i))
        assert bool(ok)
        if loss0 is None:
            loss0 = float(metrics["loss"].mean())
    assert float(metrics["loss"].mean()) < loss0 * 0.1
    assert float(state.rho) > 0


def test_bmuf_nan_health_check(rng):
    mesh = make_mesh(N_DEV)
    cfg = BMUFConfig(variant="bmuf", block_momentum=0.9, block_lr=1.0, sync_period=1)
    state = bmuf_init({"w": jnp.ones(2)}, cfg)

    tx = optax.sgd(0.1)

    def bad_step(params, opt_state, extra, batch, key):
        params = {"w": params["w"] * jnp.nan}
        return params, opt_state, extra, {"loss": jnp.asarray(0.0)}

    round_fn = make_bmuf_round(bad_step, tx.init, cfg, mesh)
    batches = np.zeros((1, N_DEV, 2), np.float32)
    new_state, _, ok, _ = round_fn(state, (), jnp.asarray(batches), jax.random.PRNGKey(0))
    assert not bool(ok)
    # params must be untouched
    np.testing.assert_array_equal(np.asarray(new_state.params["w"]), np.ones(2))


def test_jit_dp_matches_single_device(rng):
    """Sharded-batch DP step == single-device step on the full batch."""
    mesh = make_mesh(N_DEV)
    w0 = rng.standard_normal(4).astype(np.float32)
    tx = optax.sgd(0.1)

    def step(state, batch, key):
        params, opt_state = state

        def loss_fn(p):
            return 0.5 * jnp.sum((p["w"][None, :] - batch["x"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state), {"loss": loss}

    params = {"w": jnp.asarray(w0)}
    state = (params, tx.init(params))
    batch = {"x": rng.standard_normal((N_DEV * 2, 4)).astype(np.float32)}

    dp_step = jit_dp(step, mesh, donate_state=False)
    state_r = replicate_tree(state, mesh)
    batch_s = shard_batch(batch, mesh)
    (new_params_dp, _), m_dp = dp_step(state_r, batch_s, jax.random.PRNGKey(0))

    (new_params_1, _), m_1 = jax.jit(step)(state, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(new_params_dp["w"]), np.asarray(new_params_1["w"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_1["loss"]), rtol=1e-5)
