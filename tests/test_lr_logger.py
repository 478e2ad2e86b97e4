"""LR schedule parity with the reference formula, inf-norm clip, Logger."""

import io
import math

import numpy as np
import jax.numpy as jnp
import optax

from pika_tpu.train.lr import clip_by_inf_norm, exp_interp_schedule, make_optimizer
from pika_tpu.utils.logger import Logger


def test_exp_interp_matches_reference_formula():
    """lr = initial * exp(n * ln(final/initial) / total)
    (trainer/train_transducer_bmuf_otfaug.py:48-51)."""
    initial, final, total = 0.003, 0.0001, 8 * 20000
    sched = exp_interp_schedule(initial, final, total)
    for n in (0, 1, 999, 20000, total):
        expected = initial * math.exp(n * math.log(final / initial) / total)
        np.testing.assert_allclose(float(sched(n)), expected, rtol=1e-6)
    # endpoints
    np.testing.assert_allclose(float(sched(0)), initial, rtol=1e-6)
    np.testing.assert_allclose(float(sched(total)), final, rtol=1e-5)


def test_clip_by_inf_norm():
    clip = clip_by_inf_norm(3.0)
    grads = {"a": jnp.asarray([1.0, -6.0]), "b": jnp.asarray([[2.0]])}
    out, _ = clip.update(grads, clip.init(grads))
    # inf norm 6 → scale 0.5
    np.testing.assert_allclose(np.asarray(out["a"]), [0.5, -3.0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["b"]), [[1.0]], rtol=1e-6)
    # below threshold: untouched
    small = {"a": jnp.asarray([0.5]), "b": jnp.asarray([[1.0]])}
    out2, _ = clip.update(small, clip.init(small))
    np.testing.assert_allclose(np.asarray(out2["a"]), [0.5], rtol=1e-6)


def test_make_optimizer_variants():
    params = {"w": jnp.zeros(3)}
    for name in ("sgd", "adam", "adadelta"):
        tx = make_optimizer(name, 0.01, 0.001, 100, grad_clip=2.0)
        state = tx.init(params)
        updates, _ = tx.update({"w": jnp.ones(3)}, state, params)
        assert np.isfinite(np.asarray(updates["w"])).all()


def test_logger_windows_and_summary():
    buf = io.StringIO()
    log = Logger(buf, log_per_n_frames=10, tags=["Loss"])
    for _ in range(5):
        log.update_and_log(4, [8.0])
    total, frames = log.summarize_and_log()
    assert frames == 20
    np.testing.assert_allclose(total, 40.0)
    out = buf.getvalue()
    assert "Loss: 2.000" in out  # per-frame average per window
    assert "Overall Avg Loss: 2.000" in out
    assert "fps" in out
