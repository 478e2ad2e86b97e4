"""SRU — "Training RNNs as Fast as CNNs" — via associative scan.

The reference JIT-compiles raw CUDA kernels at import (modules/sru.py:70-367).
The SRU recurrence is a *diagonal linear* recurrence in c:

    c_t = g1_t · c_{t-1} + (1 − g1_t) · u0_t        (sru.py:107-110)
    h_t = (act(c_t) − x'_t) · g2_t + x'_t           (sru.py:111-115)

so on TPU it needs no kernel at all: the time dependency is a single
``jax.lax.associative_scan`` over (a, b) pairs with the affine-composition
monoid — O(log T) depth, fully vectorized over batch and features.  All
the pointwise math (u = xW projections, gates, highway) is plain XLA.

Layout matches the reference cell: ``weight`` has k·n_out columns per
direction (k = 4 when input dim ≠ output dim — the 4th block is the
highway transform of x), bias holds the two gate biases.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _affine_scan(a: jnp.ndarray, b: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Solve c_t = a_t * c_{t-1} + b_t (c_0 folded into b_1) via
    associative scan; returns all c_t."""

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, b_l * a_r + b_r

    _, c = jax.lax.associative_scan(combine, (a, b), axis=axis)
    return c


class SRUCell(nn.Module):
    n_in: int
    n_out: int
    bidirectional: bool = False
    activation: str = "tanh"   # 'tanh' | 'relu' | 'identity'
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, c0: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x (B, T, n_in) → (h (B, T, n_out·dirs), c_last)."""
        b, t, _ = x.shape
        dirs = 2 if self.bidirectional else 1
        out_size = self.n_out * dirs
        k = 4 if self.n_in != out_size else 3
        weight = self.param(
            "weight",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-((3.0 / self.n_in) ** 0.5),
                maxval=(3.0 / self.n_in) ** 0.5,
            ),
            (self.n_in, self.n_out * k * dirs),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.n_out * 2 * dirs,))

        u = x @ weight  # (B, T, n_out*k*dirs)
        act = {"tanh": jnp.tanh, "relu": nn.relu, "identity": lambda v: v}[self.activation]

        hs = []
        c_lasts = []
        for d in range(dirs):
            ud = u[..., d * self.n_out * k : (d + 1) * self.n_out * k]
            ud = ud.reshape(b, t, self.n_out, k)
            u0 = ud[..., 0]
            g1 = jax.nn.sigmoid(ud[..., 1] + bias[d * 2 * self.n_out : d * 2 * self.n_out + self.n_out])
            g2 = jax.nn.sigmoid(ud[..., 2] + bias[d * 2 * self.n_out + self.n_out : (d + 1) * 2 * self.n_out])
            # k == 3 requires n_in == n_out*dirs; the highway input is the
            # direction's slice of x (CUDA kernel: xp = x + col with
            # ncols_x spanning both directions, sru.py:102)
            xp = ud[..., 3] if k == 4 else x[..., d * self.n_out : (d + 1) * self.n_out]
            if d == 1:
                u0, g1, g2, xp = (z[:, ::-1] for z in (u0, g1, g2, xp))
            bterm = (1.0 - g1) * u0
            if c0 is not None:
                c_init = c0[..., d * self.n_out : (d + 1) * self.n_out]
                bterm = bterm.at[:, 0].add(g1[:, 0] * c_init)
            c = _affine_scan(g1, bterm, axis=1)
            val = act(c)
            if self.dropout_rate > 0:
                val = nn.Dropout(self.dropout_rate)(val, deterministic=deterministic)
            h = (val - xp) * g2 + xp
            c_lasts.append(c[:, -1])
            if d == 1:
                h = h[:, ::-1]
            hs.append(h)
        h_out = hs[0] if dirs == 1 else jnp.concatenate(hs, axis=-1)
        return h_out, jnp.concatenate(c_lasts, axis=-1)


class SRU(nn.Module):
    """Multi-layer SRU (modules/sru.py:549-633)."""

    input_size: int
    hidden_size: int
    num_layers: int = 2
    bidirectional: bool = False
    activation: str = "tanh"
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        dirs = 2 if self.bidirectional else 1
        out = x
        c_finals = []
        for i in range(self.num_layers):
            n_in = self.input_size if i == 0 else self.hidden_size * dirs
            out, c_last = SRUCell(
                n_in, self.hidden_size, self.bidirectional,
                self.activation, self.dropout_rate, name=f"cell_{i}",
            )(out, deterministic=deterministic)
            c_finals.append(c_last)
        return out, jnp.stack(c_finals)
