"""LSTM layers via ``lax.scan`` — the TPU-native replacement for cuDNN LSTM.

The reference uses ``nn.LSTM`` (cuDNN) for the transducer encoder/prediction
net (trainer/model/transducer.py:39-44,56-61) and LAS (las.py:543).  On TPU
the idiomatic form is a fused cell stepped with ``lax.scan``: the 4-gate
projection is one MXU matmul per step, and XLA pipelines the scan.

Semantics matched to the reference:
  * the encoder uses pack_padded_sequence → outputs at padding are zero and
    hidden state does not advance past each sequence's true length
    (``lengths`` argument);
  * the prediction net runs un-packed over padded labels (transducer.py:93-97)
    → pass ``lengths=None``;
  * bidirectional halves the hidden size per direction and concatenates
    (transducer.py:35-44).

Weights use torch gate ordering (i, f, g, o) and a single fused bias so a
converted reference checkpoint (b_ih + b_hh summed) drops straight in.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def lstm_cell_step(wih: jnp.ndarray, whh: jnp.ndarray, b: jnp.ndarray, x, h, c):
    """One LSTM cell step: x (B, D), h/c (B, H) → (h', c')."""
    z = x @ wih + h @ whh + b
    i, f, g, o = jnp.split(z, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _scan_direction(wih, whh, b, x_tm, mask_tm, h0, c0):
    """Scan a single LSTM direction over time-major input (T, B, D).

    The input projection x @ Wih is hoisted out of the scan as one large
    (T*B, D) @ (D, 4H) MXU matmul; only the h @ Whh recurrence stays
    sequential — the standard TPU LSTM decomposition."""
    x_proj = jnp.einsum("tbd,dh->tbh", x_tm, wih, preferred_element_type=x_tm.dtype) + b

    def step(carry, inp):
        h, c = carry
        if mask_tm is None:
            xp = inp
        else:
            xp, mt = inp
        z = xp + h @ whh
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        if mask_tm is None:
            return (h_new, c_new), h_new
        keep = mt[:, None]
        h_new = keep * h_new + (1 - keep) * h
        c_new = keep * c_new + (1 - keep) * c
        return (h_new, c_new), h_new * keep

    xs = x_proj if mask_tm is None else (x_proj, mask_tm)
    (hT, cT), ys = jax.lax.scan(step, (h0, c0), xs)
    return ys, hT, cT


def _reverse_padded(x: jnp.ndarray, lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Reverse each sequence within its true length (padding stays put)."""
    t = x.shape[1]
    if lengths is None:
        return x[:, ::-1]
    idx = jnp.arange(t)[None, :]
    rev = lengths[:, None] - 1 - idx
    rev = jnp.where(idx < lengths[:, None], rev, idx)
    return jnp.take_along_axis(x, rev[..., None], axis=1)


class LSTM(nn.Module):
    """Multi-layer (optionally bidirectional) LSTM over (B, T, D) inputs.

    Returns ``(outputs, (h, c))`` — outputs (B, T, H_total); h/c stacked as
    (num_layers * num_directions, B, H_dir), torch layout.
    """

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        initial_state: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        deterministic: bool = True,
    ):
        b, t, _ = x.shape
        dirs = 2 if self.bidirectional else 1
        h_dir = self.hidden_size // dirs if self.bidirectional else self.hidden_size
        mask = None
        if lengths is not None:
            mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(x.dtype)
            mask_tm = jnp.swapaxes(mask, 0, 1)
        else:
            mask_tm = None

        final_h, final_c = [], []
        out = x
        for layer in range(self.num_layers):
            in_dim = out.shape[-1]
            layer_outs = []
            for d in range(dirs):
                prefix = f"l{layer}_d{d}"
                wih = self.param(f"{prefix}_wih", nn.initializers.lecun_normal(), (in_dim, 4 * h_dir))
                whh = self.param(f"{prefix}_whh", nn.initializers.orthogonal(), (h_dir, 4 * h_dir))
                bias = self.param(f"{prefix}_b", nn.initializers.zeros, (4 * h_dir,))
                if initial_state is not None:
                    idx = layer * dirs + d
                    h0, c0 = initial_state[0][idx], initial_state[1][idx]
                else:
                    h0 = jnp.zeros((b, h_dir), x.dtype)
                    c0 = jnp.zeros((b, h_dir), x.dtype)
                seq = out if d == 0 else _reverse_padded(out, lengths)
                ys, hT, cT = _scan_direction(
                    wih, whh, bias, jnp.swapaxes(seq, 0, 1), mask_tm, h0, c0
                )
                ys = jnp.swapaxes(ys, 0, 1)
                if d == 1:
                    ys = _reverse_padded(ys, lengths)
                layer_outs.append(ys)
                final_h.append(hT)
                final_c.append(cT)
            out = layer_outs[0] if dirs == 1 else jnp.concatenate(layer_outs, axis=-1)
            if self.dropout_rate > 0.0 and layer < self.num_layers - 1:
                out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)
        return out, (jnp.stack(final_h), jnp.stack(final_c))


def lstm_stack_step(params: dict, num_layers: int, x, h, c):
    """Incremental one-token step through a unidirectional LSTM stack.

    ``params`` is the param dict of an ``LSTM`` module (unidirectional);
    ``h``/``c`` are (num_layers, B, H).  Returns (top_h, new_h, new_c).
    Used by the beam-search decoder's prediction-net update
    (mirrors decoder/transducer_decoder.py:144-150).
    """
    new_h, new_c = [], []
    inp = x
    for layer in range(num_layers):
        prefix = f"l{layer}_d0"
        h_new, c_new = lstm_cell_step(
            params[f"{prefix}_wih"], params[f"{prefix}_whh"], params[f"{prefix}_b"],
            inp, h[layer], c[layer],
        )
        new_h.append(h_new)
        new_c.append(c_new)
        inp = h_new
    return inp, jnp.stack(new_h), jnp.stack(new_c)
