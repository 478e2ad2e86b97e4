"""Attention-path options: the default path must be untouched, cheap
dropout must be unbiased, and the flash flag must fall back to the exact
einsum path wherever the kernel cannot reproduce the semantics (CPU
backend, masks, relative positions, attention-prob dropout).  Flash
numerical parity on real hardware is checked by tools/check_flash_attn.py
(the suite runs on CPU where the Pallas kernel is interpret-only)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pika_tpu.models.transformer import MultiHeadedAttention, TransformerEncoderLayer

K = jax.random.PRNGKey(0)


def _mha(dropout=0.0, **kw):
    return MultiHeadedAttention(4, 64, dropout, **kw)


def _data(b=2, t=12, d=64):
    return jax.random.normal(jax.random.PRNGKey(1), (b, t, d))


def test_flag_defaults_change_nothing():
    """attn_flash/attn_cheap_dropout default OFF must be bitwise inert."""
    x = _data()
    base = _mha(0.2)
    v = base.init({"params": K, "dropout": jax.random.PRNGKey(2)}, x, x, x)
    ref = base.apply(v, x, x, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(3)})
    flagged = _mha(0.2, use_flash=False, cheap_dropout=False)
    out = flagged.apply(v, x, x, x, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(3)})
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_flash_falls_back_exactly_off_tpu():
    """On CPU the flash flag must take the exact einsum path."""
    x = _data()
    m = _mha(0.0)
    v = m.init({"params": K}, x, x, x)
    ref = m.apply(v, x, x, x, deterministic=True)
    out = _mha(0.0, use_flash=True).apply(v, x, x, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_cheap_dropout_unbiased_and_head_shared():
    """E[cheap-dropout(attn)] == attn; the mask is shared across heads."""
    rate = 0.3
    x = _data(b=1, t=8)
    m = _mha(rate, cheap_dropout=True)
    v = m.init({"params": K, "dropout": jax.random.PRNGKey(2)}, x, x, x)
    ref = m.apply(v, x, x, x, deterministic=True)
    outs = []
    for i in range(600):
        outs.append(np.asarray(m.apply(
            v, x, x, x, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(100 + i)})))
    mean = np.mean(outs, axis=0)
    # the final linear is affine, so unbiased probs => unbiased output
    np.testing.assert_allclose(mean, np.asarray(ref), atol=0.15)


def test_encoder_layer_options_thread_through():
    x = _data()
    layer = TransformerEncoderLayer(64, 4, 128, 0.2,
                                    attn_flash=True, attn_cheap_dropout=True)
    v = layer.init({"params": K, "dropout": jax.random.PRNGKey(2)}, x, None, False)
    out = layer.apply(v, x, None, False, rngs={"dropout": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(out)).all()
