"""SRU tests: associative-scan recurrence vs a literal per-step loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pika_tpu.models.sru import SRU, SRUCell

K = jax.random.PRNGKey(21)


def _ref_sru_cell(x, weight, bias, n_out, bidirectional, act=np.tanh):
    """Literal transcription of the CUDA sru_fwd loop (sru.py:95-120)."""
    b, t, n_in = x.shape
    dirs = 2 if bidirectional else 1
    out_size = n_out * dirs
    k = 4 if n_in != out_size else 3
    u = x @ weight
    hs = []
    for d in range(dirs):
        ud = u[..., d * n_out * k : (d + 1) * n_out * k].reshape(b, t, n_out, k)
        bias1 = bias[d * 2 * n_out : d * 2 * n_out + n_out]
        bias2 = bias[d * 2 * n_out + n_out : (d + 1) * 2 * n_out]
        h = np.zeros((b, t, n_out))
        time_order = range(t) if d == 0 else range(t - 1, -1, -1)
        cur = np.zeros((b, n_out))
        for row in time_order:
            u0 = ud[:, row, :, 0]
            g1 = 1 / (1 + np.exp(-(ud[:, row, :, 1] + bias1)))
            g2 = 1 / (1 + np.exp(-(ud[:, row, :, 2] + bias2)))
            cur = (cur - u0) * g1 + u0
            if k == 4:
                xp = ud[:, row, :, 3]
            else:
                xp = x[:, row, d * n_out : (d + 1) * n_out]
            h[:, row] = (act(cur) - xp) * g2 + xp
        hs.append(h)
    return hs[0] if dirs == 1 else np.concatenate(hs, axis=-1)


@pytest.mark.parametrize("bidi,n_in,n_out", [(False, 8, 12), (False, 12, 12), (True, 8, 6)])
def test_sru_cell_matches_loop(rng, bidi, n_in, n_out):
    cell = SRUCell(n_in, n_out, bidirectional=bidi)
    x = jnp.asarray(rng.standard_normal((2, 9, n_in)).astype(np.float32))
    variables = cell.init(K, x)
    h, c_last = cell.apply(variables, x)
    ref = _ref_sru_cell(
        np.asarray(x), np.asarray(variables["params"]["weight"]),
        np.asarray(variables["params"]["bias"]), n_out, bidi,
    )
    np.testing.assert_allclose(np.asarray(h), ref, rtol=2e-5, atol=1e-6)


def test_sru_multilayer_shapes(rng):
    sru = SRU(input_size=8, hidden_size=16, num_layers=3, bidirectional=True)
    x = jnp.asarray(rng.standard_normal((2, 11, 8)).astype(np.float32))
    variables = sru.init(K, x)
    h, c = sru.apply(variables, x)
    assert h.shape == (2, 11, 32)
    assert c.shape == (3, 2, 32)
