"""Flash-attention parity + speed check on the real chip.

Compares MultiHeadedAttention with use_flash=True against the exact
einsum path at flagship shapes (B, T, H) = (32, 960, 1024), fwd and
grad, then times both.  Run on the TPU:

    PYTHONPATH=. python tools/check_flash_attn.py [--batch 32] [--t 960]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--t", type=int, default=960)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--heads", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pika_tpu.models.transformer import MultiHeadedAttention

    K = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (args.batch, args.t, args.dim), jnp.float32)

    exact = MultiHeadedAttention(args.heads, args.dim, 0.0)
    flash = MultiHeadedAttention(args.heads, args.dim, 0.0, use_flash=True)
    v = exact.init({"params": K}, x, x, x)

    def run(mod):
        def f(v_, x_):
            out = mod.apply(v_, x_, x_, x_, deterministic=True)
            return out.sum(), out
        g = jax.jit(jax.value_and_grad(lambda v_, x_: f(v_, x_)[0], argnums=1))
        out = jax.jit(lambda v_, x_: f(v_, x_)[1])(v, x)
        _, dx = g(v, x)
        return np.asarray(out), np.asarray(dx), g

    out_e, dx_e, g_e = run(exact)
    out_f, dx_f, g_f = run(flash)
    rel = np.abs(out_f - out_e).max() / (np.abs(out_e).max() + 1e-9)
    rel_g = np.abs(dx_f - dx_e).max() / (np.abs(dx_e).max() + 1e-9)
    print(f"fwd max rel err {rel:.2e}; grad max rel err {rel_g:.2e}")
    assert rel < 5e-2 and rel_g < 5e-2, "flash parity failed"

    for name, g in (("exact", g_e), ("flash", g_f)):
        def chain(v_, x_):
            def body(c, _):
                _, dx = g(v_, c)
                return c + dx * 1e-20, dx.sum()
            _, s = jax.lax.scan(body, x_, None, length=5)
            return s.sum()
        cj = jax.jit(chain)
        float(cj(v, x))
        t0 = time.perf_counter()
        float(cj(v, x))
        dt = (time.perf_counter() - t0) / 5
        print(f"{name}: fwd+bwd {dt * 1000:.1f} ms")


if __name__ == "__main__":
    main()
