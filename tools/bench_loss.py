"""Fused RNN-T loss benchmark: pallas vs chunked-XLA backends on the
flagship joint shape, dependency-chained timing on the real chip.

    PYTHONPATH=. python tools/bench_loss.py [--mode fwd|fwdbwd]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--t", type=int, default=250)
    ap.add_argument("--u", type=int, default=40)
    ap.add_argument("--h", type=int, default=1024)
    ap.add_argument("--v", type=int, default=6268)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--backends", type=str, default="pallas,xla")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pika_tpu.ops.rnnt_loss import rnnt_loss_fused

    rng = np.random.default_rng(0)
    b, t, u1, h, v = args.b, args.t, args.u + 1, args.h, args.v
    ax = jnp.asarray(rng.standard_normal((b, t, h)).astype(np.float32) * 0.5)
    gx = jnp.asarray(rng.standard_normal((b, t, h)).astype(np.float32) * 0.5)
    ay = jnp.asarray(rng.standard_normal((b, u1, h)).astype(np.float32) * 0.5)
    gy = jnp.asarray(rng.standard_normal((b, u1, h)).astype(np.float32) * 0.5)
    w2 = jnp.asarray(rng.standard_normal((h, v)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.standard_normal((v,)).astype(np.float32) * 0.1)
    labels = jnp.asarray(rng.integers(1, v, (b, args.u)).astype(np.int32))
    t_len = jnp.asarray(np.full(b, t, np.int32))
    u_len = jnp.asarray(np.full(b, args.u, np.int32))

    for backend in args.backends.split(","):
        def loss_fn(ax_, gx_, ay_, gy_, w2_, b2_):
            return rnnt_loss_fused(ax_, gx_, ay_, gy_, w2_, b2_,
                                   labels, t_len, u_len, 16, backend).sum()

        for mode in ("fwd", "fwdbwd"):
            if mode == "fwd":
                fn = loss_fn
            else:
                fn = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5))

            @jax.jit
            def run(ax_, n):
                def body(c, _):
                    out = fn(ax_ + c * 1e-12, gx, ay, gy, w2, b2)
                    # consume EVERY gradient, or XLA dead-code-eliminates
                    # entire backward kernels (e.g. the dW2 pass)
                    s = out if mode == "fwd" else sum(g.sum() for g in out)
                    return c + s * 1e-20, s
                c, outs = jax.lax.scan(body, jnp.float32(0), None, length=args.reps)
                return c

            float(run(ax, args.reps))  # compile
            t0 = time.perf_counter()
            float(run(ax, args.reps))
            dt = (time.perf_counter() - t0) / args.reps * 1000
            print(f"{backend:7s} {mode:6s}: {dt:7.2f} ms")


if __name__ == "__main__":
    main()
