"""Sweep Pallas fused-joint block sizes on the flagship shape — times the
channel kernels directly (fwd, and the two bwd kernels), chained.

    PYTHONPATH=. python tools/sweep_loss_blocks.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import itertools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pika_tpu.ops.rnnt_pallas import (
        joint_channels_pallas, joint_channels_pallas_bwd,
    )

    rng = np.random.default_rng(0)
    b, t, u1, h, v = 8, 250, 41, 1024, 6268
    ax = jnp.asarray(rng.standard_normal((b, t, h)).astype(np.float32) * 0.5)
    gx = jnp.asarray(rng.standard_normal((b, t, h)).astype(np.float32) * 0.5)
    ay = jnp.asarray(rng.standard_normal((b, u1, h)).astype(np.float32) * 0.5)
    gy = jnp.asarray(rng.standard_normal((b, u1, h)).astype(np.float32) * 0.5)
    w2 = jnp.asarray(rng.standard_normal((h, v)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.standard_normal((v,)).astype(np.float32) * 0.1)
    labels = jnp.asarray(rng.integers(1, v, (b, u1)).astype(np.int32))
    reps = 8

    for bt, bu, bv in itertools.product((128, 256), (4, 8, 16), (256, 512, 1024)):
        try:
            @jax.jit
            def run_fwd(ax_):
                def body(c, _):
                    lse, zb, zy = joint_channels_pallas(
                        ax_ + c * 1e-12, gx, ay, gy, w2, b2, labels,
                        block_t=bt, block_u=bu, block_v=bv)
                    s = lse.sum() + zb.sum() + zy.sum()
                    return c + s * 1e-20, s
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
                return c

            float(run_fwd(ax))
            t0 = time.perf_counter(); float(run_fwd(ax))
            fwd_ms = (time.perf_counter() - t0) / reps * 1000

            lse, zb, zy = joint_channels_pallas(ax, gx, ay, gy, w2, b2, labels,
                                                block_t=bt, block_u=bu, block_v=bv)
            dl = jnp.ones_like(lse) * 0.1
            dz = jnp.ones_like(zb) * -0.05
            dy = jnp.ones_like(zy) * -0.05

            @jax.jit
            def run_bwd(ax_):
                def body(c, _):
                    outs = joint_channels_pallas_bwd(
                        ax_ + c * 1e-12, gx, ay, gy, w2, b2, labels,
                        lse, dl, dz, dy, block_t=bt, block_u=bu, block_v=bv)
                    s = sum(o.sum() for o in outs)
                    return c + s * 1e-20, s
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
                return c

            float(run_bwd(ax))
            t0 = time.perf_counter(); float(run_bwd(ax))
            bwd_ms = (time.perf_counter() - t0) / reps * 1000
            print(f"bt={bt:3d} bu={bu:2d} bv={bv:4d}: fwd {fwd_ms:6.2f} ms, "
                  f"bwd {bwd_ms:6.2f} ms, total {fwd_ms + bwd_ms:6.2f} ms")
        except Exception as e:
            print(f"bt={bt:3d} bu={bu:2d} bv={bv:4d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
