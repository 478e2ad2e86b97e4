"""Measure the chip's achievable matmul TFLOP/s at the flagship's shapes.

VERDICT round-2 weak #1: the "compute-bound at ~58 TF/s" claim rested on
an uncommitted ceiling figure.  This bench makes the ceiling a committed,
rerunnable artifact: it times dependency-chained matmul loops (the only
timing discipline this PJRT transport respects — see bench.py's header)
at (a) large square shapes, which bound the chip's practical peak, and
(b) the flagship training step's actual dominant shapes, which bound what
the step could ever reach.

Each measured config runs a jitted ``lax.scan`` whose carry is the
activation: ``y = a @ W1; a = normalize(y) @ W2`` — every step depends on
the previous one, so nothing can be elided or overlapped away — followed
by a ``float()`` host materialization.  Two repetitions must agree within
10%.

Flagship dominant shapes (see bench.py:flop_model; B=8, 10 s utts →
T=998 frames, T/4=250 after the stride-4 TDNN, U=40, H=1024, V=6268):
  - TDNN 3-tap conv as matmul:  (B*T, 3H) x (3H, H)
  - attention/QKVO projection:  (B*T, H)  x (H, H)
  - transformer FFN:            (B*T, H)  x (H, 4H)
  - joint vocab projection:     (B*T4*(U+1), H) x (H, V)
  - LSTM per-symbol gates:      (B, H) x (H, 4H)   [M=8: latency/BW-bound]

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_matmul.py
Prints one line per shape to stdout; the SUMMARY line gives the ceiling.
"""

from __future__ import annotations

import sys
import time

import numpy as np

N_REPS = 2
TOLERANCE = 0.10


def bench_shape(jax, jnp, name, m, k, n, dtype, n_steps):
    """TF/s for a dependency-chained (m,k)x(k,n) + (m,n)x(n,k) loop."""
    rng = np.random.default_rng(0)
    a0 = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32), dtype)
    w1 = jnp.asarray(
        (rng.standard_normal((k, n)) / np.sqrt(k)).astype(np.float32), dtype)
    w2 = jnp.asarray(
        (rng.standard_normal((n, k)) / np.sqrt(n)).astype(np.float32), dtype)

    # weights are ARGUMENTS, not closure constants: a closed-over device
    # array embeds as an inline literal in the lowered program, which this
    # transport's remote-compile endpoint rejects past ~100 MB (HTTP 413)
    def run(a, w1, w2):
        def body(carry, _):
            y = carry @ w1
            # cheap normalization: keeps bf16 from overflowing over the
            # chain AND adds a data dependency XLA cannot remove
            y = y * jax.lax.rsqrt(jnp.mean(jnp.square(y)) + 1e-6)
            a2 = y @ w2
            a2 = a2 * jax.lax.rsqrt(jnp.mean(jnp.square(a2)) + 1e-6)
            return a2, ()
        a, _ = jax.lax.scan(body, a, None, length=n_steps)
        return jnp.sum(a[0, :1])

    run_j = jax.jit(run)
    float(run_j(a0, w1, w2))  # compile + warm

    times = []
    for _ in range(N_REPS):
        t0 = time.perf_counter()
        float(run_j(a0, w1, w2))
        times.append(time.perf_counter() - t0)
    spread = (max(times) - min(times)) / min(times)
    flops = 2 * 2 * m * k * n * n_steps  # two matmuls per step
    tfs = flops / min(times) / 1e12
    status = "ok" if spread <= TOLERANCE else "NOISY"
    print(f"{name:34s} M={m:<7d} K={k:<5d} N={n:<5d} {str(dtype.__name__ if hasattr(dtype, '__name__') else dtype):9s} "
          f"{tfs:7.1f} TF/s  (spread {spread * 100:4.1f}% {status})")
    sys.stdout.flush()
    return tfs, spread


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind})", file=sys.stderr)

    results = {}

    # (a) ceiling: large square bf16 — practical peak for this chip
    for size in (1024, 2048, 4096, 8192):
        steps = max(8, int(4e12 / (4 * size ** 3)))  # ~2 TFLOP per rep min
        tfs, _ = bench_shape(jax, jnp, f"square{size}", size, size, size,
                             jnp.bfloat16, steps)
        results[f"square{size}_bf16"] = tfs
    # f32 inputs at default precision (what the train step actually runs:
    # bf16 MXU multiplies with f32 accumulation)
    tfs, _ = bench_shape(jax, jnp, "square4096 f32-default", 4096, 4096,
                         4096, jnp.float32, 60)
    results["square4096_f32"] = tfs

    # (b) flagship shapes (B=8, T=998, T4=250, U=40, H=1024, V=6268)
    B, T, T4, U, H, V = 8, 998, 250, 40, 1024, 6268
    flag = [
        ("tdnn_conv (BT,3H)x(3H,H)", B * T, 3 * H, H),
        ("qkvo_proj (BT,H)x(H,H)", B * T, H, H),
        ("ffn (BT,H)x(H,4H)", B * T, H, 4 * H),
        ("joint_vocab (BT4(U+1),H)x(H,V)", B * T4 * (U + 1), H, V),
        ("lstm_gates (B,H)x(H,4H)", B, H, 4 * H),
    ]
    for name, m, k, n in flag:
        steps = max(8, min(4000, int(2e12 / (4 * m * k * n))))
        for dt in (jnp.bfloat16, jnp.float32):
            tfs, _ = bench_shape(jax, jnp, name, m, k, n, dt, steps)
            results[f"{name.split()[0]}_{dt.__name__}"] = tfs

    ceiling = max(v for k, v in results.items() if k.startswith("square"))
    print(f"\nSUMMARY ceiling_bf16={ceiling:.1f} TF/s; "
          f"flagship-shape range "
          f"{min(v for k, v in results.items() if not k.startswith('square')):.1f}"
          f"-{max(v for k, v in results.items() if not k.startswith('square')):.1f} TF/s")


if __name__ == "__main__":
    main()
