"""Characterize the host→device transport: latency vs bandwidth, dtype
effects, and whether transfers overlap with compute."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    # latency/bandwidth curve
    for mb in (0.01, 0.1, 1.0, 5.0, 20.0):
        n = int(mb * 1e6 / 4)
        reps = 5
        ts = []
        for r in range(reps):
            x = (rng.standard_normal(n) * 100).astype(np.float32)
            t0 = time.perf_counter()
            d = jax.device_put(x)
            np.asarray(d[:1])
            ts.append(time.perf_counter() - t0)
        best = min(ts[1:])
        print(f"H2D {mb:6.2f} MB: best {best * 1000:7.1f} ms "
              f"({mb / best:6.1f} MB/s)")

    # int16 vs float32 for the same logical batch
    wav_f32 = (rng.standard_normal((8, 160000)) * 4000).astype(np.float32)
    wav_i16 = wav_f32.astype(np.int16)
    for name, arr in (("f32", wav_f32), ("i16", wav_i16)):
        ts = []
        for r in range(4):
            a = arr + np.asarray(r, arr.dtype)
            t0 = time.perf_counter()
            d = jax.device_put(a)
            np.asarray(d[:1, :1])
            ts.append(time.perf_counter() - t0)
        print(f"batch wavs {name} ({arr.nbytes / 1e6:.1f} MB): "
              f"best {min(ts[1:]) * 1000:.1f} ms")

    # D2H for the params-sized fetch
    big = (rng.standard_normal(57_000_000) * 0.1).astype(np.float32)
    dbig = jax.device_put(big)
    np.asarray(dbig[:1])
    t0 = time.perf_counter()
    _ = np.asarray(dbig)
    dt = time.perf_counter() - t0
    print(f"D2H 228 MB: {dt:.2f}s ({228 / dt:.1f} MB/s)")

    # do H2D transfers overlap compute?  run a long matmul chain, then
    # immediately device_put a batch; if overlapped, the put returns and
    # materializes while the chain still runs.
    a = jax.device_put((rng.standard_normal((4096, 4096))).astype(np.float32))

    @jax.jit
    def chain(x):
        def body(c, _):
            return jnp.tanh(c @ a), ()
        y, _ = jax.lax.scan(body, x, None, length=60)
        return y

    chain(a).block_until_ready()
    t0 = time.perf_counter()
    out = chain(a)
    t_dispatch = time.perf_counter() - t0
    t0 = time.perf_counter()
    d = jax.device_put(wav_f32 + 1.0)
    np.asarray(d[:1, :1])
    t_put = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(out[0, 0])
    t_wait = time.perf_counter() - t0
    print(f"during-compute: dispatch {t_dispatch * 1000:.1f} ms, "
          f"H2D-while-running {t_put * 1000:.1f} ms, "
          f"remaining-compute wait {t_wait * 1000:.1f} ms")
    print("(if H2D-while-running >> idle H2D, transfers serialize with compute)")


if __name__ == "__main__":
    main()
