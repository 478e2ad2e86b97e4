"""Persistent XLA compilation cache for the CLI entry points.

Every recipe stage is a fresh Python process, and the flagship beam-decode
/ train-step programs take minutes to compile (the reference never pays
this: PyTorch has no whole-program compile).  JAX's persistent cache
makes the Nth invocation start hot — measured on the axon v5e transport:
33 s cold compile -> 0.45 s cache hit in a new process.

Enabled by every pika_tpu CLI main.  Controls:
  PIKA_CACHE_DIR          cache location (default ~/.cache/pika_tpu/xla)
  PIKA_NO_COMPILE_CACHE=1 disable entirely
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    if os.environ.get("PIKA_NO_COMPILE_CACHE") == "1":
        return
    cache_dir = os.environ.get(
        "PIKA_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "pika_tpu", "xla"),
    )
    try:
        import jax

        # TPU-only: CPU programs compile in well under a second, and
        # XLA:CPU cache entries are AOT machine code NOT keyed by host CPU
        # features — under a remote-compile hook (e.g. the axon tunnel's
        # PALLAS_AXON_REMOTE_COMPILE=1) they can be produced on a different
        # x86 machine, and reloading such an entry into a local CPU-mesh
        # run wedges a device thread (observed: collective-rendezvous
        # timeout -> process abort in the 8-device dryrun after a CLI main
        # had enabled the cache in-process).  Decided from the config
        # string, not jax.default_backend(), to avoid initializing a
        # possibly-remote backend just to configure a cache.  An UNSET
        # platform list enables the cache: it means the ambient default
        # backend, which is the accelerator on TPU hosts; on a plain
        # CPU-only host (no remote-compile hook) local AOT entries are
        # feature-matched to the machine that wrote them, so they are safe.
        first = (jax.config.jax_platforms or "").split(",")[0].strip()
        if first == "cpu":
            return
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except (OSError, AttributeError):  # read-only FS or very old jax
        pass
