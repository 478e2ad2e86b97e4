"""Restore ``JAX_PLATFORMS`` env semantics under platform-plugin hooks.

Some PJRT plugin shims (e.g. the axon tunnel's sitecustomize) register
themselves by rewriting ``jax_platforms`` to ``"<plugin>,cpu"`` at
interpreter start, which silently overrides an explicit
``JAX_PLATFORMS=cpu`` in the environment: ``jax.process_index()`` /
``jax.devices()`` then initialize the plugin backend anyway, and a
CPU-pinned subprocess (tests, multi-host gloo workers) ends up dialing
remote TPU hardware — or hanging when that transport is down.

``honor_platforms_env()`` re-asserts the user's env var over such a hook.
It is deliberately narrow: a no-op unless ``JAX_PLATFORMS`` is set AND
the live config added a platform the env never asked for.
"""

from __future__ import annotations

import os


def honor_platforms_env() -> None:
    env = os.environ.get("JAX_PLATFORMS", "").strip()
    if not env:
        return
    import jax

    cfg = jax.config.jax_platforms or ""
    env_set = {p.strip() for p in env.split(",") if p.strip()}
    cfg_set = {p.strip() for p in cfg.split(",") if p.strip()}
    if cfg_set - env_set:  # a hook injected platforms the env didn't name
        jax.config.update("jax_platforms", env)
