"""Dtype utilities shared by the train and decode paths."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floats(tree, dtype):
    """Cast floating-point leaves to ``dtype`` (mixed-precision compute
    cast in either direction).  Gradients taken through this cast come
    back in the original dtype automatically."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def resolve_mm_dtype(mm_dtype):
    """Resolve a matmul compute-dtype spec: "auto" → bf16 on TPU (the
    MXU's native mode, ~2x f32 throughput) and None (f32) elsewhere;
    otherwise accept "bfloat16"/"float32"/None/jnp dtypes."""
    if mm_dtype == "auto":
        return jnp.bfloat16 if jax.default_backend() == "tpu" else None
    if mm_dtype in (None, "float32", jnp.float32):
        return None
    if mm_dtype in ("bfloat16", jnp.bfloat16):
        return jnp.bfloat16
    raise ValueError(f"unsupported mm_dtype {mm_dtype!r}")
