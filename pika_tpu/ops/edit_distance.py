"""Vectorized Levenshtein distance in JAX — replaces the ``editdistance``
C++ pip used by MBR training (trainer/train_transducer_mbr_bmuf_otfaug.py:24,188).

The row update's within-row dependency (insertions) is solved in closed
form: with base[i] = min(prev[i]+1, prev[i-1]+sub_i), the row is
``min(base, i + cummin(base - i))`` — one associative scan instead of a
sequential inner loop, so the whole (ref × hyp) DP is a single
``lax.scan`` over hyp positions, vmapped over pairs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def edit_distance_jax(ref: jnp.ndarray, ref_len, hyp: jnp.ndarray, hyp_len) -> jnp.ndarray:
    """Distance between padded int sequences ref (U,) and hyp (V,)."""
    u = ref.shape[0]
    i = jnp.arange(u + 1, dtype=jnp.float32)
    row0 = i  # distance vs empty hyp

    def step(carry, h_tok_and_j):
        prev = carry
        h_tok, j = h_tok_and_j
        sub_cost = jnp.where(ref == h_tok, 0.0, 1.0)  # (U,)
        base_tail = jnp.minimum(prev[1:] + 1.0, prev[:-1] + sub_cost)
        base = jnp.concatenate([jnp.array([j + 1.0]), base_tail])
        shifted = jax.lax.associative_scan(jnp.minimum, base - i)
        cur = jnp.minimum(base, i + shifted)
        cur = jnp.where(j < hyp_len, cur, prev)
        return cur, None

    final, _ = jax.lax.scan(
        step, row0, (hyp, jnp.arange(hyp.shape[0], dtype=jnp.float32))
    )
    return final[jnp.clip(ref_len, 0, u)].astype(jnp.int32)


def edit_distance_batch_jax(refs, ref_lens, hyps, hyp_lens):
    """(N, U) refs vs (N, V) hyps → (N,) distances."""
    return jax.vmap(edit_distance_jax)(refs, ref_lens, hyps, hyp_lens)
