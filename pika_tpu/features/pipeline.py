"""On-device feature post-processing: splice, stride, CMVN, SpecAugment.

JAX equivalents of the reference's host-side numpy post-processing
(loader/otf_utt_loader.py:28-46,243-244) and GPU-side normalization /
augmentation (trainer/train_transducer_bmuf_otfaug.py:88-93,
utils/spec_augment.py).  All functions are shape-static and jit-safe so
the whole wave→features→model pipeline compiles into one XLA program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def splice(feats: jnp.ndarray, lctx: int, rctx: int, frame_lens: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Frame splicing with edge replication.

    ``feats`` is (B, T, D) (or (T, D)); output is (B, T, D*(lctx+1+rctx)).
    Matches ``splice`` in loader/otf_utt_loader.py:28-46: the first/last
    valid frame is replicated into the context padding.  When ``frame_lens``
    is given, replication of the *right* edge uses each element's own last
    valid frame rather than the padded buffer edge.
    """
    squeeze = feats.ndim == 2
    if squeeze:
        feats = feats[None]
    b, t, d = feats.shape
    if frame_lens is not None:
        # clamp gathered indices to [0, len-1] so right-context replication
        # uses the true last frame per element.
        idx = jnp.arange(t)
        ctx_offsets = jnp.arange(-lctx, rctx + 1)
        gather = idx[None, :, None] + ctx_offsets[None, None, :]  # (1, T, C)
        gather = jnp.clip(gather, 0, (frame_lens - 1)[:, None, None])
        out = jnp.take_along_axis(feats[:, :, None, :], gather[..., None], axis=1)
        out = out.reshape(b, t, (lctx + 1 + rctx) * d)
    else:
        pieces = []
        for off in range(-lctx, rctx + 1):
            idx = jnp.clip(jnp.arange(t) + off, 0, t - 1)
            pieces.append(feats[:, idx, :])
        out = jnp.concatenate(pieces, axis=-1)
    return out[0] if squeeze else out


def stride_subsample(feats: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Take every ``stride``-th frame (loader/otf_utt_loader.py:243-244)."""
    if stride == 1:
        return feats
    return feats[..., ::stride, :] if feats.ndim == 2 else feats[:, ::stride, :]


def strided_len(frame_lens, stride: int):
    """ceil(len / stride) — the loader's utt_len computation."""
    return (frame_lens + stride - 1) // stride


def model_output_len(frame_lens, model_lctx: int = 0, model_rctx: int = 0, model_stride: int = 1):
    """Length transform applied by the trainer before the loss
    (trainer/train_transducer_bmuf_otfaug.py:82-85)."""
    lens = frame_lens - model_lctx - model_rctx
    return lens // model_stride + jnp.where(lens % model_stride != 0, 1, 0)


def apply_cmvn(
    feats: jnp.ndarray,
    offset: jnp.ndarray,
    scale: jnp.ndarray,
    cmn: bool = False,
) -> jnp.ndarray:
    """Per-utterance CMN (optional) then global CMVN offset/scale.

    Matches trainer/train_transducer_bmuf_otfaug.py:88-91 exactly —
    including the detail that the CMN mean is taken over the padded length
    (padding frames replicate the last valid frame in the loader, so this
    is the reference's true behavior).
    """
    if cmn:
        feats = feats - jnp.mean(feats, axis=-2, keepdims=True)
    return (feats + offset) * scale


def spec_augment(
    key: jax.Array,
    feats: jnp.ndarray,
    max_freq_span: int,
    max_time_span: int,
) -> jnp.ndarray:
    """SpecAugment with one frequency span + one time span, shared across
    the batch (utils/spec_augment.py:12-20 semantics: span widths sampled
    uniformly from [0, max], start positions uniform over valid range)."""
    b, t, d = feats.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    freq_span = jax.random.randint(k1, (), 0, max_freq_span + 1)
    time_span = jax.random.randint(k2, (), 0, max_time_span + 1)
    # valid starts are [0, dim - span] inclusive (randint's hi is exclusive);
    # without the +1 the last frame/bin could never be masked.
    # INTENTIONAL deviation from the reference: its np.random.randint(0,
    # dim - span) excludes dim-span (so the final bin/frame is never
    # masked) and crashes when span == dim — this fixes the off-by-one;
    # do not "restore parity" here (ADVICE r3)
    freq_start = jax.random.randint(k3, (), 0, jnp.maximum(1, d - freq_span + 1))
    time_start = jax.random.randint(k4, (), 0, jnp.maximum(1, t - time_span + 1))
    freq_idx = jnp.arange(d)
    time_idx = jnp.arange(t)
    freq_mask = (freq_idx >= freq_start) & (freq_idx < freq_start + freq_span)
    time_mask = (time_idx >= time_start) & (time_idx < time_start + time_span)
    keep = ~(freq_mask[None, None, :] | time_mask[None, :, None])
    return feats * keep.astype(feats.dtype)


def pad_to_bucket(x: np.ndarray, target_len: int, axis: int = 0, mode: str = "edge") -> np.ndarray:
    """Host-side pad of a single array up to a bucket length."""
    pad = target_len - x.shape[axis]
    if pad <= 0:
        return np.take(x, np.arange(target_len), axis=axis)
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, mode=mode)
