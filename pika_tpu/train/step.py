"""Fused train/eval steps: waveforms → features → model → loss in one jit.

The reference splits this across loader threads (Kaldi fbank on host),
a .cuda() transfer, GPU-side CMVN/SpecAugment and model forward
(trainer/train_transducer_bmuf_otfaug.py:71-110).  Here the entire chain
from padded raw waveforms to the transducer loss is one XLA program: the
loader only reads/augments/pads PCM on host; dither, fbank, splice,
stride, CMVN, SpecAugment, encoder/decoder/joint and the fused RNN-T loss
all compile together — HBM traffic is minimized and there is exactly one
host→device transfer per batch.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pika_tpu.features.fbank import FbankConfig, make_fbank_fn
from pika_tpu.features.pipeline import (
    apply_cmvn,
    spec_augment,
    splice,
    strided_len,
    stride_subsample,
)
from pika_tpu.models.transducer import Transducer
from pika_tpu.ops.rnnt_loss import rnnt_loss_fused
from pika_tpu.utils.dtypes import cast_floats  # re-exported for callers


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any = None


@dataclasses.dataclass(frozen=True)
class FeaturizerConfig:
    fbank: FbankConfig
    max_samples: int
    lctx: int = 0
    rctx: int = 0
    stride: int = 1
    cmn: bool = False
    spec_augment: bool = False
    max_freq_span: int = 15
    max_time_span: int = 35


def make_featurizer(cfg: FeaturizerConfig, cmvn_offset=None, cmvn_scale=None):
    """Build ``featurize(key, wavs, wav_lens, train) -> (feats, feat_lens)``.

    Input waveforms are float32 in int16 scale, padded to ``max_samples``.
    Output features are spliced/strided/normalized, ready for the encoder.
    """
    fbank = make_fbank_fn(cfg.fbank, cfg.max_samples)

    def featurize(key, wavs, wav_lens, train: bool = True):
        # waveforms may arrive as int16 (the loader's values are integral;
        # shipping int16 halves H2D bytes) — promote on device
        wavs = wavs.astype(jnp.float32)
        kd, ks = (None, None) if key is None else jax.random.split(key)
        feats, frame_lens = fbank(wavs, wav_lens, key=kd if train else None)
        feats = splice(feats, cfg.lctx, cfg.rctx, frame_lens=frame_lens)
        feats = stride_subsample(feats, cfg.stride)
        feat_lens = strided_len(frame_lens, cfg.stride)
        if cmvn_offset is not None:
            feats = apply_cmvn(feats, cmvn_offset, cmvn_scale, cmn=cfg.cmn)
        if cfg.spec_augment and train and key is not None:
            feats = spec_augment(ks, feats, cfg.max_freq_span, cfg.max_time_span)
        return feats, feat_lens

    return featurize


def make_feats_featurizer(
    cmvn_offset=None,
    cmvn_scale=None,
    cmn: bool = False,
    use_spec_augment: bool = False,
    max_freq_span: int = 15,
    max_time_span: int = 35,
):
    """Featurizer over PRECOMPUTED features (the --loader utt training
    path, reference loader/utt_loader.py): the loader already did
    splice/stride in the feature domain on host, so on device only CMVN
    and SpecAugment remain.  Same signature as ``make_featurizer``'s
    result, so the fused train/eval steps are loader-agnostic."""

    def featurize(key, feats, feat_lens, train: bool = True):
        feats = feats.astype(jnp.float32)
        if cmvn_offset is not None:
            feats = apply_cmvn(feats, cmvn_offset, cmvn_scale, cmn=cmn)
        if use_spec_augment and train and key is not None:
            feats = spec_augment(key, feats, max_freq_span, max_time_span)
        return feats, feat_lens

    return featurize


def batch_inputs(batch):
    """The step input pair: raw waveforms (--loader otf, fused fbank on
    device) or precomputed features (--loader utt).  Key presence is
    static under jit, so both compile to straight-line programs."""
    if "wavs" in batch:
        return batch["wavs"], batch["wav_lens"]
    return batch["feats"], batch["feat_lens"]


def transducer_loss(
    model: Transducer,
    params,
    batch_stats,
    feats,
    feat_lens,
    labels,
    label_lens,
    train: bool,
    dropout_key=None,
    loss_chunk: int = 32,
    loss_backend: str = "auto",
    pruned_range: int = 0,
    simple_scale: float = 0.5,
    pruned_scale: float = 1.0,
):
    """Fused-loss forward; returns (loss_sum, new_batch_stats).

    ``pruned_range > 0`` switches to the pruned objective
    (ops/rnnt_pruned.py): ``pruned_scale`` times the full gated joint's
    loss on a per-frame band of ``pruned_range`` label positions picked by
    the additive simple joint, plus ``simple_scale`` times the simple
    loss.  Requires a model built with ``config.simple_joint=True``.
    ``pruned_scale < 1`` is the k2-style warmup: early in training the
    simple joint's alignment is noise, so the band is noise — the
    trainers down-weight the banded term (0.1) for the first
    ``--pruned_warmup_epochs`` so the simple heads stabilize first
    (without it, cold-start collapses into a degenerate all-emissions-
    up-front alignment that the band then locks in)."""
    if loss_backend == "auto":
        loss_backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    mutable = ["batch_stats"] if (batch_stats is not None and train) else False
    rngs = {"dropout": dropout_key} if dropout_key is not None else None

    enc_lens = model.apply(variables, feat_lens, method=Transducer.encoder_out_len)

    def fwd(mdl):
        enc = mdl.encode(feats, feat_lens, train=train)
        dec = mdl.predict(labels, label_lens, train=train)
        ax, gx, ay, gy = mdl.joint_factors(enc, dec)
        w2, b2 = mdl.joint_params()
        simple = mdl.simple_factors(enc, dec) if pruned_range > 0 else None
        return ax, gx, ay, gy, w2, b2, simple

    out = model.apply(variables, method=fwd, mutable=mutable, rngs=rngs)
    if mutable:
        (ax, gx, ay, gy, w2, b2, simple), new_vars = out
        new_stats = new_vars.get("batch_stats", batch_stats)
    else:
        ax, gx, ay, gy, w2, b2, simple = out
        new_stats = batch_stats
    # The fused loss kernels take f32 factors (their MXU matmuls downcast
    # to bf16 internally with f32 accumulation); under bf16 compute the
    # model emits bf16 factors, and feeding those through shifts Mosaic's
    # kernel-stack budget past the 16MB scoped-VMEM limit.  Casting here
    # keeps one tested kernel configuration for every compute_dtype.
    ax, gx, ay, gy, w2, b2 = (x.astype(jnp.float32)
                              for x in (ax, gx, ay, gy, w2, b2))
    if pruned_range > 0:
        from pika_tpu.ops.rnnt_pruned import (prune_ranges, rnnt_loss_pruned,
                                              rnnt_loss_simple)

        am, lm = (x.astype(jnp.float32) for x in simple)
        simple_losses, (blp, elp) = rnnt_loss_simple(
            am, lm, labels, enc_lens, label_lens)
        s_begin = prune_ranges(blp, elp, labels, enc_lens, label_lens,
                               pruned_range)
        pruned_losses = rnnt_loss_pruned(
            ax, gx, ay, gy, w2, b2, labels, enc_lens, label_lens,
            s_begin, pruned_range, chunk=max(loss_chunk, 64))
        total = (pruned_scale * pruned_losses.sum()
                 + simple_scale * simple_losses.sum())
        return total, new_stats
    losses = rnnt_loss_fused(
        ax, gx, ay, gy, w2, b2, labels, enc_lens, label_lens, loss_chunk, loss_backend
    )
    return losses.sum(), new_stats




def make_train_step(
    model: Transducer,
    tx: optax.GradientTransformation,
    featurizer: Callable,
    loss_chunk: int = 32,
    loss_backend: str = "auto",
    compute_dtype=None,
    donate: bool = True,
    jit: bool = True,
    pruned_range: int = 0,
    simple_scale: float = 0.5,
    pruned_scale: float = 1.0,
):
    """Build the jitted train step.

    batch = dict(wavs, wav_lens, labels, label_lens) — all padded static
    shapes.  Returns (new_state, metrics) where metrics has the summed loss
    and total label count (the reference's per-frame loss normalizer,
    utils/logger.py).

    ``compute_dtype=jnp.bfloat16`` runs the model forward/backward in bf16
    (master params, optimizer state, and gradients stay float32; bf16's
    float32-range exponent needs no loss scaling).  The loss DP itself
    always runs in float32 inside the fused kernels.
    """

    def step_fn(state: TrainState, batch, key):
        kf, kd = jax.random.split(key)
        x, x_lens = batch_inputs(batch)
        feats, feat_lens = featurizer(kf, x, x_lens, True)
        enc_in_lens = feat_lens

        def loss_fn(params):
            stats = state.batch_stats
            f = feats
            if compute_dtype is not None:
                params = cast_floats(params, compute_dtype)
                stats = cast_floats(stats, compute_dtype)
                f = feats.astype(compute_dtype)
            loss, new_stats = transducer_loss(
                model, params, stats,
                f, enc_in_lens, batch["labels"], batch["label_lens"],
                train=True, dropout_key=kd,
                loss_chunk=loss_chunk, loss_backend=loss_backend,
                pruned_range=pruned_range, simple_scale=simple_scale,
                pruned_scale=pruned_scale,
            )
            if compute_dtype is not None:
                new_stats = cast_floats(new_stats, jnp.float32)
            return loss.astype(jnp.float32), new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt,
            batch_stats=new_stats,
        )
        metrics = {
            "loss": loss,
            "num_labels": batch["label_lens"].sum(),
            "num_frames": feat_lens.sum(),
        }
        return new_state, metrics

    if not jit:
        return step_fn
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_scanned_step(step_fn: Callable) -> Callable:
    """Wrap a ``(state, batch, key) -> (state, metrics)`` step into a
    K-steps-per-dispatch scan: ``(state, xs, key) -> (state, metrics[K])``
    with ``xs = {"batch": <dict of (K, ...) arrays>, "apply": (K,) bool}``.

    One XLA program + one H2D transfer covers K batches (amortizing
    per-dispatch/transfer latency); ragged tail groups are padded with a
    repeated batch and masked out exactly — where ``apply`` is False the
    state update is a no-op and metrics are zeroed.
    """

    def multi_step(state, xs, key):
        def body(carry, x):
            st, k = carry
            k, sub = jax.random.split(k)
            new_st, m = step_fn(st, x["batch"], sub)
            new_st = jax.tree_util.tree_map(
                lambda a, b: jnp.where(x["apply"], a, b), new_st, st)
            m = {kk: jnp.where(x["apply"], vv, jnp.zeros_like(vv))
                 for kk, vv in m.items()}
            return (new_st, k), m
        (state, _), ms = jax.lax.scan(body, (state, key), xs)
        return state, ms

    return multi_step


def make_eval_step(model, featurizer, loss_chunk: int = 32, loss_backend: str = "auto"):
    def step_fn(state: TrainState, batch):
        x, x_lens = batch_inputs(batch)
        feats, feat_lens = featurizer(None, x, x_lens, False)
        loss, _ = transducer_loss(
            model, state.params, state.batch_stats,
            feats, feat_lens, batch["labels"], batch["label_lens"],
            train=False, loss_chunk=loss_chunk, loss_backend=loss_backend,
        )
        return {"loss": loss, "num_labels": batch["label_lens"].sum()}

    return jax.jit(step_fn)
