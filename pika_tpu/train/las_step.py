"""LAS rescorer training step.

Re-implements trainer/train_las_bmuf_otfaug.py: NLL decoder loss (optional
CTC auxiliary loss on the encoder projection, LASLossCompute:35-138), an
optional *frozen* shared encoder taken from an RNN-T checkpoint
(:512-518 — its forward runs under stop_gradient like the reference's
``no_grad``), scheduled-sampling schedule hooks, decoder-only LM
pretraining (``pretrain_decoder``), and reverse-label support via the
loader (backward rescorer, README.md:81-84).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from pika_tpu.models.las import LAS
from pika_tpu.models.transducer import Transducer
from pika_tpu.train.step import TrainState


def las_loss(
    model: LAS,
    params,
    src,
    src_lens,
    targets,            # (B, U) incl. SOS/EOS, padded with pad_idx
    dec_loss_scale: float = 1.0,
    enc_loss_scale: float = 0.0,
    pretrain_decoder: bool = False,
    sampling_prob: float = 0.0,
    key=None,
):
    """Returns (loss, metrics).  NLL is sum-reduced over non-pad targets
    (nn.NLLLoss(size_average=False), train_las:56)."""
    cfg = model.config
    variables = {"params": params}
    rngs = {"dropout": key} if key is not None else None
    outputs, _, enc_out = model.apply(
        variables, src, targets, src_lens,
        enable_enc=not pretrain_decoder,
        train=key is not None,
        sampling_prob=sampling_prob,
        sampling_key=key,
        rngs=rngs,
    )
    logits = model.apply(variables, outputs, method=LAS.output_logits)
    lp = jax.nn.log_softmax(logits, axis=-1)
    tgt_out = targets[:, 1:]
    mask = tgt_out != cfg.pad_idx
    tok_lp = jnp.take_along_axis(
        lp, jnp.clip(tgt_out, 0, cfg.output_dim - 1)[..., None], axis=-1
    )[..., 0]
    nll = -(jnp.where(mask, tok_lp, 0.0)).sum()
    loss = dec_loss_scale * nll
    metrics = {"dec_loss": nll, "num_labels": mask.sum()}

    if enc_loss_scale > 0.0 and not pretrain_decoder:
        enc_logits = model.apply(variables, enc_out, method=LAS.encoder_logits)
        enc_lp = jax.nn.log_softmax(enc_logits, axis=-1)
        t = enc_lp.shape[1]
        logit_pad = (jnp.arange(t)[None, :] >= src_lens[:, None]).astype(jnp.float32)
        # CTC labels: strip SOS(0)/EOS(1-ish boundary ids) and padding —
        # the reference keeps ids in (1, pad_idx) (LASLossCompute:70-75)
        ctc_ok = (tgt_out > 1) & (tgt_out < cfg.pad_idx)
        u = tgt_out.shape[1]
        order = jnp.argsort(~ctc_ok, axis=1, stable=True)
        packed = jnp.take_along_axis(jnp.where(ctc_ok, tgt_out, 0), order, axis=1)
        n_lab = ctc_ok.sum(axis=1)
        label_pad = (jnp.arange(u)[None, :] >= n_lab[:, None]).astype(jnp.float32)
        ctc = optax.ctc_loss(enc_lp, logit_pad, packed, label_pad, blank_id=0).sum()
        loss = loss + enc_loss_scale * ctc
        metrics["enc_loss"] = ctc
    return loss, metrics


def make_las_train_step(
    model: LAS,
    tx: optax.GradientTransformation,
    featurizer: Callable,
    shared_encoder: Optional[Transducer] = None,
    shared_encoder_variables=None,
    dec_loss_scale: float = 1.0,
    enc_loss_scale: float = 0.0,
    pretrain_decoder: bool = False,
    donate: bool = True,
    jit: bool = True,
):
    """Build the jitted LAS train step.  ``sampling_prob`` is a traced
    argument so the schedule (train_las:185-190) needs no recompiles.
    ``jit=False`` returns the raw step for callers that wrap it themselves
    (mesh DP shardings, or a BMUF round's local step)."""

    def step_fn(state: TrainState, batch, key, sampling_prob):
        from pika_tpu.train.step import batch_inputs

        kf, kd = jax.random.split(key)
        x, x_lens = batch_inputs(batch)
        feats, feat_lens = featurizer(kf, x, x_lens, True)
        if shared_encoder is not None:
            # frozen RNN-T encoder (no_grad, train_las:213-221) — eval
            # mode, so BatchNorm encoders need their running stats in the
            # variables dict (full bundle variables, not just params)
            src = shared_encoder.apply(
                shared_encoder_variables, feats, feat_lens,
                method=Transducer.encode,
            )
            src_lens = shared_encoder.apply(
                shared_encoder_variables, feat_lens,
                method=Transducer.encoder_out_len,
            )
            src = jax.lax.stop_gradient(src)
        else:
            src, src_lens = feats, feat_lens

        def loss_fn(params):
            return las_loss(
                model, params, src, src_lens, batch["labels"],
                dec_loss_scale, enc_loss_scale, pretrain_decoder,
                sampling_prob, kd,
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params, opt_state=new_opt)
        metrics["loss"] = loss
        return new_state, metrics

    if not jit:
        return step_fn
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
