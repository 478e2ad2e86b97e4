"""Minimum Bayes Risk (MBR) training step for RNN-T.

Re-implements trainer/train_transducer_mbr_bmuf_otfaug.py:40-264 as ONE
jitted program per batch:

  1. beam-decode the batch (eval mode, no SpecAugment) → N-best label
     sequences, their model scores, and their full alignment paths;
  2. expected edit distance: prob = softmax(scores); risk = Σ prob·dist;
  3. the hand-injected sequence-level gradient (out.backward(mbr_grad),
     :229-235) becomes a *surrogate objective*
         Σ_steps w · log_softmax(sm_scale · joint(x_t, y_u))[token]
     with stop-gradient weights w = prob·(dist − E[dist]) (blank steps
     scaled 1/T, :233-234) — its gradient w.r.t. parameters is exactly the
     reference's injected gradient;
  4. interpolated with ``rnnt_scale`` × the fused RNN-T loss on the
     reference labels (:139-161), sharing one encoder forward.

The (t, u) path-index construction (:213-228) is an exclusive cumulative
sum over blank indicators on the recorded beam alignments.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from pika_tpu.decode.beam import BeamConfig, beam_search
from pika_tpu.models.transducer import Transducer
from pika_tpu.ops.edit_distance import edit_distance_batch_jax
from pika_tpu.ops.rnnt_loss import rnnt_loss_fused
from pika_tpu.train.step import TrainState


def mbr_losses(
    model: Transducer,
    params,
    feats,
    feat_lens,
    labels,
    label_lens,
    nbest: dict,
    rnnt_scale: float,
    sm_scale: float,
    dropout_key=None,
    loss_chunk: int = 16,
    loss_backend: str = "auto",
    batch_stats=None,
    blank: int = 0,
):
    """Returns (total_objective, (metrics, new_batch_stats)) for one batch
    given decoded N-best; differentiable w.r.t. ``params``.

    The training forward runs in train mode (dropout on, BatchNorm in
    batch-statistics mode with running stats updated) when ``dropout_key``
    is given — the reference's ``model.train()`` between decodes
    (train_transducer_mbr_bmuf_otfaug.py:90-91,124)."""
    if loss_backend == "auto":
        loss_backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    train = dropout_key is not None
    rngs = {"dropout": dropout_key} if train else None
    b, k, um = nbest["tokens"].shape

    mutable = ["batch_stats"] if (train and batch_stats is not None) else False
    enc_out = model.apply(variables, feats, feat_lens, train,
                          method=Transducer.encode, rngs=rngs, mutable=mutable)
    if mutable:
        enc, new_vars = enc_out
        new_stats = new_vars.get("batch_stats", batch_stats)
    else:
        enc = enc_out
        new_stats = batch_stats
    enc_lens = model.apply(variables, feat_lens, method=Transducer.encoder_out_len)
    t_pad = enc.shape[1]

    # ---- RNN-T loss on reference labels --------------------------------
    dec_ref = model.apply(variables, labels, label_lens, train,
                          method=Transducer.predict, rngs=rngs)
    ax, gx, ay, gy = model.apply(variables, enc, dec_ref, method=Transducer.joint_factors)
    w2, b2 = model.apply(variables, method=Transducer.joint_params)
    rnnt = rnnt_loss_fused(ax, gx, ay, gy, w2, b2, labels, enc_lens, label_lens,
                           loss_chunk, loss_backend).sum()

    # ---- expected edit distance ----------------------------------------
    scores = jax.lax.stop_gradient(nbest["scores"])            # (B, K)
    prob = jax.nn.softmax(scores, axis=1)
    refs = jnp.repeat(labels, k, axis=0)
    ref_lens = jnp.repeat(label_lens, k, axis=0)
    hyps = nbest["tokens"].reshape(b * k, um)
    hyp_lens = nbest["lens"].reshape(b * k)
    dist = edit_distance_batch_jax(
        jnp.clip(refs, 0, None), ref_lens, jnp.clip(hyps, 0, None), hyp_lens
    ).reshape(b, k).astype(jnp.float32)
    avg_dist = (prob * dist).sum(axis=1)                       # (B,)
    mbr_value = avg_dist.sum()
    seq_grad = jax.lax.stop_gradient(prob * (dist - avg_dist[:, None]))  # (B, K)

    # ---- surrogate along the alignment paths ---------------------------
    aligns = nbest["aligns"].reshape(b * k, -1)                # (BK, S)
    align_lens = nbest["align_lens"].reshape(b * k)
    s_max = aligns.shape[1]
    tok = jnp.clip(aligns, 0, None)
    is_blank = aligns == blank
    step_valid = jnp.arange(s_max)[None, :] < align_lens[:, None]
    # exclusive cumsums → (t, u) lattice position of each path step
    t_idx = jnp.cumsum(is_blank.astype(jnp.int32), axis=1) - is_blank.astype(jnp.int32)
    u_idx = jnp.cumsum((~is_blank).astype(jnp.int32), axis=1) - (~is_blank).astype(jnp.int32)

    dec_hyp = model.apply(
        variables, hyps * (hyps >= 0), hyp_lens, train,
        method=Transducer.predict, rngs=rngs
    )  # (BK, Um+1, H)
    enc_rep = jnp.repeat(enc, k, axis=0)                        # (BK, T, H)
    x_path = jnp.take_along_axis(
        enc_rep, jnp.clip(t_idx, 0, t_pad - 1)[..., None], axis=1
    )
    y_path = jnp.take_along_axis(
        dec_hyp, jnp.clip(u_idx, 0, dec_hyp.shape[1] - 1)[..., None], axis=1
    )
    logits = model.apply(variables, x_path, y_path, method=Transducer.joint_step)
    lp = jax.nn.log_softmax(sm_scale * logits, axis=-1)         # (BK, S, V)
    tok_lp = jnp.take_along_axis(lp, tok[..., None], axis=-1)[..., 0]
    w = jnp.repeat(seq_grad.reshape(b * k), s_max).reshape(b * k, s_max)
    # blank-step weights scale by the PADDED batch width, exactly like the
    # reference: its `mbr_grad[:, :, blk] /= float(T)` uses T = x.size(1),
    # the batch-padded encoder length, not each utterance's own length
    # (train_transducer_mbr_bmuf_otfaug.py:233-234) — reviewed and kept
    w = jnp.where(is_blank, w / float(t_pad), w)
    w = jnp.where(step_valid, w, 0.0)
    surrogate = (w * tok_lp).sum()

    total = rnnt_scale * rnnt + surrogate
    metrics = {
        "mbr_loss": mbr_value,
        "rnnt_loss": rnnt,
        "num_labels": label_lens.sum(),
    }
    return total, (metrics, new_stats)


def make_mbr_step(
    model: Transducer,
    tx: optax.GradientTransformation,
    featurizer: Callable,
    beam_cfg: BeamConfig,
    rnnt_scale: float = 0.0,
    sm_scale: float = 1.0,
    loss_chunk: int = 16,
    loss_backend: str = "auto",
    donate: bool = True,
    jit: bool = True,
):
    """One MBR batch: decode → risk-weighted surrogate + RNN-T loss → update.

    ``jit=False`` returns the raw step for callers that wrap it themselves
    (``jit_dp`` over a device mesh, or a BMUF round's local step)."""

    def step_fn(state: TrainState, batch, key):
        from pika_tpu.train.step import batch_inputs

        kf, kd = jax.random.split(key)
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        x, x_lens = batch_inputs(batch)
        # decode on clean (no SpecAugment/dither) features, eval mode
        # (the reference's model.eval() before decoding, :113)
        feats_c, lens_c = featurizer(None, x, x_lens, False)
        enc_c = model.apply(variables, feats_c, lens_c, method=Transducer.encode)
        enc_lens_c = model.apply(variables, lens_c, method=Transducer.encoder_out_len)
        nbest = beam_search(model, variables, enc_c, enc_lens_c, beam_cfg)
        nbest = jax.lax.stop_gradient(nbest)

        feats, feat_lens = featurizer(kf, x, x_lens, True)

        def loss_fn(params):
            return mbr_losses(
                model, params, feats, feat_lens,
                batch["labels"], batch["label_lens"], nbest,
                rnnt_scale, sm_scale, dropout_key=kd,
                loss_chunk=loss_chunk, loss_backend=loss_backend,
                batch_stats=state.batch_stats, blank=beam_cfg.blank,
            )

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt, batch_stats=new_stats), metrics

    if not jit:
        return step_fn
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
