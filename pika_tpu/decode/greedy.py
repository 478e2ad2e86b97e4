"""Batched greedy RNN-T decoding, fully jitted.

Time-synchronous greedy search: at each step, run the joint on the current
(encoder frame, prediction-net state) pair; emit the argmax; advance the
encoder frame on blank, advance the prediction net on non-blank.  The whole
search is one ``lax.while_loop`` over fixed-shape batch state — no Python
per-step loop (contrast decoder/transducer_decoder.py:123-183, which steps
Python over GPU ops).

Used for the tiny-model parity check (BASELINE.json config 2) and as the
fast path when beam_size == 1.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from pika_tpu.models.transducer import Transducer
from pika_tpu.utils.dtypes import cast_floats, resolve_mm_dtype


def greedy_decode(
    model: Transducer,
    variables,
    enc_out: jnp.ndarray,
    enc_lens: jnp.ndarray,
    max_symbols: int = 200,
    mm_dtype=None,
    blank: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode a batch given encoder output.

    Returns (hyps (B, max_symbols) int32 padded with -1, hyp_lens (B,)).
    Supports both prediction nets: LSTM decoders advance incrementally;
    transformer decoders re-forward the full prefix each emission.
    ``mm_dtype="auto"`` runs the loop matmuls in bf16 on TPU (argmax is
    taken over f32-upcast logits); the library default is float32 — the
    decode CLI opts into "auto" via ``--decode_dtype``.
    """
    is_rnn = model.config.decoder_type == "rnn"
    b, t_max, _ = enc_out.shape
    layers = model.config.dec_layers
    hid = model.config.hid_dim

    mmd = resolve_mm_dtype(mm_dtype)
    fdt = mmd or jnp.float32
    if mmd is not None:
        variables = cast_floats(variables, mmd)
        enc_out = enc_out.astype(mmd)

    def predict_step(tok, state):
        return model.apply(variables, tok, state, method=Transducer.predict_step)

    def predict_prefix(tokens, lens):
        return model.apply(variables, tokens, lens, method=Transducer.predict_last)

    def dec_factors(dec_hid):
        return model.apply(variables, dec_hid, method=Transducer.joint_dec_factors)

    def joint_from_factors(ax, gx, ay, gy):
        return model.apply(variables, ax, gx, ay, gy,
                           method=Transducer.joint_from_factors)

    # encoder-side joint factors hoisted out of the loop (see beam.py)
    ax_all, gx_all = model.apply(variables, enc_out,
                                 method=Transducer.joint_enc_factors)

    # init: prediction net consumed SOS (= blank), like blk_sos init
    # (decoder/transducer_decoder.py:103,116-121)
    if is_rnn:
        zero_state = (jnp.zeros((layers, b, hid), fdt),
                      jnp.zeros((layers, b, hid), fdt))
        dec_hid0, state0 = predict_step(
            jnp.full((b,), blank, jnp.int32), zero_state)
    else:
        state0 = (jnp.zeros((layers, b, hid), fdt),
                  jnp.zeros((layers, b, hid), fdt))
        dec_hid0 = predict_prefix(
            jnp.zeros((b, max_symbols), jnp.int32), jnp.zeros((b,), jnp.int32)
        )
    ay0, gy0 = dec_factors(dec_hid0)

    max_steps = t_max + max_symbols

    def cond(carry):
        t_idx, done, *_ = carry
        return ~jnp.all(done)

    def body(carry):
        t_idx, done, (dec_ay, dec_gy), state, hyps, hyp_len = carry
        rows = jnp.arange(b)
        tc = jnp.clip(t_idx, 0, t_max - 1)
        logits = joint_from_factors(ax_all[rows, tc], gx_all[rows, tc],
                                    dec_ay, dec_gy)
        tok = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
        full = hyp_len >= max_symbols
        is_blank = (tok == blank) | done | full
        # advance time on blank
        t_idx = jnp.where(is_blank, t_idx + 1, t_idx)
        done = done | (t_idx >= enc_lens)
        # emit on non-blank
        emit = ~is_blank
        pos = jnp.clip(hyp_len, 0, max_symbols - 1)
        hyps = jnp.where(
            emit[:, None] & (jnp.arange(max_symbols)[None, :] == pos[:, None]),
            tok[:, None], hyps,
        )
        hyp_len = jnp.where(emit, hyp_len + 1, hyp_len)
        # advance prediction net only for emitting rows
        keep = emit[:, None]
        if is_rnn:
            new_dec_hid, (new_h, new_c) = predict_step(tok, state)
            state = (
                jnp.where(keep[None, :, :], new_h, state[0]),
                jnp.where(keep[None, :, :], new_c, state[1]),
            )
        else:
            new_dec_hid = predict_prefix(jnp.clip(hyps, 0, None), hyp_len)
        new_ay, new_gy = dec_factors(new_dec_hid)
        dec_ay = jnp.where(keep, new_ay, dec_ay)
        dec_gy = jnp.where(keep, new_gy, dec_gy)
        return (t_idx, done, (dec_ay, dec_gy), state, hyps, hyp_len)

    init = (
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), bool) | (enc_lens <= 0),
        (ay0, gy0),
        state0,
        jnp.full((b, max_symbols), -1, jnp.int32),
        jnp.zeros((b,), jnp.int32),
    )
    # bound the loop: each iteration advances t or emits; cap at max_steps
    def bounded_cond(carry_i):
        carry, i = carry_i
        return cond(carry) & (i < max_steps)

    def bounded_body(carry_i):
        carry, i = carry_i
        return body(carry), i + 1

    (final, _) = jax.lax.while_loop(bounded_cond, bounded_body, (init, 0))
    _, _, _, _, hyps, hyp_len = final
    return hyps, hyp_len


def greedy_decode_waveforms(model, variables, featurizer, wavs, wav_lens,
                            max_symbols: int = 200, mm_dtype=None,
                            blank: int = 0):
    """Wav → features → encoder → greedy decode, one jittable function."""
    feats, feat_lens = featurizer(None, wavs, wav_lens, False)
    enc = model.apply(variables, feats, feat_lens, method=Transducer.encode)
    enc_lens = model.apply(variables, feat_lens, method=Transducer.encoder_out_len)
    return greedy_decode(model, variables, enc, enc_lens, max_symbols, mm_dtype,
                         blank)
