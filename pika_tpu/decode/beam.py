"""Batched RNN-T beam search — one jit-compiled program.

TPU-native redesign of decoder/transducer_decoder.py + beam_transducer.py:
the reference steps Python over per-utterance beam objects; here the whole
search is a single ``lax.while_loop`` over fixed-shape (B, K) arrays:

  * per-beam time pointers advance on blank (transducer_decoder.py:129)
  * the prediction net (LSTM) advances only for non-blank beams (:139-150)
  * duplicate partial hypotheses are pruned via incremental rolling hashes
    (replacing the string-keyed dict of beam_transducer.py:100-116)
  * optional n-gram FST shallow fusion carries a fixed-capacity set of LM
    states per beam with min-cost tracking (beam_transducer.py:136-159)
  * finished hypotheses (blank at the last frame, beam_transducer.py:161-181)
    move into a separate top-N finished store — unlike the reference they
    never occupy live beam slots, which can only improve search quality
  * softmax temperature ``sm_scale`` (transducer_decoder.py:177)

Scores kept per beam are model-only; the LM bonus biases candidate
selection each step and enters final scores via FST final weights —
matching the reference's bookkeeping exactly (beam_transducer.py:119-134).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pika_tpu.decode.fst import (fst_advance_min_costs,
                                 fst_advance_min_costs_all,
                                 fst_advance_sets, fst_final_scores)
from pika_tpu.models.transducer import Transducer
from pika_tpu.utils.dtypes import cast_floats, resolve_mm_dtype

NEG = -1.0e20
# numpy, NOT jnp: a module-level jnp call initializes the XLA backend at
# import time, which forbids a later jax.distributed.initialize
HASH_MULT = np.uint32(1000003)


@dataclasses.dataclass(frozen=True)
class BeamConfig:
    beam_size: int = 8
    n_best: int = 1
    blank: int = 0
    sm_scale: float = 1.0
    max_symbols: int = 200
    prune_dups: bool = True
    lm_scale: float = 0.0
    nonblk_reward: float = 0.0
    max_fst_states: int = 4
    fst_backoff_levels: int = 6
    # per-candidate shallow fusion: score each expanded candidate (blank +
    # the top-lm_topm non-blank model candidates per beam) with its ACTUAL
    # advanced LM score and select on model + lm_scale * LM.  This is a
    # pika_tpu extension BEYOND the reference: the reference's selection
    # bias is the per-beam prefix LM score broadcast over the vocabulary,
    # with state sets advanced only for the k winners AFTER top-k
    # (beam_transducer.py:93-97,136-159) — i.e. lm_per_token=False is the
    # reference's exact semantics (the LM influences which BEAM survives,
    # not which token a beam picks — one step delayed).  Per-token
    # selection wins 2.7-6.2 WER points on the grammar matrix
    # (BASELINE.md) and is the CLI default.
    lm_per_token: bool = False
    # non-blank candidates per beam scored with their advanced LM score in
    # per-token mode; 0 = EXACT: score every vocabulary entry (requires
    # the dense advance cache, fst.py build_advance_cache)
    lm_topm: int = 8
    # matmul compute dtype inside the decode loop: "auto" = bf16 on TPU
    # (MXU native, ~2x f32), f32 elsewhere.  Scores, log_softmax and all
    # beam bookkeeping stay float32 either way.  The library default is
    # float32 so programmatic callers get full-precision numerics; the
    # CLIs (eval_transducer --decode_dtype, train_mbr) opt into "auto".
    mm_dtype: Optional[str] = None


class _BeamState(NamedTuple):
    step: jnp.ndarray
    scores: jnp.ndarray       # (B, K) model-only cumulative log-prob
    lm_scores: jnp.ndarray    # (B, K)
    t_idx: jnp.ndarray        # (B, K)
    tokens: jnp.ndarray       # (B, K, Um)
    lens: jnp.ndarray         # (B, K)
    aligns: jnp.ndarray       # (B, K, max_steps) full alignment incl. blanks
    align_lens: jnp.ndarray   # (B, K)
    hashes: jnp.ndarray       # (B, K) uint32
    dec_ay: jnp.ndarray       # (B, K, H) prediction-side joint factor fc1_y
    dec_gy: jnp.ndarray       # (B, K, H) prediction-side joint factor gate_y
    dec_h: jnp.ndarray        # (L, B, K, H)
    dec_c: jnp.ndarray        # (L, B, K, H)
    fst_states: jnp.ndarray   # (B, K, S)
    fst_costs: jnp.ndarray    # (B, K, S)
    fin_scores: jnp.ndarray   # (B, N)
    fin_tokens: jnp.ndarray   # (B, N, Um)
    fin_lens: jnp.ndarray     # (B, N)
    fin_aligns: jnp.ndarray   # (B, N, max_steps)
    fin_align_lens: jnp.ndarray  # (B, N)


def _dup_mask(hashes, lens, tokens):
    """True where a beam duplicates an earlier (higher-ranked) beam's
    emitted prefix.  The rolling hash + length equality is only a
    prefilter: the actual token buffers must match too, so a ~2^-32 hash
    collision can never silently merge two distinct hypotheses — the
    reference compares real prefixes (beam_transducer.py:100-116).
    Unwritten token positions are -1 and lengths must be equal, so
    full-buffer equality is exactly prefix equality."""
    k = hashes.shape[1]
    same = (hashes[:, None, :] == hashes[:, :, None]) & (
        lens[:, None, :] == lens[:, :, None]
    ) & (lens[:, :, None] > 0)
    same &= jnp.all(tokens[:, None, :, :] == tokens[:, :, None, :], axis=-1)
    earlier = jnp.arange(k)[None, :] < jnp.arange(k)[:, None]
    return jnp.any(same & earlier[None], axis=2)


def _gather_beams(x, idx):
    """Gather along the beam axis: x (B, K, ...) by idx (B, K)."""
    return jnp.take_along_axis(x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)


def beam_search(
    model: Transducer,
    variables,
    enc_out: jnp.ndarray,
    enc_lens: jnp.ndarray,
    cfg: BeamConfig,
    fst_tables: Optional[dict] = None,
    fst_start: int = 0,
):
    """Decode a batch.  Returns dict(tokens (B, N, Um), lens (B, N),
    scores (B, N), aligns (B, N, T+Um), align_lens (B, N)) sorted
    best-first; padding token is -1.  ``aligns`` is the full emission
    sequence including blanks — the MBR trainer\'s lattice path
    (train_transducer_mbr_bmuf_otfaug.py:213-228)."""
    is_rnn = model.config.decoder_type == "rnn"
    b, t_max, _ = enc_out.shape
    k = cfg.beam_size
    n = cfg.n_best
    um = cfg.max_symbols
    layers = model.config.dec_layers
    hid = model.config.hid_dim
    vocab = model.config.vocab_size
    use_lm = fst_tables is not None

    mmd = resolve_mm_dtype(cfg.mm_dtype)
    fdt = mmd or jnp.float32  # dtype of float loop-carry / activations
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

    # encoder-side joint factors, hoisted out of the decode loop: two H×H
    # projections per utterance instead of per step (the reference re-runs
    # the full joint every step, transducer_decoder.py:173-177)
    ax_all, gx_all = model.apply(variables, enc_out,
                                 method=Transducer.joint_enc_factors)

    # init: every beam consumed SOS(=blank); beam 0 live, others NEG
    if is_rnn:
        zero_state = (jnp.zeros((layers, b * k, hid), fdt),
                      jnp.zeros((layers, b * k, hid), fdt))
        dec_hid0, (h0, c0) = predict_step(
            jnp.full((b * k,), cfg.blank, jnp.int32), zero_state)
    else:
        # tiny unused placeholder state (not gathered in the loop)
        h0 = c0 = jnp.zeros((1, b * k, 1), fdt)
        dec_hid0 = predict_prefix(
            jnp.zeros((b * k, um), jnp.int32), jnp.zeros((b * k,), jnp.int32)
        )
    ay0, gy0 = dec_factors(dec_hid0)

    if use_lm:
        fst_states0 = jnp.full((b, k, cfg.max_fst_states), -1, jnp.int32)
        fst_states0 = fst_states0.at[..., 0].set(fst_start)
        fst_costs0 = jnp.full((b, k, cfg.max_fst_states), 1e30, jnp.float32)
        fst_costs0 = fst_costs0.at[..., 0].set(0.0)
    else:
        fst_states0 = jnp.zeros((b, k, 1), jnp.int32)
        fst_costs0 = jnp.zeros((b, k, 1), jnp.float32)

    max_steps = t_max + um
    init = _BeamState(
        step=jnp.zeros((), jnp.int32),
        scores=jnp.full((b, k), NEG).at[:, 0].set(0.0),
        lm_scores=jnp.zeros((b, k)),
        t_idx=jnp.zeros((b, k), jnp.int32),
        tokens=jnp.full((b, k, um), -1, jnp.int32),
        lens=jnp.zeros((b, k), jnp.int32),
        aligns=jnp.full((b, k, max_steps), -1, jnp.int32),
        align_lens=jnp.zeros((b, k), jnp.int32),
        hashes=jnp.zeros((b, k), jnp.uint32),
        dec_ay=ay0.reshape(b, k, hid),
        dec_gy=gy0.reshape(b, k, hid),
        dec_h=h0.reshape(h0.shape[0], b, k, -1),
        dec_c=c0.reshape(c0.shape[0], b, k, -1),
        fst_states=fst_states0,
        fst_costs=fst_costs0,
        fin_scores=jnp.full((b, n), NEG),
        fin_tokens=jnp.full((b, n, um), -1, jnp.int32),
        fin_lens=jnp.zeros((b, n), jnp.int32),
        fin_aligns=jnp.full((b, n, max_steps), -1, jnp.int32),
        fin_align_lens=jnp.zeros((b, n), jnp.int32),
    )

    if use_lm and cfg.lm_scale > 0:
        # Admissible stop bound under ARBITRARY LM contributions.  A live
        # beam's eventual finished total can EXCEED its model-only score
        # whenever an emission can LOWER the LM cost: nonblk_reward > 0, or
        # negative arc/backoff/final weights (read_text_fst accepts any
        # weights; ARPA-compiled automata are always >= 0).  Credit each
        # remaining emission slot with the largest possible per-emission
        # gain, plus the largest possible final-weight gain, computed once
        # from the tables; with nonneg weights and reward 0 both terms are
        # 0 and the bound reduces to prefix-LM-augmented scores (itself
        # <= model-only scores, so at least as tight as the plain bound).
        def _min0(x):
            return jnp.minimum(jnp.min(x), 0.0) if x.size else jnp.float32(0.0)

        _dw = fst_tables["disambig_weight"]
        _fw = fst_tables["final_weight"]
        _min_bw = _min0(fst_tables["backoff_weight"])
        # per-emission cost increment >= min0(arc) + levels*min0(backoff)
        #                                + min0(finite disambig) - reward
        _gain_per_emit = cfg.nonblk_reward - (
            _min0(fst_tables["arc_weight"])
            + cfg.fst_backoff_levels * _min_bw
            + _min0(jnp.where(_dw < 1e29, _dw, 0.0))
        )
        # reaching a final state adds (backoff chain + final weight), which
        # can only RAISE the LM score by at most this much
        _final_gain = jnp.maximum(
            -(_min0(jnp.where(_fw < 1e29, _fw, 0.0))
              + cfg.fst_backoff_levels * _min_bw), 0.0)
    else:
        _gain_per_emit = _final_gain = None

    def cond(st: _BeamState):
        if use_lm and cfg.lm_scale > 0:
            slack = _gain_per_emit * jnp.maximum(um - st.lens, 0)
            live_best = jnp.max(
                st.scores + cfg.lm_scale * (st.lm_scores + slack + _final_gain),
                axis=1)
        else:
            live_best = jnp.max(st.scores, axis=1)
        fin_worst = st.fin_scores[:, n - 1]
        undecided = live_best > fin_worst
        return (st.step < max_steps) & jnp.any(undecided)

    def body(st: _BeamState):
        # --- duplicate-prefix pruning (beam order is score-descending) ---
        scores = st.scores
        if cfg.prune_dups:
            dup = _dup_mask(st.hashes, st.lens, st.tokens)
            scores = jnp.where(dup, NEG, scores)

        # --- joint over current (enc frame, dec state) -------------------
        t_gather = jnp.clip(st.t_idx, 0, t_max - 1)[..., None]
        axk = jnp.take_along_axis(ax_all, t_gather, axis=1)  # (B, K, H)
        gxk = jnp.take_along_axis(gx_all, t_gather, axis=1)
        logits = joint_from_factors(
            axk.reshape(b * k, hid), gxk.reshape(b * k, hid),
            st.dec_ay.reshape(b * k, hid), st.dec_gy.reshape(b * k, hid),
        )
        lp = jax.nn.log_softmax(
            cfg.sm_scale * logits.astype(jnp.float32), axis=-1
        ).reshape(b, k, vocab)

        per_token = use_lm and cfg.lm_per_token
        use_bias = use_lm and not cfg.lm_per_token
        if use_bias:
            # a beam whose LM state set died (possible only with no-backoff
            # FSTs) can never finish (final LM score -INF) — kill it here.
            # Without this, lm_scale * NEG rides through the selection bias
            # and the f32 subtract-back at new_scores cancels to exactly 0,
            # resurrecting the dead beam above every real hypothesis.
            scores = jnp.where(st.lm_scores <= NEG / 2, NEG, scores)
        sel_bias = cfg.lm_scale * st.lm_scores if use_bias else 0.0
        cand = scores[..., None] + lp + (sel_bias[..., None] if use_bias else 0.0)

        # full beams may only take blank (same cap semantics as greedy)
        full = st.lens >= um
        non_blank = jnp.arange(vocab)[None, None, :] != cfg.blank
        cand = jnp.where(full[..., None] & non_blank, NEG, cand)

        # --- finished extraction: blank at the last frame ----------------
        at_last = st.t_idx >= (enc_lens[:, None] - 1)
        fin_cand_score = scores + lp[..., cfg.blank]
        if use_lm:
            fin_lm = fst_final_scores(fst_tables, st.fst_states, st.fst_costs,
                                      cfg.fst_backoff_levels)
            fin_cand_score = fin_cand_score + cfg.lm_scale * fin_lm
        finish_now = at_last & (scores > NEG / 2)
        fin_cand_score = jnp.where(finish_now, fin_cand_score, NEG)
        # merge into the top-N finished store
        all_scores = jnp.concatenate([st.fin_scores, fin_cand_score], axis=1)
        all_tokens = jnp.concatenate([st.fin_tokens, st.tokens], axis=1)
        all_lens = jnp.concatenate([st.fin_lens, st.lens], axis=1)
        all_aligns = jnp.concatenate([st.fin_aligns, st.aligns], axis=1)
        all_align_lens = jnp.concatenate([st.fin_align_lens, st.align_lens], axis=1)
        top_fin, fin_idx = jax.lax.top_k(all_scores, n)
        fin_tokens = jnp.take_along_axis(all_tokens, fin_idx[..., None], axis=1)
        fin_lens = jnp.take_along_axis(all_lens, fin_idx, axis=1)
        fin_aligns = jnp.take_along_axis(all_aligns, fin_idx[..., None], axis=1)
        fin_align_lens = jnp.take_along_axis(all_align_lens, fin_idx, axis=1)

        # finished beams cannot continue via blank past the last frame
        cand = cand.at[..., cfg.blank].set(
            jnp.where(at_last, NEG, cand[..., cfg.blank])
        )

        # --- top-k continuation ------------------------------------------
        has_cache = use_lm and "adv_cost" in fst_tables
        if per_token and cfg.lm_topm <= 0 and not has_cache:
            raise ValueError(
                "lm_topm=0 (exact per-token fusion) needs the dense advance "
                "cache — build fst_tables with device_arrays(n_ilabels=..., "
                "cache_max_bytes>0) or set lm_topm > 0")
        if per_token and cfg.lm_topm <= 0:
            # EXACT per-token fusion: score EVERY (beam, token) candidate
            # with its true advanced LM score (one dense row gather + min
            # over the state set) and pick top-k over the full vocabulary —
            # no top-m candidate restriction.  Winners' state sets are
            # advanced after selection (below), like the reference.
            lm_tok = fst_advance_min_costs_all(
                fst_tables, st.fst_states, st.fst_costs,
                cfg.nonblk_reward)               # (B, K, Vt) over FST ilabels
            vt = lm_tok.shape[-1]
            # token v emits FST ilabel v+1; tokens beyond the table are dead
            if vt >= vocab + 1:
                lm_grid = lm_tok[..., 1 : vocab + 1]
            else:
                pad = jnp.full(lm_tok.shape[:-1] + (vocab + 1 - vt,), -1e30)
                lm_grid = jnp.concatenate([lm_tok, pad], -1)[..., 1 : vocab + 1]
            lm_grid = jnp.maximum(lm_grid, NEG)
            # the blank candidate carries the prefix LM set through unchanged
            lm_grid = lm_grid.at[..., cfg.blank].set(st.lm_scores)
            sel = (cand + cfg.lm_scale * lm_grid).reshape(b, k * vocab)
            _, top_idx = jax.lax.top_k(sel, k)
            prev_k = top_idx // vocab
            tok = (top_idx % vocab).astype(jnp.int32)
            new_scores = jnp.take_along_axis(
                cand.reshape(b, k * vocab), top_idx, axis=1)
            sel_lm = jnp.take_along_axis(
                lm_grid.reshape(b, k * vocab), top_idx, axis=1)
            # a candidate whose LM state set died cannot continue in-grammar
            # or ever finish — kill it instead of zombie-decoding LM-free
            new_scores = jnp.where(sel_lm <= NEG / 2, NEG, new_scores)
            lm_prev = _gather_beams(st.lm_scores, prev_k)
        elif per_token:
            # blank + top-m non-blank candidates per beam, each scored with
            # its actual advanced LM score (candidate restriction is safe:
            # at most k winners, and a candidate outside the model top-m
            # per beam only wins on LM alone at extreme lm_scale)
            m = min(cfg.lm_topm, vocab - 1)
            nb_val, nb_tok = jax.lax.top_k(cand.at[..., cfg.blank].set(NEG), m)
            s_cap = st.fst_states.shape[-1]
            bs = jnp.broadcast_to(st.fst_states[:, :, None], (b, k, m, s_cap))
            bc = jnp.broadcast_to(st.fst_costs[:, :, None], (b, k, m, s_cap))
            if has_cache:
                # selection needs only each candidate's best advanced cost;
                # the k winners' full sets are advanced after selection
                # (bit-identical lm, fst_advance_min_costs docstring)
                adv_lm = fst_advance_min_costs(
                    fst_tables, bs, bc, nb_tok + 1, cfg.nonblk_reward)
            else:
                adv_states, adv_costs, adv_lm = fst_advance_sets(
                    fst_tables, bs, bc,
                    nb_tok + 1,  # FST ilabels are shifted by one
                    cfg.fst_backoff_levels, cfg.nonblk_reward)
            adv_lm = jnp.maximum(adv_lm, NEG)
            mc = m + 1  # candidate 0 is blank: prefix LM set unchanged
            vals = jnp.concatenate([cand[..., cfg.blank][..., None], nb_val], -1)
            lm_all = jnp.concatenate([st.lm_scores[..., None], adv_lm], -1)
            toks = jnp.concatenate(
                [jnp.full((b, k, 1), cfg.blank, jnp.int32), nb_tok], -1)
            sel = (vals + cfg.lm_scale * lm_all).reshape(b, k * mc)
            _, top_idx = jax.lax.top_k(sel, k)
            prev_k = top_idx // mc
            tok = jnp.take_along_axis(
                toks.reshape(b, k * mc), top_idx, axis=1).astype(jnp.int32)
            new_scores = jnp.take_along_axis(
                vals.reshape(b, k * mc), top_idx, axis=1)
            sel_lm = jnp.take_along_axis(
                lm_all.reshape(b, k * mc), top_idx, axis=1)
            if not has_cache:
                states_all = jnp.concatenate(
                    [st.fst_states[:, :, None], adv_states], axis=2)
                costs_all = jnp.concatenate(
                    [st.fst_costs[:, :, None], adv_costs], axis=2)
                sel_states = jnp.take_along_axis(
                    states_all.reshape(b, k * mc, s_cap), top_idx[..., None],
                    axis=1)
                sel_costs = jnp.take_along_axis(
                    costs_all.reshape(b, k * mc, s_cap), top_idx[..., None],
                    axis=1)
            # a candidate whose LM state set died cannot continue in-grammar
            # or ever finish — kill it instead of zombie-decoding LM-free
            new_scores = jnp.where(sel_lm <= NEG / 2, NEG, new_scores)
            lm_prev = _gather_beams(st.lm_scores, prev_k)
        else:
            flat = cand.reshape(b, k * vocab)
            top_val, top_idx = jax.lax.top_k(flat, k)
            prev_k = top_idx // vocab
            tok = (top_idx % vocab).astype(jnp.int32)

            new_scores = top_val
            lm_prev = _gather_beams(st.lm_scores, prev_k)
            if use_lm:
                new_scores = new_scores - cfg.lm_scale * lm_prev

        tokens = _gather_beams(st.tokens, prev_k)
        lens = _gather_beams(st.lens, prev_k)
        aligns = _gather_beams(st.aligns, prev_k)
        align_lens = _gather_beams(st.align_lens, prev_k)
        hashes = _gather_beams(st.hashes, prev_k)
        t_idx = _gather_beams(st.t_idx, prev_k)
        dec_ay = _gather_beams(st.dec_ay, prev_k)
        dec_gy = _gather_beams(st.dec_gy, prev_k)
        if is_rnn:
            dec_h = jnp.take_along_axis(st.dec_h, prev_k[None, :, :, None], axis=2)
            dec_c = jnp.take_along_axis(st.dec_c, prev_k[None, :, :, None], axis=2)
        else:
            dec_h, dec_c = st.dec_h, st.dec_c
        fst_states = _gather_beams(st.fst_states, prev_k)
        fst_costs = _gather_beams(st.fst_costs, prev_k)

        emit = tok != cfg.blank
        # record the alignment step (blank or not)
        apos = jnp.clip(align_lens, 0, max_steps - 1)
        awrite = jnp.arange(max_steps)[None, None, :] == apos[..., None]
        aligns = jnp.where(awrite, tok[..., None], aligns)
        align_lens = align_lens + 1
        # append emitted tokens
        pos = jnp.clip(lens, 0, um - 1)
        write = emit[..., None] & (jnp.arange(um)[None, None, :] == pos[..., None])
        tokens = jnp.where(write, tok[..., None], tokens)
        lens = jnp.where(emit, lens + 1, lens)
        hashes = jnp.where(
            emit, hashes * HASH_MULT + tok.astype(jnp.uint32) + 1, hashes
        )
        t_idx = jnp.where(emit, t_idx, t_idx + 1)

        # prediction-net advance for emitting beams only
        keep = emit.reshape(b * k)[:, None]
        if is_rnn:
            new_hid, (nh, nc) = predict_step(
                tok.reshape(b * k),
                (dec_h.reshape(layers, b * k, hid), dec_c.reshape(layers, b * k, hid)),
            )
            dec_h = jnp.where(keep[None], nh, dec_h.reshape(layers, b * k, hid)).reshape(layers, b, k, hid)
            dec_c = jnp.where(keep[None], nc, dec_c.reshape(layers, b * k, hid)).reshape(layers, b, k, hid)
            del nh, nc
        else:
            new_hid = predict_prefix(
                jnp.clip(tokens, 0, None).reshape(b * k, um),
                lens.reshape(b * k),
            )
        new_ay, new_gy = dec_factors(new_hid)
        dec_ay = jnp.where(keep, new_ay, dec_ay.reshape(b * k, hid)).reshape(b, k, hid)
        dec_gy = jnp.where(keep, new_gy, dec_gy.reshape(b * k, hid)).reshape(b, k, hid)

        lm_scores = lm_prev
        if per_token and not has_cache:
            # walk path: the selected candidates' sets were advanced BEFORE
            # selection; candidate 0 (blank) carried the prefix set through
            fst_states, fst_costs, lm_scores = sel_states, sel_costs, sel_lm
        elif use_lm:
            # per-beam mode, and per-token with the dense cache: advance
            # only the k winners' sets — exactly when the reference
            # advances them (beam_transducer.py:136-159).  In per-token
            # mode the resulting lm equals the selection-time sel_lm
            # bit-for-bit (fst_advance_min_costs docstring).
            adv_states, adv_costs, adv_lm = fst_advance_sets(
                fst_tables, fst_states, fst_costs,
                tok + 1,  # FST ilabels are shifted by one (beam_transducer.py:139)
                cfg.fst_backoff_levels, cfg.nonblk_reward,
            )
            fst_states = jnp.where(emit[..., None], adv_states, fst_states)
            fst_costs = jnp.where(emit[..., None], adv_costs, fst_costs)
            lm_scores = jnp.where(emit, jnp.maximum(adv_lm, NEG), lm_prev)

        return _BeamState(
            step=st.step + 1,
            scores=new_scores,
            lm_scores=lm_scores,
            t_idx=t_idx,
            tokens=tokens,
            lens=lens,
            aligns=aligns,
            align_lens=align_lens,
            hashes=hashes,
            dec_ay=dec_ay,
            dec_gy=dec_gy,
            dec_h=dec_h,
            dec_c=dec_c,
            fst_states=fst_states,
            fst_costs=fst_costs,
            fin_scores=top_fin,
            fin_tokens=fin_tokens,
            fin_lens=fin_lens,
            fin_aligns=fin_aligns,
            fin_align_lens=fin_align_lens,
        )

    final = jax.lax.while_loop(cond, body, init)

    # backfill: live beams enter the final ranking force-finished — with
    # their FST final scores added, like the reference's at-max_len path
    # (beam_transducer.py:161-181) and like every mid-loop finished entry.
    # Ranking live beams model-only would be inconsistent with the
    # LM-augmented finished scores: the stop bound guarantees no live
    # beam's LM-AUGMENTED total can beat the kept finished set, so a
    # model-only live score could spuriously outrank genuinely finished
    # hypotheses the moment the loop exits.
    live_scores = final.scores
    if use_lm:
        live_fin_lm = fst_final_scores(fst_tables, final.fst_states,
                                       final.fst_costs, cfg.fst_backoff_levels)
        live_scores = final.scores + cfg.lm_scale * jnp.maximum(live_fin_lm, NEG)
    all_scores = jnp.concatenate([final.fin_scores, live_scores], axis=1)
    all_tokens = jnp.concatenate([final.fin_tokens, final.tokens], axis=1)
    all_lens = jnp.concatenate([final.fin_lens, final.lens], axis=1)
    all_aligns = jnp.concatenate([final.fin_aligns, final.aligns], axis=1)
    all_align_lens = jnp.concatenate([final.fin_align_lens, final.align_lens], axis=1)
    top, idx = jax.lax.top_k(all_scores, n)
    return {
        "tokens": jnp.take_along_axis(all_tokens, idx[..., None], axis=1),
        "lens": jnp.take_along_axis(all_lens, idx, axis=1),
        "scores": top,
        "aligns": jnp.take_along_axis(all_aligns, idx[..., None], axis=1),
        "align_lens": jnp.take_along_axis(all_align_lens, idx, axis=1),
    }


def beam_search_features(model, variables, feats, feat_lens, cfg: BeamConfig,
                         fst_tables=None, fst_start: int = 0):
    """Precomputed-feature decode: spliced/strided features → encoder →
    beam search.  The reference's ``--loader utt`` eval path
    (egs/eval_transducer.sh:88, decode_transducer.py:108-120)."""
    enc = model.apply(variables, feats, feat_lens, method=Transducer.encode)
    enc_lens = model.apply(variables, feat_lens, method=Transducer.encoder_out_len)
    out = beam_search(model, variables, enc, enc_lens, cfg, fst_tables, fst_start)
    out["enc_out"] = enc
    out["enc_lens"] = enc_lens
    # features also ride along for independent-encoder LAS rescoring
    # (a rescorer whose input_dim is the feature dim, not the encoder's)
    out["feats"] = feats
    out["feat_lens"] = feat_lens
    return out


def beam_search_waveforms(model, variables, featurizer, wavs, wav_lens, cfg: BeamConfig,
                          fst_tables=None, fst_start: int = 0):
    """wav → features → encoder → beam search (decode_batch equivalent,
    transducer_decoder.py:66).  Also returns encoder output for LAS
    rescoring reuse (:99-100)."""
    feats, feat_lens = featurizer(None, wavs, wav_lens, False)
    enc = model.apply(variables, feats, feat_lens, method=Transducer.encode)
    enc_lens = model.apply(variables, feat_lens, method=Transducer.encoder_out_len)
    out = beam_search(model, variables, enc, enc_lens, cfg, fst_tables, fst_start)
    out["enc_out"] = enc
    out["enc_lens"] = enc_lens
    out["feats"] = feats
    out["feat_lens"] = feat_lens
    return out
