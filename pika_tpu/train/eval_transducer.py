"""Batch decoding CLI — eval_transducer / decode_transducer equivalent.

Mirrors decoder/decode_transducer.py + egs/eval_transducer.sh: reads a
model bundle, decodes a wav.scp (features computed on device — no Kaldi
feature archives needed), optionally applies n-gram FST shallow fusion and
LAS forward/backward rescoring, writes N-best hypotheses with scores in
the reference's output format, then reranks and (given references) scores
WER/CER.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pika_tpu.data.scp import read_symbol_table, read_wav_scp, read_int_vectors
from pika_tpu.data.wavio import read_wav
from pika_tpu.data import segment as seg
from pika_tpu.decode.beam import BeamConfig, beam_search_waveforms
from pika_tpu.decode.fst import compile_arpa, read_openfst_binary, read_text_fst
from pika_tpu.decode.rescore import las_score_hyps, rerank_nbest
from pika_tpu.decode.wer import score_wer
from pika_tpu.train import common
from pika_tpu.train.bundle import load_bundle


def select_las_input(flag: str, meta: dict, input_dim: int,
                     enc_dim: int, feat_dim: int) -> str:
    """Which tensor the LAS rescorer consumes: ``"enc"`` (the transducer
    encoder output — the reference's shared-encoder rescorer,
    train_las_rescorer_bmuf_otfaug.sh) or ``"feats"`` (an
    independently-trained LAS with its own encoder).

    Dispatch order: the ``--las_input`` flag, then the bundle's recorded
    ``las_input`` metadata (written by train_las), then ``input_dim``
    matching.  An ambiguous dim tie with no recorded kind raises — it
    must never be guessed silently (ADVICE r4); a kind whose dim doesn't
    match the rescorer's input_dim also raises.
    """
    kind = flag
    if kind == "auto":
        kind = meta.get("las_input", "auto")
    if kind == "auto":
        if input_dim == enc_dim and input_dim == feat_dim:
            raise ValueError(
                f"LAS rescorer input_dim {input_dim} matches BOTH the "
                "transducer encoder output and the decode features, and "
                "the bundle records no las_input kind; pass "
                "--las_input enc|feats")
        if input_dim == enc_dim:
            kind = "enc"
        elif input_dim == feat_dim:
            kind = "feats"
        else:
            raise ValueError(
                f"LAS rescorer input_dim {input_dim} matches neither the "
                f"transducer encoder output ({enc_dim}) nor the decode "
                f"features ({feat_dim}); decode feature flags must match "
                "the rescorer's training")
    want = enc_dim if kind == "enc" else feat_dim
    if input_dim != want:
        raise ValueError(
            f"LAS rescorer input_dim {input_dim} != the selected "
            f"las_input '{kind}' dim ({want})")
    return kind


def make_decode_fn(model, cfg: BeamConfig, fst_start: int, featurizer=None):
    """Jitted ``decode(variables, fst_tables, x, lens)``.

    The model params and the FST tables — including the dense advance
    cache, which is hundreds of MB at real vocab sizes — ride as runtime
    arguments, NOT closure constants: closed-over device arrays are
    inlined into the lowered program as literals, and a ~478 MB cache
    blows tunneled remote-compile payload limits (observed: HTTP 413).
    As arguments they live in HBM and the program holds only their
    shapes.  ``tests/test_decode_payload.py`` pins this property.
    """
    if featurizer is None:
        from pika_tpu.decode.beam import beam_search_features

        return jax.jit(
            lambda v, ft, f, l: beam_search_features(
                model, v, f, l, cfg, ft, fst_start))
    return jax.jit(
        lambda v, ft, w, l: beam_search_waveforms(
            model, v, featurizer, w, l, cfg, ft, fst_start))


def build_parser():
    parser = argparse.ArgumentParser(description="transducer batch decoding")
    parser.add_argument("model", type=str, help="model bundle directory")
    parser.add_argument("wav_scp", type=str,
                        help="wav.scp (--loader otf) or feats.scp/.ark of "
                             "precomputed fbank features (--loader utt)")
    parser.add_argument("output_file", type=str)
    parser.add_argument("--loader", type=str, default="otf",
                        choices=["otf", "utt"],
                        help="otf: decode raw audio with on-device features; "
                             "utt: decode precomputed Kaldi feature archives "
                             "(eval_transducer.sh:88, decode_transducer.py:108-120)")
    parser.add_argument("--symbols_map", type=str, default=None)
    parser.add_argument("--ref_labels", type=str, default=None,
                        help="label.txt for WER scoring")
    parser.add_argument("--attn_chunk", type=int, default=-1,
                        help="override the bundle's encoder attention "
                             "chunking for decode (-1 keeps the trained "
                             "setting; >0 enables O(T*chunk)-memory "
                             "attention for long audio, 0 forces full)")
    parser.add_argument("--beam_size", type=int, default=8)
    parser.add_argument("--n_best", type=int, default=8)
    parser.add_argument("--blk", type=int, default=0)
    parser.add_argument("--sm_scale", type=float, default=1.0)
    parser.add_argument("--max_symbols", type=int, default=220)
    parser.add_argument("--fst_lm", type=str, default="",
                        help="binary OpenFst, text FST, or .arpa n-gram LM")
    parser.add_argument("--backoff_id", type=int, default=0)
    parser.add_argument("--disambig_ids", type=str, default="",
                        help="comma separated disambig label ids")
    parser.add_argument("--fst_lm_scale", type=float, default=1.0)
    parser.add_argument("--nonblk_reward", type=float, default=0.0)
    parser.add_argument("--max_fst_states", type=int, default=4)
    parser.add_argument("--fst_fusion", type=str, default="per_token",
                        choices=["per_token", "per_beam"],
                        help="shallow-fusion mode: per_token (default) "
                             "scores each expanded candidate with its "
                             "actual advanced LM score at selection time — "
                             "a pika_tpu extension that wins 2.7-6.2 WER "
                             "points absolute on the grammar matrix; "
                             "per_beam is the reference's exact semantics "
                             "(prefix-LM bias broadcast over the vocab, "
                             "winners' state sets advanced after top-k, "
                             "beam_transducer.py:93-97,136-159)")
    parser.add_argument("--fst_per_token", action="store_true",
                        help="alias for --fst_fusion per_token (the "
                             "default; kept for recipe compatibility)")
    parser.add_argument("--fst_topm", type=int, default=0,
                        help="non-blank candidates per beam scored with "
                             "their advanced LM score by --fst_per_token. "
                             "0 (default) = EXACT: score the full "
                             "vocabulary via the dense advance cache — "
                             "both more exact AND faster than a top-m "
                             "restriction (116 vs 56 utt/s at flagship "
                             "scale, BASELINE.md round 5); falls back to "
                             "top-8 when the cache is unavailable "
                             "(--fst_cache_mb 0 or LM too big)")
    parser.add_argument("--fst_cache_mb", type=int, default=512,
                        help="budget (MB) for the host-precomputed dense "
                             "advance cache (n_states x vocab x Lm) that "
                             "replaces the per-step LM backoff walks with "
                             "one gather; LMs whose cache exceeds it fall "
                             "back to the on-device walk.  0 disables")
    parser.add_argument("--fst_cache_file", type=str, default="",
                        help="persist the advance cache on disk and reuse "
                             "it across decode runs (the host build takes "
                             "~35 s at real vocab sizes).  'auto' = "
                             "<fst_lm>.advcache.npz; keyed by a content "
                             "fingerprint of the compiled tables, so a "
                             "changed LM rebuilds instead of mis-serving")
    parser.add_argument("--las_rescorer_model", type=str, default=None)
    parser.add_argument("--las_rescorer_bw_model", type=str, default=None)
    parser.add_argument("--las_input", type=str, default="auto",
                        choices=["auto", "enc", "feats"],
                        help="what the LAS rescorer consumes: the "
                             "transducer encoder output (enc — the "
                             "shared-encoder rescorer configuration) or "
                             "the decode features (feats — an "
                             "independently-trained LAS).  auto uses the "
                             "bundle's recorded las_input metadata, "
                             "falling back to input_dim matching, and "
                             "errors on an ambiguous tie")
    parser.add_argument("--rnnt_score_scale", type=float, default=1.0)
    parser.add_argument("--las_fw_score_scale", type=float, default=0.3)
    parser.add_argument("--las_bw_score_scale", type=float, default=0.7)
    parser.add_argument("--las_scale_sweep", type=str, default="",
                        help="comma-separated fw:bw pairs, e.g. "
                             "'0.3:0.7,0.5:0.5'.  One decode, a WER line "
                             "per pair (requires --ref_labels) — tune LAS "
                             "rescoring scales on a dev set without "
                             "re-decoding per candidate")
    parser.add_argument("--output_scores", action="store_true")
    parser.add_argument("--min_len", type=int, default=0,
                        help="minimum feature frames; short utterances are "
                             "edge-padded (decode_transducer.py:114-120)")
    parser.add_argument("--cmvn_stats", type=str, default=None)
    parser.add_argument("--cmn", action="store_true")
    parser.add_argument("--decode_dtype", type=str, default="auto",
                        choices=["auto", "bfloat16", "float32"],
                        help="matmul dtype inside the decode loop: auto = "
                             "bf16 on TPU (MXU-native), f32 elsewhere; "
                             "scores/softmax stay f32 either way")
    common.add_loader_args(parser)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    from pika_tpu.utils.cache import enable_compilation_cache
    from pika_tpu.utils.platform import honor_platforms_env

    honor_platforms_env()
    enable_compilation_cache()
    model, variables, _ = load_bundle(args.model)
    if args.attn_chunk >= 0 and getattr(model.config, "attn_chunk", None) is not None:
        import dataclasses as _dc

        model = type(model)(_dc.replace(model.config, attn_chunk=args.attn_chunk))
    args.spec_augment = False
    args.max_freq_span = args.max_time_span = 0
    args.cmn = getattr(args, "cmn", False)
    featurizer, _, max_samples = common.featurizer_from_args(args, spec_augment=False)

    fst_tables = None
    fst_start = 0
    if args.fst_lm:
        disambig = [int(x) for x in args.disambig_ids.split(",") if x]
        if args.fst_lm.endswith(".arpa"):
            if not args.symbols_map:
                sys.exit("--fst_lm with an ARPA file requires --symbols_map "
                         "(token symbol table) to map LM words to ids")
            sym = read_symbol_table(args.symbols_map)
            tables = compile_arpa(args.fst_lm, {s: i + 1 for i, s in sym.items()},
                                  backoff_id=args.backoff_id)
        else:
            try:
                tables = read_openfst_binary(args.fst_lm, args.backoff_id, disambig)
            except ValueError:
                tables = read_text_fst(args.fst_lm, args.backoff_id, disambig)
        cache_file = args.fst_cache_file
        if cache_file == "auto":
            cache_file = args.fst_lm + ".advcache.npz"
        fst_tables = tables.device_arrays(
            n_ilabels=int(model.config.vocab_size) + 1,
            cache_max_bytes=args.fst_cache_mb << 20,
            cache_file=cache_file or None,
        )
        fst_start = tables.start
        if "adv_cost" in fst_tables:
            print(f"FST advance cache: {tables.n_states} states x "
                  f"{fst_tables['adv_cost'].shape[1]} ilabels x "
                  f"Lm={fst_tables['adv_cost'].shape[2]} "
                  f"({fst_tables['adv_cost'].nbytes * 2 >> 20} MB)",
                  file=sys.stderr)

    lm_topm = args.fst_topm
    if (fst_tables is not None and lm_topm <= 0
            and "adv_cost" not in fst_tables):
        print("per-token fusion: exact selection (--fst_topm 0) needs the "
              "dense advance cache, unavailable here (--fst_cache_mb 0 or "
              "LM too big) — falling back to the top-8 candidate walk",
              file=sys.stderr)
        lm_topm = 8
    cfg = BeamConfig(
        beam_size=args.beam_size, n_best=args.n_best, blank=args.blk,
        sm_scale=args.sm_scale, max_symbols=args.max_symbols,
        lm_scale=args.fst_lm_scale if fst_tables is not None else 0.0,
        nonblk_reward=args.nonblk_reward, max_fst_states=args.max_fst_states,
        lm_per_token=args.fst_per_token or args.fst_fusion == "per_token",
        lm_topm=lm_topm,
        mm_dtype=args.decode_dtype,
    )

    las_fw = las_bw = None
    if args.las_rescorer_model:
        las_fw = load_bundle(args.las_rescorer_model)
    if args.las_rescorer_bw_model:
        las_bw = load_bundle(args.las_rescorer_bw_model)

    def make_las_scorer(m, reverse):
        # one jitted program per rescorer instead of eager op-by-op
        # dispatch: on tunneled transports every eager primitive pays
        # ~32 ms fixed latency, so scoring a batch cost dozens of round
        # trips.  Shapes are stable across batches (padded to bsz), so
        # this compiles once.  Variables ride as an argument (payload
        # discipline, see make_decode_fn).
        sos = args.SOS if args.SOS >= 0 else 0
        eos = args.EOS if args.EOS >= 0 else m.config.output_dim - 1
        return jax.jit(lambda v, src, sl, tok, tl: las_score_hyps(
            m, v, src, sl, tok, tl, sos=sos, eos=eos, reverse=reverse))

    las_fw_fn = make_las_scorer(las_fw[0], False) if las_fw else None
    las_bw_fn = make_las_scorer(las_bw[0], True) if las_bw else None

    sym_map = read_symbol_table(args.symbols_map) if args.symbols_map else None
    bsz = args.batch_size
    t_start = time.perf_counter()
    hyp_best = {}
    n_utts = 0

    if args.loader == "utt":
        # Precomputed-feature decoding (reference --loader utt:
        # eval_transducer.sh:88, decode_transducer.py:108-120): read Kaldi
        # feature archives, splice/stride on host, CMVN, decode.
        from pika_tpu.data.cmvn import CmvnStats, offset_scale
        from pika_tpu.data.feats_loader import FeatsLoaderConfig, feats_dataloader
        from pika_tpu.data.loader import prefetch_iter
        from pika_tpu.decode.beam import beam_search_features

        decode = make_decode_fn(model, cfg, fst_start)
        fbc = common.fbank_from_args(args)
        offset = scale = None
        if args.cmvn_stats:
            stats = CmvnStats.read(args.cmvn_stats)
            offset, scale = offset_scale(
                stats.stats, splice_copies=args.lctx + 1 + args.rctx)
        fl_cfg = FeatsLoaderConfig(
            batch_size=bsz, lctx=args.lctx, rctx=args.rctx,
            stride=args.stride, max_len=args.max_len,
        )

        def chunk_stream():
            def gen():
                for b in feats_dataloader(args.wav_scp, None, fl_cfg):
                    feats, lens = b["feats"], b["feat_lens"]
                    if args.min_len > 0:
                        # bucket padding replicates the last valid frame, so
                        # raising the length IS the reference's edge-pad
                        # (decode_transducer.py:114-120)
                        lens = np.minimum(np.maximum(lens, args.min_len),
                                          feats.shape[1]).astype(np.int32)
                    if args.cmn:
                        feats = feats - feats.mean(axis=1, keepdims=True)
                    if offset is not None:
                        feats = (feats + offset) * scale
                    if feats.shape[0] < bsz:  # ragged tail: pad the batch
                        pad = bsz - feats.shape[0]
                        feats = np.pad(feats, ((0, pad), (0, 0), (0, 0)))
                        lens = np.pad(lens, (0, pad), constant_values=1)
                    audio = (float(np.sum(lens[: len(b["uttids"])]))
                             * args.stride * fbc.frame_shift
                             / fbc.sample_frequency)
                    yield (b["uttids"], feats.astype(np.float32),
                           lens.astype(np.int32), audio)

            yield from prefetch_iter(gen(), size=2)

    else:
        decode = make_decode_fn(model, cfg, fst_start, featurizer=featurizer)
        scp = read_wav_scp(args.wav_scp)
        uttids = list(scp)

        min_samples = 0
        if args.min_len > 0:
            # frames = 1 + (n - frame_len)//shift → invert for min_len using
            # the configured fbank geometry
            fbc = common.fbank_from_args(args)
            min_samples = (args.min_len - 1) * fbc.frame_shift + fbc.frame_length

        def make_chunk(chunk):
            wavs = np.zeros((bsz, max_samples), np.float32)
            lens = np.full(bsz, max_samples, np.int32)
            audio = 0.0
            for i, uttid in enumerate(chunk):
                pcm, rate = read_wav(scp[uttid])
                x = seg.from_float32(seg.to_float32(pcm), "int16").astype(np.float32)
                x = x[:max_samples]
                if len(x) < min_samples:
                    mode = "edge" if len(x) else "constant"
                    x = np.pad(x, (0, min(min_samples, max_samples) - len(x)), mode=mode)
                wavs[i, : len(x)] = x
                lens[i] = len(x)
                audio += len(x) / rate
            return chunk, wavs, lens, audio

        def chunk_stream():
            """Prefetch the next chunk's wav I/O while the device decodes.
            Producer exceptions propagate to the consumer (a bad wav must abort
            the run, not silently truncate it)."""
            import queue as _q
            import threading as _t

            q: "_q.Queue" = _q.Queue(maxsize=2)

            def producer():
                try:
                    for i0 in range(0, len(uttids), bsz):
                        q.put(("ok", make_chunk(uttids[i0 : i0 + bsz])))
                    q.put(("done", None))
                except BaseException as exc:  # re-raised on the main thread
                    q.put(("error", exc))

            _t.Thread(target=producer, daemon=True).start()
            while True:
                kind, item = q.get()
                if kind == "error":
                    raise item
                if kind == "done":
                    return
                yield item

    sweep_pairs = []
    if args.las_scale_sweep:
        for p in args.las_scale_sweep.split(","):
            fw_s, bw_s = p.split(":")
            sweep_pairs.append((float(fw_s), float(bw_s)))
    hyp_sweep = [dict() for _ in sweep_pairs]

    total_audio = 0.0
    with open(args.output_file, "w", encoding="utf-8") as out_f:
        for chunk, wavs, lens, audio in chunk_stream():
            total_audio += audio
            n_utts += len(chunk)
            out = decode(variables, fst_tables, jnp.asarray(wavs), jnp.asarray(lens))

            def las_input(m, meta):
                try:
                    kind = select_las_input(
                        args.las_input, meta, int(m.config.input_dim),
                        out["enc_out"].shape[-1], out["feats"].shape[-1])
                except ValueError as exc:
                    sys.exit(str(exc))
                if kind == "enc":
                    return out["enc_out"], out["enc_lens"]
                return out["feats"], out["feat_lens"]

            fw_scores = bw_scores = None
            fw_tok = bw_tok = None
            if las_fw is not None:
                m, v, meta = las_fw
                src, src_lens = las_input(m, meta)
                fw_scores, fw_tok = las_fw_fn(
                    v, src, src_lens, out["tokens"], out["lens"])
                # per-token scores are only written under --output_scores;
                # each np.asarray is a D2H round trip (~32 ms fixed latency
                # on tunneled transports) — don't pay it for unused arrays
                fw_scores = np.asarray(fw_scores)
                fw_tok = np.asarray(fw_tok) if args.output_scores else None
            if las_bw is not None:
                m, v, meta = las_bw
                src, src_lens = las_input(m, meta)
                bw_scores, bw_tok = las_bw_fn(
                    v, src, src_lens, out["tokens"], out["lens"])
                bw_scores = np.asarray(bw_scores)
                bw_tok = np.asarray(bw_tok) if args.output_scores else None

            # ONE bulk fetch of the small outputs per batch (after the LAS
            # programs are dispatched, so scoring overlaps the transfer).
            # The per-utt loops below index these thousands of times;
            # indexing a device array is a separate D2H round trip EACH
            # time, and this transport has ~32 ms fixed latency per
            # transfer — per-element fetches turned a ~1 s decode batch
            # into ~25 s (measured).  enc_out/enc_lens stay on device:
            # only las_score_hyps uses them, device-side.
            host = {k: np.asarray(out[k]) for k in ("tokens", "lens", "scores")}

            best_idx, _ = rerank_nbest(
                host["scores"], host["lens"], fw_scores, bw_scores,
                args.rnnt_score_scale, args.las_fw_score_scale, args.las_bw_score_scale,
            )
            best_idx = np.asarray(best_idx)

            # scale sweep: rerank the SAME in-memory N-best per pair — one
            # decode, many candidate scale settings
            for pi, (fs, bs) in enumerate(sweep_pairs):
                bidx, _ = rerank_nbest(host["scores"], host["lens"],
                                       fw_scores, bw_scores,
                                       args.rnnt_score_scale, fs, bs)
                bidx = np.asarray(bidx)
                for i, uttid in enumerate(chunk):
                    bj = int(bidx[i])
                    length = int(host["lens"][i, bj])
                    hyp_sweep[pi][uttid] = [
                        str(int(t)) for t in host["tokens"][i, bj, :length]]

            for i, uttid in enumerate(chunk):
                for j in range(args.n_best):
                    length = int(host["lens"][i, j])
                    toks = [int(t) for t in host["tokens"][i, j, :length]]
                    text = "".join(sym_map.get(t, f"<{t}>") for t in toks) if sym_map else " ".join(map(str, toks))
                    out_f.write(text)
                    if args.output_scores:
                        out_f.write(f" {float(host['scores'][i, j])}")
                        if fw_tok is not None:
                            out_f.write(" " + " ".join(str(float(s)) for s in fw_tok[i, j, : length + 1]))
                        if bw_tok is not None:
                            out_f.write(" " + " ".join(str(float(s)) for s in bw_tok[i, j, : length + 1]))
                    out_f.write("\n")
                bj = int(best_idx[i])
                length = int(host["lens"][i, bj])
                hyp_best[uttid] = [str(int(t)) for t in host["tokens"][i, bj, :length]]

    elapsed = time.perf_counter() - t_start
    rtf = elapsed / max(total_audio, 1e-9)
    print(f"decoded {n_utts} utts, {total_audio:.1f}s audio in {elapsed:.1f}s "
          f"(RTF {rtf:.4f}, {n_utts / elapsed:.2f} utt/s)", file=sys.stderr)

    if args.ref_labels:
        refs = {
            uttid: [str(int(x)) for x in vec]
            for uttid, vec in read_int_vectors(args.ref_labels).items()
            if uttid in hyp_best
        }
        n_unref = len(hyp_best) - len(refs)
        if n_unref or not refs:
            # id drift between --ref_labels and the decoded wav.scp must be
            # loud: unmatched hypotheses are excluded from scoring, and an
            # empty intersection would otherwise print a perfect 0% WER
            print(f"WARNING: {n_unref} decoded utterances have no reference "
                  f"({len(refs)} of {len(hyp_best)} scored) — check that "
                  "--ref_labels ids match wav.scp ids", file=sys.stderr)
        for (fs, bs), hyps in zip(sweep_pairs, hyp_sweep):
            w_s, c_s = score_wer(refs, {u: h for u, h in hyps.items() if u in refs})
            print(f"las_scales {fs}:{bs} %WER {w_s * 100:.2f} "
                  f"[ {c_s['errors']} / {c_s['words']} ]", file=sys.stderr)
        wer, counts = score_wer(refs, hyp_best)
        print(f"%WER {wer * 100:.2f} [ {counts['errors']} / {counts['words']}, "
              f"{counts['ins']} ins, {counts['del']} del, {counts['sub']} sub ]",
              file=sys.stderr)
        return wer
    return None


def cli():
    """Console-script entry: main() returns the WER for programmatic use,
    which sys.exit() would misread as a failing exit status."""
    main()
    return 0


if __name__ == "__main__":
    main()
