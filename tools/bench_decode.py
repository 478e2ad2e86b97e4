"""Decode-throughput benchmark: batched beam search on the flagship model.

Measures utterances/sec and RTF for the jitted beam search (the
reference's eval_transducer path: 1 GPU, batch 2, beam 8 —
egs/eval_transducer.sh:18-20).  Run on the real chip:

    PYTHONPATH=. python tools/bench_decode.py [--batch 8] [--beam 8]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import dataclasses
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--beam", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--n_best", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--max_symbols", type=int, default=64)
    ap.add_argument("--attribution", action="store_true",
                    help="also time the featurizer+encoder alone; the "
                         "difference attributes decode time between the "
                         "batch-scaling encoder forward and the "
                         "latency-bound beam while_loop")
    ap.add_argument("--fst", choices=("off", "per_beam", "per_token"),
                    default="off",
                    help="decode with synthetic n-gram FST fusion to "
                         "measure the RTF cost of each fusion mode "
                         "(VERDICT r3 item 4)")
    ap.add_argument("--fst_states", type=int, default=5000,
                    help="synthetic LM size (bigram contexts)")
    ap.add_argument("--fst_cache_mb", type=int, default=512,
                    help="dense advance-cache budget (MB); 0 = the "
                         "on-device backoff-walk path (round-4 behavior)")
    ap.add_argument("--fst_topm", type=int, default=0,
                    help="per-token candidates per beam; 0 (the CLI "
                         "default) = exact full-vocab selection via the "
                         "dense cache")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pika_tpu.decode.beam import BeamConfig, beam_search_waveforms
    from pika_tpu.features import FbankConfig
    from pika_tpu.models import TransducerConfig, init_transducer
    from pika_tpu.train import FeaturizerConfig, make_featurizer

    sr = 16000
    max_samples = int(sr * args.seconds)
    fb = FbankConfig(sample_frequency=sr, window_type="hamming", dither=0.0,
                     low_freq=40.0, high_freq=-200.0, num_mel_bins=80)
    featurizer = make_featurizer(
        FeaturizerConfig(fbank=fb, max_samples=max_samples, lctx=1, rctx=1, stride=1)
    )
    cfg = TransducerConfig(
        input_dim=240, vocab_size=6268, hid_dim=1024,
        encoder_type="tdnn_transformer", decoder_type="rnn",
        enc_layers=9, dec_layers=2, embd_dim=100,
        tdnn_nhid=1024, tdnn_layers=9,
    )
    model, variables = init_transducer(jax.random.PRNGKey(0), cfg, max_t=80, max_u=8)
    fst_tables = None
    fst_start = 0
    bcfg = BeamConfig(beam_size=args.beam, n_best=args.n_best,
                      sm_scale=1.2, max_symbols=args.max_symbols,
                      mm_dtype="auto",
                      lm_scale=0.5 if args.fst != "off" else 0.0,
                      lm_per_token=(args.fst == "per_token"),
                      lm_topm=args.fst_topm)
    if args.fst != "off":
        # synthetic but realistically-shaped backoff bigram LM: a unigram
        # state with V arcs plus fst_states bigram contexts with ~40
        # successors each, ilabel-sorted CSR (what compile_arpa produces)
        from pika_tpu.decode.fst import FstTables
        lm_rng = np.random.default_rng(1)
        vocab = 6268
        ns = 1 + args.fst_states
        succ = 40
        arc_start = np.zeros(ns + 1, np.int64)
        arc_start[1] = vocab  # unigram state: every token
        arc_start[2:] = vocab + succ * np.arange(1, ns, dtype=np.int64)
        ils, ws, nxt = [np.arange(1, vocab + 1, dtype=np.int32)], [], []
        ws.append(lm_rng.uniform(1.0, 12.0, vocab).astype(np.float32))
        nxt.append(lm_rng.integers(1, ns, vocab).astype(np.int32))
        for _ in range(ns - 1):
            ils.append(np.sort(lm_rng.choice(
                np.arange(1, vocab + 1, dtype=np.int32), succ, replace=False)))
            ws.append(lm_rng.uniform(0.2, 6.0, succ).astype(np.float32))
            nxt.append(lm_rng.integers(1, ns, succ).astype(np.int32))
        tables = FstTables(
            arc_start=arc_start.astype(np.int32),
            arc_ilabel=np.concatenate(ils), arc_weight=np.concatenate(ws),
            arc_next=np.concatenate(nxt),
            backoff_next=np.concatenate([[-1], np.zeros(ns - 1, np.int32)]).astype(np.int32),
            backoff_weight=np.concatenate([[0.0], lm_rng.uniform(0.5, 3.0, ns - 1)]).astype(np.float32),
            final_weight=np.full(ns, 0.5, np.float32),
            start=0,
            disambig_next=np.full((ns, 1), -1, np.int32),
            disambig_weight=np.full((ns, 1), 1e30, np.float32),
        )
        t0 = time.perf_counter()
        fst_tables = tables.device_arrays(
            n_ilabels=vocab + 1,
            cache_max_bytes=args.fst_cache_mb << 20)
        fst_start = tables.start
        if "adv_cost" in fst_tables:
            print(f"  advance cache: Lm={fst_tables['adv_cost'].shape[-1]}, "
                  f"{(fst_tables['adv_cost'].nbytes * 2) >> 20} MB, "
                  f"built in {time.perf_counter() - t0:.1f}s")

    if (fst_tables is not None and args.fst_topm <= 0
            and "adv_cost" not in fst_tables):
        # exact selection needs the cache; mirror the CLI's fallback
        bcfg = dataclasses.replace(bcfg, lm_topm=8)

    rng = np.random.default_rng(0)
    wavs = jnp.asarray((rng.standard_normal((args.batch, max_samples)) * 4000).astype(np.float32))
    lens = jnp.asarray(np.full(args.batch, max_samples, np.int32))

    # dependency-chained timing: some PJRT transports short-circuit
    # repeated identical dispatches, so each iteration must consume the
    # previous result
    # fst_tables must be a runtime argument, not a closure constant: a
    # closed-over advance cache is inlined into the HLO as a literal and a
    # ~478 MB cache blows tunneled remote-compile payload limits (HTTP 413).
    @jax.jit
    def run(vs, ft, w):
        def body(carry, _):
            out = beam_search_waveforms(model, vs, featurizer, carry, lens,
                                        bcfg, ft, fst_start)
            return carry + out["scores"].sum() * 1e-20, out["scores"].sum()
        _, outs = jax.lax.scan(body, w, None, length=args.reps)
        return outs.sum()

    float(run(variables, fst_tables, wavs))  # compile + warm
    t0 = time.perf_counter()
    float(run(variables, fst_tables, wavs))
    dt = (time.perf_counter() - t0) / args.reps
    utts = args.batch / dt
    rtf = dt / (args.batch * args.seconds)
    print(f"beam={args.beam} batch={args.batch} fst={args.fst}: "
          f"{dt*1000:.1f} ms/batch, {utts:.2f} utt/s, RTF {rtf:.5f}")

    if args.attribution:
        from pika_tpu.models.transducer import Transducer

        @jax.jit
        def run_enc(vs, w):
            def body(carry, _):
                feats, feat_lens = featurizer(None, carry, lens, False)
                enc = model.apply(vs, feats, feat_lens, method=Transducer.encode)
                s = enc.sum()
                return carry + s * 1e-20, s
            _, outs = jax.lax.scan(body, w, None, length=args.reps)
            return outs.sum()

        float(run_enc(variables, wavs))
        t0 = time.perf_counter()
        float(run_enc(variables, wavs))
        dt_enc = (time.perf_counter() - t0) / args.reps
        print(f"  attribution: featurizer+encoder {dt_enc*1000:.1f} ms "
              f"({dt_enc/dt*100:.0f}%), beam while_loop+joint "
              f"{(dt-dt_enc)*1000:.1f} ms ({(dt-dt_enc)/dt*100:.0f}%)")


if __name__ == "__main__":
    main()
