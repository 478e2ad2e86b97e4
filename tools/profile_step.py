"""Attribute flagship train-step time to components on the real chip.

The batch sweep (bench.py BENCH_BATCH) saturates at ~62 TF/s analytic
while tools/bench_matmul.py shows the chip sustaining ~140 TF/s at the
joint-vocab shape and ~52 TF/s at the encoder shapes — so the step's
ceiling is a FLOP-weighted mix plus non-matmul overhead.  This tool
times each stage as its own dependency-chained scan:

  featurizer        wav -> fbank -> splice -> CMVN -> SpecAugment
  encoder fwd       TDNN-Transformer forward
  encoder fwd+bwd   + VJP wrt params (the training cost of the encoder)
  loss fwd+bwd      joint factors -> fused RNN-T loss -> grads (Pallas)
  full step         everything + prediction net + optimizer update

Stages overlap (the full step can fuse across boundaries), so components
need not sum exactly to the step; large residuals ARE the finding.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_step.py [--batch 8]
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np

SR = 16000
SECONDS = 10.0
VOCAB = 6268
U = 40


def chain_time(jax, jnp, fn, args, n_steps=10, reps=2):
    """Time fn(*args) -> (new_first_arg_like, scalar) in a dependency chain."""
    def run(*a):
        def body(carry, _):
            out, s = fn(carry, *a[1:])
            return out, s
        out, ss = jax.lax.scan(body, a[0], None, length=n_steps)
        return ss[-1]

    run_j = jax.jit(run)
    float(run_j(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run_j(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / n_steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dropout", type=float, default=0.2,
                    help="tdnn_transformer_dropout (0 isolates the cost of "
                         "attention-prob dropout masks, (B,H,T,T) random "
                         "bits per layer)")
    ap.add_argument("--attn_chunk", type=int, default=0,
                    help="query-block chunked attention (never materializes "
                         "(B,H,T,T) scores in HBM)")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--rng_impl", type=str, default="threefry2x32",
                    choices=["threefry2x32", "rbg"],
                    help="rbg = TPU hardware RngBitGenerator for mask "
                         "bits (the trainers' --rng_impl rbg)")
    ap.add_argument("--cheap_dropout", action="store_true",
                    help="attn_cheap_dropout: head-shared bits-threshold "
                         "attention-prob dropout (16x fewer random bits, "
                         "no bernoulli->uniform chain)")
    ap.add_argument("--pruned", type=int, default=0,
                    help="profile the pruned objective (--pruned_loss_range "
                         "N): adds a pruned-loss stage and switches the "
                         "FULL-step row to the pruned step")
    args = ap.parse_args()
    B = args.batch

    import jax
    import jax.numpy as jnp

    # unconditional: an explicit threefry pin must override any ambient
    # JAX_DEFAULT_PRNG_IMPL (ADVICE r4, same fix as bench.py/common.py)
    jax.config.update("jax_default_prng_impl", args.rng_impl)

    from pika_tpu.features import FbankConfig
    from pika_tpu.models import TransducerConfig, init_transducer
    from pika_tpu.models.transducer import Transducer
    from pika_tpu.ops.rnnt_loss import rnnt_loss_fused
    from pika_tpu.train import (
        FeaturizerConfig, TrainState, make_featurizer, make_optimizer,
        make_train_step,
    )

    max_samples = int(SR * SECONDS)
    featurizer = make_featurizer(FeaturizerConfig(
        fbank=FbankConfig(sample_frequency=SR, window_type="hamming",
                          dither=1.0, low_freq=40.0, high_freq=-200.0,
                          num_mel_bins=80),
        max_samples=max_samples, lctx=1, rctx=1, stride=1, spec_augment=True,
    ))
    cfg = TransducerConfig(
        input_dim=240, vocab_size=VOCAB, hid_dim=1024,
        encoder_type="tdnn_transformer", decoder_type="rnn",
        enc_layers=9, dec_layers=2, embd_dim=100,
        tdnn_nhid=1024, tdnn_layers=9,
        tdnn_transformer_dropout=args.dropout,
        attn_chunk=args.attn_chunk, remat=args.remat,
        attn_cheap_dropout=args.cheap_dropout,
        simple_joint=args.pruned > 0,
    )
    model, variables = init_transducer(jax.random.PRNGKey(0), cfg,
                                       max_t=80, max_u=8)
    rng = np.random.default_rng(0)
    wavs = jnp.asarray((rng.standard_normal((B, max_samples)) * 4000).astype(np.float32))
    wlens = jnp.asarray(np.full(B, max_samples, np.int32))
    labels = jnp.asarray(rng.integers(1, VOCAB, (B, U)).astype(np.int32))
    ulens = jnp.asarray(np.full(B, U, np.int32))
    key = jax.random.PRNGKey(1)

    rows = []

    # 1. featurizer
    def feat_fn(w, k):
        f, fl = featurizer(k, w, wlens, True)
        return w + f.sum() * 1e-20, f.sum()
    rows.append(("featurizer (fbank+splice+CMVN+SpecAug)",
                 chain_time(jax, jnp, feat_fn, (wavs, key))))

    # 2. encoder fwd
    feats, feat_lens = featurizer(None, wavs, wlens, False)
    feats = jax.block_until_ready(feats)

    # NB: every stage takes the model variables as a jit ARGUMENT — a
    # closure capture would bake the ~228 MB pytree into the HLO as
    # constants, which the axon remote-compile transport rejects
    # (HTTP 413 request-size limit).
    def enc_fn(f, vs, _k):
        enc = model.apply(vs, f, feat_lens, method=Transducer.encode,
                          rngs={"dropout": _k}, mutable=False, train=False)
        return f + enc.sum() * 1e-20, enc.sum()
    rows.append(("encoder fwd",
                 chain_time(jax, jnp, enc_fn, (feats, variables, key))))

    # 3. encoder fwd+bwd (grad wrt params of a scalar of encoder output)
    params = variables["params"]
    nonparams = {k_: v_ for k_, v_ in variables.items() if k_ != "params"}

    def encg_fn(f, nonp, p):
        def loss(p_):
            vs = {**nonp, "params": p_}
            enc = model.apply(vs, f, feat_lens, method=Transducer.encode,
                              train=False)
            return enc.sum()
        g = jax.grad(loss)(p)
        gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
        return f + gsum * 1e-20, gsum
    rows.append(("encoder fwd+bwd (eval mode, no dropout)",
                 chain_time(jax, jnp, encg_fn, (feats, nonparams, params))))

    # 3b. encoder fwd+bwd in TRAIN mode — what the step actually pays:
    # includes dropout mask generation ((B,H,T,T) random bits per
    # transformer layer when attention dropout is on) and BatchNorm
    # batch-statistics mode
    def encg_train_fn(f, nonp, p):
        def loss(p_):
            vs = {**nonp, "params": p_}
            enc = model.apply(vs, f, feat_lens, method=Transducer.encode,
                              train=True, rngs={"dropout": key},
                              mutable=["batch_stats"])[0]
            return enc.sum()
        g = jax.grad(loss)(p)
        gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
        return f + gsum * 1e-20, gsum
    rows.append(("encoder fwd+bwd (train mode, dropout+BN)",
                 chain_time(jax, jnp, encg_train_fn, (feats, nonparams, params))))

    # 4. loss fwd+bwd at the step's joint shapes (T'=250)
    tp = 250
    ax = jnp.asarray(rng.standard_normal((B, tp, 1024)).astype(np.float32))
    gx = jnp.asarray(rng.standard_normal((B, tp, 1024)).astype(np.float32))
    ay = jnp.asarray(rng.standard_normal((B, U + 1, 1024)).astype(np.float32))
    gy = jnp.asarray(rng.standard_normal((B, U + 1, 1024)).astype(np.float32))
    w2 = jnp.asarray((rng.standard_normal((1024, VOCAB)) / 32).astype(np.float32))
    b2 = jnp.zeros((VOCAB,), jnp.float32)
    tlens = jnp.asarray(np.full(B, tp, np.int32))

    def loss_fn(ax_, rest):
        gx_, ay_, gy_, w2_, b2_ = rest

        def f(a):
            return jnp.sum(rnnt_loss_fused(a, gx_, ay_, gy_, w2_, b2_,
                                           labels, tlens, ulens, 16, "pallas"))
        l, g = jax.value_and_grad(f)(ax_)
        return ax_ + g * 1e-20, l
    rows.append(("fused RNN-T loss fwd+bwd (pallas, d_ax only)",
                 chain_time(jax, jnp, loss_fn, (ax, (gx, ay, gy, w2, b2)))))

    # 4a. pruned objective fwd+bwd at the same shapes (simple heads +
    # simple DP + band selection + banded joint channels + banded DP)
    if args.pruned:
        from pika_tpu.ops.rnnt_pruned import (prune_ranges, rnnt_loss_pruned,
                                              rnnt_loss_simple)
        enc_in = jnp.asarray(rng.standard_normal((B, tp, 1024)).astype(np.float32))
        dec_in = jnp.asarray(rng.standard_normal((B, U + 1, 1024)).astype(np.float32))
        params0 = variables["params"]
        nonp0 = {k_: v_ for k_, v_ in variables.items() if k_ != "params"}

        def pruned_fn(e, d, nonp, p):
            def loss(p_):
                vs = {**nonp, "params": p_}
                am, lm = model.apply(vs, e, d, method=Transducer.simple_factors)
                simple, (blp, elp) = rnnt_loss_simple(
                    am, lm, labels, tlens, ulens)
                sb = prune_ranges(blp, elp, labels, tlens, ulens, args.pruned)
                ax_, gx_, ay_, gy_ = model.apply(
                    vs, e, d, method=Transducer.joint_factors)
                w2_, b2_ = model.apply(vs, method=Transducer.joint_params)
                pr = rnnt_loss_pruned(ax_, gx_, ay_, gy_, w2_, b2_, labels,
                                      tlens, ulens, sb, args.pruned, chunk=64)
                return pr.sum() + 0.5 * simple.sum()
            g = jax.grad(loss)(p)
            gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
            return e + gsum * 1e-20, gsum
        rows.append((f"pruned objective fwd+bwd (s={args.pruned}, incl. "
                     "simple+ranges+factors)",
                     chain_time(jax, jnp, pruned_fn,
                                (enc_in, dec_in, nonp0, params0))))

    # 4b-4e. residual itemization (VERDICT r4 item 3): the pieces of the
    # step outside featurizer/encoder/loss, each as its own chained scan.
    dummy = jnp.zeros((8, 8), jnp.float32)

    #   prediction net fwd+bwd (2-layer LSTM scan over U+1 label positions)
    def pred_fn(dmy, nonp, p):
        def loss(p_):
            vs = {**nonp, "params": p_}
            dec = model.apply(vs, labels, ulens, method=Transducer.predict)
            return dec.sum()
        g = jax.grad(loss)(p)
        gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
        return dmy + gsum * 1e-20, gsum
    rows.append(("pred net fwd+bwd (LSTM scan over U+1)",
                 chain_time(jax, jnp, pred_fn, (dummy, nonparams, params))))

    #   joint factor projections fwd+bwd (4 H x H matmuls over enc + dec)
    enc_fix = jnp.asarray(rng.standard_normal((B, tp, 1024)).astype(np.float32))
    dec_fix = jnp.asarray(rng.standard_normal((B, U + 1, 1024)).astype(np.float32))

    def jf_fn(e, d, nonp, p):
        def loss(p_):
            vs = {**nonp, "params": p_}
            ax_, gx_, ay_, gy_ = model.apply(
                vs, e, d, method=Transducer.joint_factors)
            return ax_.sum() + gx_.sum() + ay_.sum() + gy_.sum()
        g = jax.grad(loss)(p)
        gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
        return e + gsum * 1e-20, gsum
    rows.append(("joint factor projections fwd+bwd",
                 chain_time(jax, jnp, jf_fn, (enc_fix, dec_fix, nonparams, params))))

    # 5. full train step
    tx = make_optimizer("sgd", initial_lr=0.003, final_lr=0.0001,
                        total_batches=100000, momentum=0.9, grad_clip=3.0)

    #   optimizer update: inf-norm clip + momentum + LR schedule + apply
    #   over the full ~57M-param tree (the optax chain as the step runs it)
    import optax as _optax
    opt_state0 = tx.init(params)
    fake_grads = jax.tree_util.tree_map(lambda x: jnp.full_like(x, 1e-4), params)

    def opt_fn(g, os_, p_):
        updates, _ = tx.update(g, os_, p_)
        new_p = _optax.apply_updates(p_, updates)
        gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(new_p))
        g2 = jax.tree_util.tree_map(lambda x: x + gsum * 1e-30, g)
        return g2, gsum
    rows.append(("optimizer (inf-clip + momentum + apply)",
                 chain_time(jax, jnp, opt_fn, (fake_grads, opt_state0, params))))

    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       opt_state=tx.init(variables["params"]),
                       batch_stats=variables.get("batch_stats"))
    step_fn = make_train_step(model, tx, featurizer, loss_chunk=16,
                              jit=False, pruned_range=args.pruned)
    batch = {"wavs": wavs, "wav_lens": wlens, "labels": labels,
             "label_lens": ulens}

    def step_wrap(st, b, k):
        st2, m = step_fn(st, b, k)
        return st2, m["loss"]
    rows.append(("FULL train step",
                 chain_time(jax, jnp, step_wrap, (state, batch, key))))

    full = rows[-1][1]
    print(f"\nbatch {B}, 10s utts, flagship config, dropout {args.dropout}, "
          f"attn_chunk {args.attn_chunk}, rng {args.rng_impl}, "
          f"cheap_dropout {args.cheap_dropout}:")
    for name, t in rows:
        print(f"  {name:45s} {t * 1000:8.1f} ms  ({t / full * 100:5.1f}% of step)")
    named = {n: t for n, t in rows}
    loss_row = (f"pruned objective fwd+bwd (s={args.pruned}, incl. "
                "simple+ranges+factors)" if args.pruned
                else "fused RNN-T loss fwd+bwd (pallas, d_ax only)")
    known = (named["featurizer (fbank+splice+CMVN+SpecAug)"]
             + named["encoder fwd+bwd (train mode, dropout+BN)"]
             + named[loss_row]
             + named["pred net fwd+bwd (LSTM scan over U+1)"]
             + named["joint factor projections fwd+bwd"]
             + named["optimizer (inf-clip + momentum + apply)"])
    print(f"  {'sum of itemized components':45s} {known * 1000:8.1f} ms  "
          f"({known / full * 100:5.1f}%) — remainder is XLA fusion overlap "
          f"(negative = the full step fuses better than the parts)")


if __name__ == "__main__":
    main()
