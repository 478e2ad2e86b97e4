"""Overfit probe: can each encoder type fit 64 utterances of the
mini-synthetic corpus with augmentation off?  Isolates trainability bugs
from task difficulty.

    PYTHONPATH=.:... python tools/probe_overfit.py CORPUS_DIR --encoder rnn|transformer
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("corpus")
    ap.add_argument("--encoder", default="transformer")
    ap.add_argument("--utts", type=int, default=64)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--tdnn_nhid", type=int, default=256)
    ap.add_argument("--bs", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pika_tpu.data import segment as seg
    from pika_tpu.data.scp import read_wav_scp, read_int_vectors
    from pika_tpu.data.wavio import read_wav
    from pika_tpu.features import FbankConfig
    from pika_tpu.models import TransducerConfig, init_transducer
    from pika_tpu.train import (FeaturizerConfig, TrainState, make_featurizer,
                                make_optimizer, make_train_step)

    sr = 16000
    max_samples = 4 * sr
    scp = read_wav_scp(f"{args.corpus}/train/wav.scp")
    labels = read_int_vectors(f"ark:{args.corpus}/train/label.txt")
    uttids = list(scp)[: args.utts]
    wavs = np.zeros((len(uttids), max_samples), np.float32)
    wl = np.zeros(len(uttids), np.int32)
    labs = np.zeros((len(uttids), 16), np.int32)
    ll = np.zeros(len(uttids), np.int32)
    for i, u in enumerate(uttids):
        pcm, _ = read_wav(scp[u])
        x = seg.from_float32(seg.to_float32(pcm), "int16").astype(np.float32)
        wavs[i, : len(x)] = x[:max_samples]
        wl[i] = min(len(x), max_samples)
        a = labels[u]
        labs[i, : len(a)] = a
        ll[i] = len(a)

    fb = FbankConfig(sample_frequency=sr, window_type="hamming", dither=0.0,
                     low_freq=40.0, high_freq=-200.0, num_mel_bins=40)
    featurizer = make_featurizer(FeaturizerConfig(
        fbank=fb, max_samples=max_samples, lctx=1, rctx=1, stride=1))
    cfg = TransducerConfig(
        input_dim=120, vocab_size=31, hid_dim=256,
        encoder_type="tdnn_transformer" if args.encoder == "transformer" else "rnn",
        decoder_type="rnn", enc_layers=2 if args.encoder == "rnn" else 9,
        dec_layers=1, embd_dim=64, tdnn_nhid=args.tdnn_nhid, tdnn_layers=9)
    model, variables = init_transducer(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer("sgd", args.lr, args.lr / 10, args.steps,
                        momentum=0.9, grad_clip=3.0)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       opt_state=tx.init(variables["params"]),
                       batch_stats=variables.get("batch_stats"))
    step = make_train_step(model, tx, featurizer, donate=False)

    key = jax.random.PRNGKey(1)
    n = len(uttids)
    order = np.arange(n)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for it in range(args.steps):
        rng.shuffle(order)
        idx = order[: args.bs]
        batch = {"wavs": jnp.asarray(wavs[idx]), "wav_lens": jnp.asarray(wl[idx]),
                 "labels": jnp.asarray(labs[idx]), "label_lens": jnp.asarray(ll[idx])}
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
        if it % 25 == 0 or it == args.steps - 1:
            print(f"step {it:4d}: loss/label "
                  f"{float(m['loss']) / max(1, float(m['num_labels'])):.4f}")
    print(f"done in {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
