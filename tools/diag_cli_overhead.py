"""Diagnose end-to-end CLI training overhead on the real chip: host loader
throughput, H2D transfer cost, and per-dispatch train-step latency
(Python-loop dispatches vs the scan-chained bench.py pattern)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pika_tpu.features import FbankConfig
    from pika_tpu.models import TransducerConfig, init_transducer
    from pika_tpu.train import (
        FeaturizerConfig, TrainState, make_featurizer, make_optimizer,
        make_train_step,
    )

    sr = 16000
    max_samples = sr * 10
    vocab = 6268

    # --- a) host loader alone ---------------------------------------------
    import tempfile

    from pika_tpu.data import MrkSeqWriter, write_int_vectors
    from pika_tpu.data.loader import OtfLoaderConfig, dataloader

    root = tempfile.mkdtemp(prefix="diag_")
    rng = np.random.default_rng(0)
    n_utts = 160
    labels = []
    with MrkSeqWriter(f"{root}/d.mrk", f"{root}/d.seq") as w:
        for i in range(n_utts):
            pcm = (rng.standard_normal(sr * 9) * 4000).astype(np.int16)
            w.write(f"u{i:04d}", pcm)
            labels.append((f"u{i:04d}", rng.integers(1, vocab, 30).tolist()))
        shards = list(w.shards)
    write_int_vectors(f"{root}/label.txt", labels)
    with open(f"{root}/data.lst", "w") as f:
        for mrk, seq in shards:
            f.write(f"{mrk} {seq} ark:{root}/label.txt\n")

    cfg_l = OtfLoaderConfig(batch_size=8, num_workers=4,
                            wav_buckets=(max_samples,), label_buckets=(32,))
    t0 = time.perf_counter()
    n = 0
    for b in dataloader(f"{root}/data.lst", cfg_l):
        n += len(b["uttids"])
    dt = time.perf_counter() - t0
    print(f"a) host loader only: {n} utts in {dt:.2f}s = {n / dt:.1f} utt/s")

    # --- model + step ------------------------------------------------------
    fb = FbankConfig(sample_frequency=sr, window_type="hamming", dither=1.0,
                     low_freq=40.0, high_freq=-200.0, num_mel_bins=80)
    featurizer = make_featurizer(FeaturizerConfig(
        fbank=fb, max_samples=max_samples, lctx=1, rctx=1, stride=1,
        spec_augment=True))
    cfg = TransducerConfig(
        input_dim=240, vocab_size=vocab, hid_dim=1024,
        encoder_type="tdnn_transformer", decoder_type="rnn",
        enc_layers=9, dec_layers=2, embd_dim=100,
        tdnn_nhid=1024, tdnn_layers=9)
    model, variables = init_transducer(jax.random.PRNGKey(0), cfg, max_t=80, max_u=8)
    tx = make_optimizer("sgd", initial_lr=0.003, final_lr=0.0001,
                        total_batches=100000, momentum=0.9, grad_clip=3.0)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       opt_state=tx.init(variables["params"]),
                       batch_stats=variables.get("batch_stats"))
    step = make_train_step(model, tx, featurizer, loss_chunk=16, donate=False)

    batch_np = {
        "wavs": (rng.standard_normal((8, max_samples)) * 4000).astype(np.float32),
        "wav_lens": np.full(8, max_samples, np.int32),
        "labels": rng.integers(1, vocab, (8, 40)).astype(np.int32),
        "label_lens": np.full(8, 40, np.int32),
    }

    # --- b) H2D transfer ----------------------------------------------------
    for rep in range(2):
        t0 = time.perf_counter()
        k = 10
        devs = []
        for i in range(k):
            bb = dict(batch_np)
            bb["wavs"] = batch_np["wavs"] + np.float32(i)  # defeat caching
            devs.append({kk: jax.device_put(vv) for kk, vv in bb.items()})
        for d in devs:
            np.asarray(d["wavs"][0, :4])  # force completion
        dt = (time.perf_counter() - t0) / k
        mb = sum(v.nbytes for v in batch_np.values()) / 1e6
        print(f"b) H2D per batch ({mb:.1f} MB): {dt * 1000:.1f} ms (rep {rep})")

    # --- c) per-dispatch train-step latency (Python loop, CLI pattern) -----
    key = jax.random.PRNGKey(1)
    dev_batch = {kk: jax.device_put(vv) for kk, vv in batch_np.items()}
    state2, m = step(state, dev_batch, key)
    float(m["loss"])  # compile
    for rep in range(2):
        t0 = time.perf_counter()
        k = 10
        st = state2
        for i in range(k):
            key, sub = jax.random.split(key)
            st, m = step(st, dev_batch, sub)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / k
        print(f"c) python-loop dispatch per step: {dt * 1000:.1f} ms (rep {rep})")


if __name__ == "__main__":
    main()
