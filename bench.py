"""Benchmark: RNN-T training throughput (utterances/sec/chip) on the
flagship PIKA config — TDNN-Transformer encoder (9 layers, nhid 1024),
2-layer LSTM prediction net, vocab 6268, batch 8 × 10 s utterances —
running the FULL fused step: waveform → fbank → splice → CMVN →
SpecAugment → encoder/decoder/joint → fused RNN-T loss → SGD update,
as one XLA program on one chip.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is null: the reference publishes no throughput numbers
(BASELINE.md), and its GPU stack cannot run here.
"""

import json
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

    batch_size = 8
    seconds = 10.0
    sr = 16000
    max_samples = int(sr * seconds)
    vocab = 6268
    u_max = 40

    fbank_cfg = FbankConfig(
        sample_frequency=sr, window_type="hamming", dither=1.0,
        low_freq=40.0, high_freq=-200.0, num_mel_bins=80,
    )
    featurizer = make_featurizer(
        FeaturizerConfig(
            fbank=fbank_cfg, max_samples=max_samples, lctx=1, rctx=1,
            stride=1, spec_augment=True,
        )
    )
    cfg = TransducerConfig(
        input_dim=240, vocab_size=vocab, hid_dim=1024,
        encoder_type="tdnn_transformer", decoder_type="rnn",
        enc_layers=9, dec_layers=2, embd_dim=100,
        tdnn_nhid=1024, tdnn_layers=9,
    )
    model, variables = init_transducer(jax.random.PRNGKey(0), cfg, max_t=80, max_u=8)
    tx = make_optimizer(
        "sgd", initial_lr=0.003, final_lr=0.0001, total_batches=100000,
        momentum=0.9, grad_clip=3.0,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        opt_state=tx.init(variables["params"]),
        batch_stats=variables.get("batch_stats"),
    )
    train_step = make_train_step(model, tx, featurizer, loss_chunk=16, donate=True)  # loss_backend auto -> pallas on TPU

    rng = np.random.default_rng(0)
    batch = {
        "wavs": jnp.asarray((rng.standard_normal((batch_size, max_samples)) * 4000).astype(np.float32)),
        "wav_lens": jnp.asarray(np.full(batch_size, max_samples, np.int32)),
        "labels": jnp.asarray(rng.integers(1, vocab, (batch_size, u_max)).astype(np.int32)),
        "label_lens": jnp.asarray(np.full(batch_size, u_max, np.int32)),
    }
    key = jax.random.PRNGKey(1)

    # warmup / compile
    for i in range(3):
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, batch, sub)
    jax.block_until_ready(metrics["loss"])

    n_steps = 10
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, batch, sub)
    jax.block_until_ready(metrics["loss"])
    elapsed = time.perf_counter() - t0

    utts_per_sec = batch_size * n_steps / elapsed
    print(json.dumps({
        "metric": "rnnt_train_utterances_per_sec_per_chip",
        "value": round(utts_per_sec, 3),
        "unit": "utt/s (10s utts, flagship TDNN-Transformer RNN-T, fused wav->loss step)",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
