"""Minimum end-to-end slice (SURVEY.md §7 step 5): synthetic wavs →
mrk/seq archives → threaded loader → fused wav→fbank→model→RNNT-loss
train step → greedy decode → CER ≈ 0 → checkpoint round trip."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pika_tpu.data import MrkSeqWriter, write_int_vectors
from pika_tpu.data.loader import OtfLoaderConfig, dataloader
from pika_tpu.features import FbankConfig
from pika_tpu.models import Transducer, TransducerConfig, init_transducer
from pika_tpu.train import (
    FeaturizerConfig,
    TrainState,
    make_featurizer,
    make_optimizer,
    make_train_step,
    save_checkpoint,
    restore_checkpoint,
)
from pika_tpu.decode import greedy_decode_waveforms, score_wer

VOCAB = 6  # labels 1..5, blank 0
TONE_HZ = {k: 300 + 180 * k for k in range(1, VOCAB)}
SR = 16000
TOK_SEC = 0.12


def _make_corpus(tmp_path, n_utts, rng):
    """Tone-sequence corpus: each label is a distinct sine tone."""
    wavs, labels = {}, []
    with MrkSeqWriter(str(tmp_path / "train.mrk"), str(tmp_path / "train.seq")) as w:
        for i in range(n_utts):
            n_tok = int(rng.integers(2, 5))
            toks = rng.integers(1, VOCAB, n_tok)
            pieces = []
            for tk in toks:
                t = np.arange(int(SR * TOK_SEC)) / SR
                pieces.append(0.3 * np.sin(2 * np.pi * TONE_HZ[int(tk)] * t))
            pcm = (np.concatenate(pieces) * 32767).astype(np.int16)
            uttid = f"utt{i}"
            w.write(uttid, pcm)
            labels.append((uttid, toks.tolist()))
            wavs[uttid] = toks.tolist()
        shards = list(w.shards)
    write_int_vectors(str(tmp_path / "label.txt"), labels)
    with open(tmp_path / "data.lst", "w") as f:
        for mrk, seq in shards:
            f.write(f"{mrk} {seq} ark:{tmp_path / 'label.txt'}\n")
    return str(tmp_path / "data.lst"), wavs


def test_loader_propagates_worker_errors(tmp_path, rng):
    """A corrupt shard (here: an utterance missing from the label ark) must
    raise in the consuming loop, not silently end the worker's stream and
    shrink the epoch (VERDICT r1 weak #3)."""
    data_lst, _ = _make_corpus(tmp_path, 8, rng)
    # drop one utterance's labels
    label_path = tmp_path / "label.txt"
    lines = label_path.read_text().splitlines()
    label_path.write_text("\n".join(lines[1:]) + "\n")
    cfg = OtfLoaderConfig(batch_size=4, num_workers=2, augment=False)
    with pytest.raises(RuntimeError, match="loader worker"):
        for _ in dataloader(data_lst, cfg):
            pass


@pytest.mark.slow
def test_end_to_end_train_decode_checkpoint(tmp_path, rng):
    data_lst, refs = _make_corpus(tmp_path, 24, rng)

    fbank_cfg = FbankConfig(
        sample_frequency=SR, window_type="hamming", dither=0.0,
        low_freq=40.0, high_freq=-200.0, num_mel_bins=20,
    )
    max_samples = SR  # 1 s buckets
    loader_cfg = OtfLoaderConfig(
        batch_size=8, num_workers=1, augment=False, seed=3,
        wav_buckets=(max_samples,), label_buckets=(8,),
    )
    feat_cfg = FeaturizerConfig(fbank=fbank_cfg, max_samples=max_samples, lctx=1, rctx=1, stride=2)

    # global CMVN pass (compute_global_cmvn.py equivalent)
    from pika_tpu.data.cmvn import CmvnStats, offset_scale

    raw_featurizer = make_featurizer(FeaturizerConfig(fbank=fbank_cfg, max_samples=max_samples))
    stats = CmvnStats(20)
    for batch in dataloader(data_lst, loader_cfg):
        f, fl = jax.jit(lambda w, l: raw_featurizer(None, w, l, False))(
            jnp.asarray(batch["wavs"]), jnp.asarray(batch["wav_lens"])
        )
        for i in range(len(fl)):
            stats.accumulate(np.asarray(f[i, : int(fl[i])]))
    off, sc = offset_scale(stats.stats, splice_copies=3)
    featurizer = make_featurizer(feat_cfg, jnp.asarray(off), jnp.asarray(sc))

    cfg = TransducerConfig(
        input_dim=20 * 3, vocab_size=VOCAB, hid_dim=48,
        enc_layers=1, dec_layers=1, embd_dim=16,
    )
    model, variables = init_transducer(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer("sgd", initial_lr=0.05, final_lr=0.01, total_batches=600,
                        momentum=0.9, grad_clip=3.0)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       opt_state=tx.init(variables["params"]))
    train_step = make_train_step(model, tx, featurizer, donate=False)

    key = jax.random.PRNGKey(1)
    last_loss = None
    for epoch in range(40):
        for batch in dataloader(data_lst, loader_cfg):
            key, sub = jax.random.split(key)
            jbatch = {k: jnp.asarray(v) for k, v in batch.items() if k != "uttids"}
            state, metrics = train_step(state, jbatch, sub)
        last_loss = float(metrics["loss"]) / float(metrics["num_labels"])
    assert last_loss < 0.1, f"per-label loss too high: {last_loss}"

    # greedy decode the training data → CER ~ 0
    hyps = {}
    variables = {"params": state.params}
    for batch in dataloader(data_lst, loader_cfg):
        out, out_lens = jax.jit(
            lambda w, l: greedy_decode_waveforms(model, variables, featurizer, w, l, max_symbols=8)
        )(jnp.asarray(batch["wavs"]), jnp.asarray(batch["wav_lens"]))
        for i, uttid in enumerate(batch["uttids"]):
            hyps[uttid] = [str(x) for x in np.asarray(out[i, : int(out_lens[i])])]
    refs_str = {k: [str(x) for x in v] for k, v in refs.items()}
    wer, counts = score_wer(refs_str, hyps)
    assert wer < 0.1, f"greedy CER too high: {wer} ({counts})"

    # checkpoint round trip
    path = save_checkpoint(str(tmp_path / "ckpt"), int(state.step), state,
                           metadata={"epoch": 40})
    restored, meta = restore_checkpoint(str(tmp_path / "ckpt"), target=state)
    assert meta["epoch"] == 40
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.params, restored.params,
    )


def test_scanned_step_tail_masking_is_exact(rng):
    """make_scanned_step with apply=[True, False] (a padded tail group)
    must produce EXACTLY the state of running only the real step: padded
    steps are no-ops, not approximations."""
    from pika_tpu.features import FbankConfig
    from pika_tpu.train import (
        FeaturizerConfig, TrainState, make_featurizer, make_optimizer,
        make_scanned_step, make_train_step,
    )

    fb = FbankConfig(sample_frequency=SR, window_type="hamming", dither=0.0,
                     low_freq=40.0, high_freq=-200.0, num_mel_bins=12)
    featurizer = make_featurizer(FeaturizerConfig(fbank=fb, max_samples=SR))
    cfg = TransducerConfig(input_dim=12, vocab_size=VOCAB, hid_dim=16,
                           enc_layers=1, dec_layers=1, embd_dim=8)
    model, variables = init_transducer(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer("sgd", 0.05, 0.01, 100, momentum=0.9, grad_clip=3.0)
    state0 = TrainState(step=jnp.zeros((), jnp.int32),
                        params=variables["params"],
                        opt_state=tx.init(variables["params"]))
    step = make_train_step(model, tx, featurizer, jit=False)
    multi = make_scanned_step(step)

    batch = {
        "wavs": jnp.asarray((rng.standard_normal((2, SR)) * 3000).astype(np.float32)),
        "wav_lens": jnp.asarray([SR, SR - 4000], jnp.int32),
        "labels": jnp.asarray(rng.integers(1, VOCAB, (2, 4)).astype(np.int32)),
        "label_lens": jnp.asarray([4, 3], jnp.int32),
    }
    key = jax.random.PRNGKey(7)

    def stack(k):  # k copies along a leading scan axis
        return {kk: jnp.stack([vv] * k) for kk, vv in batch.items()}

    s1, m1 = jax.jit(multi)(state0, {"batch": stack(1),
                                     "apply": jnp.asarray([True])}, key)
    s2, m2 = jax.jit(multi)(state0, {"batch": stack(2),
                                     "apply": jnp.asarray([True, False])}, key)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s1, s2)
    assert float(m2["loss"][1]) == 0.0 and int(m2["num_labels"][1]) == 0
    assert float(m2["loss"][0]) == float(m1["loss"][0])


def test_bf16_compute_train_step(rng):
    """--compute_dtype bfloat16 (mixed precision: bf16 activations, f32
    master params/optimizer/gradients) must run the full wav->loss->update
    step, keep the state f32, and track the f32 step closely (this path
    compiles the same f32 loss-kernel configuration — step.py casts the
    joint factors back to f32 at the loss boundary)."""
    from pika_tpu.features import FbankConfig
    from pika_tpu.train import (
        FeaturizerConfig, TrainState, make_featurizer, make_optimizer,
        make_train_step,
    )

    fb = FbankConfig(sample_frequency=SR, window_type="hamming", dither=0.0,
                     low_freq=40.0, high_freq=-200.0, num_mel_bins=12)
    featurizer = make_featurizer(FeaturizerConfig(fbank=fb, max_samples=SR))
    cfg = TransducerConfig(input_dim=12, vocab_size=VOCAB, hid_dim=16,
                           enc_layers=1, dec_layers=1, embd_dim=8)
    model, variables = init_transducer(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer("sgd", 0.05, 0.01, 100, momentum=0.9, grad_clip=3.0)
    state0 = TrainState(step=jnp.zeros((), jnp.int32),
                        params=variables["params"],
                        opt_state=tx.init(variables["params"]))
    batch = {
        "wavs": jnp.asarray((rng.standard_normal((2, SR)) * 3000).astype(np.float32)),
        "wav_lens": jnp.asarray([SR, SR - 4000], jnp.int32),
        "labels": jnp.asarray(rng.integers(1, VOCAB, (2, 4)).astype(np.int32)),
        "label_lens": jnp.asarray([4, 3], jnp.int32),
    }
    key = jax.random.PRNGKey(7)

    step32 = make_train_step(model, tx, featurizer, donate=False)
    step16 = make_train_step(model, tx, featurizer, donate=False,
                             compute_dtype=jnp.bfloat16)
    s32, m32 = step32(state0, batch, key)
    s16, m16 = step16(state0, batch, key)

    # master state stays f32
    for leaf in jax.tree.leaves(s16.params):
        assert leaf.dtype == jnp.float32
    l32, l16 = float(m32["loss"]), float(m16["loss"])
    assert np.isfinite(l16)
    np.testing.assert_allclose(l16, l32, rtol=0.02)
    # parameters moved, and moved in nearly the same direction
    d32 = jax.tree.map(lambda a, b: np.asarray(b - a), state0.params, s32.params)
    d16 = jax.tree.map(lambda a, b: np.asarray(b - a), state0.params, s16.params)
    num = sum(float((a * b).sum()) for a, b in zip(jax.tree.leaves(d32), jax.tree.leaves(d16)))
    den = (sum(float((a * a).sum()) for a in jax.tree.leaves(d32)) ** 0.5
           * sum(float((b * b).sum()) for b in jax.tree.leaves(d16)) ** 0.5)
    assert den > 0 and num / den > 0.98
