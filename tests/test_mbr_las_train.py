"""MBR and LAS training-step tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from pika_tpu.decode.beam import BeamConfig, beam_search
from pika_tpu.models import Transducer, TransducerConfig, init_transducer
from pika_tpu.models.las import LASConfig, init_las
from pika_tpu.ops.edit_distance import edit_distance_batch_jax
from pika_tpu.decode.wer import edit_distance
from pika_tpu.train import TrainState
from pika_tpu.train.mbr import make_mbr_step, mbr_losses
from pika_tpu.train.las_step import make_las_train_step, las_loss

K = jax.random.PRNGKey(3)


def test_edit_distance_jax_matches_numpy(rng):
    for _ in range(10):
        u, v = int(rng.integers(0, 8)), int(rng.integers(0, 8))
        ref = rng.integers(1, 5, 8).astype(np.int32)
        hyp = rng.integers(1, 5, 8).astype(np.int32)
        expected = edit_distance(ref[:u].tolist(), hyp[:v].tolist())
        got = int(edit_distance_batch_jax(
            jnp.asarray(ref)[None], jnp.asarray([u]),
            jnp.asarray(hyp)[None], jnp.asarray([v]))[0])
        assert got == expected, (ref[:u], hyp[:v], got, expected)


def _identity_featurizer(feats_dim):
    def featurize(key, wavs, wav_lens, train):
        # 'wavs' already are feature frames in these tests
        return wavs, wav_lens
    return featurize


def test_mbr_step_runs_and_reduces_risk(rng):
    cfg = TransducerConfig(input_dim=8, vocab_size=6, hid_dim=16,
                           enc_layers=1, dec_layers=1, embd_dim=8)
    model, variables = init_transducer(K, cfg)
    tx = optax.sgd(0.05, momentum=0.9, nesterov=True)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       opt_state=tx.init(variables["params"]))
    beam_cfg = BeamConfig(beam_size=4, n_best=4, max_symbols=6, prune_dups=False)
    step = make_mbr_step(model, tx, _identity_featurizer(8), beam_cfg,
                         rnnt_scale=0.1, sm_scale=1.0, donate=False)

    b, t, u = 3, 7, 3
    batch = {
        "wavs": jnp.asarray(rng.standard_normal((b, t, 8)).astype(np.float32)),
        "wav_lens": jnp.asarray([t, t, t - 2], jnp.int32),
        "labels": jnp.asarray(rng.integers(1, 6, (b, u)).astype(np.int32)),
        "label_lens": jnp.asarray([u, u - 1, u], jnp.int32),
    }
    risks = []
    for i in range(25):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        risks.append(float(metrics["mbr_loss"]))
    assert np.isfinite(risks).all()
    # expected edit distance on this tiny overfit batch should go down
    assert min(risks[-5:]) < risks[0] + 1e-6, risks


def test_mbr_surrogate_gradient_direction(rng):
    """The surrogate's gradient must push up the probability of
    lower-distance hypotheses relative to higher-distance ones."""
    cfg = TransducerConfig(input_dim=8, vocab_size=6, hid_dim=16,
                           enc_layers=1, dec_layers=1, embd_dim=8)
    model, variables = init_transducer(K, cfg)
    b, t, u = 2, 6, 3
    feats = jnp.asarray(rng.standard_normal((b, t, 8)).astype(np.float32))
    feat_lens = jnp.asarray([t, t], jnp.int32)
    labels = jnp.asarray(rng.integers(1, 6, (b, u)).astype(np.int32))
    label_lens = jnp.asarray([u, u], jnp.int32)
    beam_cfg = BeamConfig(beam_size=4, n_best=4, max_symbols=6, prune_dups=False)
    enc = model.apply(variables, feats, feat_lens, method=Transducer.encode)
    nbest = beam_search(model, variables, enc, feat_lens, beam_cfg)

    def obj(params):
        total, (m, _) = mbr_losses(model, params, feats, feat_lens, labels,
                                   label_lens, nbest, rnnt_scale=0.0, sm_scale=1.0)
        return total, m

    (val, metrics), grads = jax.value_and_grad(obj, has_aux=True)(variables["params"])
    gnorm = sum(float(jnp.sum(g ** 2)) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0.0
    assert np.isfinite(float(metrics["mbr_loss"]))


def test_mbr_blank_threaded_through(rng):
    """mbr_losses used to hardcode blank=0; with a nonzero blank the (t,u)
    lattice indices must follow the beam's actual blank id, so the
    surrogate value must differ from one computed with the wrong blank
    (review r4).  Label 0 is excluded from targets so blank=5 is clean."""
    cfg = TransducerConfig(input_dim=8, vocab_size=6, hid_dim=16,
                           enc_layers=1, dec_layers=1, embd_dim=8)
    model, variables = init_transducer(K, cfg)
    b, t, u = 2, 6, 3
    feats = jnp.asarray(rng.standard_normal((b, t, 8)).astype(np.float32))
    feat_lens = jnp.asarray([t, t], jnp.int32)
    labels = jnp.asarray(rng.integers(1, 5, (b, u)).astype(np.int32))
    label_lens = jnp.asarray([u, u], jnp.int32)
    beam_cfg = BeamConfig(beam_size=4, n_best=4, max_symbols=6,
                          prune_dups=False, blank=5)
    enc = model.apply(variables, feats, feat_lens, method=Transducer.encode)
    nbest = beam_search(model, variables, enc, feat_lens, beam_cfg)
    aligns = np.asarray(nbest["aligns"])
    assert (aligns == 5).any(), "premise: alignments contain blank=5 steps"

    def total_with(blank):
        tot, (m, _) = mbr_losses(model, variables["params"], feats, feat_lens,
                                 labels, label_lens, nbest, rnnt_scale=0.0,
                                 sm_scale=1.0, blank=blank)
        return float(tot), m

    right, m = total_with(5)
    wrong, _ = total_with(0)
    assert np.isfinite(right) and np.isfinite(float(m["mbr_loss"]))
    assert right != wrong, "blank id had no effect on the surrogate"


VOCAB = 8


def test_las_train_step_overfits(rng):
    las_cfg = LASConfig(input_dim=8, output_dim=VOCAB, pad_idx=VOCAB, rnn_size=16,
                        enc_layers=1, dec_layers=1, embd_dim=8)
    model, variables = init_las(K, las_cfg)
    tx = optax.adam(0.01)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       opt_state=tx.init(variables["params"]))
    step = make_las_train_step(model, tx, _identity_featurizer(8), donate=False)
    b, t = 4, 10
    src = jnp.asarray(rng.standard_normal((b, t, 8)).astype(np.float32))
    # targets: SOS=0 ... EOS=7, pad=8
    tgt = np.full((b, 6), VOCAB, np.int32)
    for i in range(b):
        seq = [0] + rng.integers(2, 7, 3).tolist() + [7]
        tgt[i, : len(seq)] = seq
    batch = {"wavs": src, "wav_lens": jnp.asarray([t] * b, jnp.int32),
             "labels": jnp.asarray(tgt), "label_lens": jnp.asarray([5] * b, jnp.int32)}
    losses = []
    for i in range(60):
        state, metrics = step(state, batch, jax.random.PRNGKey(i), 0.0)
        losses.append(float(metrics["loss"]) / float(metrics["num_labels"]))
    assert losses[-1] < 0.3, losses[-1]
    assert losses[-1] < losses[0] * 0.3


def test_las_ctc_aux_loss(rng):
    las_cfg = LASConfig(input_dim=8, output_dim=VOCAB, pad_idx=VOCAB, rnn_size=16,
                        enc_layers=1, dec_layers=1, embd_dim=8)
    model, variables = init_las(K, las_cfg)
    src = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
    tgt = jnp.asarray([[0, 3, 4, 7, VOCAB, VOCAB], [0, 2, 7, VOCAB, VOCAB, VOCAB]], jnp.int32)
    loss, metrics = las_loss(model, variables["params"], src,
                             jnp.asarray([10, 10]), tgt, enc_loss_scale=0.5)
    assert np.isfinite(float(loss))
    assert "enc_loss" in metrics and np.isfinite(float(metrics["enc_loss"]))


def test_las_pretrain_decoder_step(rng):
    las_cfg = LASConfig(input_dim=8, output_dim=VOCAB, pad_idx=VOCAB, rnn_size=16,
                        enc_layers=1, dec_layers=1, embd_dim=8)
    model, variables = init_las(K, las_cfg)
    tgt = jnp.asarray([[0, 3, 4, 7, VOCAB]], jnp.int32)
    loss, metrics = las_loss(model, variables["params"],
                             jnp.zeros((1, 4, 8)), jnp.asarray([4]), tgt,
                             pretrain_decoder=True)
    assert np.isfinite(float(loss))


def test_las_shared_frozen_encoder(rng):
    tcfg = TransducerConfig(input_dim=8, vocab_size=VOCAB, hid_dim=16,
                            enc_layers=1, dec_layers=1, embd_dim=8)
    tmodel, tvars = init_transducer(K, tcfg)
    las_cfg = LASConfig(input_dim=16, output_dim=VOCAB, pad_idx=VOCAB, rnn_size=16,
                        enc_layers=1, dec_layers=1, embd_dim=8)
    model, variables = init_las(jax.random.PRNGKey(9), las_cfg)
    tx = optax.adam(0.01)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       opt_state=tx.init(variables["params"]))
    step = make_las_train_step(model, tx, _identity_featurizer(8),
                               shared_encoder=tmodel,
                               shared_encoder_variables=tvars, donate=False)
    batch = {
        "wavs": jnp.asarray(rng.standard_normal((2, 9, 8)).astype(np.float32)),
        "wav_lens": jnp.asarray([9, 7], jnp.int32),
        "labels": jnp.asarray([[0, 3, 7, VOCAB], [0, 2, 7, VOCAB]], jnp.int32),
        "label_lens": jnp.asarray([3, 3], jnp.int32),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0), 0.0)
    assert np.isfinite(float(metrics["loss"]))


def test_mbr_step_batchnorm_encoder(rng):
    """MBR fine-tuning from a TDNN-Transformer (BatchNorm) bundle must
    thread batch_stats through decode (eval mode) and the training
    forward (batch mode, running stats updated) — the reference's
    model.eval()/model.train() dance (train_transducer_mbr_bmuf_otfaug.py
    :90-124).  Regression: this crashed with ScopeCollectionNotFound."""
    cfg = TransducerConfig(input_dim=12, vocab_size=6, hid_dim=16,
                           encoder_type="tdnn_transformer", decoder_type="rnn",
                           enc_layers=5, dec_layers=1, embd_dim=8,
                           tdnn_nhid=32, tdnn_layers=5)
    model, variables = init_transducer(K, cfg, max_t=60, max_u=4)
    assert "batch_stats" in variables
    tx = optax.sgd(0.01)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       opt_state=tx.init(variables["params"]),
                       batch_stats=variables["batch_stats"])
    beam_cfg = BeamConfig(beam_size=2, n_best=2, max_symbols=4, prune_dups=False)
    step = make_mbr_step(model, tx, _identity_featurizer(12), beam_cfg,
                         rnnt_scale=0.1, sm_scale=1.0, donate=False)
    b, t, u = 2, 40, 2
    batch = {
        "wavs": jnp.asarray(rng.standard_normal((b, t, 12)).astype(np.float32)),
        "wav_lens": jnp.asarray([t, t - 4], jnp.int32),
        "labels": jnp.asarray(rng.integers(1, 6, (b, u)).astype(np.int32)),
        "label_lens": jnp.asarray([u, u], jnp.int32),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["mbr_loss"]))
    # running stats moved (train-mode BN in the training forward)
    s0 = jax.tree.leaves(state.batch_stats)
    s1 = jax.tree.leaves(new_state.batch_stats)
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(s0, s1))


def test_las_shared_batchnorm_encoder(rng):
    """LAS training on a frozen TDNN-Transformer (BatchNorm) shared
    encoder needs the full bundle variables (params + batch_stats) —
    regression for the params-only wiring."""
    tcfg = TransducerConfig(input_dim=12, vocab_size=VOCAB, hid_dim=16,
                            encoder_type="tdnn_transformer", decoder_type="rnn",
                            enc_layers=5, dec_layers=1, embd_dim=8,
                            tdnn_nhid=32, tdnn_layers=5)
    tmodel, tvars = init_transducer(K, tcfg, max_t=60, max_u=4)
    las_cfg = LASConfig(input_dim=16, output_dim=VOCAB, pad_idx=VOCAB, rnn_size=16,
                        enc_layers=1, dec_layers=1, embd_dim=8)
    model, variables = init_las(jax.random.PRNGKey(9), las_cfg)
    tx = optax.adam(0.01)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       opt_state=tx.init(variables["params"]))
    step = make_las_train_step(model, tx, _identity_featurizer(12),
                               shared_encoder=tmodel,
                               shared_encoder_variables=tvars, donate=False)
    batch = {
        "wavs": jnp.asarray(rng.standard_normal((2, 40, 12)).astype(np.float32)),
        "wav_lens": jnp.asarray([40, 36], jnp.int32),
        "labels": jnp.asarray([[0, 3, 7, VOCAB], [0, 2, 7, VOCAB]], jnp.int32),
        "label_lens": jnp.asarray([3, 3], jnp.int32),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0), 0.0)
    assert np.isfinite(float(metrics["loss"]))
