"""LAS model + rescoring tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pika_tpu.models.las import LAS, LASConfig, init_las
from pika_tpu.decode.rescore import _build_targets, las_score_hyps, rerank_nbest

K = jax.random.PRNGKey(11)
VOCAB = 10  # ids 0..9: SOS=0, EOS=9; pad = 10


def _cfg(**kw):
    base = dict(input_dim=8, output_dim=VOCAB, pad_idx=VOCAB, rnn_size=16,
                enc_layers=1, dec_layers=1, embd_dim=6)
    base.update(kw)
    return LASConfig(**base)


@pytest.mark.parametrize("attn", ["dot", "general", "mlp"])
def test_las_forward_shapes(rng, attn):
    model, variables = init_las(K, _cfg(attn_type=attn))
    src = jnp.asarray(rng.standard_normal((2, 12, 8)).astype(np.float32))
    tgt = jnp.asarray(rng.integers(0, VOCAB, (2, 6)).astype(np.int32))
    lens = jnp.asarray([12, 9])
    out, attns, enc_out = model.apply(variables, src, tgt, lens)
    assert out.shape == (2, 5, 16)
    assert attns.shape == (2, 5, 12)
    assert enc_out.shape == (2, 12, 16)
    logits = model.apply(variables, out, method=LAS.output_logits)
    assert logits.shape == (2, 5, VOCAB)
    # attention over masked positions is ~0 for the short element
    assert float(np.abs(np.asarray(attns[1, :, 9:])).max()) < 1e-6


def test_las_variants_compile(rng):
    for kw in [dict(brnn=True), dict(context_gate="both"),
               dict(use_downsampler=True, downsampler_rate=2),
               dict(enc_layers=2, dec_layers=2)]:
        model, variables = init_las(K, _cfg(**kw))
        src = jnp.asarray(rng.standard_normal((1, 10, 8)).astype(np.float32))
        tgt = jnp.asarray(rng.integers(0, VOCAB, (1, 4)).astype(np.int32))
        out, _, _ = model.apply(variables, src, tgt, jnp.asarray([10]))
        assert out.shape[1] == 3


def test_las_pretrain_decoder(rng):
    model, variables = init_las(K, _cfg())
    tgt = jnp.asarray(rng.integers(0, VOCAB, (3, 7)).astype(np.int32))
    out, attns, enc = model.apply(variables, jnp.zeros((3, 1, 8)), tgt, None, True, False)
    assert out.shape == (3, 6, 16)
    assert attns is None and enc is None


def test_las_scheduled_sampling_changes_outputs(rng):
    model, variables = init_las(K, _cfg())
    src = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
    tgt = jnp.asarray(rng.integers(2, VOCAB - 1, (2, 6)).astype(np.int32))
    lens = jnp.asarray([10, 10])
    out0, _, _ = model.apply(variables, src, tgt, lens)
    out1, _, _ = model.apply(variables, src, tgt, lens,
                             sampling_prob=1.0, sampling_key=jax.random.PRNGKey(5))
    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_build_targets_and_reverse():
    tokens = jnp.asarray([[3, 4, 5, -1], [7, -1, -1, -1]], jnp.int32)
    lens = jnp.asarray([3, 1])
    tgt = _build_targets(tokens, lens, sos=0, eos=9, pad=10, reverse=False)
    np.testing.assert_array_equal(np.asarray(tgt[0]), [0, 3, 4, 5, 9, 10])
    np.testing.assert_array_equal(np.asarray(tgt[1]), [0, 7, 9, 10, 10, 10])
    tgt_r = _build_targets(tokens, lens, sos=0, eos=9, pad=10, reverse=True)
    np.testing.assert_array_equal(np.asarray(tgt_r[0]), [0, 5, 4, 3, 9, 10])


def test_las_score_hyps_matches_manual(rng):
    model, variables = init_las(K, _cfg())
    enc_out = jnp.asarray(rng.standard_normal((1, 8, 8)).astype(np.float32))
    enc_lens = jnp.asarray([8])
    tokens = jnp.asarray([[[3, 4, -1]]], jnp.int32)  # (B=1, N=1, Um=3)
    lens = jnp.asarray([[2]])
    total, per_tok = las_score_hyps(model, variables, enc_out, enc_lens,
                                    tokens, lens, sos=0, eos=9)
    # manual: feed tgt = [0,3,4,9,pad]; score tokens 3,4,9
    tgt = jnp.asarray([[0, 3, 4, 9, 10]], jnp.int32)
    outputs, _, _ = model.apply(variables, enc_out, tgt, enc_lens)
    lp = np.asarray(jax.nn.log_softmax(model.apply(variables, outputs, method=LAS.output_logits), axis=-1))
    expected = lp[0, 0, 3] + lp[0, 1, 4] + lp[0, 2, 9]
    np.testing.assert_allclose(float(total[0, 0]), expected, rtol=1e-5)
    assert float(per_tok[0, 0, 3]) == 0.0  # beyond EOS masked


def test_rerank_fusion():
    rnnt = jnp.asarray([[-10.0, -9.0]])
    lens = jnp.asarray([[5, 10]])
    fw = jnp.asarray([[-1.0, -20.0]])
    best, fused = rerank_nbest(rnnt, lens, fw_scores=fw, fw_scale=1.0)
    # candidate 0: (-10-1)/5 = -2.2 ; candidate 1: (-9-20)/10 = -2.9
    assert int(best[0]) == 0
    np.testing.assert_allclose(np.asarray(fused[0]), [-2.2, -2.9], rtol=1e-6)


def test_las_sru_encoder(rng):
    model, variables = init_las(K, _cfg(rnn_type="SRU"))
    src = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
    tgt = jnp.asarray(rng.integers(0, VOCAB, (2, 5)).astype(np.int32))
    out, _, enc = model.apply(variables, src, tgt, jnp.asarray([10, 10]))
    assert out.shape == (2, 4, 16)
    assert enc.shape == (2, 10, 16)


def test_las_train_mode_dropout(rng):
    """train=True with dropout>0 must run (regression: inline nn.Dropout in
    a setup-style module raised AssignSubModuleError) and be stochastic
    across dropout keys."""
    import optax
    from pika_tpu.train import TrainState
    from pika_tpu.train.las_step import las_loss

    cfg = LASConfig(input_dim=8, output_dim=8, pad_idx=8, rnn_size=16,
                    enc_layers=1, dec_layers=1, embd_dim=8, dropout=0.5)
    model, variables = init_las(jax.random.PRNGKey(0), cfg)
    src = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
    tgt = jnp.asarray([[0, 3, 4, 7, 8, 8], [0, 2, 7, 8, 8, 8]], jnp.int32)
    lens = jnp.asarray([10, 10])
    l1, _ = las_loss(model, variables["params"], src, lens, tgt,
                     key=jax.random.PRNGKey(1))
    l2, _ = las_loss(model, variables["params"], src, lens, tgt,
                     key=jax.random.PRNGKey(2))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l1) != float(l2)


def test_las_coverage_attn_semantics(rng):
    """Coverage attention (global_attention.py:116-117,196-199 +
    las.py:670-673): the keys see the accumulated attention mass from the
    SECOND step on (state.coverage starts None, las.py:644-645), so step-0
    attention must be identical to the coverage-off model and later steps
    must differ."""
    src = jnp.asarray(rng.standard_normal((2, 12, 8)).astype(np.float32))
    tgt = jnp.asarray(rng.integers(0, VOCAB, (2, 6)).astype(np.int32))
    lens = jnp.asarray([12, 12])

    m0, v0 = init_las(K, _cfg(attn_type="mlp"))
    m1, v1 = init_las(K, _cfg(attn_type="mlp", coverage_attn=True))
    assert "attn_linear_cover" in v1["params"] and "attn_linear_cover" not in v0["params"]

    _, a0, _ = m0.apply(v0, src, tgt, lens)
    _, a1, _ = m1.apply(v1, src, tgt, lens)
    # identical param trees apart from the extra coverage projection (flax
    # derives init streams from param paths), so step 0 agrees exactly...
    np.testing.assert_allclose(np.asarray(a0[:, 0]), np.asarray(a1[:, 0]),
                               rtol=1e-6, atol=1e-7)
    # ...and coverage changes every later step's attention
    assert float(np.abs(np.asarray(a0[:, 1:] - a1[:, 1:])).max()) > 1e-5


def test_las_coverage_shifts_attention_mass(rng):
    """With a suppressive coverage projection, attention mass moves AWAY
    from already-attended source positions (the mechanism's purpose)."""
    cfg = _cfg(attn_type="dot", coverage_attn=True)
    model, variables = init_las(K, cfg)
    # a strongly negative coverage projection: covered positions' keys are
    # pushed towards -1 in every dim, killing their dot score against any
    # positive query
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    params["attn_linear_cover"] = jnp.full((1, cfg.rnn_size), -50.0)
    v_sup = {"params": params}

    src = jnp.asarray(rng.standard_normal((1, 10, 8)).astype(np.float32))
    tgt = jnp.asarray(rng.integers(0, VOCAB, (1, 6)).astype(np.int32))
    lens = jnp.asarray([10])
    _, attns, _ = model.apply(v_sup, src, tgt, lens)
    a = np.asarray(attns[0])          # (U, T)
    p = int(a[0].argmax())            # the position step 0 attended most
    m0_cov, v0_cfg = init_las(K, _cfg(attn_type="dot"))
    _, attns_off, _ = m0_cov.apply(v0_cfg, src, tgt, lens)
    a_off = np.asarray(attns_off[0])
    # step 1 onward, the covered position p holds less mass than it does
    # without coverage (keys at p are saturated to tanh(ctx-50) ~ -1)
    assert a[1:, p].max() < a_off[1:, p].max()
    assert a[1:, p].max() < a[0, p]
