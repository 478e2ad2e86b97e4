"""Model tests: LSTM masking semantics, encoder shapes, transducer forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pika_tpu.models import (
    LSTM,
    lstm_stack_step,
    TDNNTransformerEncoder,
    ConvTransformerLM,
    Transducer,
    TransducerConfig,
    init_transducer,
    causal_mask,
)

K = jax.random.PRNGKey(0)


def test_lstm_shapes_and_padding(rng):
    model = LSTM(hidden_size=16, num_layers=2)
    x = jnp.asarray(rng.standard_normal((3, 10, 8)).astype(np.float32))
    lens = jnp.asarray([10, 6, 1])
    variables = model.init(K, x, lens)
    out, (h, c) = model.apply(variables, x, lens)
    assert out.shape == (3, 10, 16)
    assert h.shape == (2, 3, 16)
    # outputs past each length are zero (pack_padded semantics)
    assert np.abs(np.asarray(out[1, 6:])).max() == 0.0
    assert np.abs(np.asarray(out[2, 1:])).max() == 0.0
    # state freezing: final h equals h at the true last step
    out_full, (h_full, _) = model.apply(variables, x[1:2, :6], jnp.asarray([6]))
    np.testing.assert_allclose(np.asarray(h_full[:, 0]), np.asarray(h[:, 1]), rtol=2e-5, atol=1e-6)


def test_lstm_bidirectional(rng):
    model = LSTM(hidden_size=16, num_layers=1, bidirectional=True)
    x = jnp.asarray(rng.standard_normal((2, 7, 4)).astype(np.float32))
    lens = jnp.asarray([7, 4])
    variables = model.init(K, x, lens)
    out, _ = model.apply(variables, x, lens)
    assert out.shape == (2, 7, 16)
    # backward direction of the shorter element must be unaffected by padding
    out_short, _ = model.apply(variables, x[1:2, :4], jnp.asarray([4]))
    np.testing.assert_allclose(np.asarray(out[1, :4]), np.asarray(out_short[0]), rtol=2e-5, atol=1e-6)


def test_lstm_incremental_step_matches_scan(rng):
    model = LSTM(hidden_size=8, num_layers=2)
    x = jnp.asarray(rng.standard_normal((2, 5, 3)).astype(np.float32))
    variables = model.init(K, x)
    out, _ = model.apply(variables, x)
    # replay with single steps
    h = jnp.zeros((2, 2, 8))
    c = jnp.zeros((2, 2, 8))
    params = variables["params"]
    for t in range(5):
        top, h, c = lstm_stack_step(params, 2, x[:, t, :], h, c)
        np.testing.assert_allclose(np.asarray(top), np.asarray(out[:, t]), rtol=2e-5, atol=1e-6)


def test_tdnn_transformer_encoder_shapes(rng):
    enc = TDNNTransformerEncoder(output_dim=32, tdnn_nhid=64, tdnn_layers=9)
    t_in = 100
    x = jnp.asarray(rng.standard_normal((2, t_in, 20)).astype(np.float32))
    variables = enc.init(K, x)
    out = enc.apply(variables, x)
    # context 42, stride 4: ceil((100-42)/4) = 15
    assert enc.context == 42
    expected_t = -(-(t_in - enc.context) // 4)
    assert out.shape == (2, expected_t, 32)
    assert int(enc.output_length(t_in)) == expected_t
    # batch stats mutable when training
    out2, mutated = enc.apply(variables, x, train=True, mutable=["batch_stats"], rngs={"dropout": K})
    assert out2.shape == out.shape
    assert "batch_stats" in mutated


def test_conv_transformer_lm_causality(rng):
    lm = ConvTransformerLM(output_dim=16, d_model=32, num_layers=2, heads=4, d_ff=64, dropout_rate=0.0)
    emb = jnp.asarray(rng.standard_normal((1, 9, 24)).astype(np.float32))
    variables = lm.init(K, emb)
    out = lm.apply(variables, emb)
    assert out.shape == (1, 9, 16)
    # causality: changing future positions must not affect earlier outputs
    emb2 = emb.at[0, 5:].set(99.0)
    out2 = lm.apply(variables, emb2)
    np.testing.assert_allclose(np.asarray(out[0, :5]), np.asarray(out2[0, :5]), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("enc_type,dec_type", [("rnn", "rnn"), ("tdnn_transformer", "transformer")])
def test_transducer_forward(rng, enc_type, dec_type):
    cfg = TransducerConfig(
        input_dim=12, vocab_size=10, hid_dim=16,
        encoder_type=enc_type, decoder_type=dec_type,
        enc_layers=1, dec_layers=1, embd_dim=8,
        tdnn_nhid=32, tdnn_layers=5, dec_d_model=16, dec_heads=2, dec_d_ff=32,
    )
    t_in = 60 if enc_type == "tdnn_transformer" else 7
    model, variables = init_transducer(K, cfg, max_t=t_in, max_u=5)
    x = jnp.asarray(rng.standard_normal((2, t_in, 12)).astype(np.float32))
    y = jnp.asarray(rng.integers(1, 10, (2, 5)).astype(np.int32))
    out = model.apply(variables, x, y, jnp.asarray([t_in, t_in]), jnp.asarray([5, 3]))
    t_out = t_in if enc_type == "rnn" else int(model.bind(variables).encoder_out_len(t_in))
    assert out.shape == (2, t_out, 6, 10)
    # log-softmax: logsumexp over vocab ≈ 0
    lse = np.asarray(jax.scipy.special.logsumexp(out, axis=-1))
    np.testing.assert_allclose(lse, 0.0, atol=1e-4)


def test_joint_factorization_consistency(rng):
    """joint_logits (factorized) must equal an explicit concat-based joint."""
    cfg = TransducerConfig(input_dim=6, vocab_size=7, hid_dim=8, enc_layers=1, dec_layers=1, embd_dim=4)
    model, variables = init_transducer(K, cfg)
    enc = jnp.asarray(rng.standard_normal((1, 3, 8)).astype(np.float32))
    dec = jnp.asarray(rng.standard_normal((1, 4, 8)).astype(np.float32))
    logits = model.apply(variables, enc, dec, method=Transducer.joint_logits)
    p = variables["params"]
    cat_x = np.broadcast_to(np.asarray(enc)[:, :, None, :], (1, 3, 4, 8))
    cat_y = np.broadcast_to(np.asarray(dec)[:, None, :, :], (1, 3, 4, 8))
    pre = cat_x @ np.asarray(p["fc1_x"]["kernel"]) + cat_y @ np.asarray(p["fc1_y"]["kernel"]) + np.asarray(p["fc1_y"]["bias"])
    gate = cat_x @ np.asarray(p["gate_x"]["kernel"]) + cat_y @ np.asarray(p["gate_y"]["kernel"]) + np.asarray(p["gate_y"]["bias"])
    h = np.tanh(pre) * (1 / (1 + np.exp(-gate)))
    expected = h @ np.asarray(p["fc2"]["kernel"]) + np.asarray(p["fc2"]["bias"])
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=1e-4, atol=1e-5)


def test_joint_step_matches_lattice(rng):
    cfg = TransducerConfig(input_dim=6, vocab_size=7, hid_dim=8, enc_layers=1, dec_layers=1, embd_dim=4)
    model, variables = init_transducer(K, cfg)
    enc = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    dec = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    step = model.apply(variables, enc, dec, method=Transducer.joint_step)
    lattice = model.apply(variables, enc[:, None, :], dec[:, None, :], method=Transducer.joint_logits)
    np.testing.assert_allclose(np.asarray(step), np.asarray(lattice[:, 0, 0]), rtol=1e-5, atol=1e-6)


def test_joint_factors_match_joint_step(rng):
    """The decode-loop factorization (enc factors hoisted, dec factors
    cached) must reproduce joint_step exactly in f32."""
    cfg = TransducerConfig(input_dim=6, vocab_size=7, hid_dim=8,
                           enc_layers=1, dec_layers=1, embd_dim=4)
    model, variables = init_transducer(K, cfg)
    enc = jnp.asarray(rng.standard_normal((3, 8)).astype(np.float32))
    dec = jnp.asarray(rng.standard_normal((3, 8)).astype(np.float32))
    ax, gx = model.apply(variables, enc, method=Transducer.joint_enc_factors)
    ay, gy = model.apply(variables, dec, method=Transducer.joint_dec_factors)
    via_factors = model.apply(variables, ax, gx, ay, gy,
                              method=Transducer.joint_from_factors)
    direct = model.apply(variables, enc, dec, method=Transducer.joint_step)
    np.testing.assert_allclose(np.asarray(via_factors), np.asarray(direct),
                               rtol=1e-6, atol=1e-6)


def test_remat_encoder_matches_exact(rng):
    """--remat (jax.checkpoint around encoder transformer layers) must not
    change the math: identical loss and gradients, only the backward-pass
    memory/FLOP schedule differs (SURVEY §5.7)."""
    from pika_tpu.train import transducer_loss

    def build(remat):
        cfg = TransducerConfig(input_dim=24, vocab_size=12, hid_dim=16,
                               encoder_type="tdnn_transformer",
                               decoder_type="rnn", enc_layers=9, dec_layers=1,
                               embd_dim=8, tdnn_nhid=32, tdnn_layers=9,
                               remat=remat)
        return init_transducer(K, cfg, max_t=60, max_u=5)

    x = jnp.asarray(rng.standard_normal((2, 60, 24)).astype(np.float32))
    y = jnp.asarray(rng.integers(1, 12, (2, 5)).astype(np.int32))
    xl = jnp.asarray([60, 52], jnp.int32)
    yl = jnp.asarray([5, 3], jnp.int32)

    results = []
    for remat in (False, True):
        model, variables = build(remat)

        def f(p):
            loss, _ = transducer_loss(model, p, variables.get("batch_stats"),
                                      x, xl, y, yl, train=True,
                                      dropout_key=jax.random.PRNGKey(7))
            return loss

        results.append(jax.jit(jax.value_and_grad(f))(variables["params"]))

    (l0, g0), (l1, g1) = results
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_chunked_attention_matches_full(rng):
    """q_chunk query-block attention must be numerically identical to the
    full path (same params, same math — only the memory schedule and the
    dropout RNG pattern differ), with and without relative positions and
    masks."""
    from pika_tpu.models.transformer import MultiHeadedAttention

    b, t, dim, h = 2, 50, 32, 4
    x = jnp.asarray(rng.standard_normal((b, t, dim)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, t, t)) < 0.1)
    for m_rel in (0, 6):
        for use_mask in (None, mask):
            full = MultiHeadedAttention(h, dim, 0.0, m_rel, mm_dtype=None)
            ck = MultiHeadedAttention(h, dim, 0.0, m_rel, mm_dtype=None,
                                      q_chunk=16)
            v = full.init(jax.random.PRNGKey(0), x, x, x, mask=use_mask)
            o1 = full.apply(v, x, x, x, mask=use_mask)
            o2 = ck.apply(v, x, x, x, mask=use_mask)
            np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                                       atol=1e-5)
    # gradients through the rematerialized scan body
    full = MultiHeadedAttention(h, dim, 0.0, 6, mm_dtype=None)
    ck = MultiHeadedAttention(h, dim, 0.0, 6, mm_dtype=None, q_chunk=16)
    v = full.init(jax.random.PRNGKey(0), x, x, x)
    g1 = jax.grad(lambda p: (full.apply(p, x, x, x) ** 2).sum())(v)
    g2 = jax.grad(lambda p: (ck.apply(p, x, x, x) ** 2).sum())(v)
    for a, c in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=1e-3)
    # train-mode dropout runs under the scan (per-chunk bernoulli keys)
    ckd = MultiHeadedAttention(h, dim, 0.3, 6, mm_dtype=None, q_chunk=16)
    o = ckd.apply(v, x, x, x, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(5)})
    assert np.isfinite(np.asarray(o)).all()


def test_attn_chunk_transducer_config(rng):
    """attn_chunk through the full transducer: same loss as full attention."""
    from pika_tpu.train import transducer_loss

    def build(chunk):
        cfg = TransducerConfig(input_dim=24, vocab_size=12, hid_dim=16,
                               encoder_type="tdnn_transformer",
                               decoder_type="rnn", enc_layers=5, dec_layers=1,
                               embd_dim=8, tdnn_nhid=32, tdnn_layers=5,
                               attn_chunk=chunk)
        return init_transducer(K, cfg, max_t=60, max_u=4)

    x = jnp.asarray(rng.standard_normal((2, 60, 24)).astype(np.float32))
    y = jnp.asarray(rng.integers(1, 12, (2, 3)).astype(np.int32))
    xl = jnp.asarray([60, 52], jnp.int32)
    yl = jnp.asarray([3, 2], jnp.int32)
    losses = []
    for chunk in (0, 16):
        model, variables = build(chunk)
        loss, _ = transducer_loss(model, variables["params"],
                                  variables.get("batch_stats"), x, xl, y, yl,
                                  train=False)
        losses.append(float(loss))
    np.testing.assert_allclose(losses[1], losses[0], rtol=1e-6)
