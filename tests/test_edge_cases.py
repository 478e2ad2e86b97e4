"""Edge-case coverage: degenerate lengths, deep ARPA backoff, empty inputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pika_tpu.decode.beam import BeamConfig, beam_search
from pika_tpu.decode.greedy import greedy_decode
from pika_tpu.decode.fst import compile_arpa, fst_advance_sets, init_state_sets
from pika_tpu.features.fbank import FbankConfig, num_frames
from pika_tpu.models import Transducer, TransducerConfig, init_transducer
from pika_tpu.ops.rnnt_loss import rnnt_loss_from_logprobs

K = jax.random.PRNGKey(13)


def test_num_frames_short_inputs():
    cfg = FbankConfig(sample_frequency=16000)
    assert num_frames(399, cfg) == 0
    assert num_frames(400, cfg) == 1
    assert num_frames(0, cfg) == 0


def test_beam_zero_length_element(rng):
    cfg = TransducerConfig(input_dim=6, vocab_size=4, hid_dim=12,
                           enc_layers=1, dec_layers=1, embd_dim=8)
    model, variables = init_transducer(K, cfg)
    x = jnp.asarray(rng.standard_normal((2, 5, 6)).astype(np.float32))
    enc = model.apply(variables, x, jnp.asarray([5, 5]), method=Transducer.encode)
    lens = jnp.asarray([5, 0], jnp.int32)
    out = beam_search(model, variables, enc, lens,
                      BeamConfig(beam_size=2, n_best=1, max_symbols=4))
    assert np.isfinite(np.asarray(out["scores"][0])).all()
    # zero-length element yields an empty (or trivial) hypothesis, no NaNs
    assert int(out["lens"][1, 0]) <= 1
    hyps, hyp_lens = greedy_decode(model, variables, enc, lens, max_symbols=4)
    assert int(hyp_lens[1]) == 0


def test_rnnt_loss_zero_label_length(rng):
    """U=0: the loss is the probability of emitting all blanks."""
    v, t = 4, 5
    logits = rng.standard_normal((1, t, 1, v)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    labels = np.zeros((1, 0), np.int32)
    loss = float(rnnt_loss_from_logprobs(
        jnp.asarray(lp), jnp.asarray(labels), jnp.asarray([t]), jnp.asarray([0]))[0])
    expected = -lp[0, :, 0, 0].sum()
    np.testing.assert_allclose(loss, expected, rtol=1e-5)


def test_arpa_trigram_backoff_chain(tmp_path):
    """Unseen trigram context must back off two levels to the unigram."""
    arpa = tmp_path / "tri.arpa"
    arpa.write_text(
        "\\data\\\nngram 1=4\nngram 2=2\nngram 3=1\n\n"
        "\\1-grams:\n-0.6 <s> -0.1\n-0.9 a -0.1\n-1.0 b -0.1\n-0.9 </s>\n\n"
        "\\2-grams:\n-0.2 <s> a -0.1\n-0.4 a b -0.1\n\n"
        "\\3-grams:\n-0.1 <s> a b\n\n\\end\\\n"
    )
    tables_obj = compile_arpa(str(arpa), {"a": 1, "b": 2})
    tables = tables_obj.device_arrays()
    states, costs = init_state_sets(tables_obj, (1, 1), max_states=4)
    # <s> a → trigram state; emit b: trigram hit -0.1
    states, costs, lm1 = fst_advance_sets(tables, states, costs, jnp.full((1, 1), 1, jnp.int32))
    states, costs, lm2 = fst_advance_sets(tables, states, costs, jnp.full((1, 1), 2, jnp.int32))
    import math
    # best path: p(a|<s>) = -0.2, then p(b|<s> a) = -0.1 (trigram)
    np.testing.assert_allclose(float(lm2[0, 0]), (0.2 + 0.1) * math.log(10) * -1, rtol=1e-4)
    # now context (a b) exists only via backoff: emit b again — must reach
    # the unigram b via two backoff hops and stay alive
    states, costs, lm3 = fst_advance_sets(tables, states, costs, jnp.full((1, 1), 2, jnp.int32))
    assert float(lm3[0, 0]) > -1e29, "backoff chain failed to find unigram"


def test_empty_wav_scp(tmp_path):
    from pika_tpu.data import read_wav_scp

    p = tmp_path / "empty.scp"
    p.write_text("")
    assert read_wav_scp(str(p)) == {}
