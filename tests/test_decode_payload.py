"""The decode program must not embed params or FST tables as constants.

Closed-over device arrays are inlined into the lowered program as
literals.  On tunneled remote-compile transports the compile payload has
a hard size limit, and the dense FST advance cache is hundreds of MB at
real vocab sizes — closing over it breaks on-chip decoding outright
(observed: HTTP 413 at a 478 MB cache).  ``make_decode_fn`` therefore
takes variables and fst_tables as runtime arguments; this test pins that
the lowered program stays small while the cache it consumes is large.
"""

import numpy as np
import jax.numpy as jnp

from pika_tpu.decode.beam import BeamConfig
from pika_tpu.decode.fst import FstTables
from pika_tpu.models import init_transducer, TransducerConfig
from pika_tpu.train.eval_transducer import make_decode_fn

import jax

INF = 1e30


def _bigram_tables(n_states: int, vocab: int, rng) -> FstTables:
    """Backoff bigram shaped like compile_arpa's output: a unigram state
    with an arc for every token, plus bigram contexts with sparse
    successors backing off to the unigram state."""
    succ = 8
    arc_start = np.zeros(n_states + 1, np.int64)
    arc_start[1] = vocab
    arc_start[2:] = vocab + succ * np.arange(1, n_states, dtype=np.int64)
    ils = [np.arange(1, vocab + 1, dtype=np.int32)]
    ws = [rng.uniform(1.0, 9.0, vocab).astype(np.float32)]
    nxt = [rng.integers(1, n_states, vocab).astype(np.int32)]
    for _ in range(n_states - 1):
        ils.append(np.sort(rng.choice(
            np.arange(1, vocab + 1, dtype=np.int32), succ, replace=False)))
        ws.append(rng.uniform(0.2, 5.0, succ).astype(np.float32))
        nxt.append(rng.integers(1, n_states, succ).astype(np.int32))
    return FstTables(
        arc_start=arc_start.astype(np.int32),
        arc_ilabel=np.concatenate(ils),
        arc_weight=np.concatenate(ws),
        arc_next=np.concatenate(nxt),
        backoff_next=np.concatenate(
            [[-1], np.zeros(n_states - 1, np.int32)]).astype(np.int32),
        backoff_weight=np.concatenate(
            [[0.0], rng.uniform(0.5, 2.0, n_states - 1)]).astype(np.float32),
        final_weight=np.full(n_states, 0.5, np.float32),
        start=0,
        disambig_next=np.full((n_states, 1), -1, np.int32),
        disambig_weight=np.full((n_states, 1), INF, np.float32),
    )


def test_lowered_decode_program_excludes_cache_and_params():
    vocab = 1500
    cfg = TransducerConfig(
        input_dim=6, vocab_size=vocab, hid_dim=12,
        enc_layers=1, dec_layers=1, embd_dim=8,
    )
    model, variables = init_transducer(jax.random.PRNGKey(0), cfg)

    tables = _bigram_tables(700, vocab, np.random.default_rng(0))
    fst_tables = tables.device_arrays(
        n_ilabels=vocab + 1, cache_max_bytes=512 << 20)
    assert "adv_cost" in fst_tables
    cache_bytes = fst_tables["adv_cost"].nbytes + fst_tables["adv_next"].nbytes
    assert cache_bytes > 6 << 20  # the cache is genuinely large

    bcfg = BeamConfig(beam_size=2, n_best=2, max_symbols=3,
                      lm_scale=0.5, lm_per_token=True)
    fn = make_decode_fn(model, bcfg, tables.start)
    feats = jnp.zeros((1, 5, 6), jnp.float32)
    lens = jnp.asarray([5], jnp.int32)
    lowered = fn.lower(variables, fst_tables, feats, lens)
    text_len = len(lowered.as_text())
    # a closed-over cache inflates the program past the cache's own size
    # (literals print at >2 bytes/elem); as arguments the program is tiny.
    assert text_len < cache_bytes // 4, (
        f"lowered program is {text_len} bytes for a {cache_bytes}-byte "
        "cache — large arrays are being inlined as constants again")
