"""tools/train_ngram.py: estimator correctness + compile_arpa round trip.

The grammar quality recipe (egs/mini_grammar.sh) rests on this chain:
bigram counts -> Witten-Bell ARPA -> compile_arpa -> FST shallow fusion.
"""

import math
import subprocess
import sys
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def arpa(tmp_path):
    from pika_tpu.data import write_int_vectors

    rng = np.random.default_rng(3)
    # sparse bigram language over 8 words: successors of w are {w, w%8+1, (w+2)%8+1}
    labels = []
    for i in range(60):
        toks, ctx = [], int(rng.integers(1, 9))
        for _ in range(int(rng.integers(3, 9))):
            nxt = [ctx, ctx % 8 + 1, (ctx + 2) % 8 + 1]
            ctx = int(nxt[rng.integers(0, 3)])
            toks.append(ctx)
        labels.append((f"u{i}", toks))
    write_int_vectors(str(tmp_path / "label.txt"), labels)
    with open(tmp_path / "char.txt", "w") as f:
        f.write("<blk> 0\n")
        for k in range(1, 9):
            f.write(f"w{k} {k}\n")
    r = subprocess.run(
        [sys.executable, f"{REPO}/tools/train_ngram.py",
         f"ark:{tmp_path}/label.txt", f"{tmp_path}/char.txt",
         f"{tmp_path}/lm.arpa"],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")})
    assert r.returncode == 0, r.stderr
    return tmp_path / "lm.arpa", labels


def _parse(path):
    uni, bi, bow = {}, {}, {}
    sec = None
    for line in open(path):
        line = line.strip()
        if line.startswith("\\1"):
            sec = 1
            continue
        if line.startswith("\\2"):
            sec = 2
            continue
        if not line or line.startswith("\\") or line.startswith("ngram"):
            continue
        p = line.split()
        if sec == 1:
            uni[p[1]] = float(p[0])
            bow[p[1]] = float(p[2])
        elif sec == 2:
            bi[(p[1], p[2])] = float(p[0])
    return uni, bi, bow


def test_arpa_normalizes(arpa):
    uni, bi, bow = _parse(arpa[0])
    words = [w for w in uni if w != "<s>"]
    # unigram distribution sums to 1
    assert abs(sum(10 ** uni[w] for w in words) - 1.0) < 1e-6
    # every context's conditional distribution sums to 1 (explicit bigrams
    # + backoff mass over unseen successors)
    for ctx in ["<s>", "w1", "w5", "w8"]:
        tot = sum(10 ** bi[(ctx, w)] if (ctx, w) in bi
                  else 10 ** (bow.get(ctx, 0.0) + uni[w]) for w in words)
        assert abs(tot - 1.0) < 1e-6, (ctx, tot)


def test_grammar_text_scores_higher_than_uniform(arpa):
    path, labels = arpa
    uni, bi, bow = _parse(path)

    def logp(toks):
        ctx, lp = "<s>", 0.0
        for w in [f"w{t}" for t in toks] + ["</s>"]:
            lp += bi[(ctx, w)] if (ctx, w) in bi else bow.get(ctx, 0.0) + uni[w]
            ctx = w
        return lp / (len(toks) + 1)

    mean = np.mean([logp(t) for _, t in labels])
    assert mean > math.log10(1 / 8) + 0.15, mean  # real LM signal


def test_compile_arpa_scores_match_python_walk(arpa):
    """compile_arpa + the CSR advance tables reproduce the hand-computed
    backoff walk (min-cost over direct vs backoff paths) for in- and
    out-of-grammar successions."""
    import jax.numpy as jnp

    from pika_tpu.decode.fst import (
        compile_arpa, fst_advance_sets, init_state_sets,
    )

    path, _ = arpa
    uni, bi, bow = _parse(path)
    sym_to_id = {f"w{k}": k + 1 for k in range(1, 9)}  # shifted ilabels
    fst = compile_arpa(str(path), sym_to_id)
    tables = fst.device_arrays()

    LOG10 = math.log(10.0)

    def py_lnp(ctx_word, w):
        """min-cost = max-prob over {direct bigram, backoff+unigram}
        (the FST's free-backoff semantics)."""
        cands = [bow.get(ctx_word, 0.0) + uni[w]]
        if (ctx_word, w) in bi:
            cands.append(bi[(ctx_word, w)])
        return max(cands) * LOG10

    states, costs = init_state_sets(fst, (1,), max_states=8)
    states, costs, lm1 = fst_advance_sets(
        tables, states, costs, jnp.asarray([sym_to_id["w3"]]))
    np.testing.assert_allclose(float(lm1[0]), py_lnp("<s>", "w3"), rtol=1e-5)
    for w in ["w1", "w3", "w5", "w8"]:
        _, _, lm2 = fst_advance_sets(
            tables, states, costs, jnp.asarray([sym_to_id[w]]))
        np.testing.assert_allclose(
            float(lm2[0]), py_lnp("<s>", "w3") + py_lnp("w3", w), rtol=1e-5,
            err_msg=f"w3 -> {w}")
