"""FST shallow-fusion tests: device queries vs a literal SortedMatcher
transliteration, and ARPA compilation vs hand-computed LM scores."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from pika_tpu.decode.fst import (
    FstTables,
    INF,
    compile_arpa,
    fst_advance_sets,
    fst_final_scores,
    init_state_sets,
    read_text_fst,
)


class PySortedMatcher:
    """Literal transliteration of decoder/sorted_matcher.py over FstTables."""

    def __init__(self, t: FstTables):
        self.t = t

    def search(self, state, ilabel):
        t = self.t
        if state < 0:
            return None
        for i in range(t.arc_start[state], t.arc_start[state + 1]):
            if t.arc_ilabel[i] == ilabel:
                return float(t.arc_weight[i]), int(t.arc_next[i])
        return None

    def get_scores_wodisambig(self, state, ilabel, init=0.0):
        scores, states = [], []
        bf, cur = init, state
        while True:
            hit = self.search(cur, ilabel)
            if hit:
                scores.append(bf + hit[0])
                states.append(hit[1])
            if cur >= 0 and self.t.backoff_next[cur] >= 0:
                bf += float(self.t.backoff_weight[cur])
                cur = int(self.t.backoff_next[cur])
            else:
                return scores, states

    def get_scores(self, state, ilabel):
        inits = [(0.0, state)]
        for j in range(self.t.disambig_next.shape[1]):
            if self.t.disambig_next[state, j] >= 0:
                inits.append((float(self.t.disambig_weight[state, j]), int(self.t.disambig_next[state, j])))
        scores, states = [], []
        for ic, istate in inits:
            sc, st = self.get_scores_wodisambig(istate, ilabel, ic)
            scores.extend(sc)
            states.extend(st)
        return scores, states

    def final_score(self, state):
        def chain(s, acc):
            while True:
                if self.t.final_weight[s] < INF:
                    return acc + float(self.t.final_weight[s])
                if self.t.backoff_next[s] >= 0:
                    acc += float(self.t.backoff_weight[s])
                    s = int(self.t.backoff_next[s])
                else:
                    return float("inf")

        return chain(state, 0.0)


@pytest.fixture
def toy_fst(tmp_path):
    """Bigram-ish LM automaton: states 0 (uni), 1 (ctx a), 2 (ctx b).
    ilabels: 1=a, 2=b; backoff_id 0."""
    path = tmp_path / "lm.txt.fst"
    path.write_text(
        "0 1 1 1 0.5\n"   # a from unigram state
        "0 2 2 2 1.2\n"   # b
        "1 2 2 2 0.3\n"   # b | a
        "1 0 0 0 0.4\n"   # backoff a-ctx -> uni
        "2 0 0 0 0.2\n"   # backoff b-ctx -> uni
        "1 1 1 1 0.9\n"   # a | a
        "0 0.1\n"          # uni state final
        "2 0.05\n"         # b-ctx final
    )
    return read_text_fst(str(path))


def test_advance_matches_sorted_matcher(toy_fst):
    tables = toy_fst.device_arrays()
    py = PySortedMatcher(toy_fst)
    states, costs = init_state_sets(toy_fst, (1, 1), max_states=4)
    # emit 'a' (ilabel 1) then 'b' (2)
    for ilabel in (1, 2, 1):
        ref_map = {}
        for s_row, c_row in [(np.asarray(states)[0, 0], np.asarray(costs)[0, 0])]:
            for s, c in zip(s_row, c_row):
                if s < 0:
                    continue
                scs, sts = py.get_scores(int(s), ilabel)
                for sc, st in zip(scs, sts):
                    v = float(c) + sc
                    if st not in ref_map or v < ref_map[st]:
                        ref_map[st] = v
        states, costs, lm = fst_advance_sets(
            tables, states, costs, jnp.full((1, 1), ilabel, jnp.int32)
        )
        got = {
            int(s): float(c)
            for s, c in zip(np.asarray(states)[0, 0], np.asarray(costs)[0, 0])
            if s >= 0
        }
        assert set(got) == set(ref_map)
        for k in ref_map:
            np.testing.assert_allclose(got[k], ref_map[k], rtol=1e-5)
        np.testing.assert_allclose(float(lm[0, 0]), -min(ref_map.values()), rtol=1e-5)


def test_final_scores_match(toy_fst):
    tables = toy_fst.device_arrays()
    py = PySortedMatcher(toy_fst)
    states, costs = init_state_sets(toy_fst, (1, 1), max_states=4)
    states, costs, _ = fst_advance_sets(tables, states, costs, jnp.full((1, 1), 1, jnp.int32))
    got = float(fst_final_scores(tables, states, costs)[0, 0])
    ref = min(
        float(c) + py.final_score(int(s))
        for s, c in zip(np.asarray(states)[0, 0], np.asarray(costs)[0, 0])
        if s >= 0
    )
    np.testing.assert_allclose(got, -ref, rtol=1e-5)


def test_dead_set_kills_beam(toy_fst):
    """Unknown ilabel (no arc anywhere) must yield an empty set and -INF lm."""
    tables = toy_fst.device_arrays()
    states, costs = init_state_sets(toy_fst, (1, 1), max_states=4)
    states, costs, lm = fst_advance_sets(tables, states, costs, jnp.full((1, 1), 99, jnp.int32))
    assert (np.asarray(states) < 0).all()
    assert float(lm[0, 0]) < -1e29


def test_nonblk_reward(toy_fst):
    tables = toy_fst.device_arrays()
    states, costs = init_state_sets(toy_fst, (1, 1), max_states=4)
    _, costs_r, lm_r = fst_advance_sets(
        tables, states, costs, jnp.full((1, 1), 1, jnp.int32), nonblk_reward=0.7
    )
    _, costs_0, lm_0 = fst_advance_sets(
        tables, states, costs, jnp.full((1, 1), 1, jnp.int32)
    )
    np.testing.assert_allclose(float(lm_r[0, 0]), float(lm_0[0, 0]) + 0.7, rtol=1e-5)


def test_compile_arpa_scores(tmp_path):
    """Bigram ARPA: sentence score through the automaton = ARPA chain rule."""
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(
        "\\data\\\n"
        "ngram 1=4\n"
        "ngram 2=3\n"
        "\n"
        "\\1-grams:\n"
        "-0.7 <s> -0.3\n"
        "-0.9 a -0.2\n"
        "-1.1 b -0.25\n"
        "-0.8 </s>\n"
        "\n"
        "\\2-grams:\n"
        "-0.30 <s> a\n"
        "-0.45 a b\n"
        "-0.5 b </s>\n"
        "\n"
        "\\end\\\n"
    )
    sym = {"a": 1, "b": 2}
    tables_obj = compile_arpa(str(arpa), sym)
    tables = tables_obj.device_arrays()
    states, costs = init_state_sets(tables_obj, (1, 1), max_states=4)
    total = 0.0
    for ilabel in (1, 2):  # "a b"
        states, costs, lm = fst_advance_sets(tables, states, costs, jnp.full((1, 1), ilabel, jnp.int32))
    final = float(fst_final_scores(tables, states, costs)[0, 0])
    # ARPA chain: p(a|<s>) = 10^-0.30 ; p(b|a) = 10^-0.45 ; p(</s>|b) = 10^-0.5
    expected = -(0.30 + 0.45 + 0.5) * math.log(10)
    np.testing.assert_allclose(final, expected, rtol=1e-4)


def test_compile_arpa_start_state_backoff(tmp_path):
    """The <s> unigram's bow must be kept even though <s> is not an
    emittable token: a token with no explicit <s> bigram pays
    bow(<s>) + p_unigram, not just p_unigram (ADVICE r1: the dropped bow
    inflated every utterance-initial LM score)."""
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(
        "\\data\\\n"
        "ngram 1=4\n"
        "ngram 2=3\n"
        "\n"
        "\\1-grams:\n"
        "-0.7 <s> -0.3\n"
        "-0.9 a -0.2\n"
        "-1.1 b -0.25\n"
        "-0.8 </s>\n"
        "\n"
        "\\2-grams:\n"
        "-0.30 <s> a\n"
        "-0.45 a b\n"
        "-0.5 b </s>\n"
        "\n"
        "\\end\\\n"
    )
    sym = {"a": 1, "b": 2}
    tables_obj = compile_arpa(str(arpa), sym)
    tables = tables_obj.device_arrays()
    states, costs = init_state_sets(tables_obj, (1, 1), max_states=4)
    # "b" from the start state: no <s>-b bigram, so back off with the <s>
    # bow (-0.3) and take the b unigram (-1.1).
    states, costs, lm = fst_advance_sets(
        tables, states, costs, jnp.full((1, 1), 2, jnp.int32))
    expected = -(0.3 + 1.1) * math.log(10)
    np.testing.assert_allclose(float(lm[0, 0]), expected, rtol=1e-4)


def test_openfst_binary_flags_and_embedded_symbol_tables(toy_fst, tmp_path):
    """Written headers carry flags=0 (no embedded SymbolTables); files with
    flags 0x1/0x2 (fstcompile --keep_isymbols/--keep_osymbols) have their
    embedded SymbolTables skipped on read (ADVICE r1)."""
    import struct

    from pika_tpu.decode.fst import read_openfst_binary, write_openfst_binary

    path = tmp_path / "lm.fst"
    write_openfst_binary(str(path), toy_fst)
    raw = path.read_bytes()
    # header: magic i32, "vector" (4+6), "standard" (4+8), version i32,
    # flags i32 at offset 30, then props u64 + start/numstates/numarcs
    # i64 -> header ends at 66
    assert struct.unpack_from("<i", raw, 30)[0] == 0

    def symtab(name, syms):
        out = struct.pack("<i", 2125658996)
        out += struct.pack("<i", len(name)) + name.encode()
        out += struct.pack("<q", len(syms))  # available_key
        out += struct.pack("<q", len(syms))
        for key, s in enumerate(syms):
            out += struct.pack("<i", len(s)) + s.encode()
            out += struct.pack("<q", key)
        return out

    patched = (raw[:30] + struct.pack("<i", 3) + raw[34:66]
               + symtab("isyms", ["<eps>", "a"])
               + symtab("osyms", ["<eps>", "a", "b"])
               + raw[66:])
    path2 = tmp_path / "lm_syms.fst"
    path2.write_bytes(patched)
    back = read_openfst_binary(str(path2))
    np.testing.assert_array_equal(back.arc_ilabel, toy_fst.arc_ilabel)
    np.testing.assert_allclose(back.final_weight, toy_fst.final_weight, rtol=1e-6)
    assert back.start == toy_fst.start


def test_openfst_binary_roundtrip(toy_fst, tmp_path):
    """Dense tables → binary VectorFst<StdArc> → dense tables round trip."""
    from pika_tpu.decode.fst import read_openfst_binary, write_openfst_binary

    path = tmp_path / "lm.fst"
    write_openfst_binary(str(path), toy_fst)
    back = read_openfst_binary(str(path))
    np.testing.assert_array_equal(back.arc_start, toy_fst.arc_start)
    np.testing.assert_array_equal(back.arc_ilabel, toy_fst.arc_ilabel)
    np.testing.assert_allclose(back.arc_weight, toy_fst.arc_weight, rtol=1e-6)
    np.testing.assert_array_equal(back.arc_next, toy_fst.arc_next)
    np.testing.assert_array_equal(back.backoff_next, toy_fst.backoff_next)
    np.testing.assert_allclose(back.final_weight, toy_fst.final_weight, rtol=1e-6)
    assert back.start == toy_fst.start


def test_openfst_binary_roundtrip_symbols_and_disambig(tmp_path):
    """Round trip of a file shaped like real Kaldi LM FSTs: embedded
    isymbols+osymbols (header flags 0x1|0x2, written by our own writer this
    time, not a hand-patched blob) AND disambig arcs (#0-style ilabels),
    exercising both reader paths end-to-end (VERDICT r3 item 7;
    decode_transducer.py:83-86)."""
    import struct

    from pika_tpu.decode.fst import read_openfst_binary, write_openfst_binary

    src = tmp_path / "lm.txt.fst"
    # ilabels: 1=a, 2=b; backoff 0; disambig ids 90, 91
    src.write_text(
        "0 1 1 1 0.5\n"
        "0 2 2 2 1.2\n"
        "0 1 90 90 0.15\n"   # disambig #0 from uni state
        "1 2 2 2 0.3\n"
        "1 0 0 0 0.4\n"
        "1 2 91 91 0.25\n"   # disambig #1 from a-ctx
        "2 0 0 0 0.2\n"
        "0 0.1\n"
        "2 0.05\n"
    )
    t = read_text_fst(str(src), disambig_ids=[90, 91])
    assert t.disambig_ids == (90, 91)
    assert (t.disambig_next >= 0).sum() == 2

    path = tmp_path / "lm.fst"
    syms = {"<eps>": 0, "a": 1, "b": 2, "#0": 90, "#1": 91}
    write_openfst_binary(str(path), t, isymbols=syms, osymbols=syms)
    raw = path.read_bytes()
    assert struct.unpack_from("<i", raw, 30)[0] == 0x3  # both flags set

    back = read_openfst_binary(str(path), disambig_ids=[90, 91])
    np.testing.assert_array_equal(back.arc_start, t.arc_start)
    np.testing.assert_array_equal(back.arc_ilabel, t.arc_ilabel)
    np.testing.assert_allclose(back.arc_weight, t.arc_weight, rtol=1e-6)
    np.testing.assert_array_equal(back.arc_next, t.arc_next)
    np.testing.assert_array_equal(back.backoff_next, t.backoff_next)
    np.testing.assert_allclose(back.backoff_weight, t.backoff_weight, rtol=1e-6)
    np.testing.assert_array_equal(back.disambig_next, t.disambig_next)
    np.testing.assert_allclose(
        np.where(t.disambig_next >= 0, back.disambig_weight, 0),
        np.where(t.disambig_next >= 0, t.disambig_weight, 0), rtol=1e-6)
    np.testing.assert_allclose(back.final_weight, t.final_weight, rtol=1e-6)
    assert back.start == t.start

    # reading WITHOUT disambig_ids must fold 90/91 into plain arcs, not drop
    plain = read_openfst_binary(str(path))
    assert len(plain.arc_ilabel) == len(t.arc_ilabel) + 2


def test_read_text_fst_acceptor(tmp_path):
    """Acceptor format (fstcompile --acceptor): 'src dst il [w]'.  Its
    4-field arc is ambiguous with an unweighted transducer arc — the
    explicit flag resolves it, like OpenFst's own --acceptor."""
    p = tmp_path / "a.fst.txt"
    p.write_text("0 1 3 0.5\n1 2 4\n2 0.25\n")
    t = read_text_fst(str(p), acceptor=True)
    # weighted arc kept its weight (transducer parse would drop it to 0)
    i = int(t.arc_start[0])
    assert int(t.arc_ilabel[i]) == 3 and float(t.arc_weight[i]) == 0.5
    # 3-field unweighted arc parsed as an arc, not a bogus final state
    j = int(t.arc_start[1])
    assert int(t.arc_ilabel[j]) == 4 and int(t.arc_next[j]) == 2
    assert float(t.final_weight[2]) == 0.25


def test_read_text_fst_rejects_ambiguous_lines(tmp_path):
    p = tmp_path / "bad.fst.txt"
    p.write_text("0 1 3 7\n1 2 4\n")  # 3-field arc in transducer mode
    with pytest.raises(ValueError, match="acceptor"):
        read_text_fst(str(p))
    p.write_text("0 1 3 3 0.5 9\n")  # 6 fields in transducer mode
    with pytest.raises(ValueError, match="field"):
        read_text_fst(str(p))


def test_build_tables_rejects_nondeterminism(tmp_path):
    """The searched tables keep one arc per (state, ilabel); a
    nondeterministic FST would be silently mis-scored, so it is refused."""
    p = tmp_path / "nd.fst.txt"
    p.write_text("0 1 3 3 0.5\n0 2 3 3 0.7\n1 0\n2 0\n")
    with pytest.raises(ValueError, match="nondeterministic"):
        read_text_fst(str(p))


# ---------------------------------------------------------------------------
# host-precomputed cache equivalence (round 5): the dense advance cache and
# the per-state final cache must reproduce the on-device walk EXACTLY
# ---------------------------------------------------------------------------

def _random_fst(rng, n_states=24, n_labels=8, negative=False, disambig=False):
    """A random deterministic backoff-ish automaton (may contain backoff
    cycles — both query paths bound the walk at max_backoff_levels)."""
    from pika_tpu.decode.fst import _build_tables

    arcs = {}
    finals = {}
    dis_ids = [90, 91] if disambig else None
    lo, hi = (-1.5, 2.5) if negative else (0.0, 3.0)
    for s in range(n_states):
        labs = rng.choice(np.arange(1, n_labels + 1),
                          size=rng.integers(0, n_labels), replace=False)
        lst = [(int(l), float(rng.uniform(lo, hi)), int(rng.integers(0, n_states)))
               for l in labs]
        if rng.random() < 0.8:  # backoff arc
            lst.append((0, float(rng.uniform(lo, hi)), int(rng.integers(0, n_states))))
        if disambig and rng.random() < 0.4:
            lst.append((int(rng.choice(dis_ids)), float(rng.uniform(lo, hi)),
                        int(rng.integers(0, n_states))))
        arcs[s] = lst
        if rng.random() < 0.3:
            finals[s] = float(rng.uniform(lo, hi))
    return _build_tables(n_states, arcs, finals, start=0, backoff_id=0,
                         disambig_ids=dis_ids)


def _set_dict(states, costs):
    return {int(s): round(float(c), 4)
            for s, c in zip(np.ravel(states), np.ravel(costs)) if s >= 0}


@pytest.mark.parametrize("negative,disambig", [(False, False), (True, False),
                                               (False, True), (True, True)])
def test_advance_cache_matches_uncached(rng, negative, disambig):
    t = _random_fst(rng, negative=negative, disambig=disambig)
    plain = t.device_arrays()
    cached = t.device_arrays(n_ilabels=16, cache_max_bytes=64 << 20)
    assert "adv_cost" in cached and "final_best" in cached

    states_p, costs_p = init_state_sets(t, (2, 3), max_states=4)
    states_c, costs_c = states_p, costs_p
    for step in range(6):
        labels = jnp.asarray(rng.integers(1, 12, (2, 3)).astype(np.int32))
        reward = 0.3 if step % 2 else 0.0
        states_p, costs_p, lm_p = fst_advance_sets(
            plain, states_p, costs_p, labels, nonblk_reward=reward)
        states_c, costs_c, lm_c = fst_advance_sets(
            cached, states_c, costs_c, labels, nonblk_reward=reward)
        for i in range(2):
            for j in range(3):
                assert _set_dict(states_p[i, j], costs_p[i, j]) == \
                       _set_dict(states_c[i, j], costs_c[i, j]), (step, i, j)
        np.testing.assert_allclose(np.asarray(lm_p), np.asarray(lm_c),
                                   rtol=1e-5, atol=1e-5)
        fin_p = np.asarray(fst_final_scores(plain, states_p, costs_p))
        fin_c = np.asarray(fst_final_scores(cached, states_c, costs_c))
        np.testing.assert_allclose(fin_p, fin_c, rtol=1e-5, atol=1e-5)
        # dead sets must agree exactly on the -INF sentinel
        np.testing.assert_array_equal(fin_p < -1e29, fin_c < -1e29)


def test_advance_cache_vs_sorted_matcher(toy_fst):
    """The cached path straight against the literal SortedMatcher
    transliteration (same protocol as test_advance_matches_sorted_matcher)."""
    tables = toy_fst.device_arrays(n_ilabels=8, cache_max_bytes=1 << 20)
    assert "adv_cost" in tables
    py = PySortedMatcher(toy_fst)
    states, costs = init_state_sets(toy_fst, (1, 1), max_states=4)
    for ilabel in (1, 2, 1):
        ref_map = {}
        for s, c in zip(np.asarray(states)[0, 0], np.asarray(costs)[0, 0]):
            if s < 0:
                continue
            scs, sts = py.get_scores(int(s), ilabel)
            for sc, st in zip(scs, sts):
                v = float(c) + sc
                if st not in ref_map or v < ref_map[st]:
                    ref_map[st] = v
        states, costs, lm = fst_advance_sets(
            tables, states, costs, jnp.full((1, 1), ilabel, jnp.int32))
        got = _set_dict(states[0, 0], costs[0, 0])
        assert set(got) == set(ref_map)
        for k in ref_map:
            np.testing.assert_allclose(got[k], ref_map[k], rtol=1e-5)
        np.testing.assert_allclose(float(lm[0, 0]), -min(ref_map.values()),
                                   rtol=1e-5)


def test_advance_cache_size_gate(toy_fst):
    from pika_tpu.decode.fst import build_advance_cache

    assert build_advance_cache(toy_fst, 8, max_bytes=16) is None
    tables = toy_fst.device_arrays(n_ilabels=8, cache_max_bytes=16)
    assert "adv_cost" not in tables and "final_best" in tables


def test_advance_cache_file_roundtrip(toy_fst, tmp_path, rng):
    """--fst_cache_file: a saved cache reloads bit-identically, and a
    DIFFERENT automaton never mis-serves a stale file (fingerprint)."""
    f = str(tmp_path / "lm.advcache.npz")
    built = toy_fst.device_arrays(n_ilabels=8, cache_max_bytes=1 << 20,
                                  cache_file=f)
    import os
    assert os.path.exists(f)
    loaded = toy_fst.device_arrays(n_ilabels=8, cache_max_bytes=1 << 20,
                                   cache_file=f)
    np.testing.assert_array_equal(np.asarray(built["adv_cost"]),
                                  np.asarray(loaded["adv_cost"]))
    np.testing.assert_array_equal(np.asarray(built["adv_next"]),
                                  np.asarray(loaded["adv_next"]))

    # a different FST with the same file must rebuild, not serve stale data
    other = _random_fst(rng)
    fresh = other.device_arrays(n_ilabels=8, cache_max_bytes=1 << 20)
    via_file = other.device_arrays(n_ilabels=8, cache_max_bytes=1 << 20,
                                   cache_file=f)
    np.testing.assert_array_equal(np.asarray(fresh["adv_cost"]),
                                  np.asarray(via_file["adv_cost"]))
    assert other.fingerprint(8, None) != toy_fst.fingerprint(8, None)
