"""Precomputed-feature loader, rerank CLI, and score CLI tests."""

import numpy as np
import pytest

from pika_tpu.data.feats_loader import FeatsLoaderConfig, feats_dataloader, splice_numpy
from pika_tpu.data.kaldi_ark import write_matrix_ark
from pika_tpu.data.scp import write_int_vectors
from pika_tpu.decode.rerank import rerank_file
from pika_tpu.decode.score import main as score_main


@pytest.fixture
def corpus(tmp_path, rng):
    items = [(f"utt{i}", rng.standard_normal((20 + 3 * i, 10)).astype(np.float32)) for i in range(5)]
    ark = str(tmp_path / "feats.ark")
    scp = write_matrix_ark(ark, items)
    write_int_vectors(str(tmp_path / "labels.txt"),
                      [(u, list(range(1, 2 + i))) for i, (u, _) in enumerate(items)])
    return scp, str(tmp_path / "labels.txt"), items


def test_feats_dataloader_batches(corpus):
    scp, labels, items = corpus
    cfg = FeatsLoaderConfig(batch_size=2, lctx=1, rctx=1, stride=2)
    batches = list(feats_dataloader(scp, f"ark:{labels}", cfg))
    assert sum(len(b["uttids"]) for b in batches) == 5
    b0 = batches[0]
    assert b0["feats"].shape[-1] == 30  # 10 * (1+1+1)
    # spliced+strided content matches a manual computation
    manual = splice_numpy(items[0][1], 1, 1)[::2]
    np.testing.assert_allclose(b0["feats"][0, : manual.shape[0]], manual, rtol=1e-6)
    assert b0["feat_lens"][0] == manual.shape[0]
    np.testing.assert_array_equal(b0["labels"][0, :1], [1])


def test_feats_dataloader_ctc_variant(corpus):
    scp, labels, items = corpus
    cfg = FeatsLoaderConfig(batch_size=5, ctc=True)
    (batch,) = list(feats_dataloader(scp, f"ark:{labels}", cfg))
    # flattened targets = concatenation of all label sequences
    expected = np.concatenate([list(range(1, 2 + i)) for i in range(5)])
    np.testing.assert_array_equal(batch["flat_labels"], expected)


def test_rerank_file_matches_reference_semantics(tmp_path):
    # utt with 2-best: short good hyp vs long bad hyp (with LAS scores)
    nbest = tmp_path / "nbest.txt"
    nbest.write_text(
        "ab -1.0 -0.1 -0.1 -0.2 -0.2\n"      # hyp 'ab', rnnt -1, fw [-0.1,-0.1], bw [-0.2,-0.2]
        "abcd -1.5 -2.0 -2.0 -3.0 -3.0\n"
    )
    out = tmp_path / "best.txt"
    rerank_file(str(nbest), str(out), nbest=2, las_rescore=True,
                rnnt_score_scale=1.0, las_fw_score_scale=0.3, las_bw_score_scale=0.7)
    # candidate 1: (-1 + 0.3*-0.2 + 0.7*-0.4)/2 = -0.67 ; candidate 2:
    # (-1.5 + 0.3*-4 + 0.7*-6)/4 = -1.725 → 'ab' wins, chars space-joined
    assert out.read_text().strip() == "a b"


def test_score_cli(tmp_path, capsys):
    (tmp_path / "ref.txt").write_text("u1 abc\nu2 de\n")
    (tmp_path / "hyp.txt").write_text("u1 abc\nu2 df\n")
    wer = score_main([str(tmp_path / "ref.txt"), str(tmp_path / "hyp.txt"), "--char"])
    out = capsys.readouterr().out
    assert "%WER 20.00" in out  # 1 sub over 5 chars
    assert abs(wer - 0.2) < 1e-9


def test_rerank_single_direction_and_ids(tmp_path):
    # fw-only rescoring must not split the score columns in half
    # (half fw-weighted, half bw-weighted); --las_dirs says what's there
    nbest = tmp_path / "nbest.txt"
    nbest.write_text(
        "ab -1.0 -0.1 -0.1 -0.1\n"       # rnnt -1, fw [-0.1]*3 (L+1 scores)
        "cd -1.0 -3.0 -3.0 -3.0\n"
    )
    out = tmp_path / "best.txt"
    rerank_file(str(nbest), str(out), nbest=2, las_rescore=True,
                las_dirs="fw", las_fw_score_scale=1.0, las_bw_score_scale=99.0)
    # bw scale must be inert: 'ab' (-1 - 0.3)/2 beats 'cd' (-1 - 9)/2
    assert out.read_text().strip() == "a b"
    # odd score count with --las_dirs both is an error, not a wrong split
    with pytest.raises(ValueError, match="odd LAS score count"):
        rerank_file(str(nbest), str(out), nbest=2, las_rescore=True)

    # token-id hypotheses (decode without --symbols_map) parse as a
    # leading run of integer fields, not as hyp=parts[0]
    ids = tmp_path / "nbest_ids.txt"
    ids.write_text("12 7 93 -4.0\n12 7 -1.0\n")
    rerank_file(str(ids), str(out), nbest=2, ids=True)
    # '12 7': -1.0/2 beats '12 7 93': -4.0/3
    assert out.read_text().strip() == "12 7"


def test_rerank_trailing_partial_group_flushed(tmp_path, capsys):
    nbest = tmp_path / "nbest.txt"
    nbest.write_text("aa -1.0\nbb -2.0\ncc -0.5\n")  # nbest=2: trailing 1
    out = tmp_path / "best.txt"
    rerank_file(str(nbest), str(out), nbest=2)
    lines = out.read_text().splitlines()
    assert lines == ["a a", "c c"]  # trailing group not silently dropped
    assert "trailing group" in capsys.readouterr().err


def test_score_cli_warns_on_unmatched_ids(tmp_path, capsys):
    (tmp_path / "ref.txt").write_text("u1 abc\n")
    (tmp_path / "hyp.txt").write_text("utt-1 abc\n")  # id drift
    score_main([str(tmp_path / "ref.txt"), str(tmp_path / "hyp.txt"), "--char"])
    err = capsys.readouterr().err
    assert "no reference" in err
