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
