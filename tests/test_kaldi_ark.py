"""Kaldi binary archive reader/writer round trips."""

import numpy as np
import pytest

from pika_tpu.data.kaldi_ark import (
    iter_matrix_ark,
    iter_matrices_scp,
    read_matrix_at,
    read_matrix_scp,
    write_matrix_ark,
)


def test_binary_ark_roundtrip(tmp_path, rng):
    items = [(f"utt{i}", rng.standard_normal((5 + i, 13)).astype(np.float32)) for i in range(4)]
    ark = str(tmp_path / "feats.ark")
    scp = write_matrix_ark(ark, items)
    got = list(iter_matrix_ark(ark))
    assert [u for u, _ in got] == [u for u, _ in items]
    for (u1, m1), (u2, m2) in zip(items, got):
        np.testing.assert_array_equal(m1, m2)
    # random access through the scp
    ptrs = read_matrix_scp(scp)
    np.testing.assert_array_equal(read_matrix_at(*ptrs["utt2"]), items[2][1])
    got2 = dict(iter_matrices_scp(scp))
    np.testing.assert_array_equal(got2["utt3"], items[3][1])
