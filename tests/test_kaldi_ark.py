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


def test_text_ark_multi_record(tmp_path):
    # the binary probe eats the first 2 bytes of a text object; bracket
    # matching must count them or every record after the first is swallowed
    from pika_tpu.data.kaldi_ark import iter_matrix_ark

    ark = tmp_path / "feats.txt.ark"
    ark.write_text(
        "utt1  [\n  1 2 3\n  4 5 6 ]\n"
        "utt2  [\n  7 8 9 ]\n"
    )
    got = list(iter_matrix_ark(str(ark)))
    assert [u for u, _ in got] == ["utt1", "utt2"]
    np.testing.assert_allclose(got[0][1], [[1, 2, 3], [4, 5, 6]])
    np.testing.assert_allclose(got[1][1], [[7, 8, 9]])


def test_pcm_int32_scales_not_wraps(tmp_path):
    # 24/32-bit PCM reaches the archiver as full-scale int32; conversion
    # must keep the top 16 bits, not the low 16 (modulo wrap = noise)
    from pika_tpu.data.wavio import pcm_to_int16, read_wav, write_wav

    x32 = np.array([1 << 30, -(1 << 30), 0x123456 << 8], np.int32)
    np.testing.assert_array_equal(pcm_to_int16(x32), [16384, -16384, 0x1234])
    with pytest.raises(TypeError):
        pcm_to_int16(x32.astype(np.int64))
    # write_wav on int32 now round-trips at 16-bit scale
    write_wav(tmp_path / "x.wav", x32, 16000)
    back, rate = read_wav(str(tmp_path / "x.wav"))
    assert rate == 16000 and back.dtype == np.int16
    np.testing.assert_array_equal(back, [16384, -16384, 0x1234])


def test_read_wav_24bit_left_aligned(tmp_path):
    # hand-build a 24-bit PCM RIFF: value 0x123456 must read back
    # left-aligned to full int32 scale (0x12345600)
    import struct

    frames = [0x123456, 0x800000, 0x7FFFFF]  # +, most-negative, most-positive
    body = b"".join(struct.pack("<I", v)[:3] for v in frames)
    with open(tmp_path / "a24.wav", "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000,
                                      16000 * 3, 3, 24))
        f.write(b"data" + struct.pack("<I", len(body)) + body)
    from pika_tpu.data.wavio import read_wav
    pcm, rate = read_wav(str(tmp_path / "a24.wav"))
    assert pcm.dtype == np.int32
    np.testing.assert_array_equal(
        pcm, np.array([0x12345600, -0x80000000, 0x7FFFFF00], np.int64).astype(np.int32))


def test_compressed_matrix_formats(tmp_path, rng):
    # Kaldi CompressedMatrix ("CM"/"CM2"/"CM3") decode, pinned by a
    # compressor written from the same compressed-matrix.cc spec: the
    # round-trip error must stay within each format's quantization step,
    # and a record must coexist with uncompressed records in one ark.
    from pika_tpu.data.kaldi_ark import compress_matrix, read_kaldi_object
    import io

    mat = (rng.standard_normal((50, 13)) * 4.0).astype(np.float32)
    span = float(mat.max() - mat.min())
    for fmt, tol in ((1, span / 63.0), (2, span / 65535.0 * 1.01), (3, span / 255.0)):
        buf = io.BytesIO(b"\0B" + compress_matrix(mat, fmt))
        got = read_kaldi_object(buf)
        assert got.shape == mat.shape and got.dtype == np.float32
        assert np.max(np.abs(got - mat)) <= tol, (fmt, np.max(np.abs(got - mat)))
    # format-1 piecewise decode: inner quartiles get the fine 128-step
    # resolution, so the bulk of a gaussian column is much tighter than
    # the worst-case tail tolerance above
    buf = io.BytesIO(b"\0B" + compress_matrix(mat, 1))
    got = read_kaldi_object(buf)
    q25, q75 = np.quantile(mat, [0.3, 0.7])
    inner = (mat > q25) & (mat < q75)
    assert np.max(np.abs((got - mat)[inner])) <= span / 2 / 128.0 * 1.5


def test_compressed_in_mixed_ark(tmp_path, rng):
    from pika_tpu.data.kaldi_ark import compress_matrix, iter_matrix_ark
    import struct

    m1 = rng.standard_normal((7, 5)).astype(np.float32)
    m2 = (rng.standard_normal((9, 5)) * 2).astype(np.float32)
    ark = tmp_path / "mixed.ark"
    with open(ark, "wb") as f:
        f.write(b"uttA \0BFM ")
        f.write(bytes([4]) + struct.pack("<i", 7) + bytes([4]) + struct.pack("<i", 5))
        f.write(m1.astype("<f4").tobytes())
        f.write(b"uttB \0B" + compress_matrix(m2, 1))
    got = dict(iter_matrix_ark(str(ark)))
    np.testing.assert_array_equal(got["uttA"], m1)
    span = float(m2.max() - m2.min())
    assert np.max(np.abs(got["uttB"] - m2)) <= span / 63.0
