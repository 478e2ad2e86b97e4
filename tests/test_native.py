"""Native C++ DSP library vs the numpy reference chain — exact parity."""

import os
import subprocess

import numpy as np
import pytest

from pika_tpu.data import segment as seg
from pika_tpu.decode.wer import edit_distance as py_edit_distance
from pika_tpu import native as nat


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lib = os.path.join(root, "native", "libpika_dsp.so")
    if not os.path.exists(lib):
        subprocess.run(["make", "-C", os.path.join(root, "native")], check=True)
    # reset the module cache so load() sees the fresh build
    nat._TRIED = False
    nat._LIB = None
    assert nat.load() is not None, "native library failed to load"


def _py_chain(pcm, rate, target_db):
    x = seg.to_float32(pcm)
    x = seg.change_speed(x, rate)
    x = seg.normalize(x, target_db)
    return seg.from_float32(x, "int16").astype(np.float32)


@pytest.mark.parametrize("rate", [0.9, 1.0, 1.1])
def test_augment_matches_python(rng, rate):
    pcm = (rng.standard_normal(16000) * 4000).astype(np.int16)
    got = nat.augment_i16(pcm, rate, -30.0)
    expected = _py_chain(pcm, rate, -30.0)
    assert got.shape == expected.shape
    np.testing.assert_array_equal(got, expected)


def test_augment_no_normalize(rng):
    pcm = (rng.standard_normal(1000) * 2000).astype(np.int16)
    got = nat.augment_i16(pcm, 1.0, -30.0, do_normalize=False)
    x = seg.to_float32(pcm)
    expected = seg.from_float32(x, "int16").astype(np.float32)
    np.testing.assert_array_equal(got, expected)


def test_augment_gain_overflow_raises():
    silent = np.zeros(100, np.int16)
    with pytest.raises(ValueError):
        nat.augment_i16(silent, 1.0, -20.0, max_gain_db=50.0)


def test_native_edit_distance(rng):
    for _ in range(20):
        a = rng.integers(0, 5, int(rng.integers(0, 12))).astype(np.int32)
        b = rng.integers(0, 5, int(rng.integers(0, 12))).astype(np.int32)
        assert nat.edit_distance(a, b) == py_edit_distance(a.tolist(), b.tolist())


def test_loader_uses_native(tmp_path, rng):
    """Loader with augmentation produces identical batches whether the
    native library is loaded or not (given the same seed)."""
    from pika_tpu.data import MrkSeqWriter, write_int_vectors
    from pika_tpu.data.loader import OtfLoaderConfig, dataloader

    with MrkSeqWriter(str(tmp_path / "a.mrk"), str(tmp_path / "a.seq")) as w:
        for i in range(4):
            w.write(f"u{i}", (rng.standard_normal(8000) * 3000).astype(np.int16))
    write_int_vectors(str(tmp_path / "l.txt"), [(f"u{i}", [1, 2]) for i in range(4)])
    with open(tmp_path / "d.lst", "w") as f:
        f.write(f"{tmp_path}/a.mrk.0 {tmp_path}/a.seq.0 ark:{tmp_path}/l.txt\n")
    cfg = OtfLoaderConfig(batch_size=4, num_workers=1, augment=True, seed=5,
                          wav_buckets=(16000,), label_buckets=(8,))
    native_batches = list(dataloader(str(tmp_path / "d.lst"), cfg))
    # force the python path
    lib, nat._LIB = nat._LIB, None
    try:
        py_batches = list(dataloader(str(tmp_path / "d.lst"), cfg))
    finally:
        nat._LIB = lib
    assert len(native_batches) == len(py_batches) == 1
    np.testing.assert_array_equal(native_batches[0]["wavs"], py_batches[0]["wavs"])
    np.testing.assert_array_equal(native_batches[0]["wav_lens"], py_batches[0]["wav_lens"])
