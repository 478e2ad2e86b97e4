"""Tests for the host-side data layer (wav I/O, archives, cmvn, lists)."""

import numpy as np
import pytest

from pika_tpu.data import (
    read_wav,
    write_wav,
    read_wav_scp,
    read_int_vectors,
    write_int_vectors,
    read_symbol_table,
    MrkSeqWriter,
    MrkSeqReader,
    wav_scp_to_mrk_seq,
    CmvnStats,
    offset_scale,
    split_by_length,
    shuffle_by_length,
)
from pika_tpu.data import segment as seg


def _make_wav(tmp_path, name, n=16000, rate=16000, rng=None):
    rng = rng or np.random.default_rng(0)
    pcm = (rng.standard_normal(n) * 3000).astype(np.int16)
    path = tmp_path / name
    write_wav(path, pcm, rate)
    return path, pcm


def test_wav_roundtrip_pcm16(tmp_path, rng):
    path, pcm = _make_wav(tmp_path, "a.wav", rng=rng)
    samples, rate = read_wav(path)
    assert rate == 16000
    np.testing.assert_array_equal(samples, pcm)


def test_wav_roundtrip_float32(tmp_path, rng):
    x = rng.standard_normal(1000).astype(np.float32) * 0.1
    path = tmp_path / "f.wav"
    write_wav(path, x, 8000)
    samples, rate = read_wav(path)
    assert rate == 8000
    np.testing.assert_allclose(samples, x, rtol=1e-6)


def test_wav_pipe_command(tmp_path, rng):
    path, pcm = _make_wav(tmp_path, "p.wav", rng=rng)
    samples, rate = read_wav(f"cat {path} |")
    np.testing.assert_array_equal(samples, pcm)


def test_mrk_seq_roundtrip(tmp_path, rng):
    scp = tmp_path / "wav.scp"
    utts = {}
    with open(scp, "w") as f:
        for i in range(5):
            p, pcm = _make_wav(tmp_path, f"u{i}.wav", n=1000 + i * 7, rng=rng)
            utts[f"utt{i}"] = pcm
            f.write(f"utt{i} {p}\n")
    shards = wav_scp_to_mrk_seq(str(scp), str(tmp_path / "train.mrk"), str(tmp_path / "train.seq"), num_wav_per_seq=3)
    assert len(shards) == 2
    seen = {}
    for mrk, seqf in shards:
        with MrkSeqReader(mrk, seqf) as r:
            for uttid, pcm in r:
                seen[uttid] = pcm
    assert set(seen) == set(utts)
    for k in utts:
        np.testing.assert_array_equal(seen[k], utts[k])


def test_int_vectors_roundtrip(tmp_path):
    items = [("a", [1, 2, 3]), ("b", [7]), ("c", [])]
    path = tmp_path / "label.txt"
    write_int_vectors(str(path), items)
    out = read_int_vectors(f"ark:{path}")
    assert list(out) == ["a", "b", "c"]
    np.testing.assert_array_equal(out["a"], [1, 2, 3])
    np.testing.assert_array_equal(out["c"], [])


def test_symbol_table(tmp_path):
    path = tmp_path / "char.txt"
    path.write_text("<blk> 0\nA 1\nB 2\n")
    table = read_symbol_table(str(path))
    assert table == {0: "<blk>", 1: "A", 2: "B"}


def test_cmvn_stats_roundtrip(tmp_path, rng):
    feats = rng.standard_normal((100, 8)).astype(np.float32) * 2 + 1.5
    stats = CmvnStats(8)
    stats.accumulate(feats[:60])
    stats.accumulate(feats[60:])
    path = tmp_path / "cmvn.stats"
    stats.write(str(path))
    loaded = CmvnStats.read(str(path))
    np.testing.assert_allclose(loaded.stats, stats.stats, rtol=1e-12)
    offset, scale = offset_scale(loaded.stats, splice_copies=3)
    assert offset.shape == (24,)
    mean = feats.astype(np.float64).mean(axis=0)
    np.testing.assert_allclose(offset[:8], -mean, rtol=1e-5)
    # normalized features should be ~zero-mean unit-var
    norm = (feats + offset[:8]) * scale[:8]
    assert abs(norm.mean()) < 1e-4
    np.testing.assert_allclose(norm.std(axis=0), 1.0, atol=1e-3)


def test_segment_float_conversion():
    pcm = np.array([-32768, 0, 16384], dtype=np.int16)
    f = seg.to_float32(pcm)
    np.testing.assert_allclose(f, [-1.0, 0.0, 0.5])
    back = seg.from_float32(f, "int16")
    np.testing.assert_array_equal(back, pcm)


def test_segment_change_speed(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    y = seg.change_speed(x, 1.1)
    assert y.shape[0] == int(1000 / 1.1)
    assert np.array_equal(seg.change_speed(x, 1.0), x)
    # reference semantics: np.interp onto linspace(0, n, n/rate)
    new_idx = np.linspace(0, 1000, int(1000 / 1.1))
    expected = np.interp(new_idx, np.arange(1000), x)
    np.testing.assert_allclose(y, expected, rtol=1e-6)


def test_segment_normalize(rng):
    x = rng.standard_normal(4000).astype(np.float32) * 0.01
    y = seg.normalize(x, target_db=-20.0)
    assert abs(seg.rms_db(y) - (-20.0)) < 1e-3


def test_segment_add_noise(rng):
    x = rng.standard_normal(8000).astype(np.float32) * 0.05
    noise = rng.standard_normal(16000).astype(np.float32) * 0.05
    import random

    y = seg.add_noise(x, 16000, noise, snr_dB=10.0, rng=random.Random(1))
    assert y.shape == x.shape
    assert not np.array_equal(y, x)


def test_split_by_length(tmp_path):
    path = tmp_path / "lens"
    with open(path, "w") as f:
        for i in range(64):
            f.write(f"utt{i} {100 + i}\n")
    outs = split_by_length(str(path), batch_size=4, world_size=2, full_batch=True)
    assert len(outs) == 2
    lines0 = open(outs[0]).read().splitlines()
    lines1 = open(outs[1]).read().splitlines()
    assert len(lines0) == len(lines1) == 32
    # within each worker, consecutive runs of batch_size have near-equal length
    lens0 = [int(l.split()[1]) for l in lines0]
    for i in range(0, 32, 4):
        batch = lens0[i : i + 4]
        assert max(batch) - min(batch) <= 4


def test_shuffle_by_length(tmp_path):
    path = tmp_path / "lens"
    with open(path, "w") as f:
        for i in range(10):
            f.write(f"utt{i} {100 + 10 * i}\n")
    out = tmp_path / "shuf"
    shuffle_by_length(str(path), str(out), batch_size=2, max_len=200)
    lines = open(out).read().splitlines()
    kept = [l.split()[0] for l in lines]
    # utterances longer than 200 dropped
    assert all(int(l.split()[1]) <= 200 for l in lines)
    assert len(kept) > 0


def test_prefetch_iter_propagates_errors_and_preserves_order():
    from pika_tpu.data.loader import prefetch_iter

    assert list(prefetch_iter(iter(range(10)), transform=lambda x: x * 2)) == \
        [0, 2, 4, 6, 8, 10, 12, 14, 16, 18]

    def bad():
        yield 1
        raise ValueError("boom")

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="prefetch producer"):
        list(prefetch_iter(bad()))


def test_augment_noise_prob(rng):
    """--noise_prob mixes clean and noisy utterances (multi-condition
    training): prob=0 never touches the waveform beyond speed/gain,
    prob=1 always mixes, and the same seed with the same prob is
    deterministic."""
    from pika_tpu.data.loader import OtfLoaderConfig, _augment

    pcm = (rng.standard_normal(8000) * 3000).astype(np.int16)
    noise = [(rng.standard_normal(32000) * 3000).astype(np.float32)]
    base = dict(speed_rates=(1.0,), gain_range=(20.0, 20.0),
                snr_range=(10.0, 10.0))

    def run(prob, seed):
        cfg = OtfLoaderConfig(noise_prob=prob, **base)
        return _augment(pcm, cfg, np.random.default_rng(seed), noise=noise)

    clean = run(0.0, 0)
    noisy = run(1.0, 0)
    assert not np.array_equal(clean, noisy)
    # determinism under a fixed seed
    np.testing.assert_array_equal(run(0.5, 3), run(0.5, 3))
    # at prob=0.5 both outcomes occur across seeds
    outcomes = {np.array_equal(run(0.5, s), run(0.0, s)) for s in range(12)}
    assert outcomes == {True, False}


def test_resample_spec():
    """Behavioral spec for resample (PARITY.md: polyphase replaces resampy
    — not numerically equal, so pin the *semantics* implementation-
    independently): in-band tones survive with amplitude and frequency
    intact; out-of-band energy is rejected after downsampling."""
    sr, dur = 16000, 1.0
    t = np.arange(int(sr * dur)) / sr
    # 440 Hz in-band everywhere; 7 kHz above the 8 kHz target's 4 kHz Nyquist
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.25 * np.sin(2 * np.pi * 7000 * t)).astype(np.float32)

    y = seg.resample(x, sr, 8000)
    assert y.dtype == np.float32 and abs(len(y) - 8000) <= 1

    spec = np.abs(np.fft.rfft(y[: 8000]))
    freqs = np.fft.rfftfreq(8000, d=1 / 8000)
    # 440 Hz tone preserved: amplitude within 2% of 0.5 (N/2 * a)
    i440 = np.argmin(np.abs(freqs - 440))
    assert abs(spec[i440] / (len(y[:8000]) / 2) - 0.5) < 0.01
    # aliased image of the 7 kHz tone (would land at 1 kHz) rejected >40 dB
    i1k = np.argmin(np.abs(freqs - 1000))
    assert spec[i1k] < spec[i440] * 0.01

    # round trip 16k -> 24k -> 16k is near-identity away from the edges
    # (the 7 kHz tone sits at 0.875x Nyquist, inside any sinc filter's
    # transition band, so a ~2% waveform error is inherent, not a defect)
    z = seg.resample(seg.resample(x, sr, 24000), 24000, sr)
    m = slice(400, len(x) - 400)
    assert np.max(np.abs(z[m] - x[m])) < 2.5e-2
