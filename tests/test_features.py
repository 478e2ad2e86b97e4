"""Feature pipeline tests: fbank JAX-vs-oracle parity, splice, CMVN, SpecAugment."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pika_tpu.features import (
    FbankConfig,
    fbank_numpy,
    make_fbank_fn,
    mel_banks_matrix,
    splice,
    stride_subsample,
    strided_len,
    apply_cmvn,
    spec_augment,
)

PIKA_CONF = FbankConfig(
    sample_frequency=16000,
    window_type="hamming",
    dither=0.0,  # dither disabled for determinism in parity tests
    low_freq=40.0,
    high_freq=-200.0,
    num_mel_bins=80,
)


def test_fbank_conf_parse(tmp_path):
    conf = tmp_path / "fbank.conf"
    conf.write_text(
        "--window-type=hamming \n--sample-frequency=16000\n--dither=1\n"
        "--low-freq=40    # low cutoff\n--high-freq=-200 # high cutoff\n"
        "--num-mel-bins=80\n"
    )
    cfg = FbankConfig.from_conf(str(conf))
    assert cfg.window_type == "hamming"
    assert cfg.dither == 1.0
    assert cfg.low_freq == 40.0
    assert cfg.high_freq == -200.0
    assert cfg.num_mel_bins == 80
    assert cfg.frame_length == 400
    assert cfg.frame_shift == 160
    assert cfg.padded_window_size == 512


def test_mel_banks_properties():
    mel = mel_banks_matrix(PIKA_CONF)
    assert mel.shape == (256, 80)
    # each filter is a triangle: nonneg, unimodal, nonzero
    assert (mel >= 0).all()
    assert (mel.sum(axis=0) > 0).all()
    # filters cover [40, 7800] Hz and nothing below/above
    freqs = np.arange(256) * 16000.0 / 512
    nz = mel.sum(axis=1) > 0
    assert freqs[nz].min() > 40.0
    assert freqs[nz].max() < 7800.0


@pytest.mark.parametrize("n_samples", [400, 1600, 16000, 16001, 16159])
def test_fbank_jax_matches_oracle(rng, n_samples):
    pcm = (rng.standard_normal(n_samples) * 8000.0).astype(np.float32)
    oracle = fbank_numpy(pcm, PIKA_CONF)
    max_samples = 16160
    fbank = jax.jit(make_fbank_fn(PIKA_CONF, max_samples))
    wav = np.zeros((1, max_samples), dtype=np.float32)
    wav[0, :n_samples] = pcm
    feats, lens = fbank(jnp.asarray(wav), jnp.asarray([n_samples]))
    n_frames = oracle.shape[0]
    assert int(lens[0]) == n_frames
    got = np.asarray(feats[0, :n_frames])
    rel = np.abs(got - oracle) / (np.abs(oracle) + 1e-3)
    assert rel.max() < 1e-4, f"max rel err {rel.max()}"


def test_fbank_batched_consistency(rng):
    max_samples = 8000
    fbank = jax.jit(make_fbank_fn(PIKA_CONF, max_samples))
    wavs = np.zeros((3, max_samples), dtype=np.float32)
    lens = np.array([8000, 4000, 5555])
    for i, l in enumerate(lens):
        wavs[i, :l] = rng.standard_normal(l) * 1000
    feats, flens = fbank(jnp.asarray(wavs), jnp.asarray(lens))
    for i, l in enumerate(lens):
        single = np.zeros((1, max_samples), dtype=np.float32)
        single[0, :l] = wavs[i, :l]
        f1, _ = fbank(jnp.asarray(single), jnp.asarray([l]))
        n = int(flens[i])
        np.testing.assert_allclose(np.asarray(feats[i, :n]), np.asarray(f1[0, :n]), rtol=1e-5, atol=1e-5)


def test_splice_matches_reference_numpy(rng):
    """Cross-check against a literal transcription of the reference splice
    semantics (loader/otf_utt_loader.py:28-46)."""

    def ref_splice(feats, lctx, rctx):
        length, dim = feats.shape
        padding = np.zeros((length + lctx + rctx, dim), dtype=np.float32)
        padding[:lctx] = feats[0]
        padding[lctx : lctx + length] = feats
        padding[lctx + length :] = feats[-1]
        spliced = np.zeros((length, dim * (lctx + 1 + rctx)), dtype=np.float32)
        for i in range(lctx + 1 + rctx):
            spliced[:, i * dim : (i + 1) * dim] = padding[i : i + length, :]
        return spliced

    feats = rng.standard_normal((17, 4)).astype(np.float32)
    for lctx, rctx in [(0, 0), (1, 1), (3, 2), (10, 10)]:
        expected = ref_splice(feats, lctx, rctx)
        got = np.asarray(splice(jnp.asarray(feats), lctx, rctx))
        np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_splice_respects_frame_lens(rng):
    feats = rng.standard_normal((1, 10, 3)).astype(np.float32)
    # element has true length 6; frames 6..9 are garbage padding
    out = np.asarray(splice(jnp.asarray(feats), 0, 2, frame_lens=jnp.asarray([6])))
    # at t=5 (last valid), right context should replicate frame 5, not read frame 6/7
    np.testing.assert_allclose(out[0, 5, 3:6], feats[0, 5], rtol=1e-6)
    np.testing.assert_allclose(out[0, 5, 6:9], feats[0, 5], rtol=1e-6)


def test_stride_and_lens():
    x = jnp.arange(20, dtype=jnp.float32).reshape(1, 10, 2)
    y = stride_subsample(x, 3)
    assert y.shape == (1, 4, 2)
    np.testing.assert_array_equal(np.asarray(strided_len(jnp.asarray([10, 9, 1]), 3)), [4, 3, 1])


def test_apply_cmvn(rng):
    feats = rng.standard_normal((2, 7, 4)).astype(np.float32)
    offset = rng.standard_normal(4).astype(np.float32)
    scale = rng.standard_normal(4).astype(np.float32)
    out = np.asarray(apply_cmvn(jnp.asarray(feats), jnp.asarray(offset), jnp.asarray(scale)))
    np.testing.assert_allclose(out, (feats + offset) * scale, rtol=1e-6)
    out_cmn = np.asarray(apply_cmvn(jnp.asarray(feats), jnp.asarray(offset), jnp.asarray(scale), cmn=True))
    expected = (feats - feats.mean(axis=1, keepdims=True) + offset) * scale
    np.testing.assert_allclose(out_cmn, expected, rtol=1e-5, atol=1e-6)


def test_spec_augment_masks():
    feats = jnp.ones((2, 50, 30))
    out = np.asarray(spec_augment(jax.random.PRNGKey(3), feats, 15, 35))
    assert out.shape == (2, 50, 30)
    assert set(np.unique(out)).issubset({0.0, 1.0})
    # zeros form full rows (time span) and full columns (freq span), same for all batch
    np.testing.assert_array_equal(out[0], out[1])
    zero_cols = np.where((out[0] == 0).all(axis=0))[0]
    if len(zero_cols):
        assert (np.diff(zero_cols) == 1).all()  # contiguous span


def test_fbank_numpy_batch_bitwise():
    # the vectorized CMVN-prep path must be BITWISE equal to the
    # per-frame oracle, including the dither RNG stream
    from pika_tpu.features.fbank import FbankConfig, fbank_numpy, fbank_numpy_batch

    rng = np.random.default_rng(3)
    x = (rng.standard_normal(16000 * 2) * 8000).astype(np.float64)
    for dither in (0.0, 1.0):
        cfg = FbankConfig(sample_frequency=16000, window_type="hamming",
                          dither=dither, low_freq=40.0, high_freq=-200.0,
                          num_mel_bins=40)
        a = fbank_numpy(x, cfg, np.random.default_rng(11) if dither else None)
        b = fbank_numpy_batch(x, cfg, np.random.default_rng(11) if dither else None)
        np.testing.assert_array_equal(a, b)
    # empty input
    assert fbank_numpy_batch(np.zeros(10), cfg, None).shape == (0, 40)
