"""Kaldi-semantics log-mel filterbank — fused, batched, on-device.

Replaces PyKaldi's C++ ``Fbank`` (reference: loader/otf_utt_loader.py:195-201,
232-234; config egs/fbank.conf) with a single jittable JAX function:

    frames → (dither) → remove-DC → pre-emphasis → window → rFFT →
    power spectrum → mel filterbank matmul (MXU) → log

Semantics follow Kaldi's feature-window.cc / feature-fbank.cc / mel-computations.cc:
  * snip-edges frame count: ``1 + (num_samples - frame_length) // frame_shift``
  * remove_dc_offset=True, preemph 0.97 with ``wave[0] *= (1 - coeff)``
  * window padded to the next power of two before the FFT
  * mel banks over fft bins ``[0, N/2)`` with MelScale(f) = 1127·ln(1 + f/700),
    low/high cutoffs from the conf (negative high_freq is relative to Nyquist,
    egs/fbank.conf:5)
  * log-energy floor at float epsilon

Input samples are in int16 scale (±32768), matching the reference which
converts float32 audio back to int16 before feature extraction
(loader/otf_utt_loader.py:230-234).

A literal per-frame float64 NumPy implementation (``fbank_numpy``) serves
as the parity oracle for tests (BASELINE.md: ≤1e-4 rel err).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_FLT_EPSILON = float(np.finfo(np.float32).eps)


@dataclasses.dataclass(frozen=True)
class FbankConfig:
    sample_frequency: float = 16000.0
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    num_mel_bins: int = 23
    low_freq: float = 20.0
    high_freq: float = 0.0  # <= 0: offset from Nyquist
    dither: float = 1.0
    preemphasis_coefficient: float = 0.97
    remove_dc_offset: bool = True
    window_type: str = "povey"
    round_to_power_of_two: bool = True
    use_log_fbank: bool = True
    use_power: bool = True
    snip_edges: bool = True

    @property
    def frame_length(self) -> int:
        return int(self.sample_frequency * 0.001 * self.frame_length_ms)

    @property
    def frame_shift(self) -> int:
        return int(self.sample_frequency * 0.001 * self.frame_shift_ms)

    @property
    def padded_window_size(self) -> int:
        n = self.frame_length
        if self.round_to_power_of_two:
            p = 1
            while p < n:
                p *= 2
            return p
        return n

    @classmethod
    def from_conf(cls, path: str) -> "FbankConfig":
        """Parse a Kaldi-style conf file (e.g. egs/fbank.conf)."""
        kv = {}
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.split("#")[0].strip()
                if not line.startswith("--"):
                    continue
                key, _, val = line[2:].partition("=")
                kv[key.strip().replace("-", "_")] = val.strip()
        kwargs = {}
        mapping = {
            "sample_frequency": ("sample_frequency", float),
            "frame_length": ("frame_length_ms", float),
            "frame_shift": ("frame_shift_ms", float),
            "num_mel_bins": ("num_mel_bins", int),
            "low_freq": ("low_freq", float),
            "high_freq": ("high_freq", float),
            "dither": ("dither", float),
            "preemphasis_coefficient": ("preemphasis_coefficient", float),
            "remove_dc_offset": ("remove_dc_offset", lambda s: s.lower() == "true"),
            "window_type": ("window_type", str),
            "round_to_power_of_two": ("round_to_power_of_two", lambda s: s.lower() == "true"),
            "use_log_fbank": ("use_log_fbank", lambda s: s.lower() == "true"),
            "use_power": ("use_power", lambda s: s.lower() == "true"),
            "snip_edges": ("snip_edges", lambda s: s.lower() == "true"),
        }
        for key, val in kv.items():
            if key in mapping:
                field, conv = mapping[key]
                kwargs[field] = conv(val)
        return cls(**kwargs)


def feature_window(config: FbankConfig, dtype=np.float64) -> np.ndarray:
    """The analysis window function (feature-window.cc:FeatureWindowFunction)."""
    n = config.frame_length
    a = 2.0 * math.pi / (n - 1)
    i = np.arange(n, dtype=np.float64)
    if config.window_type == "hanning":
        w = 0.5 - 0.5 * np.cos(a * i)
    elif config.window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(a * i)
    elif config.window_type == "povey":
        w = (0.5 - 0.5 * np.cos(a * i)) ** 0.85
    elif config.window_type == "rectangular":
        w = np.ones(n)
    elif config.window_type == "blackman":
        blackman_coeff = 0.42
        w = blackman_coeff - 0.5 * np.cos(a * i) + (0.5 - blackman_coeff) * np.cos(2 * a * i)
    else:
        raise ValueError(f"unknown window type {config.window_type}")
    return w.astype(dtype)


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


def mel_banks_matrix(config: FbankConfig, dtype=np.float64) -> np.ndarray:
    """Dense (num_fft_bins, num_mel_bins) mel weight matrix.

    Follows mel-computations.cc: triangular filters in mel space over fft
    bins ``[0, padded_window/2)``; negative high_freq means Nyquist+high.
    """
    num_fft_bins = config.padded_window_size // 2
    nyquist = 0.5 * config.sample_frequency
    low_freq = config.low_freq
    high_freq = config.high_freq if config.high_freq > 0.0 else nyquist + config.high_freq
    if not (0.0 <= low_freq < nyquist and 0.0 < high_freq <= nyquist and low_freq < high_freq):
        raise ValueError(f"bad mel frequency range [{low_freq}, {high_freq}]")
    fft_bin_width = config.sample_frequency / config.padded_window_size
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (config.num_mel_bins + 1)

    fft_freqs = fft_bin_width * np.arange(num_fft_bins, dtype=np.float64)
    mel = mel_scale(fft_freqs)  # (num_fft_bins,)
    bins = np.arange(config.num_mel_bins, dtype=np.float64)
    left = mel_low + bins * mel_delta  # (num_mel_bins,)
    center = mel_low + (bins + 1.0) * mel_delta
    right = mel_low + (bins + 2.0) * mel_delta
    up = (mel[:, None] - left[None, :]) / (center - left)[None, :]
    down = (right[None, :] - mel[:, None]) / (right - center)[None, :]
    weights = np.where((mel[:, None] > left) & (mel[:, None] < right), np.minimum(up, down), 0.0)
    return np.maximum(weights, 0.0).astype(dtype)


def num_frames(num_samples, config: FbankConfig):
    """Frame count (snip_edges=True semantics) — works on ints or arrays."""
    return jnp.maximum(
        0, 1 + (num_samples - config.frame_length) // config.frame_shift
    ) if isinstance(num_samples, jnp.ndarray) else max(
        0, 1 + (int(num_samples) - config.frame_length) // config.frame_shift
    )


# ---------------------------------------------------------------------------
# NumPy parity oracle — literal Kaldi per-frame algorithm in float64.
# ---------------------------------------------------------------------------

def fbank_numpy(samples: np.ndarray, config: FbankConfig, dither_rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Compute fbank features with a literal per-frame loop (test oracle).

    Per-operation provenance (Kaldi sources; PyKaldi binds these exact C++
    functions, so this is the semantics the reference executes through
    loader/otf_utt_loader.py:195-201):

    * frame count, snip_edges=True: ``1 + (num_samples - frame_length) /
      frame_shift`` — feature-window.cc ``NumFrames`` (the
      ``snip_edges`` branch: ``(num_samples - window_size)/frame_shift + 1``).
    * frame extraction at ``t*frame_shift`` — feature-window.cc
      ``ExtractWindow`` with snip_edges (no reflection padding).
    * dither: ``frame += dither * RandGauss()`` per sample, BEFORE dc/preemph
      — feature-window.cc ``Dither`` called first in ``ProcessWindow``.
    * remove_dc_offset: subtract the frame mean — ``ProcessWindow``
      (``window->Add(-window->Sum()/frame_length)``).
    * pre-emphasis: right-to-left ``w[i] -= c*w[i-1]`` with the boundary
      convention ``w[0] -= c*w[0]`` — feature-window.cc ``Preemphasize``.
    * window function applied AFTER preemph — ``ProcessWindow``;
      coefficients in ``FeatureWindowFunction`` (hamming
      ``0.54 - 0.46 cos``, povey ``(0.5 - 0.5 cos)^0.85``, denominator
      ``frame_length - 1``).
    * zero-pad to the next power of two, then real FFT; power spectrum
      ``re^2 + im^2`` — feature-fbank.cc ``FbankComputer::Compute`` +
      srfft; mel weights only read bins ``[0, N/2)`` (the Nyquist bin is
      dropped: mel-computations.cc builds ``num_fft_bins = window/2``
      triangles).
    * mel filters: triangles linear in mel space, ``mel = 1127 ln(1+f/700)``
      (``MelScale``), band edges ``low + i*delta`` with ``delta =
      (mel_high - mel_low)/(num_bins+1)``; ``high_freq <= 0`` means
      ``nyquist + high_freq`` — mel-computations.cc ``MelBanks::MelBanks``.
    * log floor: ``log(max(e, FLT_EPSILON))`` (use_log_fbank) —
      feature-fbank.cc (``ApplyFloor(FLT_EPSILON); ApplyLog()``).
    * input scale: int16-valued floats (Kaldi wave data convention); the
      reference converts augmented float32 audio back to int16 bytes before
      feature extraction (otf_utt_loader.py:230-234).

    Not implemented (unused by the reference's fbank.conf): use_energy,
    raw_energy, snip_edges=False reflection, vtln warping, htk_compat.
    """
    samples = np.asarray(samples, dtype=np.float64)
    n_frames = num_frames(len(samples), config)
    flen, fshift = config.frame_length, config.frame_shift
    window = feature_window(config)
    mel = mel_banks_matrix(config)
    out = np.zeros((n_frames, config.num_mel_bins), dtype=np.float64)
    padded = config.padded_window_size
    for t in range(n_frames):
        frame = samples[t * fshift : t * fshift + flen].copy()
        if config.dither != 0.0 and dither_rng is not None:
            frame += config.dither * dither_rng.standard_normal(flen)
        if config.remove_dc_offset:
            frame -= frame.mean()
        if config.preemphasis_coefficient != 0.0:
            c = config.preemphasis_coefficient
            frame[1:] -= c * frame[:-1]
            frame[0] -= c * frame[0]
        frame *= window
        spec = np.fft.rfft(frame, n=padded)
        power = np.abs(spec) ** 2 if config.use_power else np.abs(spec)
        energies = power[: padded // 2] @ mel
        if config.use_log_fbank:
            energies = np.log(np.maximum(energies, _FLT_EPSILON))
        out[t] = energies
    return out.astype(np.float32)


def fbank_numpy_batch(samples: np.ndarray, config: FbankConfig,
                      dither_rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Vectorized float64 fbank, bit-identical to ``fbank_numpy``.

    Same math as the per-frame oracle above but with the frame loop
    vectorized (the host CMVN prep over a whole corpus was paying one
    Python rfft per frame).  Every vectorized step is bitwise-equal to
    the loop version on this platform — batched ``standard_normal``
    draws the same stream as sequential per-frame draws, and numpy's
    row-wise mean/rfft match the 1-D calls — EXCEPT the final mel
    projection, where dgemm and dgemv order sums differently; that one
    stays a per-frame dgemv.  Pinned by
    ``test_features.py::test_fbank_numpy_batch_bitwise``.
    """
    samples = np.asarray(samples, dtype=np.float64)
    n_frames = num_frames(len(samples), config)
    flen, fshift = config.frame_length, config.frame_shift
    if n_frames <= 0:
        return np.zeros((0, config.num_mel_bins), dtype=np.float32)
    window = feature_window(config)
    mel = mel_banks_matrix(config)
    padded = config.padded_window_size
    idx = np.arange(n_frames)[:, None] * fshift + np.arange(flen)[None, :]
    frames = samples[idx]  # (n_frames, flen), rows contiguous
    if config.dither != 0.0 and dither_rng is not None:
        frames += config.dither * dither_rng.standard_normal((n_frames, flen))
    if config.remove_dc_offset:
        frames -= frames.mean(axis=1, keepdims=True)
    if config.preemphasis_coefficient != 0.0:
        c = config.preemphasis_coefficient
        first = frames[:, 0] - c * frames[:, 0]
        frames[:, 1:] -= c * frames[:, :-1]
        frames[:, 0] = first
    frames *= window
    spec = np.fft.rfft(frames, n=padded, axis=1)
    power = np.abs(spec) ** 2 if config.use_power else np.abs(spec)
    half = power[:, : padded // 2]
    out = np.empty((n_frames, config.num_mel_bins), dtype=np.float64)
    for t in range(n_frames):  # dgemv per frame: bitwise parity with the oracle
        out[t] = half[t] @ mel
    if config.use_log_fbank:
        out = np.log(np.maximum(out, _FLT_EPSILON))
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# JAX batched implementation.
# ---------------------------------------------------------------------------

def make_fbank_fn(config: FbankConfig, max_samples: int):
    """Build a jittable batched fbank over padded waveforms.

    Returns ``fbank(waveforms[B, max_samples], num_samples[B], key?) ->
    (feats[B, max_frames, num_mel_bins], frame_lens[B])``.  Frames past a
    batch element's true length are computed on padding and must be masked
    by the caller via ``frame_lens``.
    """
    flen, fshift = config.frame_length, config.frame_shift
    padded = config.padded_window_size
    max_frames = max(0, 1 + (max_samples - flen) // fshift)
    window = jnp.asarray(feature_window(config, np.float32))
    mel = jnp.asarray(mel_banks_matrix(config, np.float32))
    preemph = config.preemphasis_coefficient

    frame_starts = np.arange(max_frames) * fshift
    gather_idx = frame_starts[:, None] + np.arange(flen)[None, :]
    gather_idx = jnp.asarray(gather_idx)

    # Matmul-DFT: XLA's FFT lowering is slow on TPU, while a dense
    # (flen, padded/2) cos/sin projection runs on the MXU — zero-padding
    # the window to ``padded`` is equivalent to truncating the DFT basis
    # to the first ``flen`` rows.  Only bins [0, padded/2) are needed
    # (the mel banks never read Nyquist).  HIGHEST precision keeps the
    # f32 accuracy the ≤1e-4 parity tests require (default TPU matmul
    # precision is bf16 multiplies).
    _n = np.arange(flen, dtype=np.float64)[:, None]
    _k = np.arange(padded // 2, dtype=np.float64)[None, :]
    _ang = 2.0 * np.pi * _n * _k / padded
    dft_cos = jnp.asarray(np.cos(_ang).astype(np.float32))
    dft_sin = jnp.asarray(np.sin(_ang).astype(np.float32))

    def fbank(waveforms: jnp.ndarray, num_samples: jnp.ndarray, key: Optional[jax.Array] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = waveforms.astype(jnp.float32)
        frames = x[:, gather_idx]  # (B, F, flen)
        if config.dither != 0.0 and key is not None:
            frames = frames + config.dither * jax.random.normal(key, frames.shape, jnp.float32)
        if config.remove_dc_offset:
            frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
        if preemph != 0.0:
            shifted = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
            frames = frames - preemph * shifted
        frames = frames * window
        re = jnp.einsum("bfn,nk->bfk", frames, dft_cos,
                        precision=jax.lax.Precision.HIGHEST)
        im = jnp.einsum("bfn,nk->bfk", frames, dft_sin,
                        precision=jax.lax.Precision.HIGHEST)
        power = re ** 2 + im ** 2
        if not config.use_power:
            power = jnp.sqrt(power)
        energies = jnp.einsum(
            "bfk,km->bfm", power, mel,
            preferred_element_type=jnp.float32,
        )
        if config.use_log_fbank:
            energies = jnp.log(jnp.maximum(energies, _FLT_EPSILON))
        frame_lens = jnp.maximum(0, 1 + (num_samples - flen) // fshift)
        return energies, frame_lens

    return fbank
