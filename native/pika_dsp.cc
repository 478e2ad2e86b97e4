// pika_tpu native DSP — the host-side per-utterance hot loop.
//
// The reference leans on Kaldi C++ (feature extraction) and numpy for its
// loader DSP (loader/otf_utt_loader.py:220-234).  Here feature extraction
// lives on the TPU; what remains on host per utterance is the
// shape-changing augmentation chain:
//     int16 → float32 [-1,1) → linear-interp speed perturb →
//     RMS normalize to a target dB → int16 saturation → float32
// This file implements that chain in C++ (exact numpy semantics:
// np.interp onto linspace(0, n, n/rate); RMS in float64), exported with a
// C ABI for ctypes.  Python loader threads call it with the GIL released,
// so augmentation parallelizes across real threads.
//
// Build: make -C native   (produces libpika_dsp.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Convert int16 PCM to [-1,1) float32 (audio.py:562-576 semantics).
void pika_i16_to_f32(const int16_t* pcm, int64_t n, float* out) {
  const float scale = 1.0f / 32768.0f;
  for (int64_t i = 0; i < n; ++i) out[i] = pcm[i] * scale;
}

// Linear-interpolation speed perturbation, exact np.interp semantics:
// new_indices = linspace(0, n, new_len) over xp = arange(n).
// Returns the new length (n unchanged when rate == 1).
int64_t pika_change_speed(const float* in, int64_t n, double rate,
                          float* out, int64_t out_cap) {
  if (rate == 1.0 || n == 0) {
    int64_t m = std::min(n, out_cap);
    std::memcpy(out, in, m * sizeof(float));
    return m;
  }
  int64_t new_len = (int64_t)(n / rate);
  if (new_len > out_cap) new_len = out_cap;
  if (new_len <= 0) return 0;
  const double step = (new_len > 1) ? (double)n / (double)(new_len - 1) : 0.0;
  const int64_t last = n - 1;
  for (int64_t j = 0; j < new_len; ++j) {
    double x = step * (double)j;
    if (x >= (double)last) {
      out[j] = in[last];
    } else {
      int64_t i0 = (int64_t)x;
      double frac = x - (double)i0;
      out[j] = (float)((1.0 - frac) * in[i0] + frac * in[i0 + 1]);
    }
  }
  return new_len;
}

// RMS in dB (float64 accumulation, floor 1e-20; audio.py:545-552).
double pika_rms_db(const float* x, int64_t n) {
  double acc = 0.0;
  for (int64_t i = 0; i < n; ++i) acc += (double)x[i] * (double)x[i];
  double mean_square = n > 0 ? acc / (double)n : 0.0;
  if (mean_square < 1e-20) mean_square = 1e-20;
  return 10.0 * std::log10(mean_square);
}

// Normalize to target RMS dB, capped at max_gain_db (audio.py:240-262).
// Returns 0 on success, -1 if required gain exceeds max_gain_db.
int pika_normalize(float* x, int64_t n, double target_db, double max_gain_db) {
  double gain = target_db - pika_rms_db(x, n);
  if (gain > max_gain_db) return -1;
  float g = (float)std::pow(10.0, std::min(gain, max_gain_db) / 20.0);
  for (int64_t i = 0; i < n; ++i) x[i] *= g;
  return 0;
}

// float32 [-1,1) → int16 saturation → float32 in int16 scale — the
// round-trip the reference performs before Kaldi fbank
// (otf_utt_loader.py:230-234 + audio.py:578-603).
void pika_f32_to_i16_scale(const float* in, int64_t n, float* out) {
  for (int64_t i = 0; i < n; ++i) {
    float v = in[i] * 32768.0f;
    if (v > 32767.0f) v = 32767.0f;
    if (v < -32768.0f) v = -32768.0f;
    out[i] = (float)(int16_t)v;
  }
}

// Fused per-utterance augmentation chain.  Writes int16-scale float32
// into `out`; returns the output length, or -(1) on normalize failure.
int64_t pika_augment_i16(const int16_t* pcm, int64_t n,
                         double speed_rate, double target_db,
                         double max_gain_db, int do_normalize,
                         float* out, int64_t out_cap,
                         float* scratch /* >= n floats */) {
  pika_i16_to_f32(pcm, n, scratch);
  int64_t m = pika_change_speed(scratch, n, speed_rate, out, out_cap);
  if (do_normalize) {
    if (pika_normalize(out, m, target_db, max_gain_db) != 0) return -1;
  }
  // in-place int16 round trip
  pika_f32_to_i16_scale(out, m, out);
  return m;
}

// Levenshtein distance between two int sequences (two-row DP) —
// native replacement for the `editdistance` pip (MBR host-side checks).
int64_t pika_edit_distance(const int32_t* a, int64_t n,
                           const int32_t* b, int64_t m) {
  if (n == 0) return m;
  if (m == 0) return n;
  int64_t* prev = new int64_t[m + 1];
  int64_t* cur = new int64_t[m + 1];
  for (int64_t j = 0; j <= m; ++j) prev[j] = j;
  for (int64_t i = 1; i <= n; ++i) {
    cur[0] = i;
    for (int64_t j = 1; j <= m; ++j) {
      int64_t sub = prev[j - 1] + (a[i - 1] != b[j - 1] ? 1 : 0);
      int64_t del = prev[j] + 1;
      int64_t ins = cur[j - 1] + 1;
      cur[j] = std::min(sub, std::min(del, ins));
    }
    std::swap(prev, cur);
  }
  int64_t result = prev[m];
  delete[] prev;
  delete[] cur;
  return result;
}

}  // extern "C"
