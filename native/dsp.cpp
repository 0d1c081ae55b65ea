// avsiam-tpu native host DSP library.
//
// The reference's host data plane leans on vendored native code: Kaldi fbank
// DSP inside torchaudio (src/dataloader.py:328) and libsox WAV loading. This
// library provides the equivalents for the TPU framework's host loader:
//   * wav_read_pcm16 — RIFF/WAVE PCM16 parse -> float32 [-1, 1]
//   * mean_center / fit_length — waveform conditioning
//   * fbank — Kaldi-compatible log-mel filterbank (same numerics as
//     avsiam_tpu/ops/fbank.py: framing, DC removal, pre-emphasis 0.97,
//     periodic=False Hann, zero-pad to next pow2, radix-2 FFT power
//     spectrum, triangular mel banks over 1127*ln(1+f/700), log floor at
//     float32 eps)
//
// Exposed with a plain C ABI for ctypes (no pybind11 dependency).
//
// Build: make -C native   (produces libavsiam_dsp.so)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

constexpr float kEps = 1.1920928955078125e-07f;  // float32 eps
constexpr double kPi = 3.14159265358979323846;

int next_pow2(int n) {
  int p = 1;
  while (p < n) p <<= 1;
  return p;
}

// Iterative radix-2 complex FFT (in-place, size must be a power of two).
void fft_radix2(std::vector<double>& re, std::vector<double>& im) {
  const int n = static_cast<int>(re.size());
  // bit reversal
  for (int i = 1, j = 0; i < n; ++i) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  for (int len = 2; len <= n; len <<= 1) {
    const double ang = -2.0 * kPi / len;
    const double wr = std::cos(ang), wi = std::sin(ang);
    for (int i = 0; i < n; i += len) {
      double cur_r = 1.0, cur_i = 0.0;
      for (int k = 0; k < len / 2; ++k) {
        const double ur = re[i + k], ui = im[i + k];
        const double vr = re[i + k + len / 2] * cur_r -
                          im[i + k + len / 2] * cur_i;
        const double vi = re[i + k + len / 2] * cur_i +
                          im[i + k + len / 2] * cur_r;
        re[i + k] = ur + vr;
        im[i + k] = ui + vi;
        re[i + k + len / 2] = ur - vr;
        im[i + k + len / 2] = ui - vi;
        const double nr = cur_r * wr - cur_i * wi;
        cur_i = cur_r * wi + cur_i * wr;
        cur_r = nr;
      }
    }
  }
}

double mel_scale(double freq) { return 1127.0 * std::log(1.0 + freq / 700.0); }

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// WAV
// ---------------------------------------------------------------------------

// Parse an in-memory RIFF/WAVE file. Returns 0 on success. On success fills
// *num_samples (per channel), *num_channels, *sample_rate; if out != nullptr
// writes interleaved-averaged MONO float32 samples (caller allocates
// num_samples floats after a first sizing call with out == nullptr).
int wav_read_pcm16(const uint8_t* data, int64_t size, float* out,
                   int64_t* num_samples, int32_t* num_channels,
                   int32_t* sample_rate) {
  if (size < 44 || std::memcmp(data, "RIFF", 4) != 0 ||
      std::memcmp(data + 8, "WAVE", 4) != 0)
    return -1;
  int64_t pos = 12;
  int32_t channels = 0, rate = 0;
  int16_t bits = 0, fmt = 0;
  const uint8_t* pcm = nullptr;
  int64_t pcm_bytes = 0;
  while (pos + 8 <= size) {
    const char* id = reinterpret_cast<const char*>(data + pos);
    uint32_t chunk;
    std::memcpy(&chunk, data + pos + 4, 4);
    if (std::memcmp(id, "fmt ", 4) == 0 && pos + 8 + 16 <= size) {
      std::memcpy(&fmt, data + pos + 8, 2);
      int16_t ch16;
      std::memcpy(&ch16, data + pos + 10, 2);
      channels = ch16;
      std::memcpy(&rate, data + pos + 12, 4);
      std::memcpy(&bits, data + pos + 22, 2);
    } else if (std::memcmp(id, "data", 4) == 0) {
      pcm = data + pos + 8;
      pcm_bytes = chunk;
      if (pos + 8 + pcm_bytes > size) pcm_bytes = size - pos - 8;
    }
    // int64 accumulation: a corrupt uint32 chunk size near
    // UINT32_MAX would wrap the advance to 0 and loop forever
    pos += 8 + (int64_t)chunk + (chunk & 1);
  }
  if (!pcm || channels <= 0 || fmt != 1 || bits != 16) return -2;
  const int64_t frames = pcm_bytes / (2 * channels);
  *num_samples = frames;
  *num_channels = channels;
  *sample_rate = rate;
  if (out) {
    const int16_t* s = reinterpret_cast<const int16_t*>(pcm);
    for (int64_t i = 0; i < frames; ++i) {
      double acc = 0.0;
      for (int c = 0; c < channels; ++c) acc += s[i * channels + c];
      out[i] = static_cast<float>(acc / channels / 32768.0);
    }
  }
  return 0;
}

void mean_center(float* x, int64_t n) {
  double m = 0.0;
  for (int64_t i = 0; i < n; ++i) m += x[i];
  m /= static_cast<double>(n);
  for (int64_t i = 0; i < n; ++i) x[i] = static_cast<float>(x[i] - m);
}

// ---------------------------------------------------------------------------
// Kaldi-compatible log-mel fbank
// ---------------------------------------------------------------------------

int fbank_num_frames(int64_t num_samples, double sample_freq,
                     double frame_length_ms, double frame_shift_ms) {
  const int ws = static_cast<int>(sample_freq * frame_length_ms / 1000.0);
  const int sh = static_cast<int>(sample_freq * frame_shift_ms / 1000.0);
  if (num_samples < ws) return 0;
  return 1 + static_cast<int>((num_samples - ws) / sh);
}

// out: [num_frames, num_mel_bins] row-major float32
int fbank(const float* wave, int64_t num_samples, double sample_freq,
          int num_mel_bins, double frame_length_ms, double frame_shift_ms,
          double preemph, int remove_dc, float* out) {
  const int ws = static_cast<int>(sample_freq * frame_length_ms / 1000.0);
  const int sh = static_cast<int>(sample_freq * frame_shift_ms / 1000.0);
  const int padded = next_pow2(ws);
  const int nbins = padded / 2;  // Nyquist column is zero -> skip it
  const int m = fbank_num_frames(num_samples, sample_freq, frame_length_ms,
                                 frame_shift_ms);
  if (m <= 0) return -1;

  // Hann window, periodic=False
  std::vector<double> window(ws);
  for (int i = 0; i < ws; ++i)
    window[i] = 0.5 - 0.5 * std::cos(2.0 * kPi * i / (ws - 1));

  // mel banks [num_mel_bins, nbins]
  const double nyquist = 0.5 * sample_freq;
  const double low = 20.0, high = nyquist;
  const double mel_low = mel_scale(low), mel_high = mel_scale(high);
  const double mel_delta = (mel_high - mel_low) / (num_mel_bins + 1);
  const double bin_width = sample_freq / padded;
  std::vector<double> banks(static_cast<size_t>(num_mel_bins) * nbins, 0.0);
  for (int k = 0; k < num_mel_bins; ++k) {
    const double left = mel_low + k * mel_delta;
    const double center = left + mel_delta;
    const double right = center + mel_delta;
    for (int f = 0; f < nbins; ++f) {
      const double mel = mel_scale(bin_width * f);
      const double up = (mel - left) / (center - left);
      const double down = (right - mel) / (right - center);
      const double w = std::min(up, down);
      if (w > 0.0) banks[static_cast<size_t>(k) * nbins + f] = w;
    }
  }

  std::vector<double> re(padded), im(padded), power(nbins);
  for (int fi = 0; fi < m; ++fi) {
    const float* frame = wave + static_cast<int64_t>(fi) * sh;
    double mean = 0.0;
    if (remove_dc) {
      for (int i = 0; i < ws; ++i) mean += frame[i];
      mean /= ws;
    }
    // dc removal + pre-emphasis (replicated first sample) + window + pad
    for (int i = ws - 1; i >= 0; --i) {
      const double cur = frame[i] - mean;
      const double prev = frame[i > 0 ? i - 1 : 0] - mean;
      re[i] = (cur - preemph * prev) * window[i];
      im[i] = 0.0;
    }
    for (int i = ws; i < padded; ++i) re[i] = im[i] = 0.0;
    fft_radix2(re, im);
    for (int f = 0; f < nbins; ++f)
      power[f] = re[f] * re[f] + im[f] * im[f];
    float* row = out + static_cast<int64_t>(fi) * num_mel_bins;
    for (int k = 0; k < num_mel_bins; ++k) {
      double acc = 0.0;
      const double* b = &banks[static_cast<size_t>(k) * nbins];
      for (int f = 0; f < nbins; ++f) acc += b[f] * power[f];
      row[k] = std::log(std::max(acc, static_cast<double>(kEps)));
    }
  }
  return m;
}

}  // extern "C"
