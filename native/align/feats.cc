#include "feats.h"

#include <cmath>
#include <cstring>
#include <stdexcept>

namespace t2v {
namespace {

constexpr float kPi = 3.14159265358979323846f;

int NextPow2(int n) {
  int p = 1;
  while (p < n) p <<= 1;
  return p;
}

// In-place iterative radix-2 complex FFT.
void Fft(std::vector<float>& re, std::vector<float>& im) {
  const int n = static_cast<int>(re.size());
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
    const float ang = -2.0f * kPi / static_cast<float>(len);
    const float wr = std::cos(ang), wi = std::sin(ang);
    for (int i = 0; i < n; i += len) {
      float cr = 1.0f, ci = 0.0f;
      for (int k = 0; k < len / 2; ++k) {
        const int a = i + k, b = i + k + len / 2;
        const float xr = re[b] * cr - im[b] * ci;
        const float xi = re[b] * ci + im[b] * cr;
        re[b] = re[a] - xr;
        im[b] = im[a] - xi;
        re[a] += xr;
        im[a] += xi;
        const float ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = ncr;
      }
    }
  }
}

float HzToMel(float hz) { return 1127.0f * std::log1p(hz / 700.0f); }

// Triangular mel filterbank over FFT bins [0, nfft/2].
std::vector<std::vector<float>> MelBank(int num_mel, int nfft, int sr) {
  const float mel_lo = HzToMel(0.0f);
  const float mel_hi = HzToMel(static_cast<float>(sr) / 2.0f);
  std::vector<float> centers(num_mel + 2);
  for (int i = 0; i < num_mel + 2; ++i) {
    const float mel = mel_lo + (mel_hi - mel_lo) * i / (num_mel + 1);
    const float hz = 700.0f * (std::exp(mel / 1127.0f) - 1.0f);
    centers[i] = hz * nfft / static_cast<float>(sr);
  }
  std::vector<std::vector<float>> bank(num_mel,
                                       std::vector<float>(nfft / 2 + 1, 0.0f));
  for (int m = 0; m < num_mel; ++m) {
    const float l = centers[m], c = centers[m + 1], r = centers[m + 2];
    for (int k = 0; k <= nfft / 2; ++k) {
      const float f = static_cast<float>(k);
      if (f > l && f < c) {
        bank[m][k] = (f - l) / (c - l);
      } else if (f >= c && f < r) {
        bank[m][k] = (r - f) / (r - c);
      }
    }
  }
  return bank;
}

// Appends first-order regression deltas of columns [lo, lo+width) over a
// +-2 frame window to each row.
void AddDeltas(std::vector<std::vector<float>>& feats, int lo, int width) {
  const int t_max = static_cast<int>(feats.size());
  const int win = 2;
  float denom = 0.0f;
  for (int d = 1; d <= win; ++d) denom += 2.0f * d * d;
  for (int t = 0; t < t_max; ++t) {
    for (int c = 0; c < width; ++c) {
      float acc = 0.0f;
      for (int d = 1; d <= win; ++d) {
        const int tp = std::min(t + d, t_max - 1);
        const int tm = std::max(t - d, 0);
        acc += d * (feats[tp][lo + c] - feats[tm][lo + c]);
      }
      feats[t].push_back(acc / denom);
    }
  }
}

// Equal-loudness weight at frequency hz (the PLP psychophysical curve).
float EqualLoudness(float hz) {
  const float f2 = hz * hz;
  const float a = f2 / (f2 + 1.6e5f);
  return a * a * (f2 + 1.44e6f) / (f2 + 9.61e6f);
}

// Levinson-Durbin: autocorrelation r[0..p] -> LPC a[1..p]; returns the
// final prediction-error energy E.
float Levinson(const std::vector<float>& r, int p, std::vector<float>& a) {
  a.assign(p + 1, 0.0f);
  float e = r[0];
  if (e <= 0.0f) return 1e-10f;
  std::vector<float> prev(p + 1, 0.0f);
  for (int i = 1; i <= p; ++i) {
    float acc = r[i];
    for (int j = 1; j < i; ++j) acc -= a[j] * r[i - j];
    const float k = acc / e;
    prev = a;
    a[i] = k;
    for (int j = 1; j < i; ++j) a[j] = prev[j] - k * prev[i - j];
    e *= (1.0f - k * k);
    if (e <= 0.0f) return 1e-10f;
  }
  return e;
}

// LPC -> cepstra (c1..c{n}), the standard recursion; c0 = ln(gain).
void LpcToCepstrum(const std::vector<float>& a, float gain, int num_ceps,
                   std::vector<float>& ceps) {
  const int p = static_cast<int>(a.size()) - 1;
  ceps.assign(num_ceps, 0.0f);
  ceps[0] = std::log(std::max(gain, 1e-10f));
  for (int n = 1; n < num_ceps; ++n) {
    float acc = n <= p ? a[n] : 0.0f;
    for (int k = 1; k < n; ++k) {
      if (n - k <= p) acc += (static_cast<float>(k) / n) * ceps[k] * a[n - k];
    }
    ceps[n] = acc;
  }
}

}  // namespace

int FeatureDim(const FeatConfig& cfg) { return 3 * cfg.num_ceps; }

std::vector<std::vector<float>> ExtractFeatures(const float* samples,
                                                int64_t num_samples,
                                                const FeatConfig& cfg) {
  const int shift = static_cast<int>(cfg.frame_shift_s * cfg.sample_rate + 0.5f);
  const int flen = static_cast<int>(cfg.frame_len_s * cfg.sample_rate + 0.5f);
  const int nfft = NextPow2(flen);
  const int num_frames =
      num_samples < flen
          ? 0
          : 1 + static_cast<int>((num_samples - flen) / shift);
  std::vector<std::vector<float>> feats;
  if (num_frames <= 0) return feats;
  feats.reserve(num_frames);

  std::vector<float> window(flen);
  for (int i = 0; i < flen; ++i) {
    window[i] = 0.54f - 0.46f * std::cos(2.0f * kPi * i / (flen - 1));
  }
  const bool plp = cfg.kind == FeatKind::kPLP;
  const int num_mel = plp ? 20 : cfg.num_mel;  // NUMCHANS = 20 for PLP
  const auto bank = MelBank(num_mel, nfft, cfg.sample_rate);

  // Filter centre frequencies (Hz) for the equal-loudness weights.
  std::vector<float> eql(num_mel);
  {
    const float mel_hi = HzToMel(static_cast<float>(cfg.sample_rate) / 2.0f);
    for (int m = 0; m < num_mel; ++m) {
      const float mel = mel_hi * (m + 1) / (num_mel + 1);
      eql[m] = EqualLoudness(700.0f * (std::exp(mel / 1127.0f) - 1.0f));
    }
  }
  std::vector<float> lifter(cfg.num_ceps, 1.0f);
  if (plp && cfg.ceplifter > 0) {
    for (int n = 1; n < cfg.num_ceps; ++n) {
      lifter[n] = 1.0f + 0.5f * cfg.ceplifter *
                             std::sin(kPi * n / cfg.ceplifter);
    }
  }

  // Precompute DCT-II basis (orthonormal), c0..c{num_ceps-1} over num_mel.
  std::vector<std::vector<float>> dct(cfg.num_ceps,
                                      std::vector<float>(num_mel));
  for (int k = 0; k < cfg.num_ceps; ++k) {
    const float norm = std::sqrt((k == 0 ? 1.0f : 2.0f) / num_mel);
    for (int m = 0; m < num_mel; ++m) {
      dct[k][m] = norm * std::cos(kPi * k * (m + 0.5f) / num_mel);
    }
  }

  std::vector<float> re(nfft), im(nfft);
  std::vector<float> fb(num_mel), r(cfg.lpc_order + 1), a;
  for (int t = 0; t < num_frames; ++t) {
    const float* frame = samples + static_cast<int64_t>(t) * shift;
    std::fill(re.begin(), re.end(), 0.0f);
    std::fill(im.begin(), im.end(), 0.0f);
    float prev = frame[0];
    for (int i = 0; i < flen; ++i) {
      const float s = frame[i] - cfg.preemph * (i > 0 ? frame[i - 1] : prev);
      re[i] = s * window[i];
    }
    Fft(re, im);
    for (int m = 0; m < num_mel; ++m) {
      float e = 0.0f;
      const auto& filt = bank[m];
      for (int k = 0; k <= nfft / 2; ++k) {
        if (filt[k] > 0.0f) {
          e += filt[k] * (re[k] * re[k] + im[k] * im[k]);
        }
      }
      fb[m] = e;
    }
    std::vector<float> ceps(cfg.num_ceps, 0.0f);
    if (!plp) {
      for (int k = 0; k < cfg.num_ceps; ++k) {
        float acc = 0.0f;
        for (int m = 0; m < num_mel; ++m) {
          acc += dct[k][m] * std::log(std::max(fb[m], 1e-10f));
        }
        ceps[k] = acc;
      }
    } else {
      // PLP: equal-loudness weighting + cube-root loudness compression,
      // inverse cosine transform to autocorrelation, LPC analysis,
      // LPC-to-cepstra, liftering.
      std::vector<float> pl(num_mel);
      for (int m = 0; m < num_mel; ++m) {
        pl[m] = std::pow(std::max(eql[m] * fb[m], 1e-10f), cfg.compress);
      }
      const int mp1 = num_mel + 1;
      for (int i = 0; i <= cfg.lpc_order; ++i) {
        // Symmetric spectrum of length 2*(M+1): endpoints duplicated.
        float acc = pl[0] + pl[num_mel - 1] * std::cos(kPi * i);
        for (int m = 1; m <= num_mel; ++m) {
          acc += 2.0f * pl[m - 1] * std::cos(kPi * i * m / mp1);
        }
        r[i] = acc / (2.0f * mp1);
      }
      const float gain = Levinson(r, cfg.lpc_order, a);
      LpcToCepstrum(a, gain, cfg.num_ceps, ceps);
      for (int n = 0; n < cfg.num_ceps; ++n) ceps[n] *= lifter[n];
    }
    feats.push_back(std::move(ceps));
  }

  if (cfg.cmn) {
    std::vector<float> mean(cfg.num_ceps, 0.0f);
    for (const auto& f : feats) {
      for (int c = 0; c < cfg.num_ceps; ++c) mean[c] += f[c];
    }
    for (int c = 0; c < cfg.num_ceps; ++c) mean[c] /= feats.size();
    for (auto& f : feats) {
      for (int c = 0; c < cfg.num_ceps; ++c) f[c] -= mean[c];
    }
  }

  AddDeltas(feats, 0, cfg.num_ceps);                // deltas
  AddDeltas(feats, cfg.num_ceps, cfg.num_ceps);     // delta-deltas
  return feats;
}

}  // namespace t2v
