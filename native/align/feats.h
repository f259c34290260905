// Acoustic feature extraction (MFCC_0_D_A_Z class, 39-dim).
//
// TPU-era replacement for the role HTK's HCopy played in the reference
// pipeline (reference: aligner/align_english.py:243 — 39-dim PLP_0_D_A_Z,
// 10 ms step, 25 ms Hamming window per aligner/english/16000/config).
// Fresh implementation: framing + Hamming + radix-2 FFT + mel filterbank +
// DCT cepstra (c0..c12) + delta/delta-delta + cepstral mean normalisation.
#pragma once

#include <cstdint>
#include <vector>

namespace t2v {

struct FeatConfig {
  int sample_rate = 16000;
  float frame_shift_s = 0.010f;   // TARGETRATE 100000 (100ns units)
  float frame_len_s = 0.025f;     // WINDOWSIZE 250000
  int num_mel = 26;
  int num_ceps = 13;              // c0..c12 ("_0")
  float preemph = 0.97f;
  bool cmn = true;                // "_Z"
};

// samples: mono PCM in [-1, 1]. Returns [num_frames][39] features
// (statics + deltas + delta-deltas).
std::vector<std::vector<float>> ExtractFeatures(const float* samples,
                                                int64_t num_samples,
                                                const FeatConfig& cfg);

int FeatureDim(const FeatConfig& cfg);  // 3 * num_ceps

}  // namespace t2v
