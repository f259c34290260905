#include "hmm.h"

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <fstream>
#include <limits>
#include <sstream>

namespace t2v {

namespace {
constexpr float kLogZero = -1e30f;
constexpr float kVarFloor = 1e-3f;
constexpr double kLog2Pi = 1.8378770664093453;
}  // namespace

void Gaussian::Finalize() {
  double acc = mean.size() * kLog2Pi;
  for (float iv : inv_var) acc -= std::log(static_cast<double>(iv));
  gconst = static_cast<float>(-0.5 * acc);
}

float Gaussian::LogLik(const float* x, int dim) const {
  float acc = 0.0f;
  for (int d = 0; d < dim; ++d) {
    const float diff = x[d] - mean[d];
    acc += diff * diff * inv_var[d];
  }
  return gconst - 0.5f * acc + log_weight;
}

float State::LogLik(const float* x, int dim) const {
  float best = kLogZero;
  for (const auto& g : mix) best = std::max(best, g.LogLik(x, dim));
  // Max-approximation over mixtures (Viterbi-style); exact log-sum-exp
  // changes alignments negligibly and costs an exp per mixture.
  return best;
}

int AcousticModel::PhoneId(const std::string& name) const {
  for (size_t i = 0; i < phones.size(); ++i) {
    if (phones[i].name == name) return static_cast<int>(i);
  }
  return -1;
}

bool AcousticModel::Save(const std::string& path) const {
  std::ofstream f(path);
  if (!f) return false;
  f << "T2VAM 2\n" << feat_kind << "\n" << dim << " " << phones.size()
    << "\n";
  for (const auto& p : phones) {
    f << p.name << " " << p.states.size() << "\n";
    for (const auto& s : p.states) {
      f << s.self_loop_logp << " " << s.forward_logp << " " << s.mix.size()
        << "\n";
      for (const auto& g : s.mix) {
        f << g.log_weight;
        for (float v : g.mean) f << " " << v;
        for (float v : g.inv_var) f << " " << v;
        f << "\n";
      }
    }
  }
  return f.good();
}

bool AcousticModel::Load(const std::string& path) {
  std::ifstream f(path);
  if (!f) return false;
  std::string magic;
  int version = 0;
  f >> magic >> version;
  if (magic != "T2VAM" || (version != 1 && version != 2)) return false;
  feat_kind = 0;
  if (version >= 2) f >> feat_kind;
  size_t num_phones = 0;
  f >> dim >> num_phones;
  phones.assign(num_phones, Phone());
  for (auto& p : phones) {
    size_t num_states = 0;
    f >> p.name >> num_states;
    p.states.assign(num_states, State());
    for (auto& s : p.states) {
      size_t num_mix = 0;
      f >> s.self_loop_logp >> s.forward_logp >> num_mix;
      s.mix.assign(num_mix, Gaussian());
      for (auto& g : s.mix) {
        f >> g.log_weight;
        g.mean.resize(dim);
        g.inv_var.resize(dim);
        for (int d = 0; d < dim; ++d) f >> g.mean[d];
        for (int d = 0; d < dim; ++d) f >> g.inv_var[d];
        g.Finalize();
      }
    }
  }
  return f.good() || f.eof();
}

// ---- Viterbi forced alignment ------------------------------------------

namespace {

// Flattened decoding lattice over segments x pronunciation variants.
// Each (segment, variant) is a linear chain of emitting states; chains of
// one segment share entry/exit points. Skippable segments add bypass arcs.
struct Lattice {
  std::vector<const State*> states;
  std::vector<int> seg_of_state;
  std::vector<int> var_of_state;      // variant within segment
  std::vector<int> phone_pos_of_state;  // phone position within variant
  std::vector<int> phone_id_of_state;
  std::vector<int> state_in_phone;    // emitting-state index within phone
  std::vector<unsigned char> is_chain_first;  // first state of its chain
  // Per segment: indices of each variant's first/last lattice state.
  std::vector<std::vector<int>> seg_firsts, seg_lasts;
};

Lattice BuildLattice(const AcousticModel& model,
                     const std::vector<Segment>& segments) {
  Lattice lat;
  for (size_t i = 0; i < segments.size(); ++i) {
    lat.seg_firsts.emplace_back();
    lat.seg_lasts.emplace_back();
    for (size_t v = 0; v < segments[i].variants.size(); ++v) {
      lat.seg_firsts[i].push_back(static_cast<int>(lat.states.size()));
      const auto& ids = segments[i].variants[v].phone_ids;
      for (size_t k = 0; k < ids.size(); ++k) {
        const Phone& p = model.phones[ids[k]];
        for (size_t s = 0; s < p.states.size(); ++s) {
          lat.is_chain_first.push_back(k == 0 && s == 0 ? 1 : 0);
          lat.states.push_back(&p.states[s]);
          lat.seg_of_state.push_back(static_cast<int>(i));
          lat.var_of_state.push_back(static_cast<int>(v));
          lat.phone_pos_of_state.push_back(static_cast<int>(k));
          lat.phone_id_of_state.push_back(ids[k]);
          lat.state_in_phone.push_back(static_cast<int>(s));
        }
      }
      lat.seg_lasts[i].push_back(static_cast<int>(lat.states.size()) - 1);
    }
  }
  return lat;
}

}  // namespace

bool ViterbiAlignSegments(const AcousticModel& model,
                          const std::vector<std::vector<float>>& feats,
                          const std::vector<Segment>& segments,
                          std::vector<AlignedPhone>* phones,
                          std::vector<FrameState>* frame_states,
                          double* loglik) {
  const int t_max = static_cast<int>(feats.size());
  const int n_segs = static_cast<int>(segments.size());
  if (t_max == 0 || n_segs == 0) return false;
  for (const auto& seg : segments) {
    if (seg.variants.empty()) return false;
    for (const auto& v : seg.variants) {
      if (v.phone_ids.empty()) return false;
      for (int id : v.phone_ids) {
        if (id < 0 || id >= static_cast<int>(model.phones.size())) {
          return false;
        }
      }
    }
  }
  const Lattice lat = BuildLattice(model, segments);
  const int n_states = static_cast<int>(lat.states.size());
  const int dim = model.dim;

  std::vector<float> delta(n_states, kLogZero), ndelta(n_states, kLogZero);
  std::vector<std::vector<int>> psi(t_max, std::vector<int>(n_states, -1));

  // t = 0: chains of any segment reachable through leading skippables.
  {
    const float* x = feats[0].data();
    bool reachable = true;
    for (int i = 0; i < n_segs && reachable; ++i) {
      for (int s : lat.seg_firsts[i]) {
        delta[s] = lat.states[s]->LogLik(x, dim);
      }
      reachable = segments[i].skippable;
    }
  }

  std::vector<float> entry(n_segs, kLogZero);
  std::vector<int> entry_src(n_segs, -1);
  for (int t = 1; t < t_max; ++t) {
    const float* x = feats[t].data();
    // Entry scores: best arrival at segment i's chain starts at time t
    // from any variant exit of segment i-1 at t-1 (skippable segments
    // collapse transitively).
    for (int i = 0; i < n_segs; ++i) {
      entry[i] = kLogZero;
      entry_src[i] = -1;
      if (i > 0) {
        for (int ls : lat.seg_lasts[i - 1]) {
          const float via = delta[ls] + lat.states[ls]->forward_logp;
          if (via > entry[i]) {
            entry[i] = via;
            entry_src[i] = ls;
          }
        }
        if (segments[i - 1].skippable && entry[i - 1] > entry[i]) {
          entry[i] = entry[i - 1];
          entry_src[i] = entry_src[i - 1];
        }
      }
    }
    for (int s = 0; s < n_states; ++s) {
      float best = delta[s] + lat.states[s]->self_loop_logp;
      int src = s;
      if (lat.is_chain_first[s]) {
        const int i = lat.seg_of_state[s];
        if (entry[i] > best) {
          best = entry[i];
          src = entry_src[i];
        }
      } else {
        const float via = delta[s - 1] + lat.states[s - 1]->forward_logp;
        if (via > best) {
          best = via;
          src = s - 1;
        }
      }
      ndelta[s] =
          best <= kLogZero ? kLogZero : best + lat.states[s]->LogLik(x, dim);
      psi[t][s] = src;
    }
    delta.swap(ndelta);
  }

  // Termination: a variant exit of the final segment, or of an earlier
  // segment if everything after it is skippable.
  float best_final = kLogZero;
  int best_state = -1;
  bool tail_ok = true;
  for (int i = n_segs - 1; i >= 0 && tail_ok; --i) {
    for (int ls : lat.seg_lasts[i]) {
      if (delta[ls] > best_final) {
        best_final = delta[ls];
        best_state = ls;
      }
    }
    tail_ok = segments[i].skippable;
  }
  if (best_state < 0 || best_final <= kLogZero) return false;
  if (loglik != nullptr) *loglik = best_final;

  // Backtrack to the per-frame state path.
  std::vector<int> state_of_t(t_max);
  int s = best_state;
  for (int t = t_max - 1; t >= 0; --t) {
    state_of_t[t] = s;
    s = psi[t][s];
  }
  if (frame_states != nullptr) {
    frame_states->resize(t_max);
    for (int t = 0; t < t_max; ++t) {
      const int s_t = state_of_t[t];
      (*frame_states)[t] = {lat.phone_id_of_state[s_t],
                            lat.state_in_phone[s_t],
                            lat.seg_of_state[s_t],
                            lat.phone_pos_of_state[s_t]};
    }
  }
  if (phones != nullptr) {
    phones->clear();
    int start = 0;
    for (int t = 1; t <= t_max; ++t) {
      const int prev = state_of_t[t - 1];
      const bool boundary =
          t == t_max || lat.seg_of_state[state_of_t[t]] != lat.seg_of_state[prev] ||
          lat.phone_pos_of_state[state_of_t[t]] != lat.phone_pos_of_state[prev];
      if (boundary) {
        phones->push_back({lat.seg_of_state[prev], lat.var_of_state[prev],
                           lat.phone_pos_of_state[prev],
                           lat.phone_id_of_state[prev], start, t});
        start = t;
      }
    }
  }
  return true;
}

bool ViterbiAlign(const AcousticModel& model,
                  const std::vector<std::vector<float>>& feats,
                  const std::vector<int>& phone_ids,
                  const std::vector<unsigned char>& skippable,
                  std::vector<PhoneSpan>* spans, double* loglik) {
  // Thin wrapper: each phone is a single-variant segment.
  std::vector<Segment> segments(phone_ids.size());
  for (size_t i = 0; i < phone_ids.size(); ++i) {
    segments[i].variants.push_back({{phone_ids[i]}});
    segments[i].skippable = skippable[i] != 0;
  }
  std::vector<AlignedPhone> phones;
  if (!ViterbiAlignSegments(model, feats, segments, &phones, nullptr,
                            loglik)) {
    return false;
  }
  spans->clear();
  for (const auto& p : phones) {
    spans->push_back({p.segment, p.start_frame, p.end_frame});
  }
  return true;
}

// ---- Training ----------------------------------------------------------

Trainer::Trainer(AcousticModel* model) : model_(model) {}

void Trainer::AccumulateGlobal(const std::vector<std::vector<float>>& feats) {
  const int dim = model_->dim;
  if (global_sum_.empty()) {
    global_sum_.assign(dim, 0.0);
    global_sumsq_.assign(dim, 0.0);
  }
  for (const auto& f : feats) {
    for (int d = 0; d < dim; ++d) {
      global_sum_[d] += f[d];
      global_sumsq_[d] += static_cast<double>(f[d]) * f[d];
    }
    global_count_ += 1.0;
  }
}

void Trainer::FinalizeFlatStart() {
  const int dim = model_->dim;
  Gaussian proto;
  proto.mean.resize(dim);
  proto.inv_var.resize(dim);
  for (int d = 0; d < dim; ++d) {
    const double mean = global_sum_[d] / std::max(global_count_, 1.0);
    double var = global_sumsq_[d] / std::max(global_count_, 1.0) - mean * mean;
    var = std::max(var, static_cast<double>(kVarFloor));
    proto.mean[d] = static_cast<float>(mean);
    proto.inv_var[d] = static_cast<float>(1.0 / var);
  }
  proto.log_weight = 0.0f;
  proto.Finalize();
  for (auto& p : model_->phones) {
    for (auto& s : p.states) {
      s.mix.assign(1, proto);
      s.self_loop_logp = std::log(0.6f);
      s.forward_logp = std::log(0.4f);
    }
  }
}

void Trainer::EnsureAcc() {
  if (!acc_.empty()) return;
  acc_.resize(model_->phones.size());
  for (size_t p = 0; p < model_->phones.size(); ++p) {
    acc_[p].resize(model_->phones[p].states.size());
    for (size_t s = 0; s < acc_[p].size(); ++s) {
      acc_[p][s].resize(model_->phones[p].states[s].mix.size());
      for (auto& a : acc_[p][s]) {
        a.sum.assign(model_->dim, 0.0);
        a.sumsq.assign(model_->dim, 0.0);
      }
    }
  }
}

int Trainer::BestMix(const State& st, const float* x) const {
  int best = 0;
  float best_ll = kLogZero;
  for (size_t m = 0; m < st.mix.size(); ++m) {
    const float ll = st.mix[m].LogLik(x, model_->dim);
    if (ll > best_ll) {
      best_ll = ll;
      best = static_cast<int>(m);
    }
  }
  return best;
}

void Trainer::AccumulateUtterance(
    const std::vector<std::vector<float>>& feats,
    const std::vector<int>& phone_ids,
    const std::vector<unsigned char>& skippable, bool uniform_first_pass) {
  EnsureAcc();
  const int t_max = static_cast<int>(feats.size());
  const int dim = model_->dim;

  // frame -> (model phone id, state idx within phone)
  std::vector<std::pair<int, int>> assign(t_max, {-1, -1});
  if (uniform_first_pass) {
    // Uniform segmentation over non-skippable phones' states.
    std::vector<std::pair<int, int>> slots;  // (phone id, state idx)
    for (size_t i = 0; i < phone_ids.size(); ++i) {
      if (skippable[i]) continue;
      const auto& p = model_->phones[phone_ids[i]];
      for (size_t s = 0; s < p.states.size(); ++s) {
        slots.push_back({phone_ids[i], static_cast<int>(s)});
      }
    }
    if (slots.empty()) return;
    for (int t = 0; t < t_max; ++t) {
      const size_t k = static_cast<size_t>(t) * slots.size() / t_max;
      assign[t] = slots[k];
    }
  } else {
    // State-level Viterbi backtrace: each frame hard-assigned to the
    // exact HMM state on the best path.
    std::vector<Segment> segs(phone_ids.size());
    for (size_t i = 0; i < phone_ids.size(); ++i) {
      segs[i].variants.push_back({{phone_ids[i]}});
      segs[i].skippable = skippable[i] != 0;
    }
    std::vector<FrameState> fs;
    if (!ViterbiAlignSegments(*model_, feats, segs, nullptr, &fs, nullptr)) {
      return;
    }
    for (int t = 0; t < t_max; ++t) assign[t] = {fs[t].phone_id, fs[t].state};
  }

  for (int t = 0; t < t_max; ++t) {
    const auto [pid, s] = assign[t];
    if (pid < 0) continue;
    State& st = model_->phones[pid].states[s];
    const int m = BestMix(st, feats[t].data());
    Acc& a = acc_[pid][s][m];
    a.count += 1.0;
    for (int d = 0; d < dim; ++d) {
      a.sum[d] += feats[t][d];
      a.sumsq[d] += static_cast<double>(feats[t][d]) * feats[t][d];
    }
    const bool same_next =
        t + 1 < t_max && assign[t + 1].first == pid && assign[t + 1].second == s;
    if (same_next) {
      acc_[pid][s][m].self_loops += 1.0;
    } else {
      acc_[pid][s][m].forwards += 1.0;
    }
  }
}

void Trainer::Update() {
  const int dim = model_->dim;
  for (size_t p = 0; p < model_->phones.size(); ++p) {
    for (size_t s = 0; s < model_->phones[p].states.size(); ++s) {
      State& st = model_->phones[p].states[s];
      double state_count = 0.0, loops = 0.0, fwds = 0.0;
      for (const auto& a : acc_[p][s]) {
        state_count += a.count;
        loops += a.self_loops;
        fwds += a.forwards;
      }
      if (state_count < 1.0) continue;  // unseen state: keep params
      for (size_t m = 0; m < st.mix.size(); ++m) {
        const Acc& a = acc_[p][s][m];
        if (a.count < 2.0) continue;  // too few frames: keep component
        Gaussian& g = st.mix[m];
        for (int d = 0; d < dim; ++d) {
          const double mean = a.sum[d] / a.count;
          double var = a.sumsq[d] / a.count - mean * mean;
          var = std::max(var, static_cast<double>(kVarFloor));
          g.mean[d] = static_cast<float>(mean);
          g.inv_var[d] = static_cast<float>(1.0 / var);
        }
        g.log_weight = static_cast<float>(
            std::log(std::max(a.count / state_count, 1e-5)));
        g.Finalize();
      }
      if (loops + fwds > 0.0) {
        const double p_loop =
            std::min(std::max(loops / (loops + fwds), 0.05), 0.95);
        st.self_loop_logp = static_cast<float>(std::log(p_loop));
        st.forward_logp = static_cast<float>(std::log(1.0 - p_loop));
      }
    }
  }
  acc_.clear();
}

void Trainer::MixUp(int target_mixes) {
  for (auto& p : model_->phones) {
    for (auto& s : p.states) {
      while (static_cast<int>(s.mix.size()) * 2 <= target_mixes) {
        const size_t n = s.mix.size();
        for (size_t m = 0; m < n; ++m) {
          Gaussian g = s.mix[m];
          for (size_t d = 0; d < g.mean.size(); ++d) {
            const float sigma = 1.0f / std::sqrt(g.inv_var[d]);
            g.mean[d] += 0.2f * sigma;
            s.mix[m].mean[d] -= 0.2f * sigma;
          }
          g.log_weight = s.mix[m].log_weight =
              s.mix[m].log_weight - std::log(2.0f);
          g.Finalize();
          s.mix[m].Finalize();
          s.mix.push_back(std::move(g));
        }
      }
    }
  }
}

}  // namespace t2v
