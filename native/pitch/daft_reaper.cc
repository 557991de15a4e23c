// daft-reaper — native pitch tracker with the REAPER CLI/file protocol.
//
// Re-implements the capability of the reference's prebuilt REAPER binary
// (reference: src/daft_exprt/bin/reaper/linux/reaper, invocation protocol at
// src/daft_exprt/extract_features.py:254-266): reads a 16-bit PCM WAV,
// writes a per-sample int16 F0 track in Hz (-1 = unvoiced) to the -f file.
// Algorithm: 80 Hz rumble high-pass, normalized cross-correlation over the
// candidate lag range [sr/max_f0, sr/min_f0] at f0_interval steps, then a
// dense Viterbi pass over (lags + unvoiced) states with |log lag-ratio|
// octave-jump transition costs and the -w unvoiced cost. The same algorithm
// as the on-device JAX tracker (daft_exprt_tpu/ops/pitch.py) so the two
// paths stay tolerance-compatible.
//
// Build: make -C native/pitch   (produces build/daft-reaper)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Options {
  std::string input;
  std::string f0_output;
  double f0_interval = 0.005;
  double min_f0 = 40.0;
  double max_f0 = 500.0;
  double uv_interval = 0.01;   // accepted for protocol compatibility
  double uv_cost = 0.9;
  bool ascii = false;          // -a accepted; output format is fixed
};

bool ParseArgs(int argc, char** argv, Options* opt) {
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&](double* dst) {
      if (i + 1 >= argc) return false;
      *dst = std::atof(argv[++i]);
      return true;
    };
    if (a == "-i" && i + 1 < argc) opt->input = argv[++i];
    else if (a == "-f" && i + 1 < argc) opt->f0_output = argv[++i];
    else if (a == "-e") { if (!next(&opt->f0_interval)) return false; }
    else if (a == "-m") { if (!next(&opt->min_f0)) return false; }
    else if (a == "-x") { if (!next(&opt->max_f0)) return false; }
    else if (a == "-u") { if (!next(&opt->uv_interval)) return false; }
    else if (a == "-w") { if (!next(&opt->uv_cost)) return false; }
    else if (a == "-a") opt->ascii = true;
    else if (a == "-t" || a == "-s") { /* accepted, no-op */ }
    else {
      std::fprintf(stderr, "unknown/incomplete argument: %s\n", a.c_str());
      return false;
    }
  }
  return !opt->input.empty() && !opt->f0_output.empty();
}

// ---- minimal RIFF/WAV reader (PCM16 mono; first channel if multi) -------
bool ReadWav(const std::string& path, std::vector<float>* samples,
             int* sample_rate) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  auto read_u32 = [&](uint32_t* v) {
    return std::fread(v, 4, 1, f) == 1;
  };
  auto read_u16 = [&](uint16_t* v) {
    return std::fread(v, 2, 1, f) == 1;
  };
  char tag[5] = {0};
  uint32_t riff_size = 0;
  if (std::fread(tag, 1, 4, f) != 4 || std::strncmp(tag, "RIFF", 4) != 0 ||
      !read_u32(&riff_size) || std::fread(tag, 1, 4, f) != 4 ||
      std::strncmp(tag, "WAVE", 4) != 0) {
    std::fclose(f);
    return false;
  }
  uint16_t channels = 1, bits = 16, fmt = 1;
  uint32_t rate = 0;
  bool got_fmt = false, got_data = false;
  while (std::fread(tag, 1, 4, f) == 4) {
    uint32_t chunk_size = 0;
    if (!read_u32(&chunk_size)) break;
    if (std::strncmp(tag, "fmt ", 4) == 0) {
      uint32_t byte_rate;
      uint16_t block_align;
      if (!read_u16(&fmt) || !read_u16(&channels) || !read_u32(&rate) ||
          !read_u32(&byte_rate) || !read_u16(&block_align) ||
          !read_u16(&bits)) break;
      std::fseek(f, static_cast<long>(chunk_size) - 16, SEEK_CUR);
      got_fmt = true;
    } else if (std::strncmp(tag, "data", 4) == 0) {
      if (!got_fmt || fmt != 1 || bits != 16) break;
      size_t n = chunk_size / 2;
      std::vector<int16_t> raw(n);
      if (std::fread(raw.data(), 2, n, f) != n) break;
      size_t frames = n / channels;
      samples->resize(frames);
      for (size_t i = 0; i < frames; ++i)
        (*samples)[i] = raw[i * channels] / 32768.0f;
      got_data = true;
      break;
    } else {
      std::fseek(f, chunk_size + (chunk_size & 1), SEEK_CUR);
    }
  }
  std::fclose(f);
  *sample_rate = static_cast<int>(rate);
  return got_fmt && got_data;
}

// ---- 80 Hz high-pass (windowed-sinc FIR, same as the JAX tracker) -------
std::vector<float> HighPass(const std::vector<float>& x, int sr,
                            double cutoff = 80.0, int numtaps = 255) {
  std::vector<double> hp(numtaps);
  double fc = cutoff / (sr / 2.0);
  double sum = 0.0;
  int mid = (numtaps - 1) / 2;
  for (int i = 0; i < numtaps; ++i) {
    double t = i - (numtaps - 1) / 2.0;
    double sinc = (t == 0.0) ? 1.0 : std::sin(M_PI * fc * t) / (M_PI * fc * t);
    double ham = 0.54 - 0.46 * std::cos(2.0 * M_PI * i / (numtaps - 1));
    hp[i] = sinc * fc * ham;
    sum += hp[i];
  }
  for (int i = 0; i < numtaps; ++i) hp[i] = -hp[i] / sum;
  hp[mid] += 1.0;

  std::vector<float> y(x.size(), 0.0f);
  int n = static_cast<int>(x.size());
  for (int i = 0; i < n; ++i) {
    double acc = 0.0;
    // 'same' convolution centered at i
    int lo = std::max(0, i - mid);
    int hi = std::min(n - 1, i + mid);
    for (int j = lo; j <= hi; ++j) acc += x[j] * hp[mid + (i - j)];
    y[i] = static_cast<float>(acc);
  }
  return y;
}

}  // namespace

int main(int argc, char** argv) {
  Options opt;
  if (!ParseArgs(argc, argv, &opt)) {
    std::fprintf(stderr,
                 "Usage: daft-reaper -i <in.wav> -f <out.f0> [-a] "
                 "[-e interval] [-m min_f0] [-x max_f0] [-u uv_interval] "
                 "[-w uv_cost]\n");
    return 2;
  }

  std::vector<float> wav;
  int sr = 0;
  if (!ReadWav(opt.input, &wav, &sr) || wav.empty()) {
    std::fprintf(stderr, "failed to read %s\n", opt.input.c_str());
    return 1;
  }

  std::vector<float> x = HighPass(wav, sr);

  const int frame_step = std::max(1, static_cast<int>(
      std::lround(opt.f0_interval * sr)));
  const int min_lag = std::max(2, static_cast<int>(sr / opt.max_f0));
  const int max_lag = static_cast<int>(std::ceil(sr / opt.min_f0));
  const int win = static_cast<int>(0.0075 * sr);
  const int n_lags = max_lag - min_lag + 1;
  const int n_frames = std::max<int>(1, static_cast<int>(wav.size()) /
                                            frame_step);

  // zero-pad so every frame can access win + max_lag samples
  x.resize(static_cast<size_t>(n_frames - 1) * frame_step + win + max_lag + 2,
           0.0f);

  // ---- NCCF ----
  // RAPT amplitude term (Talkin 1995's A_FACT, scale-invariant form):
  // damps the NCCF of low-energy frames so breaths/room noise between
  // words do not produce confident lag candidates. Constants tuned
  // against the reference REAPER binary on real speech (voicing
  // agreement 0.49-0.78 with the plain model -> 0.96); the JAX tracker
  // (daft_exprt_tpu/ops/pitch.py) uses the same values.
  const double kACoef = 2e-3;
  const double kVoBias = 0.0;
  double mean_sq = 0.0;
  const size_t n_unpadded = wav.size();
  for (size_t i = 0; i < n_unpadded; ++i)
    mean_sq += static_cast<double>(x[i]) * x[i];
  mean_sq /= std::max<size_t>(1, n_unpadded);
  const double a_fact = kACoef * win * mean_sq;

  std::vector<float> ncc(static_cast<size_t>(n_frames) * n_lags);
  std::vector<double> prefix_sq(x.size() + 1, 0.0);
  for (size_t i = 0; i < x.size(); ++i)
    prefix_sq[i + 1] = prefix_sq[i] + static_cast<double>(x[i]) * x[i];
  auto energy = [&](int start) {
    return prefix_sq[start + win] - prefix_sq[start];
  };
  // per-frame unvoiced local cost: vo_bias + max candidate NCCF (RAPT)
  std::vector<double> local_uv(n_frames);
  for (int fidx = 0; fidx < n_frames; ++fidx) {
    const int s = fidx * frame_step;
    const double e0 = energy(s);
    double max_ncc = 0.0;
    for (int li = 0; li < n_lags; ++li) {
      const int lag = min_lag + li;
      double num = 0.0;
      for (int i = 0; i < win; ++i)
        num += static_cast<double>(x[s + i]) * x[s + i + lag];
      const double e1 = energy(s + lag);
      const double v = num / (a_fact + std::sqrt(e0 * e1) + 1e-9);
      ncc[static_cast<size_t>(fidx) * n_lags + li] = static_cast<float>(v);
      if (v > max_ncc) max_ncc = v;
    }
    local_uv[fidx] = kVoBias + max_ncc;
  }

  // ---- Viterbi over (lags + unvoiced) ----
  const int S = n_lags + 1;
  const int UV = n_lags;
  std::vector<double> log_lag(n_lags);
  for (int li = 0; li < n_lags; ++li) log_lag[li] = std::log(min_lag + li);

  std::vector<double> cost(S), next_cost(S);
  std::vector<int32_t> backptr(static_cast<size_t>(n_frames) * S);
  // RAPT-style doubling cost: bias toward shorter periods so exact
  // subharmonics (octave errors) lose ties (mirrors ops/pitch.py)
  std::vector<double> octave_cost(n_lags);
  for (int li = 0; li < n_lags; ++li)
    octave_cost[li] =
        0.02 * std::log2(static_cast<double>(min_lag + li) / min_lag);
  auto local = [&](int fidx, int s) -> double {
    if (s == UV) return local_uv[fidx];
    return 1.0 - ncc[static_cast<size_t>(fidx) * n_lags + s] +
           octave_cost[s];
  };
  for (int s = 0; s < S; ++s) cost[s] = local(0, s);

  for (int fidx = 1; fidx < n_frames; ++fidx) {
    // transition minimization exploiting structure:
    //   voiced->voiced: cost_prev[j] + |log_lag[j] - log_lag[s]|
    //   uv<->voiced:    uv_cost; uv->uv / voiced[j]->..(same j)..: 0
    // forward pass (non-decreasing lag) + backward pass give the min
    // |log-ratio| in O(S) per frame instead of O(S^2).
    static std::vector<double> best_fwd, best_bwd;
    static std::vector<int32_t> arg_fwd, arg_bwd;
    best_fwd.assign(n_lags, 0.0);
    best_bwd.assign(n_lags, 0.0);
    arg_fwd.assign(n_lags, 0);
    arg_bwd.assign(n_lags, 0);
    best_fwd[0] = cost[0];
    arg_fwd[0] = 0;
    for (int s = 1; s < n_lags; ++s) {
      const double carried =
          best_fwd[s - 1] + (log_lag[s] - log_lag[s - 1]);
      if (cost[s] <= carried) {
        best_fwd[s] = cost[s];
        arg_fwd[s] = s;
      } else {
        best_fwd[s] = carried;
        arg_fwd[s] = arg_fwd[s - 1];
      }
    }
    best_bwd[n_lags - 1] = cost[n_lags - 1];
    arg_bwd[n_lags - 1] = n_lags - 1;
    for (int s = n_lags - 2; s >= 0; --s) {
      const double carried =
          best_bwd[s + 1] + (log_lag[s + 1] - log_lag[s]);
      if (cost[s] <= carried) {
        best_bwd[s] = cost[s];
        arg_bwd[s] = s;
      } else {
        best_bwd[s] = carried;
        arg_bwd[s] = arg_bwd[s + 1];
      }
    }
    // best voiced predecessor overall (for uv state)
    double best_voiced = cost[0];
    int best_voiced_arg = 0;
    for (int s = 1; s < n_lags; ++s)
      if (cost[s] < best_voiced) { best_voiced = cost[s]; best_voiced_arg = s; }

    for (int s = 0; s < n_lags; ++s) {
      double c = best_fwd[s];
      int arg = arg_fwd[s];
      if (best_bwd[s] < c) { c = best_bwd[s]; arg = arg_bwd[s]; }
      const double from_uv = cost[UV] + opt.uv_cost;
      if (from_uv < c) { c = from_uv; arg = UV; }
      next_cost[s] = c + local(fidx, s);
      backptr[static_cast<size_t>(fidx) * S + s] = arg;
    }
    {
      double c = cost[UV];
      int arg = UV;
      if (best_voiced + opt.uv_cost < c) {
        c = best_voiced + opt.uv_cost;
        arg = best_voiced_arg;
      }
      next_cost[UV] = c + local(fidx, UV);
      backptr[static_cast<size_t>(fidx) * S + UV] = arg;
    }
    cost.swap(next_cost);
  }

  std::vector<int32_t> states(n_frames);
  states[n_frames - 1] = static_cast<int32_t>(
      std::min_element(cost.begin(), cost.end()) - cost.begin());
  for (int fidx = n_frames - 1; fidx > 0; --fidx)
    states[fidx - 1] = backptr[static_cast<size_t>(fidx) * S + states[fidx]];

  // ---- per-sample int16 F0 output ----
  std::vector<int16_t> out(wav.size());
  for (size_t i = 0; i < wav.size(); ++i) {
    const int fidx = std::min<int>(static_cast<int>(i) / frame_step,
                                   n_frames - 1);
    const int s = states[fidx];
    if (s == UV) {
      out[i] = -1;
    } else {
      const double f0 = static_cast<double>(sr) / (min_lag + s);
      out[i] = static_cast<int16_t>(std::lround(f0));
    }
  }
  FILE* fo = std::fopen(opt.f0_output.c_str(), "wb");
  if (!fo) {
    std::fprintf(stderr, "cannot write %s\n", opt.f0_output.c_str());
    return 1;
  }
  std::fwrite(out.data(), sizeof(int16_t), out.size(), fo);
  std::fclose(fo);
  return 0;
}
