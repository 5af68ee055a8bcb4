// osu! standard difficulty (star rating) — C++ core.
//
// The reference depends on the Rust `rosu-pp` crate for this calculation
// (reference scripts/dataset_creator.py:139-142); this is the native
// counterpart of osufusion_tpu/osu/difficulty.py (same strain-skill
// algorithm, kept numerically identical so either backend can serve the
// per-segment star-rating hot path in the input pipeline).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

constexpr double kSectionLength = 400.0;
constexpr double kAimDecayBase = 0.15;
constexpr double kSpeedDecayBase = 0.3;
constexpr double kAimSkillMultiplier = 26.25;
constexpr double kSpeedSkillMultiplier = 1400.0;
constexpr double kDecayWeight = 0.9;
constexpr double kStarScalingFactor = 0.0675;
constexpr double kNormalizedRadius = 52.0;
constexpr double kMinStrainTime = 50.0;

double difficulty_value(std::vector<double> peaks) {
  std::sort(peaks.begin(), peaks.end(), std::greater<double>());
  double total = 0.0, weight = 1.0;
  for (double p : peaks) {
    total += p * weight;
    weight *= kDecayWeight;
  }
  return total;
}

std::vector<double> strain_peaks(const std::vector<double>& times,
                                 const std::vector<double>& strains,
                                 double decay_base) {
  std::vector<double> peaks;
  double current = 0.0;
  double section_end = (std::floor(times[0] / kSectionLength) + 1) * kSectionLength;
  double section_peak = 0.0;
  double prev_t = times[0];
  for (size_t i = 0; i < times.size(); ++i) {
    double t = times[i], s = strains[i];
    while (t > section_end) {
      peaks.push_back(section_peak);
      current *= std::pow(decay_base, (section_end - prev_t) / 1000.0);
      prev_t = section_end;
      section_peak = current;
      section_end += kSectionLength;
    }
    current = current * std::pow(decay_base, (t - prev_t) / 1000.0) + s;
    section_peak = std::max(section_peak, current);
    prev_t = t;
  }
  peaks.push_back(section_peak);
  return peaks;
}

}  // namespace

extern "C" double osu_star_rating(const double* times, const double* xs, const double* ys,
                                  const uint8_t* is_slider, const double* slider_lengths,
                                  int64_t n, double cs) {
  if (n < 2) return 0.0;

  double radius = 54.4 - 4.48 * cs;
  double scale = kNormalizedRadius / radius;
  if (radius < 30) scale *= 1 + std::min(30 - radius, 5.0) / 50;

  std::vector<double> strain_time(n - 1), dist(n - 1), t_strain(n - 1);
  for (int64_t i = 0; i + 1 < n; ++i) {
    double dt = times[i + 1] - times[i];
    strain_time[i] = std::max(dt, kMinStrainTime);
    double dx = (xs[i + 1] - xs[i]) * scale;
    double dy = (ys[i + 1] - ys[i]) * scale;
    double d = std::sqrt(dx * dx + dy * dy);
    if (is_slider[i]) d += slider_lengths[i] * scale * 0.5;
    dist[i] = d;
    t_strain[i] = times[i + 1];
  }

  std::vector<double> aim_strain(n - 1), speed_strain(n - 1);
  for (int64_t i = 0; i + 1 < n; ++i) {
    aim_strain[i] = std::pow(dist[i], 0.99) / strain_time[i] * kAimSkillMultiplier;
    double speed_bonus = 1.0;
    if (strain_time[i] < 75.0) {
      double r = (75.0 - strain_time[i]) / 25.0;
      speed_bonus = 1.0 + r * r * 0.3;
    }
    speed_strain[i] = speed_bonus * (1.0 + std::min(dist[i], 125.0) / 125.0 * 0.25) /
                      strain_time[i] * kSpeedSkillMultiplier;
  }

  double aim_rating =
      std::sqrt(difficulty_value(strain_peaks(t_strain, aim_strain, kAimDecayBase))) *
      kStarScalingFactor;
  double speed_rating =
      std::sqrt(difficulty_value(strain_peaks(t_strain, speed_strain, kSpeedDecayBase))) *
      kStarScalingFactor * 0.675;

  return aim_rating + speed_rating + std::abs(aim_rating - speed_rating) / 2;
}
