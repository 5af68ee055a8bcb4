// osu! standard difficulty (star rating) — C++ evaluator core.
//
// The reference depends on the Rust `rosu-pp` crate for this calculation
// (reference scripts/dataset_creator.py:139-142); this is the native
// counterpart of osufusion_tpu/osu/difficulty.py's `evaluate` — the modern
// (Nov-2021 rework) strain-skill algorithm. Both cores consume the SAME
// preprocessed per-object attribute table (built once in Python:
// difficulty.preprocess), so they are numerically identical and either can
// serve the per-segment star-rating hot path in the input pipeline.
// Keep statement-for-statement in sync with difficulty.py.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// aim
constexpr double kAimDecayBase = 0.15;
constexpr double kAimSkillMultiplier = 23.55;
constexpr double kWideAngleMultiplier = 1.5;
constexpr double kAcuteAngleMultiplier = 1.95;
constexpr double kSliderMultiplier = 1.35;
constexpr double kVelocityChangeMultiplier = 0.75;

// speed + rhythm
constexpr double kSpeedDecayBase = 0.3;
constexpr double kSpeedSkillMultiplier = 1375.0;
constexpr double kSingleSpacingThreshold = 125.0;
constexpr double kMinSpeedBonus = 75.0;
constexpr double kSpeedBalancingFactor = 40.0;
constexpr double kRhythmMultiplier = 0.75;
constexpr double kHistoryTimeMax = 5000.0;
constexpr int kMaxHistoryObjects = 32;

// skill -> rating
constexpr double kSectionLength = 400.0;
constexpr double kDecayWeight = 0.9;
constexpr int kReducedSectionCountAim = 10;
constexpr int kReducedSectionCountSpeed = 5;
constexpr double kReducedStrainBaseline = 0.75;
constexpr double kSkillDifficultyMultiplier = 1.06;
constexpr double kDifficultyMultiplier = 0.0675;
constexpr double kPerformanceBaseMultiplier = 1.12;

struct Attrs {
  const double* start_time;
  const double* delta_time;
  const double* strain_time;
  const double* lazy_jump;
  const double* min_jump;
  const double* min_jump_time;
  const double* travel_dist;
  const double* travel_time;
  const double* angle;
  const uint8_t* is_slider;
  const uint8_t* is_spinner;
  int64_t n;
};

double wide_angle_bonus(double angle) {
  double s = std::sin(0.75 * (std::min(5.0 / 6.0 * kPi, std::max(kPi / 6.0, angle)) - kPi / 6.0));
  return s * s;
}

double acute_angle_bonus(double angle) { return 1.0 - wide_angle_bonus(angle); }

double aim_strain_of(const Attrs& a, int64_t i) {
  if (i < 3 || a.is_spinner[i] || a.is_spinner[i - 1]) return 0.0;

  double curr_vel = a.lazy_jump[i] / a.strain_time[i];
  if (a.is_slider[i - 1]) {
    double travel_vel = a.travel_dist[i - 1] / a.travel_time[i - 1];
    double movement_vel = a.min_jump[i] / a.min_jump_time[i];
    curr_vel = std::max(curr_vel, movement_vel + travel_vel);
  }
  double prev_vel = a.lazy_jump[i - 1] / a.strain_time[i - 1];
  if (a.is_slider[i - 2]) {
    double travel_vel = a.travel_dist[i - 2] / a.travel_time[i - 2];
    double movement_vel = a.min_jump[i - 1] / a.min_jump_time[i - 1];
    prev_vel = std::max(prev_vel, movement_vel + travel_vel);
  }

  double wide = 0.0, acute = 0.0, vel_change = 0.0, slider_bonus = 0.0;
  double aim_strain = curr_vel;

  double st_i = a.strain_time[i], st_l = a.strain_time[i - 1];
  if (std::max(st_i, st_l) < 1.25 * std::min(st_i, st_l)) {
    double a_c = a.angle[i], a_l = a.angle[i - 1], a_ll = a.angle[i - 2];
    if (!(std::isnan(a_c) || std::isnan(a_l) || std::isnan(a_ll))) {
      double angle_bonus = std::min(curr_vel, prev_vel);
      wide = wide_angle_bonus(a_c);
      acute = acute_angle_bonus(a_c);
      if (st_i > 100) {
        acute = 0.0;
      } else {
        double s1 = std::sin(kPi / 2 * std::min(1.0, (100.0 - st_i) / 25.0));
        double s2 = std::sin(kPi / 2 * (std::min(std::max(a.lazy_jump[i], 50.0), 100.0) - 50.0) / 50.0);
        acute *= acute_angle_bonus(a_l) * std::min(angle_bonus, 125.0 / st_i) * s1 * s1 * s2 * s2;
      }
      double wl = wide_angle_bonus(a_l);
      wide *= angle_bonus * (1 - std::min(wide, wl * wl * wl));
      double al = acute_angle_bonus(a_ll);
      acute *= 0.5 + 0.5 * (1 - std::min(acute, al * al * al));
    }
  }

  if (std::max(prev_vel, curr_vel) != 0.0) {
    prev_vel = (a.lazy_jump[i - 1] + a.travel_dist[i - 2]) / a.strain_time[i - 1];
    curr_vel = (a.lazy_jump[i] + a.travel_dist[i - 1]) / a.strain_time[i];
    double s = std::sin(kPi / 2 * std::abs(prev_vel - curr_vel) / std::max(prev_vel, curr_vel));
    double dist_ratio = s * s;
    double overlap_buff = std::min(125.0 / std::min(st_i, st_l), std::abs(prev_vel - curr_vel));
    double r = std::min(st_i, st_l) / std::max(st_i, st_l);
    vel_change = overlap_buff * dist_ratio * r * r;
  }

  if (a.is_slider[i - 1]) slider_bonus = a.travel_dist[i - 1] / a.travel_time[i - 1];

  aim_strain += std::max(acute * kAcuteAngleMultiplier,
                         wide * kWideAngleMultiplier + vel_change * kVelocityChangeMultiplier);
  aim_strain += slider_bonus * kSliderMultiplier;
  return aim_strain;
}

double speed_strain_of(const Attrs& a, int64_t i, double great_window_full) {
  if (a.is_spinner[i]) return 0.0;
  double strain_time = a.strain_time[i];
  double ratio = strain_time / great_window_full;
  if (i >= 2 && strain_time < great_window_full && a.strain_time[i - 1] > strain_time)
    strain_time = a.strain_time[i - 1] + ratio * (strain_time - a.strain_time[i - 1]);
  strain_time /= std::min(std::max((strain_time / great_window_full) / 0.93, 0.92), 1.0);
  double speed_bonus = 1.0;
  if (strain_time < kMinSpeedBonus) {
    double r = (kMinSpeedBonus - strain_time) / kSpeedBalancingFactor;
    speed_bonus = 1 + 0.75 * r * r;
  }
  double travel = i >= 2 ? a.travel_dist[i - 1] : 0.0;
  double dist = std::min(kSingleSpacingThreshold, travel + a.min_jump[i]);
  return (speed_bonus + speed_bonus * std::pow(dist / kSingleSpacingThreshold, 3.5)) / strain_time;
}

double rhythm_bonus_of(const Attrs& a, int64_t i, double great_window_full) {
  if (a.is_spinner[i]) return 0.0;
  int prev_island = 0, island = 1;
  double complexity = 0.0, start_ratio = 0.0;
  bool first_switch = false;
  int64_t historical = std::min<int64_t>(i - 1, kMaxHistoryObjects);

  int64_t rhythm_start = 0;
  while (rhythm_start < historical - 2 &&
         a.start_time[i] - a.start_time[i - 1 - rhythm_start] < kHistoryTimeMax)
    ++rhythm_start;

  for (int64_t j = rhythm_start; j > 0; --j) {
    int64_t ci = i - j, pi = i - j - 1, li = i - j - 2;
    double decay = (kHistoryTimeMax - (a.start_time[i] - a.start_time[ci])) / kHistoryTimeMax;
    decay = std::min(static_cast<double>(historical - j) / historical, decay);
    double curr_d = a.strain_time[ci], prev_d = a.strain_time[pi], last_d = a.strain_time[li];
    double s = std::sin(kPi / (std::min(prev_d, curr_d) / std::max(prev_d, curr_d)));
    double curr_ratio = 1.0 + 6.0 * std::min(0.5, s * s);
    double window_penalty = std::min(
        1.0, std::max(0.0, std::abs(prev_d - curr_d) - great_window_full * 0.3) /
                 (great_window_full * 0.3));
    double effective = window_penalty * curr_ratio;
    if (first_switch) {
      if (!(prev_d > 1.25 * curr_d || prev_d * 1.25 < curr_d)) {
        if (island < 7) ++island;
      } else {
        if (a.is_slider[ci]) effective *= 0.125;
        if (a.is_slider[pi]) effective *= 0.25;
        if (prev_island == island) effective *= 0.25;
        if (prev_island % 2 == island % 2) effective *= 0.5;
        if (last_d > prev_d + 10 && prev_d > curr_d + 10) effective *= 0.125;
        complexity += std::sqrt(effective * start_ratio) * decay * std::sqrt(4.0 + island) / 2.0 *
                      std::sqrt(4.0 + prev_island) / 2.0;
        start_ratio = effective;
        prev_island = island;
        if (prev_d * 1.25 < curr_d) first_switch = false;
        island = 1;
      }
    } else if (prev_d > 1.25 * curr_d) {
      first_switch = true;
      start_ratio = effective;
      island = 1;
    }
  }
  return std::sqrt(4.0 + complexity * kRhythmMultiplier) / 2.0;
}

std::vector<double> strain_peaks(const Attrs& a, const std::vector<double>& strains,
                                 double decay_base, const std::vector<double>* rhythm) {
  std::vector<double> peaks;
  double current = 0.0;
  double section_end = std::ceil(a.start_time[1] / kSectionLength) * kSectionLength;
  double section_peak = 0.0;
  for (int64_t i = 1; i < a.n; ++i) {
    double t = a.start_time[i];
    while (t > section_end) {
      peaks.push_back(section_peak);
      double decayed = current * std::pow(decay_base, (section_end - a.start_time[i - 1]) / 1000.0);
      section_peak = decayed * (rhythm ? (*rhythm)[i - 1] : 1.0);
      section_end += kSectionLength;
    }
    current = current * std::pow(decay_base, a.delta_time[i] / 1000.0) + strains[i];
    section_peak = std::max(section_peak, current * (rhythm ? (*rhythm)[i] : 1.0));
  }
  peaks.push_back(section_peak);
  return peaks;
}

double difficulty_value(std::vector<double> strains, int reduced_count) {
  std::sort(strains.begin(), strains.end(), std::greater<double>());
  int top = std::min<int>(strains.size(), reduced_count);
  for (int i = 0; i < top; ++i) {
    double clamped = std::min(std::max(static_cast<double>(i) / reduced_count, 0.0), 1.0);
    double scale = std::log10(1.0 + clamped * 9.0);
    strains[i] *= kReducedStrainBaseline + (1 - kReducedStrainBaseline) * scale;
  }
  std::sort(strains.begin(), strains.end(), std::greater<double>());
  double total = 0.0, weight = 1.0;
  for (double p : strains) {
    total += p * weight;
    weight *= kDecayWeight;
  }
  return total * kSkillDifficultyMultiplier;
}

}  // namespace

extern "C" double osu_star_rating(const double* start_time, const double* delta_time,
                                  const double* strain_time, const double* lazy_jump,
                                  const double* min_jump, const double* min_jump_time,
                                  const double* travel_dist, const double* travel_time,
                                  const double* angle, const uint8_t* is_slider,
                                  const uint8_t* is_spinner, int64_t n, double od) {
  if (n < 2) return 0.0;
  Attrs a{start_time, delta_time, strain_time, lazy_jump,  min_jump, min_jump_time,
          travel_dist, travel_time, angle,      is_slider, is_spinner, n};

  double great_window_full = (80.0 - 6.0 * od) * 2.0;
  std::vector<double> aim_strains(n, 0.0), speed_strains(n, 0.0), rhythm(n, 1.0);
  for (int64_t i = 1; i < n; ++i) {
    aim_strains[i] = aim_strain_of(a, i) * kAimSkillMultiplier;
    speed_strains[i] = speed_strain_of(a, i, great_window_full) * kSpeedSkillMultiplier;
    rhythm[i] = rhythm_bonus_of(a, i, great_window_full);
  }

  double aim_value =
      difficulty_value(strain_peaks(a, aim_strains, kAimDecayBase, nullptr), kReducedSectionCountAim);
  double speed_value = difficulty_value(strain_peaks(a, speed_strains, kSpeedDecayBase, &rhythm),
                                        kReducedSectionCountSpeed);

  double aim_rating = std::sqrt(aim_value) * kDifficultyMultiplier;
  double speed_rating = std::sqrt(speed_value) * kDifficultyMultiplier;

  double base_aim = std::pow(5.0 * std::max(1.0, aim_rating / 0.0675) - 4.0, 3) / 100000.0;
  double base_speed = std::pow(5.0 * std::max(1.0, speed_rating / 0.0675) - 4.0, 3) / 100000.0;
  double base_perf = std::pow(std::pow(base_aim, 1.1) + std::pow(base_speed, 1.1), 1.0 / 1.1);
  if (base_perf <= 1e-5) return 0.0;
  return std::cbrt(kPerformanceBaseMultiplier) * 0.027 *
         (std::cbrt(100000.0 / std::pow(2.0, 1.0 / 1.1) * base_perf) + 4.0);
}
