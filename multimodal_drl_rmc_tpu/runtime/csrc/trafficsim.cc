// Native host-side traffic microsimulation for the ramp-metering corridor.
//
// Role in the framework (SURVEY.md §2 "native components"): the reference's
// only native component is SUMO itself, reached through per-step TraCI
// socket RPCs (sumo_env.py:346-353) — the wall-clock bottleneck. This
// library is the TPU build's in-process replacement for host-side training
// and evaluation when SUMO is absent: the same IDM chain model as the
// on-device JAX simulator (sim/core.py), in scalar C++ behind a C ABI that
// Python drives via ctypes (envs/backends/native.py). Calls release the
// GIL, so a ThreadVecEnv of N backends steps N sims truly in parallel.
//
// The model mirrors sim/geometry.py: 5 FIFO lane-chains, IDM car-following,
// a stop-line virtual leader while the meter is red, zipper-merge coupling
// between the ramp chain and mainline lane 0 over the acceleration area,
// E1-style induction loops with interval + last-step aggregation, and
// per-trip travel/loss/wait statistics.
//
// Build: g++ -O3 -shared -fPIC (runtime/native_build.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

// Physics constants are generated from sim/physics.py (the single
// definition site, shared with the XLA and Pallas simulators) by
// runtime/native_build.py before each compile.
#include "physics_constants.h"

namespace {

constexpr int kMaxChains = 8;
constexpr int kMaxSegs = 5;
constexpr int kSlots = 512;

struct Vehicle {
  double pos = 0.0;
  double speed = 0.0;
  double depart_t = 0.0;
  double wait = 0.0;
  double co2 = 0.0;   // mg, accumulated over the trip (wheel-power model)
  double nox = 0.0;   // mg
  bool connected = false;
};

struct Chain {
  double length = 0.0;
  int n_segs = 0;
  double seg_end[kMaxSegs];
  double seg_speed[kMaxSegs];
  double stop_line = 1e18;
  Vehicle slots[kSlots];
  int head = 0;
  int count = 0;
  double pending = 0.0;

  double speed_limit(double pos) const {
    for (int s = 0; s < n_segs; ++s)
      if (pos <= seg_end[s]) return seg_speed[s];
    return seg_speed[n_segs - 1];
  }
  Vehicle& at(int i) { return slots[(head + i) % kSlots]; }
  const Vehicle& at(int i) const { return slots[(head + i) % kSlots]; }
};

struct Loop {
  int chain = 0;
  double pos = 0.0;
  // Current (running) interval accumulators.
  int count_acc = 0;
  double occ_acc = 0.0;
  // Last completed interval.
  int last_count = 0;
  double last_occ = 0.0;   // fraction [0, 1] averaged over interval
  // Last 1 s step.
  int step_count = 0;
  double step_speed = -1.0;
};

struct Sim {
  int n_chains = 0;
  Chain chains[kMaxChains];
  std::vector<Loop> loops;
  double merge_offset = 0.0, merge_zone_lo = 0.0;
  double ramp_edge_end = 0.0;
  double detector_period = 40.0;
  double interval_elapsed = 0.0;

  int phase = 1;  // 0 green, 1 red
  double t = 0.0;
  double breakdown = 0.0;  // hysteretic merge-breakdown level [0, 1]
  double accel_noise = 0.0;  // driver-imperfection sigma, m/s^2 (0 = off)
  double demand[4] = {0, 0, 0, 0};  // main, ramp, off vph + pen rate
  std::mt19937_64 rng;

  // Trip stats. Route classes: 0 = Mainline (chains 0-2), 1 = On-Ramp
  // (chain 3), 2 = Off-Ramp (chain 4) — the reference's per-route split
  // (evaluation/parsers.py get_route_type).
  double arrived = 0, travel_sum = 0, loss_sum = 0, wait_sum = 0;
  double departed = 0, loaded = 0;
  double route_count[3] = {0, 0, 0};
  double route_travel[3] = {0, 0, 0};
  double route_loss[3] = {0, 0, 0};
  double co2_sum = 0, nox_sum = 0;        // completed trips only (parser parity)
  std::vector<double> trip_travel;        // per completed trip, for median/std
  std::vector<double> trip_loss;
  double freeflow_tt[kMaxChains];

  void clear_vehicles() {
    for (int c = 0; c < n_chains; ++c) {
      chains[c].head = chains[c].count = 0;
      chains[c].pending = 0.0;
    }
    for (auto& l : loops) l = Loop{l.chain, l.pos};
    interval_elapsed = 0.0;
    t = 0.0;
    breakdown = 0.0;
    arrived = travel_sum = loss_sum = wait_sum = departed = loaded = 0.0;
    for (int r = 0; r < 3; ++r)
      route_count[r] = route_travel[r] = route_loss[r] = 0.0;
    co2_sum = nox_sum = 0.0;
    trip_travel.clear();
    trip_loss.clear();
  }
};

double idm_accel(double v, double v0, double gap, double dv,
                 double t_headway = kIdmT) {
  double s_star = kMinGap + v * t_headway + v * dv / (2.0 * std::sqrt(kIdmA * kIdmB));
  s_star = std::max(s_star, kMinGap);
  gap = std::max(gap, 0.1);
  double acc = kIdmA * (1.0 - std::pow(v / std::max(v0, 0.1), kIdmDelta) -
                        (s_star / gap) * (s_star / gap));
  return std::clamp(acc, -kEmergencyB, kIdmA);
}

// Nearest-ahead vehicle of `other` (positions in common frame, FIFO order:
// index 0 = front-most) strictly ahead of x. Linear scan from the back is
// fine: zone holds <= ~60 vehicles.
bool cross_leader(const Chain& other, double offset, double zone_lo_common,
                  double x, double* lead_pos, double* lead_speed) {
  bool found = false;
  double best = 1e18, best_speed = 0.0;
  for (int i = other.count - 1; i >= 0; --i) {
    const Vehicle& v = other.at(i);
    double p = v.pos + offset;
    if (p < zone_lo_common) continue;
    if (p > x) {  // FIFO order: first one ahead is the nearest
      best = p;
      best_speed = v.speed;
      found = true;
      break;
    }
  }
  *lead_pos = best;
  *lead_speed = best_speed;
  return found;
}

void substep(Sim& s) {
  double acc[kMaxChains][kSlots];
  std::normal_distribution<double> gauss(0.0, s.accel_noise > 0.0
                                                  ? s.accel_noise : 1.0);
  // Breakdown-driven merge friction (hysteresis state updates per second
  // in step_1s).
  double fr_lo = s.merge_zone_lo + s.merge_offset - kFrictionWindow;
  double friction = 1.0 + kFrictionAlpha * s.breakdown;
  for (int c = 0; c < s.n_chains; ++c) {
    Chain& ch = s.chains[c];
    bool is_ramp = (ch.stop_line < 1e17);
    bool couples = (c == 0 || is_ramp);
    double off = is_ramp ? s.merge_offset : 0.0;
    double zone_lo_common = s.merge_zone_lo + s.merge_offset;
    const Chain& other = is_ramp ? s.chains[0] : s.chains[3];
    double other_off = is_ramp ? 0.0 : s.merge_offset;

    for (int i = 0; i < ch.count; ++i) {
      Vehicle& v = ch.at(i);
      double gap, dv;
      if (i == 0) {
        gap = 1e18;
        dv = 0.0;
      } else {
        const Vehicle& lead = ch.at(i - 1);
        gap = lead.pos - v.pos - kVehLen;
        dv = v.speed - lead.speed;
      }
      // Ramp meter: stationary leader at the stop line while red.
      if (s.phase == 1 && v.pos < ch.stop_line) {
        double stop_gap = ch.stop_line - v.pos;
        if (stop_gap < gap) {
          gap = stop_gap;
          dv = v.speed;
        }
      }
      // Zipper merge: mainline lane 0 <-> ramp chain.
      double base_t = kIdmT;
      if (couples && s.n_chains > 3) {
        double x = v.pos + off;
        if (x >= zone_lo_common) {
          double lp, ls;
          if (cross_leader(other, other_off, zone_lo_common, x, &lp, &ls)) {
            double cross_gap = lp - x - kVehLen;
            if (cross_gap < gap) {
              gap = cross_gap;
              dv = v.speed - ls;
              base_t = kIdmTCross;
            }
          }
        }
      }
      double t_headway = base_t;
      if (c < 4 && v.pos + off >= zone_lo_common - kFrictionWindow)
        t_headway *= friction;
      double a = idm_accel(v.speed, ch.speed_limit(v.pos), gap, dv, t_headway);
      // Driver-imperfection jitter (ts_set_accel_noise), re-clipped to the
      // same physical bounds as the deterministic IDM response (the JAX
      // sim applies the identical rule, sim/core.py _substep).
      if (s.accel_noise > 0.0)
        a = std::clamp(a + gauss(s.rng), -kEmergencyB, kIdmA);
      acc[c][i] = a;
    }
  }
  for (int c = 0; c < s.n_chains; ++c) {
    Chain& ch = s.chains[c];
    for (int i = 0; i < ch.count; ++i) {
      Vehicle& v = ch.at(i);
      v.speed = std::max(0.0, v.speed + acc[c][i] * kDtSub);
      v.pos += v.speed * kDtSub;
      if (v.speed < 0.1) v.wait += kDtSub;
    }
  }
}

void detector_pass(Sim& s, const double prev_pos[kMaxChains][kSlots]) {
  for (auto& l : s.loops) {
    const Chain& ch = s.chains[l.chain];
    int crossings = 0;
    double speed_sum = 0.0, occ = 0.0;
    for (int i = 0; i < ch.count; ++i) {
      const Vehicle& v = ch.at(i);
      double p0 = prev_pos[l.chain][(ch.head + i) % kSlots];
      if (p0 < l.pos && v.pos >= l.pos) {
        ++crossings;
        speed_sum += v.speed;
      }
      if (v.pos >= l.pos && p0 <= l.pos + kVehLen)
        occ += std::min(1.0, kVehLen / std::max(v.speed, 0.18));
    }
    l.count_acc += crossings;
    l.occ_acc += std::min(occ, 1.0);
    l.step_count = crossings;
    l.step_speed = crossings > 0 ? speed_sum / crossings : -1.0;
  }
  s.interval_elapsed += 1.0;
  if (s.interval_elapsed + 1e-9 >= s.detector_period) {
    for (auto& l : s.loops) {
      l.last_count = l.count_acc;
      l.last_occ = l.occ_acc / s.interval_elapsed;
      l.count_acc = 0;
      l.occ_acc = 0.0;
    }
    s.interval_elapsed = 0.0;
  }
}

// Per-second per-vehicle emissions: wheel-power balance with idle floor
// (constants from the generated physics_constants.h; model documented in
// sim/physics.py). Accumulated onto the vehicle so only completed trips
// count, matching the reference tripinfo parser (parsers.py:84-86).
void emissions_pass(Sim& s, const double prev_speed[kMaxChains][kSlots]) {
  for (int c = 0; c < s.n_chains; ++c) {
    Chain& ch = s.chains[c];
    for (int i = 0; i < ch.count; ++i) {
      Vehicle& v = ch.slots[(ch.head + i) % kSlots];
      double a = v.speed - prev_speed[c][(ch.head + i) % kSlots];
      double p = (kRollingResN + kAeroDrag * v.speed * v.speed) * v.speed +
                 kVehMassKg * v.speed * a;
      if (p < 0) p = 0;
      v.co2 += kCo2IdleMgps + kCo2PerWheelJ * p;
      v.nox += kNoxIdleMgps + kNoxPerWheelJ * p;
    }
  }
}

void pop_arrivals(Sim& s) {
  for (int c = 0; c < s.n_chains; ++c) {
    Chain& ch = s.chains[c];
    int route = c < 3 ? 0 : (c == 3 ? 1 : 2);
    while (ch.count > 0 && ch.at(0).pos > ch.length) {
      const Vehicle& v = ch.at(0);
      double travel = s.t - v.depart_t;
      double loss = std::max(0.0, travel - s.freeflow_tt[c]);
      s.arrived += 1.0;
      s.travel_sum += travel;
      s.loss_sum += loss;
      s.wait_sum += v.wait;
      s.route_count[route] += 1.0;
      s.route_travel[route] += travel;
      s.route_loss[route] += loss;
      s.co2_sum += v.co2;
      s.nox_sum += v.nox;
      s.trip_travel.push_back(travel);
      s.trip_loss.push_back(loss);
      ch.head = (ch.head + 1) % kSlots;
      --ch.count;
    }
  }
}

void spawn(Sim& s) {
  double rate_vps[kMaxChains];
  double main = s.demand[0], ramp = s.demand[1], off = s.demand[2];
  // Equilibrium lane choice (sim/core.py MAIN_LANE_SHARES — keep in sync).
  rate_vps[0] = main * kLaneShare0 / 3600.0;
  rate_vps[1] = main * kLaneShare1 / 3600.0;
  rate_vps[2] = main * kLaneShare2 / 3600.0;
  rate_vps[3] = ramp / 3600.0;
  rate_vps[4] = off / 3600.0;
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  for (int c = 0; c < s.n_chains; ++c) {
    Chain& ch = s.chains[c];
    ch.pending += rate_vps[c];
    s.loaded += rate_vps[c];
    if (ch.pending < 1.0 || ch.count >= kSlots - 2) continue;
    double entry_gap = 1e18;
    if (ch.count > 0) entry_gap = ch.at(ch.count - 1).pos - kVehLen;
    if (entry_gap <= kSpacing) continue;
    Vehicle& v = ch.slots[(ch.head + ch.count) % kSlots];
    v.pos = 0.0;
    v.speed = std::min(ch.seg_speed[0], entry_gap / kIdmT);
    v.depart_t = s.t;
    v.wait = 0.0;
    v.co2 = 0.0;
    v.nox = 0.0;
    v.connected = uni(s.rng) < s.demand[3];
    ++ch.count;
    ch.pending -= 1.0;
    s.departed += 1.0;
  }
}

int zone_count(const Sim& s) {
  double fr_lo = s.merge_zone_lo + s.merge_offset - kFrictionWindow;
  int n = 0;
  for (int c = 0; c < std::min(s.n_chains, 4); ++c) {
    double off = (c == 3) ? s.merge_offset : 0.0;
    for (int i = 0; i < s.chains[c].count; ++i)
      if (s.chains[c].at(i).pos + off >= fr_lo) ++n;
  }
  return n;
}

void update_breakdown(Sim& s) {
  int n = zone_count(s);
  if (n > kBreakdownNHi)
    s.breakdown = std::min(s.breakdown + kBreakdownRateUp, 1.0);
  else if (n < kBreakdownNLo)
    s.breakdown = std::max(s.breakdown - kBreakdownRateDown, 0.0);
}

void step_1s(Sim& s) {
  static thread_local double prev_pos[kMaxChains][kSlots];
  static thread_local double prev_speed[kMaxChains][kSlots];
  for (int c = 0; c < s.n_chains; ++c)
    for (int i = 0; i < s.chains[c].count; ++i) {
      int slot = (s.chains[c].head + i) % kSlots;
      prev_pos[c][slot] = s.chains[c].slots[slot].pos;
      prev_speed[c][slot] = s.chains[c].slots[slot].speed;
    }
  for (int k = 0; k < kSubsteps; ++k) substep(s);
  s.t += 1.0;
  detector_pass(s, prev_pos);
  emissions_pass(s, prev_speed);
  update_breakdown(s);
  pop_arrivals(s);
  spawn(s);
}

}  // namespace

extern "C" {

void* ts_create(int n_chains, const double* chain_len,
                const int* n_segs, const double* seg_end,
                const double* seg_speed, const double* stop_line,
                double merge_offset, double merge_zone_lo,
                int n_loops, const int* loop_chain, const double* loop_pos,
                double ramp_edge_end, double detector_period,
                const double* freeflow_tt, uint64_t seed) {
  Sim* s = new Sim();
  s->n_chains = n_chains;
  for (int c = 0; c < n_chains; ++c) {
    Chain& ch = s->chains[c];
    ch.length = chain_len[c];
    ch.n_segs = n_segs[c];
    for (int k = 0; k < n_segs[c]; ++k) {
      ch.seg_end[k] = seg_end[c * kMaxSegs + k];
      ch.seg_speed[k] = seg_speed[c * kMaxSegs + k];
    }
    ch.stop_line = stop_line[c];
    s->freeflow_tt[c] = freeflow_tt[c];
  }
  s->merge_offset = merge_offset;
  s->merge_zone_lo = merge_zone_lo;
  s->ramp_edge_end = ramp_edge_end;
  s->detector_period = detector_period;
  s->loops.resize(n_loops);
  for (int l = 0; l < n_loops; ++l) {
    s->loops[l].chain = loop_chain[l];
    s->loops[l].pos = loop_pos[l];
  }
  s->rng.seed(seed);
  return s;
}

void ts_destroy(void* h) { delete static_cast<Sim*>(h); }

void ts_reset(void* h, double main_vph, double ramp_vph, double off_vph,
              double pen_rate, uint64_t seed) {
  Sim* s = static_cast<Sim*>(h);
  s->clear_vehicles();
  s->demand[0] = main_vph;
  s->demand[1] = ramp_vph;
  s->demand[2] = off_vph;
  s->demand[3] = pen_rate;
  s->rng.seed(seed);
  s->phase = 1;
  // 5 s red warm-up (host controller reset parity, rl_controller.py:165-173
  // is driven by the Python side; the backend itself starts cold).
}

void ts_step(void* h, int phase, int n) {
  Sim* s = static_cast<Sim*>(h);
  s->phase = phase;
  for (int i = 0; i < n; ++i) step_1s(*s);
}

void ts_set_phase(void* h, int phase) { static_cast<Sim*>(h)->phase = phase; }
int ts_get_phase(void* h) { return static_cast<Sim*>(h)->phase; }
double ts_time(void* h) { return static_cast<Sim*>(h)->t; }

// Introspection for cross-simulator calibration (scripts/diag_sim_trace.py):
// the hysteretic merge-breakdown level and the conflict-zone vehicle count
// that drives it — the JAX sim exposes the same pair (sim/core.py
// zone_count / SimState.breakdown).
double ts_breakdown(void* h) { return static_cast<Sim*>(h)->breakdown; }
int ts_zone_count(void* h) { return zone_count(*static_cast<Sim*>(h)); }
void ts_set_accel_noise(void* h, double sigma) {
  static_cast<Sim*>(h)->accel_noise = sigma;
}

int ts_interval_count(void* h, int loop) {
  return static_cast<Sim*>(h)->loops[loop].last_count;
}
double ts_interval_occ(void* h, int loop) {
  return 100.0 * static_cast<Sim*>(h)->loops[loop].last_occ;
}
int ts_step_count(void* h, int loop) {
  return static_cast<Sim*>(h)->loops[loop].step_count;
}
double ts_step_speed(void* h, int loop) {
  return static_cast<Sim*>(h)->loops[loop].step_speed;
}

int ts_chain_count(void* h, int chain, double lo, double hi) {
  Sim* s = static_cast<Sim*>(h);
  const Chain& ch = s->chains[chain];
  int n = 0;
  for (int i = 0; i < ch.count; ++i) {
    double p = ch.at(i).pos;
    if (p >= lo && p <= hi) ++n;
  }
  return n;
}

// Fills up to `cap` vehicles; returns the number written.
int ts_snapshot(void* h, double* pos, double* speed, int* chain,
                uint8_t* connected, int cap) {
  Sim* s = static_cast<Sim*>(h);
  int n = 0;
  for (int c = 0; c < s->n_chains && n < cap; ++c) {
    const Chain& ch = s->chains[c];
    for (int i = 0; i < ch.count && n < cap; ++i) {
      const Vehicle& v = ch.at(i);
      pos[n] = v.pos;
      speed[n] = v.speed;
      chain[n] = c;
      connected[n] = v.connected ? 1 : 0;
      ++n;
    }
  }
  return n;
}

void ts_trip_stats(void* h, double* out) {
  Sim* s = static_cast<Sim*>(h);
  out[0] = s->arrived;
  out[1] = s->travel_sum;
  out[2] = s->loss_sum;
  out[3] = s->wait_sum;
  out[4] = s->departed;
  out[5] = s->loaded;
  out[6] = s->t;
}

// Full tripinfo-equivalent statistics (24 doubles):
//  [0..6]  arrived, travel_sum, loss_sum, wait_sum, departed, loaded, t
//  [7..9]  co2_mg, fuel_ml, nox_mg                  (completed trips)
//  [10..14] median_travel, std_travel, median_loss, std_loss, sum_sq_loss
//  [15+3r] route r in {Mainline, On-Ramp, Off-Ramp}: count, travel_sum,
//          loss_sum
void ts_trip_stats_full(void* h, double* out) {
  Sim* s = static_cast<Sim*>(h);
  ts_trip_stats(h, out);
  out[7] = s->co2_sum;
  out[8] = s->co2_sum / kCo2PerFuelMl;
  out[9] = s->nox_sum;

  auto median = [](std::vector<double> v) -> double {
    if (v.empty()) return 0.0;
    size_t mid = v.size() / 2;
    std::nth_element(v.begin(), v.begin() + mid, v.end());
    double hi = v[mid];
    if (v.size() % 2 == 1) return hi;
    std::nth_element(v.begin(), v.begin() + mid - 1, v.begin() + mid);
    return 0.5 * (hi + v[mid - 1]);
  };
  auto stddev = [](const std::vector<double>& v) -> double {
    if (v.size() < 2) return 0.0;
    double mean = 0.0;
    for (double x : v) mean += x;
    mean /= v.size();
    double ss = 0.0;
    for (double x : v) ss += (x - mean) * (x - mean);
    return std::sqrt(ss / (v.size() - 1));  // sample std (pandas .std())
  };
  out[10] = median(s->trip_travel);
  out[11] = stddev(s->trip_travel);
  out[12] = median(s->trip_loss);
  out[13] = stddev(s->trip_loss);
  double ss = 0.0;
  for (double x : s->trip_loss) ss += x * x;
  out[14] = ss;
  for (int r = 0; r < 3; ++r) {
    out[15 + 3 * r] = s->route_count[r];
    out[16 + 3 * r] = s->route_travel[r];
    out[17 + 3 * r] = s->route_loss[r];
  }
}

}  // extern "C"
