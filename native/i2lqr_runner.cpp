// Standalone C++ i2LQR closed-loop runner — the embedded deployment path.
//
// A complete iterative-task learning run (seed lap -> L laps of closed-loop
// i2LQR with safe-set growth) with zero Python/JAX dependency, built on the
// native solver core (ilqr_native.cpp). Semantics mirror the host controller
// (control/i2lqr.py, which mirrors /root/reference/iterative_ilqr/utils/
// base.py:305-479 and :693-726): L1-kNN candidate selection, 3-pass
// relaxation with thresholds 80*i/10^pass, lexicographic lap selection,
// horizon shrink + stored-input replay, 121-step lap budget, goal tolerance
// 0.8, goal row appended before learning (CI variant). LM lambda resets per
// candidate (same deviation as the JAX controllers).
//
// Exposed as extern "C" run_i2lqr_closed_loop() for ctypes cross-checks
// (tests/test_native.py) and embeddable control stacks.

#include <cmath>
#include <cstring>
#include <vector>
#include <algorithm>
#include <limits>

// from ilqr_native.cpp (same shared library)
struct NativeParamsFwd;  // opaque; we re-declare the layout below

namespace {
constexpr int XD = 4;
constexpr int UD = 2;
}

// Must match the Params struct in ilqr_native.cpp exactly (same TU-set).
struct ParamsABI {
  double q[16];
  double r[4];
  double qt[16];
  double ctrl_q1, ctrl_q2;
  double obs_q1, obs_q2;
  double safety_margin;
  double eps;
  double lamb_factor, max_lamb;
  int max_ilqr_iter;
  int param_horizon;
  double a_max, delta_max_r, delta_max;
  double ox, oy, ow, oh, ospd;
  int omove;
  int opresent;
};

extern "C" int ilqr_solve_native(const ParamsABI* pp, const double* x0,
                                 const double* xterm, int n, double dt,
                                 double* us, double* xs_out, double* lamb_io);
extern "C" void bicycle_step_native(const double* x, const double* u,
                                    double dt, double* out);

namespace {

struct Lap {
  std::vector<double> xs;  // (T+1) * 4 row major
  std::vector<double> us;  // T * 2
  int len() const { return (int)xs.size() / XD; }
};

// scripted seed maneuver (base.py:103-138)
Lap seedLap(double dt) {
  Lap lap;
  const double angle = M_PI / 6.0;
  const int total = (int)(120.0 / dt);
  double x[XD] = {0, 0, 0, 0};
  lap.xs.insert(lap.xs.end(), x, x + XD);
  for (int i = 0; i < total; ++i) {
    double u[UD] = {0, 0};
    if (i <= 1.0 / dt) u[0] = 1.0;
    else if (i >= total - 4.0 / dt && i <= total - 3.0 / dt) u[0] = -1.0;
    if (i > 0 && i <= 1.0 / dt) u[1] = angle;
    else if (i >= total / 2.0 - 2.0 / dt && i <= total / 2.0 - 1.0 / dt)
      u[1] = -angle;
    double xn[XD];
    bicycle_step_native(x, u, dt, xn);
    std::memcpy(x, xn, sizeof(xn));
    lap.xs.insert(lap.xs.end(), x, x + XD);
    lap.us.insert(lap.us.end(), u, u + UD);
  }
  return lap;
}

void knnL1(const Lap& lap, const double* guess, int k, int* idx_out) {
  const int t = lap.len();
  std::vector<std::pair<double, int>> d(t);
  for (int i = 0; i < t; ++i) {
    double acc = 0.0;
    for (int j = 0; j < XD; ++j)
      acc += std::fabs(lap.xs[i * XD + j] - guess[j]);
    d[i] = {acc, i};
  }
  std::stable_sort(d.begin(), d.end());
  for (int i = 0; i < k; ++i) idx_out[i] = d[std::min(i, t - 1)].second;
}

}  // namespace

extern "C" {

// Runs seed + lap_number closed-loop learning laps. lap_steps_out must hold
// lap_number ints (closed-loop steps per lap; 121 = lap did not finish).
// Returns the number of completed laps.
int run_i2lqr_closed_loop(const ParamsABI* pp, int lap_number,
                          int num_ss_points, int num_ss_iter, int num_horizon,
                          double dt, int* lap_steps_out) {
  const ParamsABI& p = *pp;
  std::vector<Lap> ss;
  ss.push_back(seedLap(dt));
  double goal[XD];
  std::memcpy(goal, &ss[0].xs[(ss[0].len() - 1) * XD], sizeof(goal));

  int completed = 0;
  for (int lap_i = 0; lap_i < lap_number; ++lap_i) {
    Lap rec;
    double x[XD] = {0, 0, 0, 0};
    rec.xs.insert(rec.xs.end(), x, x + XD);
    int horizon = num_horizon;
    std::vector<double> u_old(num_horizon * UD, 0.0);
    bool done = false;
    int steps = 0;
    for (int t = 0; t < 121 && !done; ++t) {
      double u[UD];
      if (horizon < num_horizon) {
        // stored-input shrinking-horizon replay (base.py:377-382)
        u[0] = u_old[0];
        u[1] = u_old[1];
        u_old.erase(u_old.begin(), u_old.begin() + UD);
        u_old.push_back(0.0);
        u_old.push_back(0.0);
        horizon -= 1;
      } else {
        const int min_iter = std::max(0, (int)ss.size() - num_ss_iter);
        double x_guess[XD];
        std::memcpy(x_guess, x, sizeof(x_guess));
        std::vector<double> best_us(horizon * UD, 0.0);
        double best_xN[XD];
        int chosen_idx = 0, chosen_lap = min_iter;
        for (int pass = 0; pass < 3; ++pass) {
          double best_cost = std::numeric_limits<double>::infinity();
          bool best_set = false;
          // lexicographic across laps == first lap wins ties; with distinct
          // float costs argmin over (lap, candidate) visiting laps in order
          // and strict '<' reproduces list-min selection
          for (int lid = min_iter; lid < (int)ss.size(); ++lid) {
            std::vector<int> idx(num_ss_points);
            knnL1(ss[lid], x_guess, num_ss_points, idx.data());
            for (int j = 0; j < num_ss_points; ++j) {
              const double* xt = &ss[lid].xs[idx[j] * XD];
              const double qfun = (double)(ss[lid].len() - 1 - idx[j]);
              std::vector<double> us(horizon * UD, 0.0);
              std::vector<double> xs((horizon + 1) * XD, 0.0);
              double lamb = 1.0;
              ilqr_solve_native(&p, x, xt, horizon, dt, us.data(), xs.data(),
                                &lamb);
              double d2 = 0.0;
              for (int c = 0; c < XD; ++c) {
                const double dd = xs[horizon * XD + c] - xt[c];
                d2 += dd * dd;
              }
              const double dist = std::sqrt(d2);
              const double unit = 80.0 / std::pow(10.0, pass);
              double cost;
              if (dist > unit * 55.0) {
                cost = std::numeric_limits<double>::infinity();
              } else {
                const double i_rel = std::max(1.0, std::ceil(dist / unit - 1e-12));
                cost = qfun + horizon + 100.0 * i_rel;
              }
              if (!best_set || cost < best_cost) {
                best_set = true;
                best_cost = cost;
                best_us = us;
                std::memcpy(best_xN, &xs[horizon * XD], sizeof(best_xN));
                chosen_idx = idx[j];
                chosen_lap = lid;
              }
            }
          }
          std::memcpy(x_guess, best_xN, sizeof(x_guess));  // re-center kNN
        }
        u[0] = best_us[0];
        u[1] = best_us[1];
        u_old.assign(num_horizon * UD, 0.0);
        for (int i = 1; i < horizon; ++i) {
          u_old[(i - 1) * UD + 0] = best_us[i * UD + 0];
          u_old[(i - 1) * UD + 1] = best_us[i * UD + 1];
        }
        if (chosen_idx + 1 > ss[chosen_lap].len() - 1) horizon -= 1;
      }
      double xn[XD];
      bicycle_step_native(x, u, dt, xn);
      std::memcpy(x, xn, sizeof(xn));
      rec.xs.insert(rec.xs.end(), x, x + XD);
      rec.us.insert(rec.us.end(), u, u + UD);
      steps = t + 1;
      double d2 = 0.0;
      for (int c = 0; c < XD; ++c) {
        const double dd = x[c] - goal[c];
        d2 += dd * dd;
      }
      if (std::sqrt(d2) <= 0.8) done = true;
    }
    lap_steps_out[lap_i] = steps;
    if (done) ++completed;
    // goal row appended before learning (tests/ilqr_test.py:51)
    rec.xs.insert(rec.xs.end(), goal, goal + XD);
    ss.push_back(std::move(rec));
  }
  return completed;
}

}  // extern "C"
