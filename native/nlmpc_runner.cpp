// Standalone C++ NLMPC closed-loop runner — the embedded deployment path for
// the constrained-MPC controller family.
//
// A complete iterative-task learning run (seed lap -> L laps of closed-loop
// NLMPC with safe-set growth) with zero Python/JAX dependency, built on the
// native LM-shooting feasibility solver (ilqr_native.cpp). Semantics mirror
// the host controller (control/nlmpc.py, which mirrors /root/reference/
// iterative_ilqr/utils/base.py:514-690 and control/nonlinear_lmpc.py:6-214),
// spaceVarying safe-set option:
//   - L1-kNN candidates around the terminal guess (base.py:548-555),
//   - one warm-started feasibility solve per candidate; cost N + Qfun if
//     feasible else Inf (nonlinear_lmpc.py:197),
//   - candidate selection visiting laps in order with strict '<'
//     (reproduces the lexicographic list-min, base.py:605),
//   - terminal-guess advance to the successor safe-set point + warm-start
//     shift (base.py:619-639),
//   - horizon shrink when the chosen candidate is the lap's last point,
//     FLOORED at 1 (the reference decrements unguarded, base.py:651-654 —
//     a latent crash at horizon 0); horizon-1 steps become pure reach
//     checks (nonlinear_lmpc.py:199-213),
//   - all-infeasible step holds the previous input (the reference pauses
//     forever, base.py:607-609),
//   - 121-step lap budget, goal tolerance 0.8.
//
// Exposed as extern "C" run_nlmpc_closed_loop() for ctypes cross-checks
// (tests/test_native.py) and embeddable control stacks.

#include <cmath>
#include <cstring>
#include <vector>
#include <algorithm>
#include <limits>

namespace {
constexpr int XD = 4;
constexpr int UD = 2;
}

// Must match the Params struct in ilqr_native.cpp exactly (same TU-set).
struct NlmpcParamsABI {
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

extern "C" int lm_feasibility_solve_native(const NlmpcParamsABI* pp,
                                           const double* x0,
                                           const double* xterm, int n,
                                           double dt, double* us,
                                           double* xs_out, double* term_err,
                                           double* max_viol);
extern "C" void bicycle_step_native(const double* x, const double* u,
                                    double dt, double* out);

namespace {

struct NLap {
  std::vector<double> xs;  // (T+1) * 4 row major
  std::vector<double> us;  // T * 2
  int len() const { return (int)xs.size() / XD; }
};

// scripted seed maneuver (base.py:103-138)
NLap nlmpcSeedLap(double dt) {
  NLap lap;
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

void nlmpcKnnL1(const NLap& lap, const double* guess, int k, int* idx_out) {
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

// Runs seed + lap_number closed-loop NLMPC learning laps. lap_steps_out must
// hold lap_number ints (121 = lap did not finish). Returns completed laps.
int run_nlmpc_closed_loop(const NlmpcParamsABI* pp, int lap_number,
                          int num_ss_points, int num_ss_iter, int num_horizon,
                          double dt, int* lap_steps_out) {
  const NlmpcParamsABI& p = *pp;
  std::vector<NLap> ss;
  ss.push_back(nlmpcSeedLap(dt));
  double goal[XD];
  std::memcpy(goal, &ss[0].xs[(ss[0].len() - 1) * XD], sizeof(goal));

  int completed = 0;
  for (int lap_i = 0; lap_i < lap_number; ++lap_i) {
    NLap rec;
    double x[XD] = {0, 0, 0, 0};
    rec.xs.insert(rec.xs.end(), x, x + XD);
    int horizon = num_horizon;
    // per-lap warm start from the newest lap (base.py:661-675)
    const NLap& newest = ss.back();
    double guess[XD];
    std::memcpy(guess, &newest.xs[std::min(horizon, newest.len() - 1) * XD],
                sizeof(guess));
    std::vector<double> u_warm(num_horizon * UD, 0.0);
    for (int i = 0; i < horizon && i < (int)newest.us.size() / UD; ++i) {
      u_warm[i * UD + 0] = newest.us[i * UD + 0];
      u_warm[i * UD + 1] = newest.us[i * UD + 1];
    }
    double u_prev[UD] = {0, 0};
    bool done = false;
    int steps = 0;
    for (int t = 0; t < 121 && !done; ++t) {
      const int n = horizon;
      const int min_iter = std::max(0, (int)ss.size() - num_ss_iter);
      double best_cost = std::numeric_limits<double>::infinity();
      bool best_set = false;
      std::vector<double> best_us(n * UD, 0.0);
      double best_xN[XD] = {0, 0, 0, 0};
      int chosen_idx = 0, chosen_lap = min_iter;
      for (int lid = min_iter; lid < (int)ss.size(); ++lid) {
        std::vector<int> idx(num_ss_points);
        nlmpcKnnL1(ss[lid], guess, num_ss_points, idx.data());
        for (int j = 0; j < num_ss_points; ++j) {
          const double* xt = &ss[lid].xs[idx[j] * XD];
          const double qfun = (double)(ss[lid].len() - 1 - idx[j]);
          double cost = std::numeric_limits<double>::infinity();
          std::vector<double> us(n * UD, 0.0);
          std::vector<double> xs((n + 1) * XD, 0.0);
          if (n > 1) {
            std::memcpy(us.data(), u_warm.data(), n * UD * sizeof(double));
            double term_err = 0.0, max_viol = 0.0;
            const int feas = lm_feasibility_solve_native(
                &p, x, xt, n, dt, us.data(), xs.data(), &term_err, &max_viol);
            if (feas == 1) cost = (double)n + qfun;
          } else {
            // horizon-1 reach check (nonlinear_lmpc.py:199-213)
            double u0[UD] = {u_warm[0], u_warm[1]};
            double xn[XD];
            bicycle_step_native(x, u0, dt, xn);
            double d2 = 0.0;
            for (int c = 0; c < XD; ++c) {
              const double dd = xn[c] - xt[c];
              d2 += dd * dd;
            }
            if (std::sqrt(d2) <= 1e-3) {
              cost = 1.0 + qfun;
              us[0] = u0[0];
              us[1] = u0[1];
              std::memcpy(&xs[0], x, sizeof(double) * XD);
              std::memcpy(&xs[XD], xt, sizeof(double) * XD);
            }
          }
          if (!best_set || cost < best_cost) {
            best_set = true;
            best_cost = cost;
            best_us = us;
            std::memcpy(best_xN, &xs[n * XD], sizeof(best_xN));
            chosen_idx = idx[j];
            chosen_lap = lid;
          }
        }
      }
      const bool feasible_any = std::isfinite(best_cost);
      double u[UD];
      if (feasible_any) {
        u[0] = best_us[0];
        u[1] = best_us[1];
        // terminal guess -> successor safe-set point + warm-start shift
        // (base.py:619-639); horizon shrink floored at 1
        if (chosen_idx + 1 <= ss[chosen_lap].len() - 1) {
          std::memcpy(guess, &ss[chosen_lap].xs[(chosen_idx + 1) * XD],
                      sizeof(guess));
          for (int i = 1; i < n; ++i) {
            u_warm[(i - 1) * UD + 0] = best_us[i * UD + 0];
            u_warm[(i - 1) * UD + 1] = best_us[i * UD + 1];
          }
          // append the chosen point's STORED input (base.py:639)
          u_warm[(n - 1) * UD + 0] = ss[chosen_lap].us[chosen_idx * UD + 0];
          u_warm[(n - 1) * UD + 1] = ss[chosen_lap].us[chosen_idx * UD + 1];
        } else {
          std::memcpy(guess, best_xN, sizeof(guess));
          for (int i = 1; i < n; ++i) {
            u_warm[(i - 1) * UD + 0] = best_us[i * UD + 0];
            u_warm[(i - 1) * UD + 1] = best_us[i * UD + 1];
          }
          if (n > 1) horizon = n - 1;
        }
      } else {
        u[0] = u_prev[0];
        u[1] = u_prev[1];
      }
      double xn[XD];
      bicycle_step_native(x, u, dt, xn);
      std::memcpy(x, xn, sizeof(xn));
      std::memcpy(u_prev, u, sizeof(u_prev));
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
    ss.push_back(std::move(rec));
  }
  return completed;
}

}  // extern "C"
