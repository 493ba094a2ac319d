// Native host-side solver core for the TPU i2LQR framework.
//
// Role (SURVEY.md §2 "Native components"): the reference's only native code is
// CasADi/IPOPT behind nlpsol (control/nonlinear_lmpc.py:116). This library is
// the new framework's native runtime piece: a zero-dependency C++ (C ABI)
// implementation of the kinematic-bicycle iLQR solve and the LM-shooting
// feasibility solve, used as (a) the embedded/real-time deployment path that
// needs no Python/JAX at the control loop, and (b) a host oracle for
// cross-validating the JAX solvers (tests/test_native.py).
//
// Semantics mirror the JAX implementations, which in turn mirror
// /root/reference/iterative_ilqr/control/iterative_ilqr.py:7-160 (iLQR) and
// the NLP of control/nonlinear_lmpc.py:19-197 (feasibility). All math f64.

#include <cmath>
#include <cstring>
#include <algorithm>

namespace {

constexpr int XD = 4;
constexpr int UD = 2;

struct Params {
  double q[16];        // running state weight (row major 4x4)
  double r[4];         // running input weight (2x2)
  double qt[16];       // terminal weight (4x4)
  double ctrl_q1, ctrl_q2;
  double obs_q1, obs_q2;
  double safety_margin;
  double eps;
  double lamb_factor, max_lamb;
  int max_ilqr_iter;
  int param_horizon;   // obstacle extrapolation horizon for terminal cost
  double a_max, delta_max_r, delta_max;
  // obstacle
  double ox, oy, ow, oh, ospd;
  int omove;           // 0 static, 1 +y, 2 -x
  int opresent;
};

inline void stepDyn(const double* x, const double* u, double dt, double* out) {
  const double arc = x[2] * dt + 0.5 * u[0] * dt * dt;
  out[0] = x[0] + std::cos(x[3]) * arc;
  out[1] = x[1] + std::sin(x[3]) * arc;
  out[2] = x[2] + u[0] * dt;
  out[3] = x[3] + u[1] * dt;
}

inline void obstacleCenter(const Params& p, double off, double* cx, double* cy) {
  *cx = p.ox - (p.omove == 2 ? p.ospd * off : 0.0);
  *cy = p.oy + (p.omove == 1 ? p.ospd * off : 0.0);
}

// Gradient + Gauss-Newton Hessian of the exponential obstacle barrier at
// (px, py), extrapolated ``off`` steps (ilqr_helper.py:32-51 semantics).
inline void obsBarrier(const Params& p, double px, double py, double off,
                       double gx[2], double gh[3]) {
  gx[0] = gx[1] = gh[0] = gh[1] = gh[2] = 0.0;
  if (!p.opresent) return;
  double cx, cy;
  obstacleCenter(p, off, &cx, &cy);
  const double ia = 1.0 / (p.ow * p.ow), ib = 1.0 / (p.oh * p.oh);
  const double dz = px - cx, dy = py - cy;
  const double h = 1.0 + p.safety_margin - (dz * dz * ia + dy * dy * ib);
  const double e = std::exp(p.obs_q2 * h);
  const double hd0 = -2.0 * ia * dz, hd1 = -2.0 * ib * dy;
  const double ge = p.obs_q1 * p.obs_q2 * e;
  const double he = p.obs_q1 * p.obs_q2 * p.obs_q2 * e;
  gx[0] = ge * hd0;
  gx[1] = ge * hd1;
  gh[0] = he * hd0 * hd0;
  gh[1] = he * hd0 * hd1;
  gh[2] = he * hd1 * hd1;
}

// Spectral f(Quu), f(e) = 1/(max(e,0)+lamb), for symmetric 2x2.
inline void regInv2x2(const double q00, const double q01, const double q11,
                      double lamb, double inv[3]) {
  const double mean = 0.5 * (q00 + q11);
  const double disc =
      std::sqrt(std::max(0.25 * (q00 - q11) * (q00 - q11) + q01 * q01, 0.0));
  const double e1 = mean + disc, e2 = mean - disc;
  const double f1 = 1.0 / (std::max(e1, 0.0) + lamb);
  const double f2 = 1.0 / (std::max(e2, 0.0) + lamb);
  double beta = 0.0;
  if (disc > 1e-12) beta = (f1 - f2) / (e1 - e2);
  const double alpha = f1 - beta * e1;
  inv[0] = alpha + beta * q00;
  inv[1] = beta * q01;
  inv[2] = alpha + beta * q11;
}

inline double quad(const double* m, const double* d, int n) {
  double acc = 0.0;
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) acc += m[i * n + j] * d[i] * d[j];
  return acc;
}

void rollout(const double* x0, const double* us, int n, double dt,
             double* xs) {
  std::memcpy(xs, x0, XD * sizeof(double));
  for (int i = 0; i < n; ++i)
    stepDyn(xs + i * XD, us + i * UD, dt, xs + (i + 1) * XD);
}

double loopCost(const Params& p, const double* xs, const double* us, int n,
                const double* xterm) {
  double cost = 0.0;
  for (int i = 0; i < n; ++i) {
    cost += quad(p.q, xs + i * XD, XD) + quad(p.r, us + i * UD, UD);
  }
  double d[XD];
  for (int k = 0; k < XD; ++k) d[k] = xs[n * XD + k] - xterm[k];
  return cost + quad(p.qt, d, XD);
}

void clipU(const Params& p, double* u) {
  u[0] = std::min(std::max(u[0], -p.a_max), p.a_max);
  u[1] = std::min(std::max(u[1], -p.delta_max_r), p.delta_max_r);
}

// Riccati backward pass (iterative_ilqr.py:88-130). ks: (n,2), Ks: (n,2,4).
void backwardPass(const Params& p, const double* xs, const double* us, int n,
                  double dt, double lamb, const double* xterm, double* ks,
                  double* Ks) {
  // terminal seed
  double vx[XD], vxx[XD][XD];
  double d[XD];
  for (int k = 0; k < XD; ++k) d[k] = xs[n * XD + k] - xterm[k];
  for (int i = 0; i < XD; ++i) {
    vx[i] = 0.0;
    for (int j = 0; j < XD; ++j) {
      vx[i] += 2.0 * p.qt[i * XD + j] * d[j];
      vxx[i][j] = 2.0 * p.qt[i * XD + j];
    }
  }
  double gx[2], gh[3];
  obsBarrier(p, xs[n * XD + 0], xs[n * XD + 1], (double)p.param_horizon, gx, gh);
  vx[0] += gx[0];
  vx[1] += gx[1];
  vxx[0][0] += gh[0];
  vxx[0][1] += gh[1];
  vxx[1][0] += gh[1];
  vxx[1][1] += gh[2];

  for (int i = n - 1; i >= 0; --i) {
    const double* xi = xs + i * XD;
    const double* xn = xs + (i + 1) * XD;
    const double* ui = us + i * UD;
    const double arc = xn[2] * dt + 0.5 * ui[0] * dt * dt;
    const double st = std::sin(xn[3]), ct = std::cos(xn[3]);
    const double a02 = ct * dt, a03 = -arc * st;
    const double a12 = st * dt, a13 = arc * ct;
    const double b00 = 0.5 * dt * dt * ct, b10 = 0.5 * dt * dt * st;

    // stage cost derivatives
    const double ea_hi = std::exp(p.ctrl_q2 * (ui[0] - p.a_max));
    const double ea_lo = std::exp(p.ctrl_q2 * (-p.a_max - ui[0]));
    const double ed_hi = std::exp(p.ctrl_q2 * (ui[1] - p.delta_max_r));
    const double ed_lo = std::exp(p.ctrl_q2 * (-p.delta_max_r - ui[1]));
    double lu[UD] = {
        2.0 * (p.r[0] * ui[0] + p.r[1] * ui[1]) +
            p.ctrl_q1 * p.ctrl_q2 * (ea_hi - ea_lo),
        2.0 * (p.r[2] * ui[0] + p.r[3] * ui[1]) +
            p.ctrl_q1 * p.ctrl_q2 * (ed_hi - ed_lo)};
    const double q22 = p.ctrl_q2 * p.ctrl_q2;
    double luu00 = 2.0 * p.r[0] + p.ctrl_q1 * q22 * (ea_hi + ea_lo);
    double luu01 = 2.0 * p.r[1];
    double luu11 = 2.0 * p.r[3] + p.ctrl_q1 * q22 * (ed_hi + ed_lo);
    double lx[XD];
    for (int a = 0; a < XD; ++a) {
      lx[a] = 0.0;
      for (int bdim = 0; bdim < XD; ++bdim)
        lx[a] += 2.0 * p.q[a * XD + bdim] * xi[bdim];  // dX vs xtarget = 0
    }
    obsBarrier(p, xi[0], xi[1], (double)i, gx, gh);
    lx[0] += gx[0];
    lx[1] += gx[1];

    // q_x = lx + A^T vx ; q_u = lu + B^T vx
    double qx[XD] = {lx[0] + vx[0], lx[1] + vx[1],
                     lx[2] + a02 * vx[0] + a12 * vx[1] + vx[2],
                     lx[3] + a03 * vx[0] + a13 * vx[1] + vx[3]};
    double qu[UD] = {lu[0] + b00 * vx[0] + b10 * vx[1] + dt * vx[2],
                     lu[1] + dt * vx[3]};
    // W = vxx A
    double W[XD][XD];
    for (int rr = 0; rr < XD; ++rr) {
      W[rr][0] = vxx[rr][0];
      W[rr][1] = vxx[rr][1];
      W[rr][2] = a02 * vxx[rr][0] + a12 * vxx[rr][1] + vxx[rr][2];
      W[rr][3] = a03 * vxx[rr][0] + a13 * vxx[rr][1] + vxx[rr][3];
    }
    // q_xx = l_xx + A^T W ; l_xx = 2Q + obstacle GN in the (x, y) block
    double qxx[XD][XD];
    for (int cdim = 0; cdim < XD; ++cdim) {
      qxx[0][cdim] = W[0][cdim];
      qxx[1][cdim] = W[1][cdim];
      qxx[2][cdim] = a02 * W[0][cdim] + a12 * W[1][cdim] + W[2][cdim];
      qxx[3][cdim] = a03 * W[0][cdim] + a13 * W[1][cdim] + W[3][cdim];
    }
    for (int a = 0; a < XD; ++a)
      for (int bdim = 0; bdim < XD; ++bdim)
        qxx[a][bdim] += 2.0 * p.q[a * XD + bdim];
    qxx[0][0] += gh[0];
    qxx[0][1] += gh[1];
    qxx[1][0] += gh[1];
    qxx[1][1] += gh[2];
    // q_uu = l_uu + B^T vxx B ; q_ux = B^T W
    const double quu00 =
        luu00 + b00 * (b00 * vxx[0][0] + b10 * vxx[1][0] + dt * vxx[2][0]) +
        b10 * (b00 * vxx[0][1] + b10 * vxx[1][1] + dt * vxx[2][1]) +
        dt * (b00 * vxx[0][2] + b10 * vxx[1][2] + dt * vxx[2][2]);
    const double quu01 =
        luu01 + dt * (b00 * vxx[0][3] + b10 * vxx[1][3] + dt * vxx[2][3]);
    const double quu11 = luu11 + dt * dt * vxx[3][3];
    double qux[UD][XD];
    for (int cdim = 0; cdim < XD; ++cdim) {
      qux[0][cdim] = b00 * W[0][cdim] + b10 * W[1][cdim] + dt * W[2][cdim];
      qux[1][cdim] = dt * W[3][cdim];
    }
    double inv[3];
    regInv2x2(quu00, quu01, quu11, lamb, inv);
    double* ki = ks + i * UD;
    double* Ki = Ks + i * UD * XD;
    ki[0] = -(inv[0] * qu[0] + inv[1] * qu[1]);
    ki[1] = -(inv[1] * qu[0] + inv[2] * qu[1]);
    for (int cdim = 0; cdim < XD; ++cdim) {
      Ki[0 * XD + cdim] = -(inv[0] * qux[0][cdim] + inv[1] * qux[1][cdim]);
      Ki[1 * XD + cdim] = -(inv[1] * qux[0][cdim] + inv[2] * qux[1][cdim]);
    }
    // value updates
    const double t0 = quu00 * ki[0] + quu01 * ki[1];
    const double t1 = quu01 * ki[0] + quu11 * ki[1];
    double nvx[XD], nvxx[XD][XD];
    for (int cdim = 0; cdim < XD; ++cdim)
      nvx[cdim] = qx[cdim] - (Ki[0 * XD + cdim] * t0 + Ki[1 * XD + cdim] * t1);
    double S[UD][XD];
    for (int cdim = 0; cdim < XD; ++cdim) {
      S[0][cdim] = quu00 * Ki[0 * XD + cdim] + quu01 * Ki[1 * XD + cdim];
      S[1][cdim] = quu01 * Ki[0 * XD + cdim] + quu11 * Ki[1 * XD + cdim];
    }
    for (int a = 0; a < XD; ++a)
      for (int bdim = 0; bdim < XD; ++bdim)
        nvxx[a][bdim] = qxx[a][bdim] - (Ki[0 * XD + a] * S[0][bdim] +
                                        Ki[1 * XD + a] * S[1][bdim]);
    std::memcpy(vx, nvx, sizeof(vx));
    std::memcpy(vxx, nvxx, sizeof(vxx));
  }
}

double forwardPass(const Params& p, const double* xs, const double* us, int n,
                   double dt, const double* ks, const double* Ks,
                   const double* xterm, double* xs_new, double* us_new) {
  std::memcpy(xs_new, xs, XD * sizeof(double));
  double cost = 0.0;
  for (int i = 0; i < n; ++i) {
    const double* Ki = Ks + i * UD * XD;
    double dx[XD];
    for (int k = 0; k < XD; ++k) dx[k] = xs_new[i * XD + k] - xs[i * XD + k];
    double* ui = us_new + i * UD;
    for (int r = 0; r < UD; ++r) {
      ui[r] = us[i * UD + r] + ks[i * UD + r];
      for (int k = 0; k < XD; ++k) ui[r] += Ki[r * XD + k] * dx[k];
    }
    clipU(p, ui);
    double d[XD];
    for (int k = 0; k < XD; ++k) d[k] = xs_new[i * XD + k] - xterm[k];
    cost += quad(p.q, d, XD) + quad(p.r, ui, UD);
    stepDyn(xs_new + i * XD, ui, dt, xs_new + (i + 1) * XD);
  }
  double d[XD];
  for (int k = 0; k < XD; ++k) d[k] = xs_new[n * XD + k] - xterm[k];
  return cost + quad(p.qt, d, XD);
}

}  // namespace

extern "C" {

// Full LM-regularized iLQR solve. us (n*2) is in/out; xs_out (n+1)*4; returns
// iterations executed; lamb_io carries the LM lambda in/out.
int ilqr_solve_native(const Params* pp, const double* x0, const double* xterm,
                      int n, double dt, double* us, double* xs_out,
                      double* lamb_io) {
  const Params& p = *pp;
  double lamb = *lamb_io;
  const int cap = 512;
  double xs[(cap + 1) * XD], xs_new[(cap + 1) * XD], us_new[cap * UD];
  double ks[cap * UD], Ks[cap * UD * XD];
  if (n > cap) return -1;
  int it = 0;
  for (; it < p.max_ilqr_iter; ++it) {
    for (int i = 0; i < n; ++i) clipU(p, us + i * UD);
    rollout(x0, us, n, dt, xs);
    const double cost = loopCost(p, xs, us, n, xterm);
    backwardPass(p, xs, us, n, dt, lamb, xterm, ks, Ks);
    const double cost_new =
        forwardPass(p, xs, us, n, dt, ks, Ks, xterm, xs_new, us_new);
    if (cost_new < cost) {
      std::memcpy(us, us_new, n * UD * sizeof(double));
      lamb /= p.lamb_factor;
      if (std::fabs((cost_new - cost) / cost) < p.eps) {
        ++it;
        break;
      }
    } else {
      lamb *= p.lamb_factor;
      if (lamb > p.max_lamb) {
        ++it;
        break;
      }
    }
  }
  for (int i = 0; i < n; ++i) clipU(p, us + i * UD);
  rollout(x0, us, n, dt, xs_out);
  *lamb_io = lamb;
  return it;
}

// Projected Levenberg-Marquardt shooting feasibility solve (the NLMPC
// candidate NLP; see ops/lm_shooting.py). Returns 1 if feasible.
int lm_feasibility_solve_native(const Params* pp, const double* x0,
                                const double* xterm, int n, double dt,
                                double* us, double* xs_out, double* term_err,
                                double* max_viol) {
  const Params& p = *pp;
  const int cap = 64;
  if (n > cap || n < 2) return -1;
  const int nv = n * UD;
  const double w_obs = 10.0, margin = 1e-3;
  const int n_res = XD + (n - 1);

  auto clipRaw = [&](double* u) {
    u[0] = std::min(std::max(u[0], -p.a_max), p.a_max);
    u[1] = std::min(std::max(u[1], -p.delta_max), p.delta_max);
  };
  auto resid = [&](const double* uf, double* r) {
    double uc[cap * UD];
    std::memcpy(uc, uf, nv * sizeof(double));
    for (int i = 0; i < n; ++i) clipRaw(uc + i * UD);
    double xs[(cap + 1) * XD];
    rollout(x0, uc, n, dt, xs);
    for (int k = 0; k < XD; ++k) r[k] = xs[n * XD + k] - xterm[k];
    for (int i = 1; i < n; ++i) {
      double g = 0.0;
      if (p.opresent) {
        double cx, cy;
        obstacleCenter(p, (double)i, &cx, &cy);
        const double dz = xs[i * XD + 0] - cx, dy = xs[i * XD + 1] - cy;
        g = 1.0 - (dz * dz / (p.ow * p.ow) + dy * dy / (p.oh * p.oh));
        g = std::max(g + margin, 0.0);
      }
      r[XD + i - 1] = std::sqrt(w_obs) * g;
    }
  };
  auto ssq = [&](const double* r) {
    double acc = 0.0;
    for (int k = 0; k < n_res; ++k) acc += r[k] * r[k];
    return acc;
  };

  double uf[cap * UD];
  std::memcpy(uf, us, nv * sizeof(double));
  for (int i = 0; i < n; ++i) clipRaw(uf + i * UD);
  double lam = 1e-3;
  double r0[XD + cap], r1[XD + cap], J[(XD + cap) * cap * UD];
  for (int it = 0; it < 120; ++it) {
    resid(uf, r0);
    const double f0 = ssq(r0);
    if (f0 < 1e-14) break;
    // forward-difference Jacobian (nv small)
    const double h = 1e-7;
    for (int c = 0; c < nv; ++c) {
      double save = uf[c];
      uf[c] = save + h;
      resid(uf, r1);
      uf[c] = save;
      for (int k = 0; k < n_res; ++k) J[k * nv + c] = (r1[k] - r0[k]) / h;
    }
    // normal equations H = J^T J + lam I ; g = J^T r
    double H[cap * UD * cap * UD], g[cap * UD];
    for (int a = 0; a < nv; ++a) {
      g[a] = 0.0;
      for (int k = 0; k < n_res; ++k) g[a] += J[k * nv + a] * r0[k];
      for (int b = 0; b < nv; ++b) {
        double acc = 0.0;
        for (int k = 0; k < n_res; ++k) acc += J[k * nv + a] * J[k * nv + b];
        H[a * nv + b] = acc + (a == b ? lam : 0.0);
      }
    }
    // Cholesky solve H du = -g
    double L[cap * UD * cap * UD];
    bool ok = true;
    for (int a = 0; a < nv && ok; ++a) {
      for (int b = 0; b <= a; ++b) {
        double s = H[a * nv + b];
        for (int k = 0; k < b; ++k) s -= L[a * nv + k] * L[b * nv + k];
        if (a == b) {
          if (s <= 0.0) { ok = false; break; }
          L[a * nv + a] = std::sqrt(s);
        } else {
          L[a * nv + b] = s / L[b * nv + b];
        }
      }
    }
    if (!ok) { lam *= 4.0; continue; }
    double y[cap * UD], du[cap * UD];
    for (int a = 0; a < nv; ++a) {
      double s = -g[a];
      for (int k = 0; k < a; ++k) s -= L[a * nv + k] * y[k];
      y[a] = s / L[a * nv + a];
    }
    for (int a = nv - 1; a >= 0; --a) {
      double s = y[a];
      for (int k = a + 1; k < nv; ++k) s -= L[k * nv + a] * du[k];
      du[a] = s / L[a * nv + a];
    }
    // backtracking
    static const double alphas[5] = {1.0, 0.5, 0.25, 0.1, 0.02};
    double best_f = f0;
    double best_uf[cap * UD];
    bool accepted = false;
    for (double a : alphas) {
      double cand[cap * UD];
      for (int c = 0; c < nv; ++c) cand[c] = uf[c] + a * du[c];
      resid(cand, r1);
      const double fc = ssq(r1);
      if (fc < best_f) {
        best_f = fc;
        std::memcpy(best_uf, cand, nv * sizeof(double));
        accepted = true;
      }
    }
    if (accepted) {
      std::memcpy(uf, best_uf, nv * sizeof(double));
      lam = std::max(lam * 0.33, 1e-12);
    } else {
      lam *= 4.0;
      if (lam > 1e10) break;
    }
  }
  for (int i = 0; i < n; ++i) clipRaw(uf + i * UD);
  std::memcpy(us, uf, nv * sizeof(double));
  double xs[(cap + 1) * XD];
  rollout(x0, us, n, dt, xs);
  std::memcpy(xs_out, xs, (n + 1) * XD * sizeof(double));
  double d2 = 0.0;
  for (int k = 0; k < XD; ++k) {
    const double d = xs[n * XD + k] - xterm[k];
    d2 += d * d;
  }
  *term_err = std::sqrt(d2);
  double viol = -1e30;
  for (int i = 1; i < n; ++i) {
    double g = 0.0;
    if (p.opresent) {
      double cx, cy;
      obstacleCenter(p, (double)i, &cx, &cy);
      const double dz = xs[i * XD + 0] - cx, dy = xs[i * XD + 1] - cy;
      g = 1.0 - (dz * dz / (p.ow * p.ow) + dy * dy / (p.oh * p.oh));
    }
    viol = std::max(viol, g);
  }
  *max_viol = viol;
  return (*term_err <= 1e-4 && viol <= 1e-4) ? 1 : 0;
}

// Closed-loop plant step (true dynamics, no noise) — embedded path helper.
void bicycle_step_native(const double* x, const double* u, double dt,
                         double* out) {
  stepDyn(x, u, dt, out);
}

}  // extern "C"
