"""ctypes bindings + on-demand build of the native C++ solver library.

See native/ilqr_native.cpp for the role of the native component. The library
builds once with g++ -O3 into native/libilqr_native.so (rebuilt automatically
when the source is newer).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "ilqr_native.cpp")
_SRC_RUNNER = os.path.join(_NATIVE_DIR, "i2lqr_runner.cpp")
_SRC_NLMPC = os.path.join(_NATIVE_DIR, "nlmpc_runner.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libilqr_native.so")


class NativeParams(ctypes.Structure):
    _fields_ = [
        ("q", ctypes.c_double * 16),
        ("r", ctypes.c_double * 4),
        ("qt", ctypes.c_double * 16),
        ("ctrl_q1", ctypes.c_double), ("ctrl_q2", ctypes.c_double),
        ("obs_q1", ctypes.c_double), ("obs_q2", ctypes.c_double),
        ("safety_margin", ctypes.c_double),
        ("eps", ctypes.c_double),
        ("lamb_factor", ctypes.c_double), ("max_lamb", ctypes.c_double),
        ("max_ilqr_iter", ctypes.c_int),
        ("param_horizon", ctypes.c_int),
        ("a_max", ctypes.c_double), ("delta_max_r", ctypes.c_double),
        ("delta_max", ctypes.c_double),
        ("ox", ctypes.c_double), ("oy", ctypes.c_double),
        ("ow", ctypes.c_double), ("oh", ctypes.c_double),
        ("ospd", ctypes.c_double),
        ("omove", ctypes.c_int), ("opresent", ctypes.c_int),
    ]


def build(force: bool = False) -> str:
    """Compile the shared library if missing/stale; returns its path."""
    newest_src = max(os.path.getmtime(_SRC), os.path.getmtime(_SRC_RUNNER),
                     os.path.getmtime(_SRC_NLMPC))
    if (not force and os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= newest_src):
        return _LIB
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
         _SRC, _SRC_RUNNER, _SRC_NLMPC, "-o", _LIB],
        check=True, capture_output=True)
    return _LIB


_lib = None


def load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build())
        dp = ctypes.POINTER(ctypes.c_double)
        lib.ilqr_solve_native.restype = ctypes.c_int
        lib.ilqr_solve_native.argtypes = [
            ctypes.POINTER(NativeParams), dp, dp, ctypes.c_int,
            ctypes.c_double, dp, dp, dp]
        lib.lm_feasibility_solve_native.restype = ctypes.c_int
        lib.lm_feasibility_solve_native.argtypes = [
            ctypes.POINTER(NativeParams), dp, dp, ctypes.c_int,
            ctypes.c_double, dp, dp, dp, dp]
        lib.bicycle_step_native.restype = None
        lib.bicycle_step_native.argtypes = [dp, dp, ctypes.c_double, dp]
        lib.run_i2lqr_closed_loop.restype = ctypes.c_int
        lib.run_i2lqr_closed_loop.argtypes = [
            ctypes.POINTER(NativeParams), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int)]
        lib.run_nlmpc_closed_loop.restype = ctypes.c_int
        lib.run_nlmpc_closed_loop.argtypes = [
            ctypes.POINTER(NativeParams), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int)]
        _lib = lib
    return _lib


def make_params(params, limits, obstacle=None) -> NativeParams:
    """Build NativeParams from the JAX param pytrees (f64)."""
    p = NativeParams()
    q = np.asarray(params.matrix_Q, np.float64).ravel()
    r = np.asarray(params.matrix_R, np.float64).ravel()
    qt = np.asarray(params.matrix_Qterminal, np.float64).ravel()
    for i in range(16):
        p.q[i] = q[i]
        p.qt[i] = qt[i]
    for i in range(4):
        p.r[i] = r[i]
    p.ctrl_q1 = float(params.tuning_ctrl_q1)
    p.ctrl_q2 = float(params.tuning_ctrl_q2)
    p.obs_q1 = float(params.tuning_obs_q1)
    p.obs_q2 = float(params.tuning_obs_q2)
    p.safety_margin = float(params.safety_margin)
    p.eps = float(params.eps)
    p.lamb_factor = float(params.lamb_factor)
    p.max_lamb = float(params.max_lamb)
    p.max_ilqr_iter = int(params.max_ilqr_iter)
    p.param_horizon = int(params.num_horizon)
    p.a_max = float(limits.a_max)
    p.delta_max_r = float(limits.delta_max_r)
    p.delta_max = float(limits.delta_max)
    if obstacle is not None and float(np.asarray(obstacle.present)) > 0:
        p.ox = float(np.asarray(obstacle.x))
        p.oy = float(np.asarray(obstacle.y))
        p.ow = float(np.asarray(obstacle.width))
        p.oh = float(np.asarray(obstacle.height))
        p.ospd = float(np.asarray(obstacle.spd))
        p.omove = int(float(np.asarray(obstacle.moving_option)))
        p.opresent = 1
    else:
        p.ow = p.oh = 1.0
        p.opresent = 0
    return p


def ilqr_solve_native(params, limits, obstacle, x0, x_terminal, u_init,
                      lamb0: float, dt: float):
    """Native iLQR solve. Returns (us (N,2), xs (N+1,4), lamb, n_iters)."""
    lib = load()
    n = int(np.asarray(u_init).shape[0])
    p = make_params(params, limits, obstacle)
    us = np.ascontiguousarray(np.asarray(u_init, np.float64))
    xs = np.zeros((n + 1, 4), np.float64)
    x0 = np.ascontiguousarray(np.asarray(x0, np.float64))
    xt = np.ascontiguousarray(np.asarray(x_terminal, np.float64))
    lamb = ctypes.c_double(float(lamb0))
    dp = ctypes.POINTER(ctypes.c_double)
    it = lib.ilqr_solve_native(
        ctypes.byref(p), x0.ctypes.data_as(dp), xt.ctypes.data_as(dp), n,
        float(dt), us.ctypes.data_as(dp), xs.ctypes.data_as(dp),
        ctypes.byref(lamb))
    return us, xs, lamb.value, it


def lm_feasibility_solve_native(limits, obstacle, x0, x_terminal, u_init,
                                dt: float, params=None):
    """Native LM-shooting feasibility solve. Returns
    (us, xs, term_err, max_viol, feasible)."""
    from ilqr_iterative_tasks_tpu.utils.params import IlqrParams
    lib = load()
    if params is None:
        params = IlqrParams.make(dtype=np.float64)
    n = int(np.asarray(u_init).shape[0])
    p = make_params(params, limits, obstacle)
    us = np.ascontiguousarray(np.asarray(u_init, np.float64))
    xs = np.zeros((n + 1, 4), np.float64)
    x0 = np.ascontiguousarray(np.asarray(x0, np.float64))
    xt = np.ascontiguousarray(np.asarray(x_terminal, np.float64))
    term_err = ctypes.c_double(0.0)
    viol = ctypes.c_double(0.0)
    dp = ctypes.POINTER(ctypes.c_double)
    feasible = lib.lm_feasibility_solve_native(
        ctypes.byref(p), x0.ctypes.data_as(dp), xt.ctypes.data_as(dp), n,
        float(dt), us.ctypes.data_as(dp), xs.ctypes.data_as(dp),
        ctypes.byref(term_err), ctypes.byref(viol))
    return us, xs, term_err.value, viol.value, bool(feasible == 1)


def bicycle_step_native(x, u, dt: float):
    lib = load()
    x = np.ascontiguousarray(np.asarray(x, np.float64))
    u = np.ascontiguousarray(np.asarray(u, np.float64))
    out = np.zeros(4, np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.bicycle_step_native(x.ctypes.data_as(dp), u.ctypes.data_as(dp),
                            float(dt), out.ctypes.data_as(dp))
    return out


def run_i2lqr_closed_loop_native(params, limits, obstacle, lap_number: int,
                                 dt: float = 1.0):
    """Full native (C++) i2LQR learning run: seed + lap_number laps.
    Returns (lap_steps list, completed count) — the embedded deployment path,
    no Python in the control loop."""
    lib = load()
    p = make_params(params, limits, obstacle)
    steps = (ctypes.c_int * lap_number)()
    completed = lib.run_i2lqr_closed_loop(
        ctypes.byref(p), lap_number, int(params.num_ss_points),
        int(params.num_ss_iter), int(params.num_horizon), float(dt), steps)
    return list(steps), int(completed)


def run_nlmpc_closed_loop_native(lmpc_params, limits, obstacle,
                                 lap_number: int, dt: float = 1.0):
    """Full native (C++) NLMPC learning run: seed + lap_number laps.
    Returns (lap_steps list, completed count). Only the bound/obstacle fields
    of NativeParams are consumed by the LM-shooting feasibility path."""
    lib = load()
    p = NativeParams()
    p.a_max = float(limits.a_max)
    p.delta_max = float(limits.delta_max)
    p.delta_max_r = float(limits.delta_max_r)
    if obstacle is not None and float(np.asarray(obstacle.present)) > 0:
        p.ox = float(np.asarray(obstacle.x))
        p.oy = float(np.asarray(obstacle.y))
        p.ow = float(np.asarray(obstacle.width))
        p.oh = float(np.asarray(obstacle.height))
        p.ospd = float(np.asarray(obstacle.spd))
        p.omove = int(float(np.asarray(obstacle.moving_option)))
        p.opresent = 1
    else:
        p.ow = p.oh = 1.0
        p.opresent = 0
    steps = (ctypes.c_int * lap_number)()
    completed = lib.run_nlmpc_closed_loop(
        ctypes.byref(p), lap_number, int(lmpc_params.num_ss_points),
        int(lmpc_params.num_ss_iter), int(lmpc_params.num_horizon),
        float(dt), steps)
    return list(steps), int(completed)
