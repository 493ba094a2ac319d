"""Tests for host and device safe-set machinery (base.py:332-369 semantics)."""

import jax.numpy as jnp
import numpy as np

from ilqr_iterative_tasks_tpu.control.safe_set import DeviceSafeSet, SafeSet


def _lap(T, seed):
    rng = np.random.default_rng(seed)
    xs = rng.normal(size=(T + 1, 4))
    us = rng.normal(size=(T, 2))
    return xs, us


def test_host_qfun_time_to_go():
    ss = SafeSet()
    xs, us = _lap(10, 0)
    ss.add_trajectory(xs, us)
    np.testing.assert_array_equal(ss.Qfun[0], np.arange(10, -1, -1))
    assert ss.iter_cost == [10.0]
    assert ss.ss[0].shape == (4, 11)


def test_host_knn_l1():
    ss = SafeSet()
    xs, us = _lap(20, 1)
    ss.add_trajectory(xs, us)
    x_guess = xs[7] + 0.01
    idx = ss.select_close(0, x_guess, 5)
    d = np.abs(xs - x_guess).sum(axis=1)
    np.testing.assert_array_equal(idx, np.argsort(d)[:5])
    assert idx[0] == 7


def test_time_varying_windows():
    ss = SafeSet()
    ss.add_trajectory(*_lap(20, 2))
    ss.add_trajectory(*_lap(12, 3))
    # min cost = 12; window for lap0: start 20-12+6 = 14
    wins = ss.time_varying_windows(num_horizon=6, k=8, all_ss_point=False)
    np.testing.assert_array_equal(wins[0], np.arange(14, 22))
    np.testing.assert_array_equal(wins[1], np.arange(6, 14))
    wins_all = ss.time_varying_windows(6, 8, all_ss_point=True)
    assert len(wins_all[0]) == 21 and len(wins_all[1]) == 13


def test_device_safe_set_add_and_knn():
    dss = DeviceSafeSet.empty(max_laps=4, max_steps=32, dtype=jnp.float64)
    xs, us = _lap(20, 4)
    xs_pad = np.zeros((32, 4))
    xs_pad[:21] = xs
    us_pad = np.zeros((32, 2))
    us_pad[:20] = us
    dss = dss.add_lap(jnp.asarray(xs_pad), jnp.asarray(us_pad), 21)
    assert int(dss.num_laps) == 1
    assert int(dss.lap_len[0]) == 21
    np.testing.assert_array_equal(np.asarray(dss.valid[0][:21]), True)
    np.testing.assert_array_equal(np.asarray(dss.valid[0][21:]), False)
    np.testing.assert_allclose(np.asarray(dss.qfun[0][:21]), np.arange(20, -1, -1))

    x_guess = jnp.asarray(xs[5] + 0.01)
    idx, pts, q = dss.knn(0, x_guess, 4)
    d = np.abs(xs - np.asarray(x_guess)).sum(axis=1)
    want = np.argsort(d)[:4]
    assert set(np.asarray(idx).tolist()) == set(want.tolist())
    assert int(idx[0]) == 5
    # padded rows must never be selected
    assert all(int(i) < 21 for i in np.asarray(idx))
