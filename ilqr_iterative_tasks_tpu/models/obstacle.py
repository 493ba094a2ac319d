"""Elliptical obstacle model as a jit-friendly pytree.

Behavioral parity: /root/reference/iterative_ilqr/utils/base.py:23-64 (Obstacle)
and the horizon extrapolation rules in control/ilqr_helper.py:34-44 and
control/nonlinear_lmpc.py:58-84.

Design notes (TPU-first):
- The reference branches on ``obstacle is None`` / ``spd is None`` /
  ``moving_option`` in Python. Here an obstacle is always present as data; a
  ``present`` flag (0.0 or 1.0) masks its cost contribution so the jitted
  solver has a single trace for all scenarios, and obstacle injection/removal
  mid-run (result/ilqr_test_add_static_obstacle.py:50-59) is a pure data
  update, not a retrace.
- ``moving_option``: 0 = static, 1 = moving +y, 2 = moving -x, encoded as a
  float scalar used arithmetically (no lax.cond), matching the reference's
  extrapolation ``y + i*spd`` / ``x - i*spd``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Obstacle:
    """Ellipse obstacle state, a pytree of scalars (broadcastable/batchable)."""

    x: jnp.ndarray  # center x
    y: jnp.ndarray  # center y
    width: jnp.ndarray  # semi-axis a
    height: jnp.ndarray  # semi-axis b
    spd: jnp.ndarray  # per-step speed (0 for static)
    moving_option: jnp.ndarray  # 0 static, 1 +y, 2 -x
    present: jnp.ndarray  # 1.0 if active, 0.0 => no cost contribution

    @classmethod
    def make(cls, x=0.0, y=0.0, width=1.0, height=1.0, spd=0.0,
             moving_option=0, present=True, dtype=jnp.float32):
        f = lambda v: jnp.asarray(v, dtype=dtype)
        return cls(
            x=f(x), y=f(y), width=f(width), height=f(height),
            spd=f(0.0 if spd is None else spd),
            moving_option=f(0 if moving_option is None else moving_option),
            present=f(1.0 if present else 0.0),
        )

    @classmethod
    def absent(cls, dtype=jnp.float32):
        return cls.make(present=False, dtype=dtype)

    def center_at(self, i):
        """Extrapolated center at horizon offset ``i`` steps ahead.

        Mirrors ilqr_helper.py:34-44: option 1 -> y + i*spd; option 2 ->
        x - i*spd; otherwise static. ``i`` may be an array (vectorized over the
        horizon).
        """
        i = jnp.asarray(i, dtype=self.x.dtype)
        up = (self.moving_option == 1).astype(self.x.dtype)
        left = (self.moving_option == 2).astype(self.x.dtype)
        cx = self.x - left * self.spd * i
        cy = self.y + up * self.spd * i
        return cx, cy

    def advance(self, dt):
        """One closed-loop step of obstacle motion (base.py:50-58)."""
        up = (self.moving_option == 1).astype(self.x.dtype)
        left = (self.moving_option == 2).astype(self.x.dtype)
        return self.replace(
            x=self.x - left * self.spd * dt,
            y=self.y + up * self.spd * dt,
        )
