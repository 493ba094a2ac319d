"""State-space constants for the kinematic bicycle task.

Parity reference: /root/reference/iterative_ilqr/utils/constants_kinetic_bicycle.py:1-6.
"""

X_DIM = 4
U_DIM = 2

# State layout: [x, y, v, theta]
X_ID = {"x": 0, "y": 1, "v": 2, "theta": 3}
# Input layout: [accel, delta]
U_ID = {"accel": 0, "delta": 1}
