"""Batched iLQR on the Pallas-fused chain dynamics — the north-star solver.

`mpc/ilqr.py` is the generic per-instance optimizer (any jittable dynamics,
vmapped over scenarios). At the BASELINE.md workload — 4096 scenarios,
H=64 knots, 8 substeps/knot on an 8-dof arm — its rollouts lower to
thousands of launch-latency-bound micro-kernels (~156 us wall per ~10 us
substep, scripts/mpc_profile.py), capping throughput at ~22 solves/s vs the
32,000 target. This module is the same algorithm restructured around the
three fused kernels of physics/pallas_chain.py:

  * open-loop rollout        -> pallas_chain.rollout_open   (1 launch)
  * linearization            -> pallas_chain.lin_fd         (1 launch,
    forward differences on the knot step instead of vmap(jacfwd))
  * 5-alpha line search      -> pallas_chain.rollout_closed (1 launch)

Cost quadratization, the associative-scan Riccati backward pass (mpc/lqr),
and the Levenberg-Marquardt acceptance logic stay in plain JAX: they are
batched dense linear algebra XLA already maps well to the MXU, and they
need autodiff through user cost functions.

Semantics match `ilqr()` per scenario, with two deliberate deviations:
  * dynamics Jacobians are forward differences (eps 1e-3), not exact
    jacfwd — ~1e-4 relative error, below what the LM trust region resolves;
  * control clipping uses the plan's baked actuator ctrlrange (the same
    values GraspMPC passes as u_lo/u_hi).

Replaces the same reference boundary as mpc/ilqr.py: the serial PID
while-loop planner of MujocoController.py:269-384.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from mujoco_rl_ur5_tpu.mpc.ilqr import ILQRResult
from mujoco_rl_ur5_tpu.mpc.lqr import (
    LQR, Gains, backward_parallel, backward_sequential,
)
from mujoco_rl_ur5_tpu.mpc.pallas_lqr import backward_pallas
from mujoco_rl_ur5_tpu.physics.chain import ChainPlan
from mujoco_rl_ur5_tpu.physics.pallas_chain import (
    lin_fd, rollout_closed, rollout_open,
)


def ilqr_chain_batch(
    plan: ChainPlan,
    substeps: int,
    cost_fn: Callable,        # (x, u, ref_k) -> scalar stage cost
    term_cost_fn: Callable,   # (x, ref_H) -> scalar terminal cost
    x0: jax.Array,            # (B, nx)
    u_init: jax.Array,        # (B, H, nu)
    refs,                     # pytree, leaves (B, H, ...)
    term_ref,                 # pytree, leaves (B, ...)
    iters: int = 6,
    alphas=(1.0, 0.6, 0.3, 0.1, 0.03),
    reg: float = 1e-6,
    quad_fn: Callable = None,       # (x, u, ref) -> (X, q, U, r)
    term_quad_fn: Callable = None,  # (x, ref) -> (XH, qH)
    parallel_backward: bool = None,
    kernel_cost=None,               # ((stage_cb, term_cb), sref, tref)
) -> ILQRResult:
    """Solve B independent trajectory optimizations in lock-step. Returns
    an ILQRResult with a leading batch axis on every field.

    ``quad_fn``/``term_quad_fn`` override the autodiff cost expansion with
    an analytic (typically Gauss-Newton) one: `jax.hessian` of an
    FK-bearing cost generates hundreds of micro-ops per knot (~215 ms/iter
    at B=1024 H=64 on TPU), while the GN expansion needs only the EE
    Jacobian — and guarantees PSD stage Hessians.

    ``parallel_backward`` selects the Riccati pass. Default (None): on TPU
    the fused Pallas kernel (mpc/pallas_lqr.backward_pallas — one launch
    for the whole recursion; scripts/backward_profile.py); off-TPU the
    associative-scan pass for small batches and the classic O(H) scan
    otherwise (at B >= 1024 the batch axis alone saturates the chip and
    the parallel-in-time formulation's ~7x element-work overhead is pure
    loss — it also compiles an order of magnitude larger). Explicit
    True/False forces the XLA associative-scan / sequential pass."""
    B, H, nu = u_init.shape
    nx = x0.shape[-1]
    alphas_t = tuple(float(a) for a in alphas)
    A = len(alphas_t)

    def inst_cost(xs_i, us_i, refs_i, term_i):
        stage = jax.vmap(cost_fn)(xs_i[:-1], us_i, refs_i)
        return stage.sum() + term_cost_fn(xs_i[-1], term_i)

    def total_cost(xs, us):
        return jax.vmap(inst_cost)(xs, us, refs, term_ref)

    if quad_fn is None:
        def quad_fn(x, u, ref):
            q = jax.grad(cost_fn, argnums=0)(x, u, ref)
            r = jax.grad(cost_fn, argnums=1)(x, u, ref)
            X = jax.hessian(cost_fn, argnums=0)(x, u, ref)
            U = jax.hessian(cost_fn, argnums=1)(x, u, ref)
            return X, q, U, r
    if term_quad_fn is None:
        def term_quad_fn(x, ref):
            return (jax.hessian(term_cost_fn, argnums=0)(x, ref),
                    jax.grad(term_cost_fn, argnums=0)(x, ref))

    vquad = jax.vmap(jax.vmap(quad_fn))
    vterm = jax.vmap(term_quad_fn)

    use_kernel = (parallel_backward is None
                  and jax.default_backend() == "tpu")
    if use_kernel:
        backward_batch = backward_pallas
    else:
        backward = (backward_parallel
                    if (B < 1024 if parallel_backward is None
                        else parallel_backward)
                    else backward_sequential)

        def backward_batch(F, L, X, q, U, r, XH, qH, rg):
            def one(F, L, X, q, U, r, XH, qH, rg):
                p = LQR(F=F, L=L, c=jnp.zeros((H, nx), F.dtype), X=X, q=q,
                        U=U, r=r, XH=XH, qH=qH)
                return backward(p, reg=rg)
            return jax.vmap(one)(F, L, X, q, U, r, XH, qH, rg)

    def expand_and_backward(xs, us, rg):
        F, L = lin_fd(plan, substeps, xs[:, :-1], us)
        X, q, U, r = vquad(xs[:, :-1], us, refs)
        XH, qH = vterm(xs[:, -1], term_ref)
        return backward_batch(F, L, X, q, U, r, XH, qH, rg)

    def iteration(carry, _):
        xs, us, cost, rg = carry
        gains = expand_and_backward(xs, us, rg)
        if kernel_cost is not None:
            # candidate costs fused into the line-search kernel: the
            # separate B x A x H cost pass (an FK per state) was ~25% of
            # each iteration at B=4096
            cbs, k_sref, k_tref = kernel_cost
            xs_c, us_c, costs = rollout_closed(
                plan, substeps, x0, xs, us, gains.K, gains.d, alphas_t,
                cost=cbs, sref=k_sref, tref=k_tref)
        else:
            xs_c, us_c = rollout_closed(plan, substeps, x0, xs, us,
                                        gains.K, gains.d, alphas_t)
            costs = jax.vmap(
                lambda xsb, usb, rb, tb: jax.vmap(
                    lambda xa, ua: inst_cost(xa, ua, rb, tb))(xsb, usb)
            )(xs_c, us_c, refs, term_ref)                  # (B, A)
        best = jnp.argmin(costs, axis=1)
        bcost = jnp.take_along_axis(costs, best[:, None], 1)[:, 0]
        xs_b = jnp.take_along_axis(
            xs_c, best[:, None, None, None], 1)[:, 0]
        us_b = jnp.take_along_axis(
            us_c, best[:, None, None, None], 1)[:, 0]
        improved = bcost < cost
        xs2 = jnp.where(improved[:, None, None], xs_b, xs)
        us2 = jnp.where(improved[:, None, None], us_b, us)
        cost2 = jnp.where(improved, bcost, cost)
        # per-scenario Levenberg-Marquardt schedule (see mpc/ilqr.py)
        rg2 = jnp.where(improved, jnp.maximum(rg * 0.5, reg),
                        jnp.minimum(rg * 10.0, 1e3))
        return (xs2, us2, cost2, rg2), None

    xs0 = rollout_open(plan, substeps, x0, u_init)
    cost0 = total_cost(xs0, u_init)
    rg0 = jnp.full((B,), reg, x0.dtype)
    (xs, us, cost, _), _ = jax.lax.scan(
        iteration, (xs0, u_init, cost0, rg0), None, length=iters)

    gains = expand_and_backward(xs, us, jnp.full((B,), reg, x0.dtype))
    return ILQRResult(xs=xs, us=us, cost=cost, gains=gains)
