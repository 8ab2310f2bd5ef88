"""Compiled model pytrees.

A compiled scene is split into:

  * :class:`Topology` — static structure (sizes, index maps, level schedules,
    per-tree dof layout, names). Lives in the Model as a *static* pytree field
    (identity-hashed), so jit retraces only when a new scene is compiled.
  * :class:`Model` — frozen numeric arrays on device (a flax.struct pytree).
    Batched domain randomization can vmap over selected Model leaves.
  * :class:`State` — the minimal dynamic state (qpos, qvel, ctrl, time).

Design note (TPU-first): the mass matrix of these scenes is block-diagonal
over kinematic *trees* (the 8-dof arm+gripper chain and each free-floating
object are independent until contact couples them through constraint
impulses). We therefore never materialize the dense (nv, nv) matrix — the
compiler lays dofs out per tree (``tree_of_dof``, ``idx_in_tree``) so dynamics
runs on ``[ntree, mtdof, mtdof]`` padded blocks: thousands of tiny Cholesky
factorizations batch perfectly on the VPU across the 4096-scenario axis,
instead of one giant 248x248 dense solve per scenario (which would be ~30x
more FLOPs). The reference instead calls MuJoCo's sparse LDL
(/root/reference/gym_grasper/controller/MujocoController.py:379 `sim.step()`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import numpy as np
from flax import struct


@dataclass(eq=False)  # identity-based eq/hash -> valid static pytree aux data
class Topology:
    # sizes
    nq: int = 0
    nv: int = 0
    nu: int = 0
    nbody: int = 0
    njnt: int = 0
    ngeom: int = 0
    ncam: int = 0
    neq: int = 0
    nlimit: int = 0          # number of potentially-limited dofs
    ntree: int = 0
    mtdof: int = 0           # max dofs per kinematic tree (pad width)
    maxjnt_per_body: int = 0

    # option
    timestep: float = 0.002
    gravity: tuple = (0.0, 0.0, -9.81)
    iterations: int = 100
    tolerance: float = 1e-8
    impratio: float = 1.0
    integrator: str = "Euler"
    cone: str = "pyramidal"
    znear: float = 0.01      # fraction of extent (MuJoCo vis.map semantics)
    zfar: float = 50.0
    extent: float = 1.0      # model stat.extent (for depth encoding parity)

    # static structure (numpy int arrays; trace-time constants)
    body_parent: np.ndarray = None
    body_jntadr: np.ndarray = None    # first joint id per body (-1 if none)
    body_jntnum: np.ndarray = None
    body_levels: tuple = ()           # tuple of np arrays: body ids per depth level (>0 root level first)
    jnt_type: np.ndarray = None
    jnt_body: np.ndarray = None
    jnt_qposadr: np.ndarray = None
    jnt_dofadr: np.ndarray = None
    jnt_limited: np.ndarray = None    # bool per joint
    dof_jnt: np.ndarray = None        # joint id per dof
    dof_body: np.ndarray = None
    dof_tree: np.ndarray = None       # tree id per dof
    dof_treeidx: np.ndarray = None    # slot within tree block
    dof_ancestors: np.ndarray = None  # (nv, mtdof) ancestor dof ids (incl. self), -1 pad
    body_tree: np.ndarray = None      # tree id per body (-1 for static bodies)
    tree_rootbody: np.ndarray = None  # root (moving) body per tree
    geom_body: np.ndarray = None
    geom_type: np.ndarray = None      # (ngeom,) true MJCF geom type (render)
    geom_meshid: np.ndarray = None    # (ngeom,) mesh-table index, -1 for non-mesh
    nmesh: int = 0
    hull_maxv: int = 0                # vertex pad width of the hull tables
    hull_maxf: int = 0                # face pad width
    act_dofadr: np.ndarray = None     # dof targeted by each actuator (scalar joints)
    act_jnt: np.ndarray = None
    eq_j1_dof: np.ndarray = None      # equality: dof of joint1 / joint2
    eq_j2_dof: np.ndarray = None
    eq_j1_qadr: np.ndarray = None
    eq_j2_qadr: np.ndarray = None
    limit_dof: np.ndarray = None      # dof id per limit row
    limit_qadr: np.ndarray = None
    # contact candidate pairs (static broadphase over contype/conaffinity/excludes)
    pair_geom1: np.ndarray = None
    pair_geom2: np.ndarray = None
    pair_groups: tuple = ()           # ((type1, type2, pair_idx_array), ...)
    pair_condim: np.ndarray = None    # (npair,) mixed condim
    ncand: int = 0                    # total candidate contact points
    body_ancestor_slots: np.ndarray = None  # (nbody, mtdof) bool: tree slots moving this body

    # names
    body_names: tuple = ()
    joint_names: tuple = ()
    geom_names: tuple = ()
    cam_names: tuple = ()
    act_names: tuple = ()

    def body_id(self, name: str) -> int:
        return self.body_names.index(name)

    def joint_id(self, name: str) -> int:
        return self.joint_names.index(name)

    def geom_id(self, name: str) -> int:
        return self.geom_names.index(name)

    def cam_id(self, name: str) -> int:
        return self.cam_names.index(name)


@struct.dataclass
class Model:
    """Frozen numeric scene arrays (device-resident). Shapes in comments."""

    topo: Topology = struct.field(pytree_node=False)

    qpos0: jax.Array = None          # (nq,)
    # bodies
    body_pos: jax.Array = None       # (nbody, 3) frame offset in parent
    body_quat: jax.Array = None      # (nbody, 4)
    body_mass: jax.Array = None      # (nbody,)
    body_inertia: jax.Array = None   # (nbody, 3) principal inertia
    body_ipos: jax.Array = None      # (nbody, 3)
    body_iquat: jax.Array = None     # (nbody, 4)
    # joints
    jnt_pos: jax.Array = None        # (njnt, 3)
    jnt_axis: jax.Array = None       # (njnt, 3)
    jnt_range: jax.Array = None      # (njnt, 2)
    jnt_ref: jax.Array = None        # (njnt,)
    # dofs
    dof_damping: jax.Array = None    # (nv,)
    dof_armature: jax.Array = None   # (nv,)
    # geoms
    geom_pos: jax.Array = None       # (ngeom, 3)
    geom_quat: jax.Array = None      # (ngeom, 4)
    geom_size: jax.Array = None      # (ngeom, 3)
    geom_rgba: jax.Array = None      # (ngeom, 4)
    geom_rbound: jax.Array = None    # (ngeom,) bounding-sphere radius
                                     # (broadphase; planes = +inf)
    geom_friction: jax.Array = None  # (ngeom, 3)
    geom_margin: jax.Array = None    # (ngeom,)
    geom_solref: jax.Array = None    # (ngeom, 2)
    geom_solimp: jax.Array = None    # (ngeom, 3)
    geom_condim: jax.Array = None    # (ngeom,) int
    # collision shape (cylinders collide as capsules; mesh geoms collide as
    # convex hulls through the hull_* tables below, like MuJoCo itself)
    col_type: jax.Array = None       # (ngeom,) int geom type used for collision
    col_size: jax.Array = None       # (ngeom, 3)
    col_pos: jax.Array = None        # (ngeom, 3) local offset of proxy in geom frame
    col_quat: jax.Array = None       # (ngeom, 4)
    # per-mesh convex hulls, padded to (nmesh, hull_maxv/hull_maxf)
    hull_verts: jax.Array = None     # (nmesh, maxv, 3) mesh-frame hull vertices
    hull_vmask: jax.Array = None     # (nmesh, maxv) 1.0 = real vertex
    hull_fnorm: jax.Array = None     # (nmesh, maxf, 3) outward face normals
    hull_fdist: jax.Array = None     # (nmesh, maxf) offsets; padding = +BIG
    # actuators
    act_gear: jax.Array = None       # (nu,)
    act_ctrlrange: jax.Array = None  # (nu, 2)
    # equality constraints (joint couplings)
    eq_poly: jax.Array = None        # (neq, 5)
    eq_solref: jax.Array = None      # (neq, 2)
    eq_solimp: jax.Array = None      # (neq, 3)
    # joint limit rows
    limit_range: jax.Array = None    # (nlimit, 2)
    limit_solref: jax.Array = None   # (nlimit, 2)
    limit_solimp: jax.Array = None   # (nlimit, 3)
    # pre-mixed contact-pair parameters (MuJoCo mj_collideGeoms mixing rules)
    pair_friction: jax.Array = None  # (npair, 3) [tangential, torsional, rolling]
    pair_solref: jax.Array = None    # (npair, 2)
    pair_solimp: jax.Array = None    # (npair, 3)
    pair_margin: jax.Array = None    # (npair,)
    # cameras
    cam_pos: jax.Array = None        # (ncam, 3)
    cam_quat: jax.Array = None       # (ncam, 4)
    cam_fovy: jax.Array = None       # (ncam,)


@struct.dataclass
class State:
    """Minimal per-scenario dynamic state. Leading batch dims allowed."""

    qpos: jax.Array                 # (..., nq)
    qvel: jax.Array                 # (..., nv)
    ctrl: jax.Array                 # (..., nu)
    time: jax.Array                 # (...,)


def make_state(model: Model, batch_shape=()) -> State:
    import jax.numpy as jnp

    t = model.topo
    return State(
        qpos=jnp.broadcast_to(model.qpos0, batch_shape + (t.nq,)),
        qvel=jnp.zeros(batch_shape + (t.nv,)),
        ctrl=jnp.zeros(batch_shape + (t.nu,)),
        time=jnp.zeros(batch_shape),
    )
