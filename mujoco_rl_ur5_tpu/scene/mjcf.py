"""MJCF (MuJoCo XML) parser -> plain-Python scene spec.

Host-side, numpy-only. Covers the MJCF subset exercised by the reference
scenes (/root/reference/UR5+gripper/*.xml): compiler/option blocks, nested
default classes, mesh/texture/material assets, nested body trees with
hinge/slide/ball/free joints, geoms (plane/sphere/capsule/cylinder/box/mesh),
fixed cameras, contact excludes, joint equality constraints, and motor
actuators.  ``<include>`` files are resolved relative to the parent file
(used by UR5gripper_2_finger_many_objects.xml:235 to pull in objects.xml).

The parser produces :class:`SceneSpec`; :mod:`mujoco_rl_ur5_tpu.scene.compile`
lowers that to frozen device arrays.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

import numpy as np

# MuJoCo enums (values match mjtJoint / mjtGeom for easy cross-validation)
JNT_FREE, JNT_BALL, JNT_SLIDE, JNT_HINGE = 0, 1, 2, 3
GEOM_PLANE, GEOM_HFIELD, GEOM_SPHERE, GEOM_CAPSULE, GEOM_ELLIPSOID, GEOM_CYLINDER, GEOM_BOX, GEOM_MESH = range(8)

_JNT_TYPES = {"free": JNT_FREE, "ball": JNT_BALL, "slide": JNT_SLIDE, "hinge": JNT_HINGE}
_GEOM_TYPES = {
    "plane": GEOM_PLANE, "sphere": GEOM_SPHERE, "capsule": GEOM_CAPSULE,
    "ellipsoid": GEOM_ELLIPSOID, "cylinder": GEOM_CYLINDER, "box": GEOM_BOX,
    "mesh": GEOM_MESH,
}

JNT_DOF = {JNT_FREE: 6, JNT_BALL: 3, JNT_SLIDE: 1, JNT_HINGE: 1}
JNT_NQ = {JNT_FREE: 7, JNT_BALL: 4, JNT_SLIDE: 1, JNT_HINGE: 1}


def _fl(s: str | None, default=None):
    return float(s) if s is not None else default


def _vec(s: str | None, default=None, n=None):
    if s is None:
        return None if default is None else np.asarray(default, dtype=np.float64)
    v = np.fromstring(s, sep=" ")
    if n is not None and v.size < n:
        v = np.concatenate([v, np.zeros(n - v.size)])
    return v


def _bool(s: str | None, default=False):
    if s is None:
        return default
    return s.lower() in ("true", "1")


@dataclass
class JointSpec:
    name: str = ""
    type: int = JNT_HINGE
    pos: np.ndarray = field(default_factory=lambda: np.zeros(3))
    axis: np.ndarray = field(default_factory=lambda: np.array([0.0, 0, 1]))
    range: np.ndarray = field(default_factory=lambda: np.zeros(2))
    limited: bool = False
    damping: float = 0.0
    armature: float = 0.0
    stiffness: float = 0.0
    springref: float = 0.0
    ref: float = 0.0
    frictionloss: float = 0.0


@dataclass
class GeomSpec:
    name: str = ""
    type: int = GEOM_SPHERE
    size: np.ndarray = field(default_factory=lambda: np.zeros(3))
    pos: np.ndarray = field(default_factory=lambda: np.zeros(3))
    quat: np.ndarray = field(default_factory=lambda: np.array([1.0, 0, 0, 0]))
    rgba: np.ndarray = field(default_factory=lambda: np.array([0.5, 0.5, 0.5, 1.0]))
    friction: np.ndarray = field(default_factory=lambda: np.array([1.0, 0.005, 0.0001]))
    contype: int = 1
    conaffinity: int = 1
    condim: int = 3
    margin: float = 0.0
    gap: float = 0.0
    solref: np.ndarray = field(default_factory=lambda: np.array([0.02, 1.0]))
    solimp: np.ndarray = field(default_factory=lambda: np.array([0.9, 0.95, 0.001]))
    density: float = 1000.0
    mass: float | None = None
    material: str = ""
    mesh: str = ""
    group: int = 0


@dataclass
class CameraSpec:
    name: str = ""
    pos: np.ndarray = field(default_factory=lambda: np.zeros(3))
    quat: np.ndarray = field(default_factory=lambda: np.array([1.0, 0, 0, 0]))
    fovy: float = 45.0
    mode: str = "fixed"
    target: str = ""


@dataclass
class InertialSpec:
    pos: np.ndarray = field(default_factory=lambda: np.zeros(3))
    quat: np.ndarray = field(default_factory=lambda: np.array([1.0, 0, 0, 0]))
    mass: float = 0.0
    diaginertia: np.ndarray | None = None
    fullinertia: np.ndarray | None = None


@dataclass
class BodySpec:
    name: str = ""
    pos: np.ndarray = field(default_factory=lambda: np.zeros(3))
    quat: np.ndarray = field(default_factory=lambda: np.array([1.0, 0, 0, 0]))
    joints: list[JointSpec] = field(default_factory=list)
    geoms: list[GeomSpec] = field(default_factory=list)
    cameras: list[CameraSpec] = field(default_factory=list)
    bodies: list["BodySpec"] = field(default_factory=list)
    inertial: InertialSpec | None = None


@dataclass
class ActuatorSpec:
    name: str = ""
    joint: str = ""
    gear: float = 1.0
    ctrlrange: np.ndarray = field(default_factory=lambda: np.array([-1.0, 1.0]))
    ctrllimited: bool = True
    kind: str = "motor"  # motor | position | velocity
    kp: float = 1.0
    kv: float = 1.0


@dataclass
class EqualitySpec:
    name: str = ""
    joint1: str = ""
    joint2: str = ""
    polycoef: np.ndarray = field(default_factory=lambda: np.array([0.0, 1, 0, 0, 0]))
    solref: np.ndarray = field(default_factory=lambda: np.array([0.02, 1.0]))
    solimp: np.ndarray = field(default_factory=lambda: np.array([0.9, 0.95, 0.001]))


@dataclass
class OptionSpec:
    timestep: float = 0.002
    gravity: np.ndarray = field(default_factory=lambda: np.array([0.0, 0, -9.81]))
    iterations: int = 100
    tolerance: float = 1e-8
    impratio: float = 1.0
    integrator: str = "Euler"
    cone: str = "pyramidal"


@dataclass
class SceneSpec:
    model_name: str = ""
    option: OptionSpec = field(default_factory=OptionSpec)
    worldbody: BodySpec = field(default_factory=BodySpec)
    meshes: dict[str, str] = field(default_factory=dict)       # name -> abs path
    mesh_scales: dict[str, np.ndarray] = field(default_factory=dict)
    materials: dict[str, np.ndarray] = field(default_factory=dict)  # name -> rgba
    actuators: list[ActuatorSpec] = field(default_factory=list)
    equalities: list[EqualitySpec] = field(default_factory=list)
    excludes: list[tuple[str, str]] = field(default_factory=list)
    znear: float = 0.01   # visual/map: fraction of stat.extent (MuJoCo default)
    zfar: float = 50.0
    inertiafromgeom: bool = True
    angle_deg: bool = False


# ---------------------------------------------------------------------------
# orientation helpers
# ---------------------------------------------------------------------------


def _quat_from_axisangle(axis: np.ndarray, angle: float) -> np.ndarray:
    n = np.linalg.norm(axis)
    if n < 1e-12 or abs(angle) < 1e-14:
        return np.array([1.0, 0, 0, 0])
    axis = axis / n
    return np.concatenate([[np.cos(angle / 2)], axis * np.sin(angle / 2)])


def _quat_mul(u, v):
    w = u[0] * v[0] - u[1] * v[1] - u[2] * v[2] - u[3] * v[3]
    x = u[0] * v[1] + u[1] * v[0] + u[2] * v[3] - u[3] * v[2]
    y = u[0] * v[2] - u[1] * v[3] + u[2] * v[0] + u[3] * v[1]
    z = u[0] * v[3] + u[1] * v[2] - u[2] * v[1] + u[3] * v[0]
    return np.array([w, x, y, z])


def _orientation(el: ET.Element, angle_deg: bool) -> np.ndarray:
    """Resolve quat/axisangle/euler/xyaxes/zaxis attributes -> quat (w,x,y,z)."""
    scale = np.pi / 180.0 if angle_deg else 1.0
    if el.get("quat") is not None:
        q = _vec(el.get("quat"))
        n = np.linalg.norm(q)
        return q / n if n > 1e-12 else np.array([1.0, 0, 0, 0])
    if el.get("axisangle") is not None:
        aa = _vec(el.get("axisangle"))
        return _quat_from_axisangle(aa[:3], aa[3] * scale)
    if el.get("euler") is not None:
        e = _vec(el.get("euler")) * scale
        # MuJoCo default eulerseq = "xyz", intrinsic rotations
        q = np.array([1.0, 0, 0, 0])
        for ax, ang in zip(np.eye(3), e):
            q = _quat_mul(q, _quat_from_axisangle(ax, ang))
        return q
    if el.get("xyaxes") is not None:
        v = _vec(el.get("xyaxes"))
        x = v[:3] / np.linalg.norm(v[:3])
        y = v[3:6] - np.dot(v[3:6], x) * x
        y /= np.linalg.norm(y)
        z = np.cross(x, y)
        from mujoco_rl_ur5_tpu.scene.mesh import _mat2quat
        return _mat2quat(np.stack([x, y, z], axis=1))
    if el.get("zaxis") is not None:
        z = _vec(el.get("zaxis"))
        z = z / np.linalg.norm(z)
        # minimal rotation taking (0,0,1) to z
        axis = np.cross([0.0, 0, 1], z)
        s = np.linalg.norm(axis)
        if s < 1e-12:
            return np.array([1.0, 0, 0, 0]) if z[2] > 0 else np.array([0.0, 1, 0, 0])
        return _quat_from_axisangle(axis / s, float(np.arctan2(s, z[2])))
    return np.array([1.0, 0, 0, 0])


# ---------------------------------------------------------------------------
# defaults handling
# ---------------------------------------------------------------------------


class _Defaults:
    """Nested default classes: attribute dicts per element kind, inherited."""

    def __init__(self, parent: "_Defaults | None" = None):
        self.attrs: dict[str, dict[str, str]] = {k: {} for k in ("joint", "geom", "site", "camera", "motor", "position", "velocity")}
        if parent is not None:
            for k in self.attrs:
                self.attrs[k].update(parent.attrs[k])
        self.children: dict[str, _Defaults] = {}

    def absorb(self, el: ET.Element):
        for child in el:
            if child.tag == "default":
                klass = child.get("class", "")
                sub = _Defaults(self)
                sub.absorb(child)
                self.children[klass] = sub
                # nested classes are visible globally in MuJoCo; flatten
                for name, d in sub.children.items():
                    self.children.setdefault(name, d)
            elif child.tag in self.attrs:
                self.attrs[child.tag].update(child.attrib)

    def resolve(self, kind: str, el: ET.Element, klass: str | None) -> dict[str, str]:
        base = dict(self.attrs.get(kind, {}))
        if klass and klass in self.children:
            base.update(self.children[klass].attrs.get(kind, {}))
        base.update(el.attrib)
        return base


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def parse_mjcf(path: str) -> SceneSpec:
    path = os.path.abspath(path)
    tree = ET.parse(path)
    root = tree.getroot()
    _resolve_includes(root, os.path.dirname(path))

    spec = SceneSpec(model_name=root.get("model", ""))

    comp = root.find("compiler")
    meshdir, texdir = "", ""
    if comp is not None:
        spec.angle_deg = comp.get("angle", "degree") == "degree"
        spec.inertiafromgeom = _bool(comp.get("inertiafromgeom"), True)
        meshdir = comp.get("meshdir", "")
    base = os.path.dirname(path)

    opt = root.find("option")
    if opt is not None:
        o = spec.option
        o.timestep = _fl(opt.get("timestep"), o.timestep)
        o.gravity = _vec(opt.get("gravity"), o.gravity)
        o.iterations = int(opt.get("iterations", o.iterations))
        o.tolerance = _fl(opt.get("tolerance"), o.tolerance)
        o.impratio = _fl(opt.get("impratio"), o.impratio)
        o.integrator = opt.get("integrator", o.integrator)
        o.cone = opt.get("cone", o.cone)

    vis = root.find("visual")
    if vis is not None:
        vmap = vis.find("map")
        if vmap is not None:
            spec.znear = _fl(vmap.get("znear"), spec.znear)
            spec.zfar = _fl(vmap.get("zfar"), spec.zfar)

    defaults = _Defaults()
    for d in root.findall("default"):
        defaults.absorb(d)

    # assets
    tex_rgb: dict[str, np.ndarray] = {}
    for asset in root.findall("asset"):
        for el in asset:
            if el.tag == "mesh":
                name = el.get("name") or os.path.splitext(os.path.basename(el.get("file")))[0]
                spec.meshes[name] = os.path.join(base, meshdir, el.get("file"))
                if el.get("scale") is not None:
                    spec.mesh_scales[name] = _vec(el.get("scale"))
            elif el.tag == "texture":
                name = el.get("name", "")
                rgb1 = _vec(el.get("rgb1"), [0.8, 0.8, 0.8])
                tex_rgb[name] = rgb1
            elif el.tag == "material":
                name = el.get("name", "")
                if el.get("rgba") is not None:
                    rgba = _vec(el.get("rgba"))
                else:
                    tex = el.get("texture", "")
                    rgb = tex_rgb.get(tex, np.array([0.5, 0.5, 0.5]))
                    rgba = np.concatenate([rgb, [1.0]])
                spec.materials[name] = rgba

    wb = root.find("worldbody")
    spec.worldbody = _parse_body(wb, defaults, spec, is_world=True)

    for con in root.findall("contact"):
        for el in con:
            if el.tag == "exclude":
                spec.excludes.append((el.get("body1"), el.get("body2")))

    for eq in root.findall("equality"):
        for el in eq:
            if el.tag == "joint":
                e = EqualitySpec(
                    name=el.get("name", ""),
                    joint1=el.get("joint1"),
                    joint2=el.get("joint2", ""),
                    polycoef=_vec(el.get("polycoef"), [0.0, 1, 0, 0, 0], n=5),
                )
                if el.get("solref") is not None:
                    e.solref = _vec(el.get("solref"))
                if el.get("solimp") is not None:
                    e.solimp = _vec(el.get("solimp"), n=3)[:3]
                spec.equalities.append(e)

    for act in root.findall("actuator"):
        for el in act:
            if el.tag not in ("motor", "position", "velocity"):
                continue
            attrs = defaults.resolve(el.tag, el, el.get("class"))
            a = ActuatorSpec(
                name=attrs.get("name", ""),
                joint=attrs.get("joint", ""),
                gear=_fl((attrs.get("gear") or "1").split()[0], 1.0),
                ctrllimited=_bool(attrs.get("ctrllimited"), False),
                kind=el.tag,
                kp=_fl(attrs.get("kp"), 1.0),
                kv=_fl(attrs.get("kv"), 1.0),
            )
            if attrs.get("ctrlrange") is not None:
                a.ctrlrange = _vec(attrs.get("ctrlrange"))
            spec.actuators.append(a)

    return spec


def _resolve_includes(root: ET.Element, base: str):
    """Splice <include file=.../> children in place (restart scan per splice)."""
    changed = True
    while changed:
        changed = False
        for parent in root.iter():
            for i, child in enumerate(list(parent)):
                if child.tag == "include":
                    inc_path = os.path.join(base, child.get("file"))
                    inc_root = ET.parse(inc_path).getroot()
                    parent.remove(child)
                    for j, sub in enumerate(list(inc_root)):
                        parent.insert(i + j, sub)
                    changed = True
                    break
            if changed:
                break


def _parse_body(el: ET.Element, defaults: _Defaults, spec: SceneSpec, is_world=False,
                inherited_class: str | None = None) -> BodySpec:
    body = BodySpec(name=el.get("name", "world" if is_world else ""))
    if not is_world:
        body.pos = _vec(el.get("pos"), [0.0, 0, 0])
        body.quat = _orientation(el, spec.angle_deg)
    childclass = el.get("childclass", inherited_class)

    for child in el:
        if child.tag in ("joint", "freejoint"):
            klass = child.get("class", childclass)
            attrs = defaults.resolve("joint", child, klass)
            j = JointSpec(name=attrs.get("name", ""))
            if child.tag == "freejoint":
                j.type = JNT_FREE
            else:
                j.type = _JNT_TYPES[attrs.get("type", "hinge")]
            j.pos = _vec(attrs.get("pos"), [0.0, 0, 0])
            j.axis = _vec(attrs.get("axis"), [0.0, 0, 1])
            n = np.linalg.norm(j.axis)
            if n > 1e-12:
                j.axis = j.axis / n
            j.limited = _bool(attrs.get("limited"), False)
            if attrs.get("range") is not None:
                rng = _vec(attrs.get("range"))
                if spec.angle_deg and j.type in (JNT_HINGE, JNT_BALL):
                    rng = rng * np.pi / 180.0
                j.range = rng
            j.damping = _fl(attrs.get("damping"), 0.0)
            j.armature = _fl(attrs.get("armature"), 0.0)
            j.stiffness = _fl(attrs.get("stiffness"), 0.0)
            j.ref = _fl(attrs.get("ref"), 0.0)
            j.frictionloss = _fl(attrs.get("frictionloss"), 0.0)
            body.joints.append(j)
        elif child.tag == "geom":
            klass = child.get("class", childclass)
            attrs = defaults.resolve("geom", child, klass)
            g = GeomSpec(name=attrs.get("name", ""))
            g.type = _GEOM_TYPES[attrs.get("type", "sphere")]
            g.size = _vec(attrs.get("size"), [0.0, 0, 0], n=3)
            g.pos = _vec(attrs.get("pos"), [0.0, 0, 0])
            g.quat = _orientation(_attr_el(child, attrs), spec.angle_deg)
            if attrs.get("rgba") is not None:
                g.rgba = _vec(attrs.get("rgba"))
            elif attrs.get("material") in spec.materials:
                g.rgba = spec.materials[attrs.get("material")].copy()
            if attrs.get("friction") is not None:
                fr = _vec(attrs.get("friction"), n=3)
                g.friction = fr[:3]
            g.contype = int(attrs.get("contype", 1))
            g.conaffinity = int(attrs.get("conaffinity", 1))
            g.condim = int(attrs.get("condim", 3))
            g.margin = _fl(attrs.get("margin"), 0.0)
            g.gap = _fl(attrs.get("gap"), 0.0)
            if attrs.get("solref") is not None:
                g.solref = _vec(attrs.get("solref"))
            if attrs.get("solimp") is not None:
                g.solimp = _vec(attrs.get("solimp"), n=3)[:3]
            g.density = _fl(attrs.get("density"), 1000.0)
            if attrs.get("mass") is not None:
                g.mass = _fl(attrs.get("mass"))
            g.material = attrs.get("material", "")
            g.mesh = attrs.get("mesh", "")
            g.group = int(attrs.get("group", 0))
            body.geoms.append(g)
        elif child.tag == "camera":
            cam = CameraSpec(
                name=child.get("name", ""),
                pos=_vec(child.get("pos"), [0.0, 0, 0]),
                quat=_orientation(child, spec.angle_deg),
                fovy=_fl(child.get("fovy"), 45.0),
                mode=child.get("mode", "fixed"),
                target=child.get("target", ""),
            )
            body.cameras.append(cam)
        elif child.tag == "inertial":
            it = InertialSpec(
                pos=_vec(child.get("pos"), [0.0, 0, 0]),
                quat=_orientation(child, spec.angle_deg),
                mass=_fl(child.get("mass"), 0.0),
            )
            if child.get("diaginertia") is not None:
                it.diaginertia = _vec(child.get("diaginertia"))
            if child.get("fullinertia") is not None:
                it.fullinertia = _vec(child.get("fullinertia"))
            body.inertial = it
        elif child.tag == "body":
            body.bodies.append(_parse_body(child, defaults, spec, inherited_class=childclass))
    return body


def _attr_el(el: ET.Element, attrs: dict[str, str]) -> ET.Element:
    """Element-like wrapper exposing merged default+element attrs for _orientation."""
    merged = ET.Element(el.tag)
    for k, v in attrs.items():
        merged.set(k, v)
    return merged
