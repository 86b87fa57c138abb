"""Composable function blocks: the cost-model description system.

Capability parity target (reference, behaviour only):
pyCamSet/optimisation/abstract_function_blocks.py — the Ceres-style block
system (key_type, param_type, abstract_function_block, optimisation_function)
that the reference turns into generated numba source. Here a block is a pure
JAX function and a chain is plain function composition traced under jit;
``jax.jacfwd`` of the composed chain replaces the reference's
inspect/splice/matflow Jacobian generator (abstract_function_blocks.py:290-652,
matmul_map.py:147-263). No source generation, no kernel cache: XLA is the
compiler.

Block evaluation order matches the reference: right-to-left, the LAST block in
the chain feeds the one before it (abstract_function_blocks.py:111-131).
Identical (link, n) param groups are deduplicated across blocks, mirroring the
hashable param_type dedup (abstract_function_blocks.py:50-70).

Concrete blocks (function_block_implementations.py:21-240):
Projection (PER_CAM 9), RigidTform3d (PER_IMG 6), Extrinsic3D (PER_CAM 6),
TemplatePoints (PER_IMG 6, template input), FreePoint (PER_KEY 3).
"""
from __future__ import annotations

import enum
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from pycamset_tpu.ops.projection import project_cam_points
from pycamset_tpu.ops.transforms import pose_apply


class key_type(enum.IntEnum):
    """Binds a parameter group to a detection table column.

    PER_GROUP binds to a handler-supplied per-detection group index (e.g.
    which of several rigidly-coupled targets a feature belongs to) — the
    mechanism behind multi-target extensions.
    """
    PER_CAM = 0
    PER_IMG = 1
    PER_KEY = 2
    SINGLE = 3
    PER_GROUP = 4


@dataclass(frozen=True)
class ParamSpec:
    """A (link type, parameter count) descriptor; hashable so identical
    groups are deduplicated across blocks."""
    link: key_type
    n: int


class FunctionBlock:
    """A chunk of the cost model: consumes ``num_inp`` values from the block
    to its right, reads ``params.n`` parameters, produces ``num_out`` values.
    """
    num_inp: int = 0
    num_out: int = 0
    params: ParamSpec
    template: bool = False  # reads its input from the target template table
    # per-detection auxiliary channels consumed (e.g. the normalized image
    # row of a rolling-shutter chain); compute() then takes (params, inp,
    # aux)
    aux_inputs: int = 0

    def compute(self, params: jnp.ndarray, inp: jnp.ndarray | None) -> jnp.ndarray:
        """Pure JAX evaluation of the block (per detection)."""
        raise NotImplementedError

    def __add__(self, other):
        from pycamset_tpu.optim.chain import OptimFunction
        if isinstance(other, FunctionBlock):
            return OptimFunction([self, other])
        if isinstance(other, OptimFunction):
            return OptimFunction([self] + other.blocks)
        return NotImplemented

    def __radd__(self, other):
        from pycamset_tpu.optim.chain import OptimFunction
        if isinstance(other, OptimFunction):
            return OptimFunction(other.blocks + [self])
        return NotImplemented

    # ------------------------------------------------------------ self test

    def test_self(self, rng=None, tol: float = 1e-4) -> bool:
        """Check jacfwd of compute against central finite differences.

        Mirrors the analytic-vs-numeric per-block verifier
        (abstract_function_blocks.py:750-775).
        """
        rng = rng or np.random.default_rng(0)
        p = jnp.array(rng.normal(size=self.params.n))
        x = jnp.array(rng.normal(size=max(self.num_inp, 1)) + 2.0)

        def f(pv, xv):
            return self.compute(pv, xv if self.num_inp or self.template else None)

        jac = np.array(jax.jacfwd(f, argnums=0)(p, x))
        eps = 1e-7
        for j in range(self.params.n):
            dp = np.zeros(self.params.n)
            dp[j] = eps
            num = (np.array(f(p + dp, x)) - np.array(f(p - dp, x))) / (2 * eps)
            if not np.allclose(jac[:, j], num, atol=tol, rtol=tol):
                return False
        return True


class Projection(FunctionBlock):
    """Pinhole + Brown–Conrady projection; 9 PER_CAM params
    [fx, px, fy, py, k1, k2, p1, p2, k3]."""
    num_inp = 3
    num_out = 2
    params = ParamSpec(key_type.PER_CAM, 9)

    def compute(self, params, inp):
        return project_cam_points(params, inp)


class ProjectionRational(Projection):
    """Pinhole + rational-model projection; 12 PER_CAM params
    [fx, px, fy, py, k1, k2, p1, p2, k3, k4, k5, k6] with
    radial = (1 + k1 r2 + k2 r4 + k3 r6) / (1 + k4 r2 + k5 r4 + k6 r6)
    (OpenCV's CALIB_RATIONAL_MODEL — the reference carries the flag only as
    commented-out dead code in initial_calibration)."""
    params = ParamSpec(key_type.PER_CAM, 12)


class ProjectionThinPrism(Projection):
    """Pinhole + rational + thin-prism projection; 16 PER_CAM params
    [fx, px, fy, py, k1, k2, p1, p2, k3, k4, k5, k6, s1, s2, s3, s4]
    (OpenCV's CALIB_RATIONAL_MODEL | CALIB_THIN_PRISM_MODEL)."""
    params = ParamSpec(key_type.PER_CAM, 16)


class ProjectionTilted(Projection):
    """Pinhole + rational + thin-prism + sensor-tilt projection; 18 PER_CAM
    params [fx,px,fy,py,k1,k2,p1,p2,k3,k4,k5,k6,s1,s2,s3,s4,taux,tauy]
    (OpenCV's full 14-coefficient model, CALIB_TILTED_MODEL)."""
    params = ParamSpec(key_type.PER_CAM, 18)


class ProjectionFisheye(Projection):
    """Fisheye (Kannala-Brandt / cv2.fisheye) projection; 8 PER_CAM params
    [fx, px, fy, py, k1, k2, k3, k4] with pixel radius proportional to the
    distorted incidence angle theta_d = theta (1 + k1 th^2 + ... + k4 th^8).
    A width the reference has no counterpart for — the fisheye family is
    first-class here (options={'camera_model': 'fisheye'})."""
    params = ParamSpec(key_type.PER_CAM, 8)


class ProjectionHet(Projection):
    """Per-camera projection-FAMILY selector: heterogeneous rigs mixing
    Kannala-Brandt fisheye cameras with one Brown-family model in a single
    bundle adjustment. PER_CAM params [sel, fx, px, fy, py, dist...] where
    ``sel`` (0 = Brown, 1 = fisheye) is a permanently fixed parameter and
    the distortion slots hold ``brown_n_dist`` Brown coefficients or KB
    k1..k4 (+ fixed zero padding) depending on the camera's family. The
    reference supports exactly one projection family per rig
    (function_block_implementations.py:21-140); this block lifts that."""

    def __init__(self, brown_model: str = "standard"):
        widths = {"standard": 5, "rational": 8, "thin_prism": 12,
                  "tilted": 14}
        if brown_model not in widths:
            raise ValueError(
                f"brown_model {brown_model!r} not a Brown-family model "
                f"(expected one of {sorted(widths)})")
        self.brown_model = brown_model
        self.brown_n_dist = widths[brown_model]
        self.params = ParamSpec(key_type.PER_CAM,
                                5 + max(self.brown_n_dist, 4))

    def compute(self, params, inp):
        from pycamset_tpu.ops.projection import project_cam_points_het
        return project_cam_points_het(params, inp,
                                      brown_n_dist=self.brown_n_dist)


class RigidTform3d(FunctionBlock):
    """SE(3) transform of a 3-input point; 6 PER_IMG params [rvec, t]."""
    num_inp = 3
    num_out = 3
    params = ParamSpec(key_type.PER_IMG, 6)

    def compute(self, params, inp):
        return pose_apply(params, inp)


class Extrinsic3D(RigidTform3d):
    """RigidTform3d bound per camera (the camera extrinsic)."""
    params = ParamSpec(key_type.PER_CAM, 6)


class TemplatePoints(RigidTform3d):
    """SE(3) pose of the target; the input point comes from the constant
    template lookup table rather than a previous block."""
    template = True
    num_inp = 0
    num_out = 3
    params = ParamSpec(key_type.PER_IMG, 6)


class FreePoint(FunctionBlock):
    """A 3D point parameterised by its coordinates; 3 PER_KEY params."""
    num_inp = 0
    num_out = 3
    params = ParamSpec(key_type.PER_KEY, 3)

    def compute(self, params, inp):
        return params


class RSTemplateTime(FunctionBlock):
    """Rolling-shutter template source: emits the template point PLUS the
    detection's sample-time offset ``tau = readout * (v/H - 1/2)``.

    1 PER_CAM parameter (the readout duration, in frame units relative to
    the reference camera's — see handlers.py RS notes on the exact
    readout*velocity scale gauge); the normalized-row aux channel
    ``v/H - 1/2`` is precomputed per detection on the host and rides an
    extra observation-table column. The time flows to RSPoseVel through
    the point pipe (output width 4 = [pt, tau])."""
    num_inp = 0
    num_out = 4
    template = True
    aux_inputs = 1
    params = ParamSpec(key_type.PER_CAM, 1)

    def compute(self, params, inp, aux=None):
        tau = params[0] * (aux[0] if aux is not None
                           else jnp.zeros((), params.dtype))
        return jnp.concatenate([inp, tau[None]])


class RSPoseVel(FunctionBlock):
    """Rolling-shutter target motion: 12 PER_IMG params [pose6 | vel6];
    consumes [pt (3), tau (1)] and applies the pose sampled at tau
    (``pose + vel * tau`` — the constant-velocity within-frame model the
    tracker and temporal sync use; tracking.py rolling_shutter=)."""
    num_inp = 4
    num_out = 3
    params = ParamSpec(key_type.PER_IMG, 12)

    def compute(self, params, inp):
        pose = params[:6] + params[6:] * inp[3]
        return pose_apply(pose, inp[:3])


class GroupRigidTform3d(RigidTform3d):
    """SE(3) transform bound per feature group — e.g. the relative pose of
    each of several rigidly-coupled calibration targets."""
    params = ParamSpec(key_type.PER_GROUP, 6)


class GroupTemplatePoints(TemplatePoints):
    """Template lookup + SE(3) transform bound per feature GROUP: the
    canonical multi-target block (each group's points are one rigid target
    posed relative to the base target's frame). The chain
    Projection + Extrinsic3D + RigidTform3d + GroupTemplatePoints has a
    closed-form Jacobian (optim/analytic.py) and runs on the structured
    Schur backend and every mesh sharding."""
    params = ParamSpec(key_type.PER_GROUP, 6)


# reference-style lowercase aliases (template_handler.py:152 spells the chain
# fb.projection() + fb.extrinsic3D() + fb.template_points())
projection = Projection
rigidTform3d = RigidTform3d
extrinsic3D = Extrinsic3D
template_points = TemplatePoints
free_point = FreePoint
