"""Extending the parameter handler: calibrate with TWO rigidly-coupled targets.

Reference capability: examples/extend_param_handler.py +
docs/source/extension/param_handler.rst (the reference's example imports
modules that no longer exist; this one runs — `python examples/
extend_param_handler.py` demonstrates it on a synthetic rig).

TPU-native design: instead of mutating the template table between host
iterations, the unknown relative transform between the targets is a
first-class chain block bound PER_GROUP (which target a feature belongs to):

    pixel = projection( extrinsic( pose_im( rel_group( template[key] ))))

Group 0 (the base target) has its relative transform fixed to the identity;
group 1's six parameters are free. PER_GROUP chains run on the structured
Schur backend (group rows expand onto the key grid; gram pieces reduce
back); the generic scatter backend solves them too.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # checkout use

import numpy as np

from pycamset_tpu.models.camera_set import CameraSet
from pycamset_tpu.models.detections import TargetDetection
from pycamset_tpu.optim.blocks import (
    Extrinsic3D, GroupRigidTform3d, ParamSpec, Projection, RigidTform3d,
    TemplatePoints, key_type)
from pycamset_tpu.optim.chain import OptimFunction
from pycamset_tpu.optim.handlers import (
    TemplateBundleHandler, TemplateBundlePrimitive)
from pycamset_tpu.utils.general_utils import (
    average_tforms, ext_4x4_to_rod, make_4x4h_tform)


# GroupTemplatePoints is now a first-class block; shown here spelled out as
# the pattern for custom group-bound blocks (a one-liner: subclass + a
# PER_GROUP ParamSpec)
class GroupTemplatePoints(TemplatePoints):
    """Template lookup + SE(3) transform bound per feature GROUP (the
    relative pose of the group's target in the base target's frame).
    Identical to pycamset_tpu.optim.blocks.GroupTemplatePoints."""
    params = ParamSpec(key_type.PER_GROUP, 6)


class TwoTargetPrimitive(TemplateBundlePrimitive):
    """Template primitive + per-group relative transforms."""

    def __init__(self, poses, extr, intr, rel_poses, poses_unfixed=None,
                 extr_unfixed=None, intr_unfixed=None, rel_unfixed=None):
        self.rel_poses = rel_poses                     # (n_groups, 6)
        self.rel_unfixed = (rel_unfixed if rel_unfixed is not None
                            else np.ones(rel_poses.shape[0], dtype=bool))
        super().__init__(poses, extr, intr, poses_unfixed, extr_unfixed,
                         intr_unfixed)

    def base_full(self):
        return np.concatenate([super().base_full(), self.rel_poses.ravel()])

    def unfixed_full(self):
        return np.concatenate([super().unfixed_full(),
                               np.repeat(self.rel_unfixed, 6)])

    def return_bundle_primitives(self, params):
        full = self.base_full()
        full[self.unfixed_full()] = params
        n_c = self.intr.shape[0]
        n_p = self.poses.shape[0]
        self.intr[:] = full[: 9 * n_c].reshape(n_c, 9)
        self.extr[:] = full[9 * n_c: 15 * n_c].reshape(n_c, 6)
        self.poses[:] = full[15 * n_c: 15 * n_c + 6 * n_p].reshape(n_p, 6)
        self.rel_poses[:] = full[15 * n_c + 6 * n_p:].reshape(-1, 6)
        return self.intr, self.extr, self.poses, self.rel_poses


class TwoTargetCalibrator(TemplateBundleHandler):
    """Calibrate with two targets that are rigidly fixed together.

    The second target's detections use keys offset by the first target's
    feature count; its pose relative to the first is recovered jointly with
    the calibration.
    """

    def __init__(self, camset: CameraSet, target0, target1,
                 detection0: TargetDetection, detection1: TargetDetection,
                 fixed_params=None, options=None, missing_poses=None):
        super().__init__(camset, target0, detection0, fixed_params, options,
                         missing_poses)
        self.extra_target = target1
        self.extra_detection = detection1
        self.len0 = target0.point_data.reshape(-1, 3).shape[0]
        self.len1 = target1.point_data.reshape(-1, 3).shape[0]
        self.point_data = np.concatenate(
            [target0.point_data.reshape(-1, 3),
             target1.point_data.reshape(-1, 3)], axis=0)
        self.target_point_shape = np.array(self.point_data.shape)

        prim = self.bundlePrimitive
        rel = np.zeros((2, 6))
        rel_unfixed = np.array([False, True])  # group 0 = identity (fixed)
        self.bundlePrimitive = TwoTargetPrimitive(
            prim.poses, prim.extr, prim.intr, rel,
            poses_unfixed=prim.poses_unfixed, extr_unfixed=prim.extr_unfixed,
            intr_unfixed=prim.intr_unfixed, rel_unfixed=rel_unfixed)

        self.op_fun = OptimFunction(
            [Projection(), Extrinsic3D(), RigidTform3d(),
             GroupTemplatePoints()])

    # ---- PER_GROUP wiring -------------------------------------------------

    def n_groups(self) -> int:
        return 2

    def group_of_key(self) -> np.ndarray:
        return (np.arange(self.len0 + self.len1) >= self.len0).astype(int)

    def template_table(self):
        return self.point_data

    # ---- initial estimates ------------------------------------------------

    def add_extra_params(self, param_array: np.ndarray) -> np.ndarray:
        """Append the initial estimate of target 1's relative pose, from
        per-image PnP of both targets."""
        base_poses, base_ok = self.target.pose_in_detections(
            self.detection, self.camset,
            outliers=self.problem_opts.get("outliers", "ask"))
        extra_poses, extra_ok = self.extra_target.pose_in_detections(
            self.extra_detection, self.camset,
            outliers=self.problem_opts.get("outliers", "ask"))
        pairs = [np.linalg.inv(b) @ e
                 for b, e, okb, oke in zip(base_poses, extra_poses,
                                           base_ok, extra_ok) if okb and oke]
        rel = average_tforms(pairs)
        rvec, tvec = ext_4x4_to_rod(rel)
        self.bundlePrimitive.rel_poses[1] = np.concatenate([rvec, tvec])
        # the free vector already covers the rel block (it is part of the
        # primitive); re-extract it so the seeded value lands in place
        prim = self.bundlePrimitive
        return prim.base_full()[prim.unfixed_full()]

    def get_detection_data(self, flatten: bool = False) -> np.ndarray:
        """The merged detection table: target 1's keys offset by len0."""
        if not flatten:
            raise ValueError("data must be flattened for multiple targets")
        data0 = super().get_detection_data(flatten=True)
        dims = self.extra_target.point_data.shape[:-1]
        data1 = (self.extra_detection.return_flattened_keys(dims).get_data()
                 + [0, 0, self.len0, 0, 0])
        return np.concatenate([data0, data1], axis=0)

    def get_relative_pose(self, x) -> np.ndarray:
        """The recovered target1->target0 4x4 transform."""
        _, _, _, rel = self.bundlePrimitive.return_bundle_primitives(x)
        return make_4x4h_tform(rel[1][:3], rel[1][3:])

    def get_camset(self, x, return_pose: bool = False):
        # the relative pose tail doesn't disturb the camera unpacking
        from pycamset_tpu.optim.handlers import _write_cams, _clone_camset
        new_cams = _clone_camset(self.camset)
        proj, extr, poses, _ = self.bundlePrimitive.return_bundle_primitives(x)
        _write_cams(new_cams, self.cam_names, proj, extr)
        if not return_pose:
            return new_cams
        flat = np.array([make_4x4h_tform(p[:3], p[3:])[:3, :4].reshape(-1)
                         for p in poses])
        return new_cams, flat


def synthetic_demo():
    """Two rigidly-joined grids observed by a 3-camera rig (no real images):
    the joint calibration recovers the relative transform between them."""
    import jax
    from pycamset_tpu.models.camera_set import make_cam_dict
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.utils.general_utils import h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=8, grid=5, visibility=1.0,
                             noise_px=0.1, seed=11)
    tpl0 = rig["template"]
    rel_true = make_4x4h_tform(np.array([0.1, -0.2, 0.3]),
                               np.array([0.15, 0.02, -0.05]))
    tpl1_local = tpl0 + [0.002, 0.001, 0.0]
    tpl1_world_local = h_tform(tpl1_local, rel_true)

    # build detections for both targets by re-projecting
    from pycamset_tpu.optim.handlers import reprojection_costs  # noqa: F401
    import pycamset_tpu.utils.general_utils as gu

    k_mats, exts, dists = [], [], []
    for c in range(3):
        i9 = rig["intr"][c]
        k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]], [0, 0, 1]]))
        dists.append(i9[4:])
        exts.append(gu.make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))

    rows1 = []
    rng = np.random.default_rng(2)
    for i in range(8):
        t = gu.make_4x4h_tform(rig["poses"][i][:3], rig["poses"][i][3:])
        world = gu.h_tform(tpl1_world_local, t)
        for c in range(3):
            uv = cams[c].project_points(world)
            for kk in range(world.shape[0]):
                rows1.append([c, i, kk, *(uv[kk] + rng.normal(size=2) * 0.1)])
    det0 = TargetDetection(cam_names=["a", "b", "c"], data=rig["dd"])
    det1 = TargetDetection(cam_names=["a", "b", "c"], data=np.array(rows1))

    target0 = FreePointTarget(tpl0.reshape(1, -1, 3))
    target1 = FreePointTarget(tpl1_local.reshape(1, -1, 3))

    handler = TwoTargetCalibrator(cams, target0, target1, det0, det1,
                                  options={"outliers": "n"})
    result, final_cams = run_bundle_adjustment(handler)
    rel = handler.get_relative_pose(result["x"])
    err_r = np.abs(rel[:3, :3] - rel_true[:3, :3]).max()
    err_t = np.abs(rel[:3, 3] - rel_true[:3, 3]).max()
    rms = np.sqrt(np.mean(result["fun"] ** 2))
    print(f"residual rms: {rms:.4f} px")
    print(f"relative pose recovery: rot err {err_r:.2e}, trans err {err_t:.2e} m")
    return rel, rel_true, rms


if __name__ == "__main__" and "--selfcal" not in sys.argv:
    synthetic_demo()


# --------------------------------------------------------------------------
# Going further: multi-target SELF-calibration (mixed PER_KEY + PER_GROUP)
# --------------------------------------------------------------------------

class TwoTargetSelfPrimitive(TwoTargetPrimitive):
    """Two-target primitive + free per-point geometry.

    Parameter layout matches the chain group order:
    [intr | extr | poses | rel poses (PER_GROUP) | points (PER_KEY)].
    """

    def __init__(self, poses, extr, intr, rel_poses, bundle_points,
                 poses_unfixed=None, extr_unfixed=None, intr_unfixed=None,
                 rel_unfixed=None, bundle_points_unfixed=None):
        self.bundle_pts = bundle_points          # flat (3*n_points,)
        self.bdpt_unfixed = (bundle_points_unfixed
                             if bundle_points_unfixed is not None
                             else np.ones(bundle_points.shape[0], dtype=bool))
        super().__init__(poses, extr, intr, rel_poses, poses_unfixed,
                         extr_unfixed, intr_unfixed, rel_unfixed)

    def base_full(self):
        return np.concatenate([super().base_full(),
                               self.bundle_pts.ravel()])

    def unfixed_full(self):
        return np.concatenate([super().unfixed_full(), self.bdpt_unfixed])

    def return_bundle_primitives(self, params):
        full = self.base_full()
        full[self.unfixed_full()] = params
        n_c = self.intr.shape[0]
        n_p = self.poses.shape[0]
        n_g = self.rel_poses.shape[0]
        e0 = 9 * n_c
        e1 = e0 + 6 * n_c
        e2 = e1 + 6 * n_p
        e3 = e2 + 6 * n_g
        self.intr[:] = full[:e0].reshape(n_c, 9)
        self.extr[:] = full[e0:e1].reshape(n_c, 6)
        self.poses[:] = full[e1:e2].reshape(n_p, 6)
        self.rel_poses[:] = full[e2:e3].reshape(n_g, 6)
        self.bundle_pts[:] = full[e3:]
        return (self.intr, self.extr, self.poses, self.rel_poses,
                self.bundle_pts.reshape(-1, 3))


class TwoTargetSelfCalibrator(TwoTargetCalibrator):
    """Two rigidly-coupled targets, SELF-calibrating BOTH geometries and
    the relative pose jointly.

    The chain mixes PER_KEY (free 3D points) and PER_GROUP (relative pose)
    parameters:

        pixel = projection( extrinsic( pose_im( rel_group( point[key] ))))

    which runs on the arrow-structured mixed backend
    (optim/structured_mixed.py). Gauge: each target's local frame is
    anchored to its nominal model — 7 fixed coordinates on target 0
    (similarity: the global frame + scale) and 6 on target 1 (rigid: its
    frame is otherwise absorbed by the free relative pose) — plus group 0's
    relative pose fixed to the identity and unseen features frozen.
    """

    def __init__(self, camset: CameraSet, target0, target1,
                 detection0: TargetDetection, detection1: TargetDetection,
                 fixed_params=None, options=None, missing_poses=None):
        super().__init__(camset, target0, target1, detection0, detection1,
                         fixed_params, options, missing_poses)
        from pycamset_tpu.optim.blocks import FreePoint, GroupRigidTform3d
        from pycamset_tpu.optim.handlers import find_not_colinear_pts

        flat_pts = np.copy(self.point_data.reshape(-1)).astype(float)
        pts3 = flat_pts.reshape(-1, 3)
        gok = self.group_of_key()
        feat_unfixed = np.ones(pts3.shape[0] * 3, dtype=bool)
        for g in range(self.n_groups()):
            idx = np.where(gok == g)[0]
            j0, j1, j2 = find_not_colinear_pts(pts3[idx])
            i0, i1, i2 = idx[j0], idx[j1], idx[j2]
            feat_unfixed[3 * i0:3 * i0 + 3] = False
            if g == 0:   # + scale anchor: 3 + 3 + 1 = 7 (similarity)
                feat_unfixed[3 * i1:3 * i1 + 3] = False
                feat_unfixed[3 * i2] = False
            else:        # 3 + 2 + 1 = 6 (rigid; rel pose carries the rest)
                feat_unfixed[3 * i1:3 * i1 + 2] = False
                feat_unfixed[3 * i2] = False
        # freeze features never observed
        seen = np.unique(self.get_detection_data(flatten=True)[:, 2]
                         .astype(int))
        for idf in np.setdiff1d(np.arange(pts3.shape[0]), seen):
            feat_unfixed[3 * idf:3 * idf + 3] = False

        prim = self.bundlePrimitive
        self.bundlePrimitive = TwoTargetSelfPrimitive(
            prim.poses, prim.extr, prim.intr, prim.rel_poses, flat_pts,
            poses_unfixed=prim.poses_unfixed, extr_unfixed=prim.extr_unfixed,
            intr_unfixed=prim.intr_unfixed, rel_unfixed=prim.rel_unfixed,
            bundle_points_unfixed=feat_unfixed)
        self.op_fun = OptimFunction(
            [Projection(), Extrinsic3D(), RigidTform3d(),
             GroupRigidTform3d(), FreePoint()])

    def template_table(self):
        return None  # geometry is optimised, not a constant table

    def get_relative_pose(self, x) -> np.ndarray:
        rel = self.bundlePrimitive.return_bundle_primitives(x)[3]
        return make_4x4h_tform(rel[1][:3], rel[1][3:])

    def get_updated_targets(self, x):
        """(points of target 0, points of target 1) in their local frames."""
        pts = self.bundlePrimitive.return_bundle_primitives(x)[4]
        return pts[:self.len0], pts[self.len0:]

    def get_camset(self, x, return_pose: bool = False):
        from pycamset_tpu.optim.handlers import _clone_camset, _write_cams
        new_cams = _clone_camset(self.camset)
        proj, extr, poses, _, _ = (
            self.bundlePrimitive.return_bundle_primitives(x))
        _write_cams(new_cams, self.cam_names, proj, extr)
        if not return_pose:
            return new_cams
        flat = np.array([make_4x4h_tform(p[:3], p[3:])[:3, :4].reshape(-1)
                         for p in poses])
        return new_cams, flat


def synthetic_selfcal_demo():
    """Two rigidly-joined grids whose TRUE geometries are warped versions
    of the nominal models: the mixed solve recovers the warp of both
    targets AND their relative pose, jointly with the calibration."""
    from pycamset_tpu.models.camera_set import make_cam_dict
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.utils.general_utils import h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig
    import pycamset_tpu.utils.general_utils as gu

    rig = make_synthetic_rig(n_cams=3, n_ims=10, grid=6, visibility=1.0,
                             noise_px=0.1, seed=13)
    tpl0_nominal = rig["template"]
    rng = np.random.default_rng(5)
    # true geometry: nominal + a smooth per-point warp (unknown to the seed)
    warp0 = rng.normal(size=tpl0_nominal.shape) * 5e-4
    tpl0_true = tpl0_nominal + warp0
    rel_true = make_4x4h_tform(np.array([0.08, -0.15, 0.25]),
                               np.array([0.12, 0.03, -0.04]))
    tpl1_nominal = tpl0_nominal + [0.002, 0.001, 0.0]
    warp1 = rng.normal(size=tpl1_nominal.shape) * 5e-4
    tpl1_true = tpl1_nominal + warp1

    k_mats, exts, dists = [], [], []
    for c in range(3):
        i9 = rig["intr"][c]
        k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]],
                                [0, 0, 1]]))
        dists.append(i9[4:])
        exts.append(gu.make_4x4h_tform(rig["extr"][c][:3],
                                       rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))

    def project_rows(points_world_local, rel=None):
        rows = []
        for i in range(10):
            t = gu.make_4x4h_tform(rig["poses"][i][:3], rig["poses"][i][3:])
            world = h_tform(points_world_local, t if rel is None
                            else t @ rel)
            for c in range(3):
                uv = cams[c].project_points(world)
                for kk in range(world.shape[0]):
                    rows.append([c, i, kk,
                                 *(uv[kk] + rng.normal(size=2) * 0.1)])
        return np.array(rows)

    det0 = TargetDetection(cam_names=["a", "b", "c"],
                           data=project_rows(tpl0_true))
    det1 = TargetDetection(cam_names=["a", "b", "c"],
                           data=project_rows(tpl1_true, rel=rel_true))

    handler = TwoTargetSelfCalibrator(
        cams, FreePointTarget(tpl0_nominal.reshape(1, -1, 3)),
        FreePointTarget(tpl1_nominal.reshape(1, -1, 3)),
        det0, det1, options={"outliers": "n"})
    result, final_cams = run_bundle_adjustment(handler)
    rms = np.sqrt(np.mean(result["fun"] ** 2))
    rel = handler.get_relative_pose(result["x"])
    pts0, pts1 = handler.get_updated_targets(result["x"])
    warp0_rec = np.abs((pts0 - tpl0_nominal) - warp0).max()
    warp1_err = np.abs(h_tform(pts1, rel) - h_tform(tpl1_true, rel_true)).max()
    print(f"residual rms: {rms:.4f} px")
    print(f"target-0 warp recovery err: {warp0_rec:.2e} m")
    print(f"target-1 world-frame err:   {warp1_err:.2e} m")
    return rms, warp0_rec, warp1_err


if __name__ == "__main__" and "--selfcal" in sys.argv:
    synthetic_selfcal_demo()
