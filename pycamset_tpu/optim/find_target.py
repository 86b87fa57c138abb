"""Target pose estimation with fixed, pre-calibrated cameras.

The reference ships this capability in a bit-rotted module
(pyCamSet/optimisation/find_target.py imports modules that no longer exist;
SURVEY.md §2.10). The capability is real and documented: solve for the pose
of a known target in each image while holding every camera parameter fixed.
This is the clean redesign: the same template-BA machinery with all camera
intrinsics/extrinsics marked fixed, so only the per-image pose parameters
are free — a batched, jointly-optimal multi-camera PnP.
"""
from __future__ import annotations

import numpy as np

from pycamset_tpu.models.abstract_target import AbstractTarget
from pycamset_tpu.models.camera_set import CameraSet
from pycamset_tpu.models.detections import TargetDetection
from pycamset_tpu.optim.driver import run_bundle_adjustment
from pycamset_tpu.optim.handlers import TemplateBundleHandler
from pycamset_tpu.utils.general_utils import ext_4x4_to_rod, make_4x4h_tform


def make_fixed_camera_params(camset: CameraSet) -> dict:
    """fixed_params dict pinning every camera's int/ext/dst to its current
    values (the format threaded through calibrate_cameras)."""
    fixed = {}
    for name in camset.get_names():
        cam = camset[name]
        fixed[name] = {
            "int": np.asarray(cam.intrinsic, dtype=float),
            "dst": np.reshape(np.asarray(cam.distortion_coefs, dtype=float), -1),
            "ext": np.asarray(cam.extrinsic, dtype=float),
        }
    return fixed


class FixedCameraPoseHandler(TemplateBundleHandler):
    """A TemplateBundleHandler with every camera parameter fixed."""

    def __init__(self, camset, target, detection, options=None,
                 missing_poses=None):
        options = dict(options or {})
        # a rig calibrated with the rational / thin-prism model carries
        # 8 / 12 distortion coefficients; follow it rather than silently
        # truncating to 5
        if "camera_model" not in options:
            from pycamset_tpu.optim.handlers import infer_shared_n_dist

            def model_of_width(n):
                if n == 4:  # the fisheye marker width
                    return "fisheye"
                if n > 12:
                    return "tilted"
                if n > 8:
                    return "thin_prism"
                if n > 5:
                    return "rational"
                return "standard"

            dl = [np.reshape(np.asarray(camset[n].distortion_coefs), -1)
                  for n in camset.get_names()]
            sizes = {d.size for d in dl}
            if 4 in sizes and sizes != {4}:
                # heterogeneous rig: follow each camera's own family
                options["camera_model"] = [model_of_width(d.size)
                                           for d in dl]
            else:
                model = model_of_width(infer_shared_n_dist(dl))
                if model != "standard":
                    options["camera_model"] = model
        super().__init__(camset, target, detection,
                         fixed_params=make_fixed_camera_params(camset),
                         options=options, missing_poses=missing_poses)

    def calc_initial_params(self) -> np.ndarray:
        """Seed each image's pose by per-camera PnP against the fixed rig
        (no relative camera estimation needed — the rig is known)."""
        prim = self.bundlePrimitive
        last_good = np.eye(4)
        missing = []
        for idp, im_det in enumerate(self.detection.get_image_list()):
            pose_w = None
            for cam in self.camset:
                pose_c = self.target.target_pose_in_cam_image(
                    im_det, cam, mode="nan")
                if not np.any(np.isnan(pose_c)):
                    pose_w = cam.cam_to_world @ pose_c
                    break
            if pose_w is None:
                missing.append(True)
                pose_w = last_good
            else:
                missing.append(False)
                last_good = pose_w
            if prim.poses_unfixed[idp]:
                rvec, tvec = ext_4x4_to_rod(pose_w)
                prim.poses[idp] = np.concatenate([rvec, tvec])
        self.missing_poses = np.array(missing)
        return prim.base_full()[prim.unfixed_full()]


def estimate_poses_with_fixed_cameras(
        camset: CameraSet, target: AbstractTarget, detection: TargetDetection,
        options: dict | None = None, return_detection: bool = False):
    """Jointly-optimal target pose per image given a calibrated rig.

    :param return_detection: also return the flattened detection table the
        solve used — its rows align with ``result['fun']``, so callers can
        bucket residuals (e.g. per camera for per-camera model selection).
    :return: (poses (I,4,4) target->world transforms, OptimizeResult
        [, detection table (N,5)]).
    """
    opts = {"outliers": "n", "fixed_pose": None, "verbosity": 0}
    if options:
        opts.update(options)
    # no gauge fixing needed: the fixed cameras pin the frame
    opts.pop("fixed_pose", None)
    handler = FixedCameraPoseHandler(camset, target, detection, options=opts)
    handler.bundlePrimitive.poses_unfixed[:] = True
    handler.bundlePrimitive.calc_free_poses()
    result, _ = run_bundle_adjustment(handler)
    _, _, pose6 = handler.bundlePrimitive.return_bundle_primitives(result["x"])
    poses = np.array([make_4x4h_tform(p[:3], p[3:]) for p in pose6])
    if return_detection:
        return poses, result, handler.get_detection_data(flatten=True)
    return poses, result
