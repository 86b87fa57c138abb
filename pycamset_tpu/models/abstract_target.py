"""AbstractTarget: the calibration-target base class (host-side frontend).

Capability parity target (reference, behaviour only):
pyCamSet/calibration_targets/abstract_target.py:25-408 — point_data of shape
(u,...,w,n,3), per-face locally-flat coordinates (make_local), folder detection
driver, default OpenCV initial per-camera calibration honouring fixed params,
PnP pose estimation with nan-mode, interactive MAD outlier loop.

Detection and seeding stay host-side OpenCV (as in the reference); everything
downstream runs on device.
"""
from __future__ import annotations

import logging
import time
from abc import ABC, abstractmethod
from copy import copy
from pathlib import Path

import cv2
import numpy as np

from pycamset_tpu.models.camera import Camera
from pycamset_tpu.models.detections import ImageDetection, TargetDetection
from pycamset_tpu.utils.general_utils import (
    glob_ims, h_tform, mad_outlier_detection, make_4x4h_tform, natsorted,
    plane_fit)


def get_keys(data: np.ndarray) -> np.ndarray:
    """Key columns of a detection table; 1-d keys are padded with a 0 face."""
    keys = data[:, 2:-2]
    if keys.shape[1] == 1:
        keys = np.concatenate((np.zeros_like(keys), keys), axis=1)
    return keys


def undistort_for_detection(image, camera):
    """Board-aware detection preprocessing (goes beyond the reference: every
    reference find_in_image accepts `camera` but never uses it).

    When a camera model with nonzero distortion is available (e.g. the
    high_distortion second pass), detect on the undistorted view — marker
    squares stay square, so corner interpolation succeeds on wide-angle
    lenses — then map the detected coordinates back to the original image
    frame so downstream stays consistent.

    :return: (image, None) when no correction applies, else
        (undistorted image, redistort_fn(points (n,2)) -> (n,2)).
    """
    if camera is None:
        return image, None
    dist = np.reshape(np.asarray(camera.distortion_coefs, dtype=float), -1)
    if not np.any(dist):
        return image, None
    und = camera.undistort(image)
    kmat = np.asarray(camera.intrinsic, dtype=float)

    def redistort(pts):
        import jax.numpy as jnp
        from pycamset_tpu.ops.distortion import distort_pixels
        pts = np.asarray(pts, dtype=float).reshape(-1, 2)
        return np.asarray(distort_pixels(
            jnp.asarray(pts), jnp.asarray(kmat), jnp.asarray(dist)))

    return und, redistort


class AbstractTarget(ABC):
    """An abstract calibration target.

    Inheritors must define a ``find_in_image`` detector and ``point_data`` of
    shape (u,...,w,n,3): u..w index faces, each face has n coplanar 3D points.
    Call ``super().__init__(inputs=locals())`` with the constructor args (for
    persistence) and ``self._process_data()`` after setting ``point_data``.
    """

    def __init__(self, inputs: dict):
        inputs.pop("self", None)
        inputs.pop("__class__", None)
        for k, v in inputs.items():
            if isinstance(v, np.ndarray):
                inputs[k] = v.tolist()
        self.point_data: np.ndarray | None = None
        self.point_local: np.ndarray | None = None
        self.original_points: np.ndarray | None = None
        self.input_args = inputs
        self.valid_map = True

    def _process_data(self):
        """Call at the end of any inheriting __init__."""
        self.point_local = self.make_local()
        self.original_points = self.point_data.copy()

    # ------------------------------------------------------------- interface

    def plot(self):
        raise NotImplementedError

    def save_to_pdf(self):
        raise NotImplementedError

    @abstractmethod
    def find_in_image(self, image, draw=False, camera: Camera | None = None,
                      wait_len=1) -> ImageDetection:
        """Detect the target in an image; return an ImageDetection."""
        raise NotImplementedError

    def additional_params(self, x: np.ndarray) -> np.ndarray:
        """Hook for targets with extra optimisable parameters."""
        return x

    def parametise_features(self, detections, camset, ref_cam=0):
        """Hook to parametise non-pose target parameters; None if there are none."""
        return None

    # ------------------------------------------------------------- detection

    def find_in_imfolder(self, file: Path, cam_names, draw=False, n_lim=None,
                         camera: Camera | None = None) -> TargetDetection:
        """Detect the target in every image of one camera's folder."""
        cam_name = file.parts[-1]
        im_locs = natsorted([str(x) for x in glob_ims(file)])
        if len(im_locs) == 0:
            raise ValueError(f"No images were found in the given folder {file}")
        if n_lim is not None:
            im_locs = im_locs[:n_lim]
        if cam_names is None:
            cam_names = [cam_name]

        detections = TargetDetection(cam_names=cam_names)

        def detect_one(im_file):
            im = cv2.imread(im_file)
            if im.ndim == 3:
                im = im[:, :, 0]
            return self.find_in_image(im, draw=draw, camera=camera)

        # thread-pooled per-image detection (the serial loop dominated the
        # end-to-end wall time); OpenCV detector const methods are
        # thread-safe and release the GIL. draw mode stays serial (imshow).
        from pycamset_tpu.utils.general_utils import thread_map
        results = thread_map(detect_one, im_locs,
                             n_threads=1 if draw else None)
        for idx, detection in enumerate(results):
            detections.add_detection(cam_name, idx, detection)
        return detections

    # ------------------------------------------------------- local geometry

    def make_local(self) -> np.ndarray:
        """Per-face locally-flat (z=0) coordinates via change of basis.

        Calibration seeding assumes each face is planar; this computes, for
        every face of point_data, a local coordinate frame with z == 0.
        """
        if self.point_data is None:
            raise AttributeError(
                "The self.point_data variable should be set during initialisation")
        if self.point_data.ndim == 2:
            self.point_data = self.point_data[None, ...]
        init_shape = self.point_data.shape
        n = init_shape[-2]
        local_view = np.reshape(self.point_data, (-1, n, 3))
        if local_view.shape[0] == 1:
            return copy(self.point_data)

        ref_point = local_view[:, 0, :]
        init_dir = local_view[:, 1, :] - ref_point
        normals = np.array([plane_fit(face.T)[1] for face in local_view])
        v3 = np.cross(init_dir, normals)
        v3 /= np.linalg.norm(v3, axis=1, keepdims=True)
        normals /= np.linalg.norm(normals, axis=1, keepdims=True)
        init_dir /= np.linalg.norm(init_dir, axis=1, keepdims=True)
        cob = np.linalg.inv(
            np.stack((v3, init_dir, normals)).transpose((1, 0, 2)))
        local_coords = (local_view - ref_point[:, None, :]) @ cob
        return np.reshape(local_coords, init_shape)

    # ------------------------------------------------------------- seeding

    def initial_calibration(self, cam_name, detection: TargetDetection,
                            res: list, pose_im: int = 0,
                            fixed_params: dict | None = None,
                            camera_model: str = "standard") -> Camera:
        """Per-camera intrinsic seed via cv2.calibrateCamera on planar faces.

        Uses only boards with >12 detected corners, feeding (local 2D object
        points, image points) pairs; honours fixed int/dst/ext params.
        camera_model="rational" seeds with cv2.CALIB_RATIONAL_MODEL (8
        distortion coefficients); "thin_prism" adds CALIB_THIN_PRISM_MODEL
        (12) — the reference carries these flags only as commented-out dead
        code (abstract_target.py initial_calibration).
        """
        detections_in_image = detection.get(cam=cam_name).get_image_list()
        object_points: list = []
        image_points: list = []

        fixed_param = {}
        if fixed_params is not None:
            fixed_param = fixed_params.get(cam_name, {})
            if "int" in fixed_param and "dst" in fixed_param:
                logging.info(f"Camera {cam_name} was pre determined. "
                             "Skipping opencv calibration")
                return Camera(intrinsic=fixed_param["int"],
                              distortion_coefs=fixed_param["dst"],
                              res=res, name=cam_name)

        for im_detect in detections_in_image:
            data = im_detect.get_data()
            if data is None:
                continue
            keys = get_keys(data)
            boards, b_counts = np.unique(keys[:, :-1], return_counts=True)
            mask = b_counts > np.prod(self.point_local.shape[:-2])
            for board in boards[mask]:
                key_mask = np.squeeze(keys[:, :-1] == board)
                if np.sum(key_mask) > 12:
                    board_obj = self.point_local[
                        tuple(keys[key_mask].astype(int).T)][None, ...].astype("float32")
                    board_im = data[key_mask, -2:][None, ...].astype("float32")
                    object_points.append(board_obj)
                    image_points.append(board_im)

        start = time.time()
        flags = {"standard": 0, "rational": cv2.CALIB_RATIONAL_MODEL,
                 "thin_prism": (cv2.CALIB_RATIONAL_MODEL
                                | cv2.CALIB_THIN_PRISM_MODEL),
                 "tilted": (cv2.CALIB_RATIONAL_MODEL
                            | cv2.CALIB_THIN_PRISM_MODEL
                            | cv2.CALIB_TILTED_MODEL),
                 }.get(camera_model, 0)
        ic = cv2.calibrateCamera(object_points, image_points,
                                 tuple(res[::-1]), None, None, flags=flags)
        logging.info(f"{cam_name} took {time.time() - start:.1f} seconds, "
                     f"leftover error of {ic[0]:.2f} pixels")

        init_cam = Camera(intrinsic=ic[1], distortion_coefs=np.array(ic[2]),
                          res=res, name=cam_name)
        if fixed_params is not None:
            if "int" in fixed_param:
                init_cam.intrinsic = np.asarray(fixed_param["int"], dtype=float)
            if "dst" in fixed_param:
                init_cam.distortion_coefs = np.asarray(
                    fixed_param["dst"], dtype=float).reshape(-1)
            if "ext" in fixed_param:
                init_cam.set_extrinsic(np.asarray(fixed_param["ext"], dtype=float))
                return init_cam
            init_cam._update_state()
        return init_cam

    def target_pose_in_cam_image(self, detection: TargetDetection, cam: Camera,
                                 refine: bool = False, mode: str = "throw") -> np.ndarray:
        """PnP pose of the target (target->camera 4x4) in one image.

        mode='nan' returns a nan matrix instead of raising on failure.
        """
        def fail(msg):
            if mode == "nan":
                return np.ones((4, 4)) * np.nan
            raise ValueError(msg)

        if not detection.has_data():
            return fail(f"The detection had no data at all, including for "
                        f"camera {cam.name}")
        datum = detection.get(cam=cam.name).get_data()
        if datum is None:
            return fail(f"The detection had no data for camera {cam.name}")
        # one image only; the reference checked column 0 (the camera column,
        # always unique after get(cam=...)), so its guard never fired
        if len(np.unique(datum[:, 1])) > 1:
            return fail("passed detection contained info from multiple "
                        "cameras; pose estimation only works with 1 image")

        keys = get_keys(datum)
        object_points = self.point_data[tuple(keys.astype(int).T)]
        image_points = datum[:, -2:]
        if len(object_points) < 6:
            return fail("Inadequate number of corners for pose estimation")

        _, rvec, tvec, err_list = cv2.solvePnPGeneric(
            object_points.astype("float32"), image_points.astype("float32"),
            cam.intrinsic, np.asarray(cam.distortion_coefs, dtype=float))
        min_err = int(np.argmin(err_list))
        if (err := np.squeeze(err_list[min_err])) > 5:
            logging.warning(f"Initial error of {err: .2f} found for a pose detection.")
        if refine:
            raise NotImplementedError
        return make_4x4h_tform(rvec[min_err], tvec[min_err])

    # ------------------------------------------------------- pose utilities

    def pose_in_detections(self, detections: TargetDetection, camset,
                           ref_cam=0, outliers: str = "ask"
                           ) -> tuple[list[np.ndarray], np.ndarray]:
        """World-frame target poses per image, with MAD outlier filtering.

        :param outliers: 'ask' prompts interactively, 'y' removes outliers,
            'n' keeps them.
        :return poses: list of found 4x4 poses.
        :return p_detected: boolean array — was a pose found in each image.
        """
        other_cams = set(range(camset.get_n_cams())) - {ref_cam}
        cam = camset[ref_cam]
        poses = []
        for im_list in detections.get_image_list():
            try:
                pose = cam.cam_to_world @ self.target_pose_in_cam_image(im_list, cam)
            except Exception:
                for other_cam in other_cams:
                    try:
                        pose = (camset[other_cam].cam_to_world
                                @ self.target_pose_in_cam_image(im_list, camset[other_cam]))
                        break
                    except Exception:
                        continue
                else:
                    pose = None
            poses.append(pose)

        p_detected = np.array([p is not None for p in poses])
        poses = [p for p in poses if p is not None]
        mloc = np.mean([p[:3, 3] for p in poses], axis=0)

        num_loops = 0
        logging.info("Beginning outlier detection")
        while num_loops < 10:
            ans = mad_outlier_detection(
                [np.linalg.norm(p[:3, 3] - mloc) for p in poses],
                out_thresh=5, draw=False)
            if ans is None:
                logging.info(f"No outliers detected in iteration {num_loops}.")
                break
            user_in = outliers
            while user_in not in ("y", "n"):
                print(f"Outliers detected in iteration {num_loops}.")
                user_in = input("Drop these outlier detections? [y/n]: ")
            if user_in == "y":
                inds = np.arange(len(p_detected))[p_detected][ans]
                poses = list(np.delete(np.array(poses), ans, axis=0))
                p_detected[inds] = False
            else:
                break
            num_loops += 1
        return poses, p_detected
