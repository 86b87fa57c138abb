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
    if keys.shape[1] > 1:
        return keys
    face0 = np.zeros_like(keys)
    return np.hstack([face0, keys])


# ---------------------------------------------------- fast detection path
#
# Per-image corner detection is the end-to-end wall-time sink (the solve is
# tens of ms; a default-parameter aruco scan is ~0.3 s). Profiling shows the
# cost is CANDIDATE processing, not pixels: the chessboard squares
# themselves are quad candidates, and the default detector runs a 3-window
# adaptive-threshold sweep (3/13/23) whose win=3 pass contributes nothing
# but whose candidates all get warped and matched against the dictionary.
# The fast pass therefore thresholds at ONE window size with error
# correction off (~3x, equal recall on the reference datasets); any frame
# where it underperforms falls back to the default-parameter detector.
# Very large images additionally detect on a decimated view and
# re-localise every corner on the full-res image with cv2.cornerSubPix
# (the reference carried the decimation idea as an unused utility,
# pyCamSet/utils/general_utils.py:486-523).
FAST_DETECTION_EDGE_PX = 2400
# accept a fast-pass detection outright only when it found at least this
# many corners; below it, rerun with the default detector and keep
# whichever found more
FAST_DETECTION_MIN_CORNERS = 20
_REFINE_STOP = (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 0.01)


def fast_detector_params():
    """Single-threshold-window aruco parameters for the fast first pass."""
    from cv2 import aruco
    dp = aruco.DetectorParameters()
    dp.adaptiveThreshWinSizeMin = 23
    dp.adaptiveThreshWinSizeMax = 23
    dp.errorCorrectionRate = 0.0
    return dp


def detection_scale(im_shape) -> int:
    """The factor that brings the long image edge near the fast-path size."""
    return max(1, -(-max(im_shape[:2]) // FAST_DETECTION_EDGE_PX))


def decimate_for_detection(image: np.ndarray, scale: int) -> np.ndarray:
    """Anti-aliased downscale for the fast detection pass (INTER_AREA box
    filter; plain striding aliases the marker patterns). Low-res pixel
    centre c maps back to full-res (c + 0.5) * scale - 0.5."""
    h, w = image.shape[:2]
    return cv2.resize(image, (w // scale, h // scale),
                      interpolation=cv2.INTER_AREA)


def refine_corners_full_res(image: np.ndarray, approx_px: np.ndarray,
                            scale: int) -> np.ndarray:
    """Subpixel-refine approximate corner locations on the full-res image.

    The search window scales with the decimation stride so the true corner
    (at most ~scale px away from the upsampled estimate) stays inside it.
    """
    if image.ndim == 3:  # cornerSubPix wants single-channel
        image = cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
    win = max(5, 2 * scale + 1)
    pts = np.ascontiguousarray(approx_px, dtype=np.float32).reshape(-1, 1, 2)
    cv2.cornerSubPix(image, pts, (win, win), (-1, -1), _REFINE_STOP)
    return pts.reshape(-1, 2).astype(float)


def detect_board_with_flip(image, detectors, pattern, on_flip=None):
    """One charuco detectBoard pass with the flipped-pattern retry.

    `detectors` is a [layout0, layout1] pair; marker detection is
    pattern-independent (both layouts share the dictionary), so the retry
    re-interpolates the SAME markers and the outcome does not depend on
    which layout was tried first — the sticky preference only saves the
    wasted first attempt.

    :return: (corners (n,2) or None, ids (n,) or None, pattern).
    """
    corners, ids, marker_px, marker_ids = detectors[pattern].detectBoard(image)
    if corners is None and marker_px is not None:
        if on_flip is not None:
            on_flip()
        corners, ids, marker_px, marker_ids = (
            detectors[1 - pattern].detectBoard(
                image, markerCorners=marker_px, markerIds=marker_ids))
        if corners is not None:
            pattern = 1 - pattern
    if corners is None:
        return None, None, pattern
    # OpenCV returns (N,1,2)/(N,1) pre-5.0 and (N,2)/(N,) from 5.0 on
    return (np.asarray(corners).reshape(-1, 2),
            np.asarray(ids).reshape(-1), pattern)


def ladder_detect_board(image, full_detectors, fast_detectors, pattern,
                        min_corners, use_fast=True, on_flip=None):
    """Fast-first board detection: the single-threshold-window fast pass,
    then the default-parameter detectors whenever it underperforms, keeping
    whichever pass found more corners.

    :return: (corners (n,2) or None, ids (n,) or None, pattern).
    """
    corners = ids = None
    if use_fast:
        corners, ids, pattern = detect_board_with_flip(
            image, fast_detectors, pattern, on_flip=on_flip)
    if corners is None or len(corners) < min_corners:
        full_c, full_i, pattern = detect_board_with_flip(
            image, full_detectors, pattern, on_flip=on_flip)
        if full_c is not None and (corners is None
                                   or len(full_c) > len(corners)):
            corners, ids = full_c, full_i
    return corners, ids, pattern


def _fisheye_seed(world_pts, pixel_pts, image_size):
    """cv2.fisheye.calibrate wrapper (float64 shapes, stable flags).

    CALIB_CHECK_COND aborts on marginal boards, so it stays off; a failed
    fisheye calibration falls back to a pinhole-only seed with zero
    distortion (the bundle adjustment recovers the coefficients).
    """
    obj = [np.asarray(w, np.float64).reshape(1, -1, 3) for w in world_pts]
    img = [np.asarray(p, np.float64).reshape(1, -1, 2) for p in pixel_pts]
    # cv2 5.0 hoisted the fisheye flags to the top-level namespace
    flags = (getattr(cv2, "CALIB_RECOMPUTE_EXTRINSIC",
                     getattr(cv2.fisheye, "CALIB_RECOMPUTE_EXTRINSIC", 0))
             | getattr(cv2, "CALIB_FIX_SKEW",
                       getattr(cv2.fisheye, "CALIB_FIX_SKEW", 0)))
    try:
        rms, kmat, dist, _rv, _tv = cv2.fisheye.calibrate(
            obj, img, image_size, None, None, flags=flags)
        return rms, kmat, dist.reshape(-1)
    except cv2.error as err:
        logging.warning(f"cv2.fisheye.calibrate failed ({err}); seeding "
                        "with a pinhole-only fisheye model")
        rms, kmat, _d, *_ = cv2.calibrateCamera(
            [np.asarray(w, np.float32) for w in world_pts],
            [np.asarray(p, np.float32) for p in pixel_pts], image_size,
            None, None, flags=cv2.CALIB_FIX_K1 | cv2.CALIB_FIX_K2
            | cv2.CALIB_FIX_K3 | cv2.CALIB_ZERO_TANGENT_DIST)
        return rms, kmat, np.zeros(4)


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
    # a 4-wide (fisheye) vector warps even with all-zero coefficients —
    # the equidistant mapping is never the identity
    if dist.size != 4 and not np.any(dist):
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

    # mutable flags that change WHAT the detector finds — the detection
    # cache fingerprint (calibration/camera_calibrator.py::
    # _detector_fingerprint) reads this list, so new detector-affecting
    # flags must be added here or stale caches get served silently
    DETECTOR_FLAGS = ("photometric_refine", "fast_detection")

    def __init__(self, inputs: dict):
        # record the constructor args (arrays as lists) so persistence can
        # re-instantiate the target reflectively
        ctor_args = {
            k: (v.tolist() if isinstance(v, np.ndarray) else v)
            for k, v in inputs.items() if k not in ("self", "__class__")
        }
        self.point_data: np.ndarray | None = None
        self.point_local: np.ndarray | None = None
        self.original_points: np.ndarray | None = None
        self.input_args = ctor_args
        self.valid_map: bool | np.ndarray = True
        # opt-in photometric X-corner refinement (models/corner_refine.py):
        # ~3x lower corner error than cv2.cornerSubPix on blurred/noisy
        # imagery, at ~30 ms/image of host-CPU fitting. Only meaningful for
        # checkerboard-style targets (ChArUco / Ccube faces).
        self.photometric_refine: bool = False

    def _refine_photometric(self, image: np.ndarray,
                            corners: np.ndarray | None):
        """Apply the opt-in photometric saddle fit to detected corners."""
        if (not getattr(self, "photometric_refine", False)
                or corners is None or len(corners) == 0):
            return corners
        from pycamset_tpu.models.corner_refine import (
            refine_corners_photometric)
        return refine_corners_photometric(image, np.asarray(corners, float))

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
        frames = natsorted(str(p) for p in glob_ims(file))
        if not frames:
            raise ValueError(f"No images were found in the given folder {file}")
        frames = frames[:n_lim] if n_lim is not None else frames

        def detect_one(frame_path):
            grey = cv2.imread(frame_path)
            if grey.ndim == 3:
                grey = grey[..., 0]
            return self.find_in_image(grey, draw=draw, camera=camera)

        # thread-pooled per-image detection (the serial loop dominated the
        # end-to-end wall time); OpenCV detector const methods are
        # thread-safe and release the GIL. draw mode stays serial (imshow).
        from pycamset_tpu.utils.general_utils import thread_map
        per_frame = thread_map(detect_one, frames,
                               n_threads=1 if draw else None)

        table = TargetDetection(
            cam_names=[cam_name] if cam_names is None else cam_names)
        for frame_idx, found in enumerate(per_frame):
            table.add_detection(cam_name, frame_idx, found)
        return table

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
            self.point_data = self.point_data[None]
        full_shape = self.point_data.shape
        faces = self.point_data.reshape(-1, full_shape[-2], 3)
        if len(faces) == 1:
            return copy(self.point_data)

        def unit(v):
            return v / np.linalg.norm(v, axis=-1, keepdims=True)

        # per-face frame: the first edge, the fitted plane normal, and their
        # cross product span the face; inverting the frame takes each face's
        # points into a z=0 local system anchored at its first point
        anchor = faces[:, 0]
        edge = faces[:, 1] - anchor
        normal = np.stack([plane_fit(f.T)[1] for f in faces])
        frame = np.stack(
            [unit(np.cross(edge, normal)), unit(edge), unit(normal)], axis=1)
        flattened = (faces - anchor[:, None]) @ np.linalg.inv(frame)
        return flattened.reshape(full_shape)

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
        pinned = (fixed_params or {}).get(cam_name, {})
        if "int" in pinned and "dst" in pinned:
            logging.info(f"Camera {cam_name} was pre determined. "
                         "Skipping opencv calibration")
            return Camera(intrinsic=pinned["int"],
                          distortion_coefs=pinned["dst"],
                          res=res, name=cam_name)

        # gather one (local 2D object points, image points) pair per board
        # with more than 12 well-spread corners
        world_pts: list = []
        pixel_pts: list = []
        min_board_rows = np.prod(self.point_local.shape[:-2])
        for per_im in detection.get(cam=cam_name).get_image_list():
            rows = per_im.get_data()
            if rows is None:
                continue
            keys = get_keys(rows)
            face_ids, face_rows = np.unique(keys[:, :-1], return_counts=True)
            for face in face_ids[face_rows > min_board_rows]:
                on_face = np.squeeze(keys[:, :-1] == face)
                if on_face.sum() <= 12:
                    continue
                gathered = self.point_local[tuple(keys[on_face].astype(int).T)]
                world_pts.append(gathered[None].astype("float32"))
                pixel_pts.append(rows[on_face, -2:][None].astype("float32"))

        model_flags = {
            "standard": 0,
            "rational": cv2.CALIB_RATIONAL_MODEL,
            "thin_prism": (cv2.CALIB_RATIONAL_MODEL
                           | cv2.CALIB_THIN_PRISM_MODEL),
            "tilted": (cv2.CALIB_RATIONAL_MODEL
                       | cv2.CALIB_THIN_PRISM_MODEL
                       | cv2.CALIB_TILTED_MODEL),
        }
        tic = time.time()
        if camera_model == "fisheye":
            rms, k_seed, dist_seed = _fisheye_seed(
                world_pts, pixel_pts, tuple(res[::-1]))
        else:
            rms, k_seed, dist_seed, *_ = cv2.calibrateCamera(
                world_pts, pixel_pts, tuple(res[::-1]), None, None,
                flags=model_flags.get(camera_model, 0))
        logging.info(f"{cam_name} took {time.time() - tic:.1f} seconds, "
                     f"leftover error of {rms:.2f} pixels")

        seed = Camera(intrinsic=k_seed, distortion_coefs=np.array(dist_seed),
                      res=res, name=cam_name)
        # a partial pin (only int, dst, or ext fixed) overrides the seed
        if "int" in pinned:
            seed.intrinsic = np.asarray(pinned["int"], dtype=float)
        if "dst" in pinned:
            seed.distortion_coefs = np.ravel(
                np.asarray(pinned["dst"], dtype=float))
        if "ext" in pinned:
            seed.set_extrinsic(np.asarray(pinned["ext"], dtype=float))
        elif pinned:
            seed._update_state()
        return seed

    def target_pose_in_cam_image(self, detection: TargetDetection, cam: Camera,
                                 refine: bool = False, mode: str = "throw") -> np.ndarray:
        """PnP pose of the target (target->camera 4x4) in one image.

        mode='nan' returns a nan matrix instead of raising on failure.
        """
        def fail(msg):
            if mode == "nan":
                return np.full((4, 4), np.nan)
            raise ValueError(msg)

        if not detection.has_data():
            return fail(f"The detection had no data at all, including for "
                        f"camera {cam.name}")
        rows = detection.get(cam=cam.name).get_data()
        if rows is None:
            return fail(f"The detection had no data for camera {cam.name}")
        # one image only; the reference checked column 0 (the camera column,
        # always unique after get(cam=...)), so its guard never fired
        if len(np.unique(rows[:, 1])) > 1:
            return fail("passed detection contained info from multiple "
                        "cameras; pose estimation only works with 1 image")

        keys = get_keys(rows).astype(int)
        seen_model_pts = self.point_data[tuple(keys.T)]
        if len(seen_model_pts) < 6:
            return fail("Inadequate number of corners for pose estimation")

        dist = np.ravel(np.asarray(cam.distortion_coefs, dtype=float))
        obs_px = rows[:, -2:]
        err_scale = 1.0
        if dist.size == 4:
            # the fisheye marker width: solvePnP treats distortion as
            # Brown-Conrady, so undistort to the normalized pinhole frame
            # first and solve with an identity intrinsic; the residuals are
            # then in normalized units and rescale by the focal for the
            # pixel-threshold check below
            err_scale = float(cam.intrinsic[0, 0])
            norm = cv2.fisheye.undistortPoints(
                obs_px.reshape(1, -1, 2).astype(np.float64),
                np.asarray(cam.intrinsic, dtype=float), dist)
            obs_px, kmat, dist = norm.reshape(-1, 2), np.eye(3), np.zeros(5)
        else:
            kmat = cam.intrinsic
        _n_sols, rvecs, tvecs, per_sol_err = cv2.solvePnPGeneric(
            seen_model_pts.astype("float32"),
            obs_px.astype("float32"), kmat, dist)
        best = int(np.argmin(per_sol_err))
        best_err = float(np.squeeze(per_sol_err[best])) * err_scale
        if best_err > 5:
            logging.warning(
                f"Initial error of {best_err: .2f} found for a pose detection.")
        if refine:
            raise NotImplementedError
        return make_4x4h_tform(rvecs[best], tvecs[best])

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
        cam_order = [ref_cam] + sorted(
            set(range(camset.get_n_cams())) - {ref_cam})

        def world_pose_of(im_rows):
            # PnP from the reference camera, falling back to any other camera
            # that saw the target in this image
            for idx in cam_order:
                viewer = camset[idx]
                try:
                    local = self.target_pose_in_cam_image(im_rows, viewer)
                    return viewer.cam_to_world @ local
                except Exception:
                    continue
            return None

        maybe_poses = [world_pose_of(im_rows)
                       for im_rows in detections.get_image_list()]
        p_detected = np.array([p is not None for p in maybe_poses])
        poses = [p for p in maybe_poses if p is not None]
        centre = np.mean([p[:3, 3] for p in poses], axis=0)

        logging.info("Beginning outlier detection")
        for sweep in range(10):
            flagged = mad_outlier_detection(
                [np.linalg.norm(p[:3, 3] - centre) for p in poses],
                out_thresh=5, draw=False)
            if flagged is None:
                logging.info(f"No outliers detected in iteration {sweep}.")
                break
            choice = outliers
            while choice not in ("y", "n"):
                print(f"Outliers detected in iteration {sweep}.")
                choice = input("Drop these outlier detections? [y/n]: ")
            if choice != "y":
                break
            original_rows = np.flatnonzero(p_detected)[flagged]
            p_detected[original_rows] = False
            poses = list(np.delete(np.array(poses), flagged, axis=0))
        return poses, p_detected
