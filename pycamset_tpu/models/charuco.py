"""ChArUco planar calibration target (OpenCV detection frontend).

Capability parity target (reference, behaviour only):
pyCamSet/calibration_targets/target_charuco.py:15-111 — CharucoBoard
construction (sizes in mm converted to m, optional legacy pattern),
CharucoDetector detection with a legacy-pattern fallback retry, plot.
"""
from __future__ import annotations

import logging

import cv2
import numpy as np
from cv2 import aruco

from pycamset_tpu.models.abstract_target import AbstractTarget
from pycamset_tpu.models.camera import Camera
from pycamset_tpu.models.detections import ImageDetection
from pycamset_tpu.utils.general_utils import downsample_valid


class ChArUco(AbstractTarget):
    """A planar ChArUco board; dimensions are given in mm."""

    def __init__(self, num_squares_x, num_squares_y, square_size,
                 marker_fraction=0.8, a_dict=cv2.aruco.DICT_4X4_1000,
                 legacy=False):
        """
        :param num_squares_x: number of squares in the x direction.
        :param num_squares_y: number of squares in the y direction.
        :param square_size: square size in mm.
        :param marker_fraction: fraction of a square occupied by a marker.
        :param a_dict: the aruco dictionary to use.
        :param legacy: use the legacy (pre-4.6) charuco pattern layout.
        """
        super().__init__(inputs=locals())
        self.square_size = square_size
        square_m = square_size / 1000  # mm -> metres
        marker_m = marker_fraction * square_m

        self.a_dict = cv2.aruco.getPredefinedDictionary(a_dict)
        # both pattern layouts are built up front so the version-drift
        # fallback never mutates a shared board (find_in_image runs on a
        # thread pool; cv2 detectBoard is const/thread-safe, board mutation
        # is not) — index 0 is the requested layout, 1 the flipped one
        self.boards = []
        for use_legacy in (legacy, not legacy):
            b = cv2.aruco.CharucoBoard(
                (num_squares_x, num_squares_y), square_m, marker_m,
                self.a_dict)
            b.setLegacyPattern(bool(use_legacy))
            self.boards.append(b)
        self.board = self.boards[0]
        self.point_data = self.board.getChessboardCorners().squeeze().astype(np.float64)

        from pycamset_tpu.models.abstract_target import fast_detector_params
        self.detection_params = aruco.CharucoParameters()
        self.detection_params.tryRefineMarkers = True
        self.board_detectors = [aruco.CharucoDetector(b, self.detection_params)
                                for b in self.boards]
        self.board_detector = self.board_detectors[0]
        # single-threshold-window first-pass detectors (~3x, see
        # abstract_target fast-detection notes); default detectors above
        # remain the fallback
        self.fast_detectors = [
            aruco.CharucoDetector(b, self.detection_params,
                                  fast_detector_params())
            for b in self.boards]
        self._preferred = 0        # sticky pattern choice (int write: atomic)
        self._given_legacy_warning = False
        self.fast_detection = True  # fast first pass + fallback ladder

        self._process_data()

    def _detect_with_fallback(self, image, allow_flip=True, fast=False):
        """One detection pass at the given resolution, with the flipped
        legacy-pattern retry (OpenCV version drift produces boards whose
        markers match but whose corners will not interpolate).

        Marker detection is pattern-independent (both layouts share the
        dictionary), so the flip retry re-interpolates the SAME markers —
        the result does not depend on which pattern was tried first, and
        the sticky preference only saves the wasted first attempt (this
        keeps threaded and serial folder scans identical). The flip is
        disabled on decimated views (allow_flip=False): a marginal low-res
        interpolation failure must fall through to the full-res ladder,
        not flip the pattern on aliased evidence.

        :return: (corners (n,2) or None, corner ids (n,) or None).
        """
        detectors = self.fast_detectors if fast else self.board_detectors
        pattern = self._preferred
        corners, corner_ids, marker_px, marker_ids = (
            detectors[pattern].detectBoard(image))
        if corners is None and marker_px is not None and allow_flip:
            if not self._given_legacy_warning:
                logging.warning("Found markers, but no corners, trying using "
                                "alternative board detection")
                self._given_legacy_warning = True
            corners, corner_ids, marker_px, marker_ids = (
                detectors[1 - pattern].detectBoard(
                    image, markerCorners=marker_px, markerIds=marker_ids))
            if corners is not None:
                self._preferred = 1 - pattern  # sticky, like the old board flip
        if corners is None:
            return None, None
        # OpenCV returns (N,1,2)/(N,1) pre-5.0 and (N,2)/(N,) from 5.0 on
        return (np.asarray(corners).reshape(-1, 2),
                np.asarray(corner_ids).reshape(-1))

    def find_in_image(self, image, draw=False, camera: Camera | None = None,
                      wait_len=1) -> ImageDetection:
        """Detect the board corners in an image.

        Large images take the fast path: detect on a decimated view, then
        subpixel-refine every corner at full resolution (falling back to a
        full-res pass when the decimated one underperforms). When a camera
        model is given, detection runs on the undistorted view and the
        corners are mapped back (board-aware detection).
        """
        from pycamset_tpu.models.abstract_target import (
            FAST_DETECTION_MIN_CORNERS, detection_scale,
            refine_corners_full_res, undistort_for_detection)
        image, redistort = undistort_for_detection(image, camera)

        from pycamset_tpu.models.abstract_target import decimate_for_detection
        corners = corner_ids = None
        if self.fast_detection:
            scale = detection_scale(image.shape)
            if scale > 1:
                # huge image: fast pass on a decimated view, corners
                # re-localised at full res
                small = decimate_for_detection(image, scale)
                corners, corner_ids = self._detect_with_fallback(
                    small, allow_flip=False, fast=True)
                if corners is not None:
                    corners = refine_corners_full_res(
                        image, (corners + 0.5) * scale - 0.5, scale)
            else:
                corners, corner_ids = self._detect_with_fallback(
                    image, fast=True)
        if corners is None or len(corners) < FAST_DETECTION_MIN_CORNERS:
            full_c, full_ids = self._detect_with_fallback(image)
            if full_c is not None and (corners is None
                                       or len(full_c) > len(corners)):
                corners, corner_ids = full_c, full_ids

        if corners is None:
            return ImageDetection()

        if redistort is not None:
            corners = redistort(corners)

        if draw:
            preview_hw = [480, 640]
            shrink = int(max(min(np.array(image.shape[:2]) / preview_hw), 1))
            preview = downsample_valid(image.copy(), shrink).astype(np.uint8)
            if preview.ndim == 2:
                preview = np.repeat(preview[..., None], 3, axis=-1)
            aruco.drawDetectedCornersCharuco(
                preview, corners[:, None, :] / shrink, corner_ids[:, None])
            cv2.imshow("detections", preview)
            cv2.waitKey(wait_len)

        return ImageDetection(corner_ids, corners)

    def plot(self, imres=(1000, 1000)):
        """Draw the board as a matplotlib image."""
        from matplotlib import pyplot as plt
        plt.imshow(self.board.generateImage(imres), cmap="gray")
        plt.show()
