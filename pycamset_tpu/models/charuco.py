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

    def _warn_flip_once(self):
        if not self._given_legacy_warning:
            logging.warning("Found markers, but no corners, trying using "
                            "alternative board detection")
            self._given_legacy_warning = True

    def find_in_image(self, image, draw=False, camera: Camera | None = None,
                      wait_len=1) -> ImageDetection:
        """Detect the board corners in an image.

        Fast-first ladder (abstract_target.ladder_detect_board): the
        single-threshold-window pass, then the default detectors whenever
        it underperforms. Large images additionally detect on a decimated
        view with corners subpixel-refined at full resolution. When a
        camera model is given, detection runs on the undistorted view and
        the corners are mapped back (board-aware detection).
        """
        from pycamset_tpu.models.abstract_target import (
            FAST_DETECTION_MIN_CORNERS, decimate_for_detection,
            detection_scale, ladder_detect_board,
            refine_corners_full_res, undistort_for_detection)
        image, redistort = undistort_for_detection(image, camera)

        corners = corner_ids = None
        scale = detection_scale(image.shape) if self.fast_detection else 1
        if scale > 1:
            # huge image: fast pass on a decimated view (no pattern flip on
            # aliased evidence), corners re-localised at full res
            small = decimate_for_detection(image, scale)
            corners, corner_ids, _, _ = (
                self.fast_detectors[self._preferred].detectBoard(small))[:4]
            if corners is not None:
                corners = np.asarray(corners).reshape(-1, 2)
                corner_ids = np.asarray(corner_ids).reshape(-1)
                corners = refine_corners_full_res(
                    image, (corners + 0.5) * scale - 0.5, scale)
        if corners is None or len(corners) < FAST_DETECTION_MIN_CORNERS:
            full_c, full_ids, self._preferred = ladder_detect_board(
                image, self.board_detectors, self.fast_detectors,
                self._preferred, FAST_DETECTION_MIN_CORNERS,
                use_fast=self.fast_detection and scale == 1,
                on_flip=self._warn_flip_once)
            if full_c is not None and (corners is None
                                       or len(full_c) > len(corners)):
                corners, corner_ids = full_c, full_ids

        if corners is None:
            return ImageDetection()

        corners = self._refine_photometric(image, corners)
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
