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
        squares_length = square_size / 1000  # to metres
        marker_length = marker_fraction * square_size / 1000

        self.a_dict = cv2.aruco.getPredefinedDictionary(a_dict)
        # both pattern layouts are built up front so the version-drift
        # fallback never mutates a shared board (find_in_image runs on a
        # thread pool; cv2 detectBoard is const/thread-safe, board mutation
        # is not) — index 0 is the requested layout, 1 the flipped one
        self.boards = []
        for flipped in (legacy, not legacy):
            b = cv2.aruco.CharucoBoard(
                (num_squares_x, num_squares_y), squares_length,
                marker_length, self.a_dict)
            b.setLegacyPattern(bool(flipped))
            self.boards.append(b)
        self.board = self.boards[0]
        self.point_data = self.board.getChessboardCorners().squeeze().astype(np.float64)

        self.detection_params = aruco.CharucoParameters()
        self.detection_params.tryRefineMarkers = True
        self.board_detectors = [aruco.CharucoDetector(b, self.detection_params)
                                for b in self.boards]
        self.board_detector = self.board_detectors[0]
        self._preferred = 0        # sticky pattern choice (int write: atomic)
        self._given_legacy_warning = False

        self._process_data()

    def find_in_image(self, image, draw=False, camera: Camera | None = None,
                      wait_len=1) -> ImageDetection:
        """Detect the board corners in an image.

        Falls back to the flipped legacy-pattern layout when markers are found
        but no corners interpolate (OpenCV version drift produces this).
        When a camera model is given, detection runs on the undistorted view
        and the corners are mapped back (board-aware detection).
        """
        from pycamset_tpu.models.abstract_target import undistort_for_detection
        image, redistort = undistort_for_detection(image, camera)
        pref = self._preferred
        c_corners, c_ids, mloc, mid = (
            self.board_detectors[pref].detectBoard(image))
        if c_corners is None and mloc is not None:
            if not self._given_legacy_warning:
                logging.warning("Found markers, but no corners, trying using "
                                "alternative board detection")
                self._given_legacy_warning = True
            c_corners, c_ids, mloc, mid = (
                self.board_detectors[1 - pref].detectBoard(
                    image, markerCorners=mloc, markerIds=mid))
            if c_corners is not None:
                self._preferred = 1 - pref  # sticky, like the old board flip

        if c_corners is None:
            return ImageDetection()

        # OpenCV returns (N,1,2)/(N,1) pre-5.0 and (N,2)/(N,) from 5.0 on
        c_corners = np.asarray(c_corners).reshape(-1, 2)
        c_ids = np.asarray(c_ids).reshape(-1)
        if redistort is not None:
            c_corners = redistort(c_corners)

        if draw:
            display_im = image.copy()
            target_size = [480, 640]
            d_f = int(max(min(np.array(display_im.shape[:2]) / target_size), 1))
            display_im = downsample_valid(display_im, d_f).astype(np.uint8)
            if display_im.ndim == 2:
                display_im = np.tile(display_im[..., None], (1, 1, 3))
            aruco.drawDetectedCornersCharuco(
                display_im, c_corners[:, None, :] / d_f, c_ids[:, None])
            cv2.imshow("detections", display_im)
            cv2.waitKey(wait_len)

        return ImageDetection(c_ids, c_corners)

    def plot(self, imres=(1000, 1000)):
        """Draw the board as a matplotlib image."""
        from matplotlib import pyplot as plt
        plt.imshow(self.board.generateImage(imres), cmap="gray")
        plt.show()
