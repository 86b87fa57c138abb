"""Ccube: a cube calibration target with a ChArUco board on each face.

Capability parity target (reference, behaviour only):
pyCamSet/calibration_targets/target_Ccube.py — split one aruco dictionary
into 6 disjoint sub-dictionaries, per-face CharucoBoards, face transforms +
net layout for a unit cube, face textures with border + index label,
printable PDF net / per-face PNGs, detection loops 6 detectors per image
with keys (face_id, corner_id).
"""
from __future__ import annotations

import logging
from pathlib import Path

import cv2
import numpy as np
from cv2 import aruco

from pycamset_tpu.models.abstract_target import AbstractTarget
from pycamset_tpu.models.camera import Camera
from pycamset_tpu.models.detections import ImageDetection
from pycamset_tpu.models.shape_by_faces import FaceToShape
from pycamset_tpu.utils.general_utils import (
    downsample_valid, make_4x4h_tform, split_aruco_dictionary)

# face transforms of a unit cube (rvec, t), and the 2D net layout, as
# recovered by make_tforms / make_net_tforms for the cube solid
TFORMS = [
    ([2.22144147, 2.22144147, 0.0], [-0.5, -0.5, 0.5]),
    ([-1.57079633, 0.0, 0.0], [-0.5, -0.5, 0.5]),
    ([-1.20919958, -1.20919958, 1.20919958], [0.5, -0.5, 0.5]),
    ([0.0, 2.22144147, -2.22144147], [0.5, 0.5, 0.5]),
    ([0.0, 0.0, 1.57079633], [0.5, -0.5, -0.5]),
    ([1.20919958, 1.20919958, 1.20919958], [-0.5, -0.5, -0.5]),
]

NET_FORMS = [
    [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
    [[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
    [[1.0, 0.0, 1.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
    [[0.0, -1.0, 1.0], [1.0, 0.0, 1.0], [0.0, 0.0, 1.0]],
    [[1.0, 0.0, 2.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
    [[1.0, 0.0, -1.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
]


def make_blank_square(draw_res, line_fraction, border_fraction):
    """A blank white face with a black edge line; returns (canvas, offset)."""
    canvas = np.ones(draw_res) * 255
    int_line = int(draw_res[0] * line_fraction)
    canvas[:, :int_line] = 0
    canvas[:int_line, :] = 0
    canvas[:, -int_line:] = 0
    canvas[-int_line:, :] = 0
    return canvas, int(border_fraction * draw_res[0] / 2)


class Ccube(AbstractTarget):
    """A cube of 6 ChArUco boards (dimensions in mm)."""

    def __init__(self, length=20, n_points=5, aruco_dict=aruco.DICT_4X4_1000,
                 draw_res=(1000, 1000), border_fraction=0.1,
                 line_fraction=0.003, legacy=False):
        """
        :param length: cube edge length in mm.
        :param n_points: chessboard squares per face edge.
        :param aruco_dict: the dictionary split across the 6 faces.
        :param draw_res: face texture resolution.
        :param border_fraction: blank border fraction of each face.
        :param line_fraction: edge line thickness fraction.
        :param legacy: use the legacy charuco pattern layout.
        """
        super().__init__(inputs=locals())
        self.input_border_fraction = border_fraction
        self.actual_border_fraction = None
        self.line_fraction = line_fraction
        self.aruco_dict = aruco_dict
        self.length = length / 1000
        self.square_size = self.length * (1 - border_fraction) / n_points
        if n_points % 2 == 0:
            split = int(n_points ** 2 / 2)
        else:
            split = int((n_points - 1) * (n_points + 1) / 2)
        self.markers_per_face = split
        self.a_dicts = split_aruco_dictionary(split, self.aruco_dict)
        if len(self.a_dicts) < 6:
            raise ValueError("Input dictionary of marker didn't contain "
                             "enough markers for this cube")

        def make_boards(flipped):
            bs = [aruco.CharucoBoard((n_points, n_points), self.square_size,
                                     markerLength=0.75 * self.square_size,
                                     dictionary=a_dict)
                  for a_dict in self.a_dicts[:6]]
            for b in bs:
                b.setLegacyPattern(bool(flipped))
            return bs

        # both pattern layouts built up front: the version-drift fallback
        # must never mutate a shared board (detection runs on a thread pool)
        self.boards = make_boards(legacy)
        self._alt_boards = make_boards(not legacy)

        self.n_points = n_points
        self.draw_res = draw_res
        self.dpi = self.draw_res[0] / self.length / 39.3701  # px/inch
        blank_face, board_offset = make_blank_square(
            draw_res, line_fraction, border_fraction)
        blank_face = blank_face.astype(np.uint8)  # cv2 5.0 putText wants 8U
        sub_res = (draw_res[0] - 2 * board_offset, draw_res[1] - 2 * board_offset)
        self.textures = [blank_face.copy() for _ in range(6)]
        for idb, (t, board) in enumerate(zip(self.textures, self.boards)):
            t[board_offset:-board_offset,
              board_offset:-board_offset] = board.generateImage(sub_res)
            font = cv2.FONT_HERSHEY_SIMPLEX
            thickness = int(t.shape[0] / 500)
            cv2.putText(t, f"{idb}",
                        (t.shape[0] // 100, t.shape[0] // 100 * 99),
                        font, 1.5, 0, thickness)

        bd = np.array([board.getChessboardCorners() for board in self.boards])
        coord_bump = self.length * border_fraction / 2
        board_coords = bd + np.array([coord_bump, coord_bump, 0])
        self.base_face = np.array([
            [0, self.length, 0], [self.length, self.length, 0],
            [self.length, 0, 0], [0, 0, 0]])

        self.faceData = FaceToShape(
            face_local_coords=board_coords,
            face_transforms=[make_4x4h_tform(*t) for t in TFORMS],
            scale_factor=self.length)
        self.point_data = self.faceData.point_data
        self._process_data()

        self.board_detectors = None
        self._alt_detectors = None
        self._preferred = [0] * 6   # sticky per-face pattern (atomic writes)
        self._given_legacy_warning = False

    def plot(self, return_scene=False):
        """3D model of the cube (requires pyvista)."""
        scene = self.faceData.draw_meshes(self.base_face, self.textures,
                                          return_scene=return_scene)
        if return_scene:
            return scene

    def save_to_pdf(self, f_out: Path | None = None, border_width: float = 10,
                    individual_faces: bool = False):
        """Write a printable net (PDF/PNG) or per-face PNGs at true scale."""
        from PIL import Image

        def pad_and_save(im_board, out):
            blank_f = int(border_width * 0.0393701 * self.dpi)
            dims = np.array(im_board.shape) + blank_f * 2
            full_im = np.ones(tuple(dims)) * 255
            full_im[blank_f:-blank_f, blank_f:-blank_f] = im_board
            with Image.fromarray(full_im.astype(np.uint8)) as im:
                im.save(fp=out, resolution=self.dpi)

        if individual_faces:
            for idf, face in enumerate(self.textures):
                out = f_out or Path(
                    f"Ccube_length_{self.length * 1000:.2f}mm"
                    f"_{self.n_points}_points_at"
                    f"_{self.square_size * 1000:.2f}mm_face_{idf}.png")
                pad_and_save(face, out)
                f_out = None
            return

        im_board = self.faceData.draw_net(self.textures, NET_FORMS)
        out = f_out or (f"Ccube_length_{self.length * 1000:.2f}mm"
                        f"_{self.n_points}_points_at"
                        f"_{self.square_size * 1000:.2f}mm.pdf")
        pad_and_save(im_board, out)

    def find_in_image(self, image, draw=False, camera: Camera | None = None,
                      wait_len=1) -> ImageDetection:
        """Detect all 6 faces; keys are (face_id, corner_id) pairs.

        When a camera model is given, detection runs on the undistorted view
        and corners are mapped back (board-aware detection).
        """
        from pycamset_tpu.models.abstract_target import undistort_for_detection
        image, redistort = undistort_for_detection(image, camera)
        if self.board_detectors is None or self._alt_detectors is None:
            params = aruco.CharucoParameters()
            params.tryRefineMarkers = True
            # build fully, then publish in one (atomic) assignment — a
            # concurrent first call at worst builds a second identical list
            self.board_detectors = [aruco.CharucoDetector(b, params)
                                    for b in self.boards]
            self._alt_detectors = [aruco.CharucoDetector(b, params)
                                   for b in self._alt_boards]

        if draw:
            im_idea = image.copy()
            target_size = [480, 640]  # (h, w) to match the image shape order
            d_f = int(max(min(np.array(im_idea.shape[:2]) / target_size), 1))
            im_idea = downsample_valid(im_idea, d_f).astype(np.uint8)
            if im_idea.ndim == 2:
                im_idea = np.tile(im_idea[..., None], (1, 1, 3))

        seen_keys = []
        seen_data = []
        det_sets = (self.board_detectors, self._alt_detectors)
        for idb in range(len(self.boards)):
            pref = self._preferred[idb]
            bd = det_sets[pref][idb]
            c_corners, c_ids, mloc, mid = bd.detectBoard(image)
            if c_corners is None and mloc is not None:
                if not self._given_legacy_warning:
                    logging.warning("Found markers, but no corners, trying "
                                    "using alternative board detection")
                    self._given_legacy_warning = True
                c_corners, c_ids, mloc, mid = (
                    det_sets[1 - pref][idb].detectBoard(
                        image, markerCorners=mloc, markerIds=mid))
                if c_corners is not None:
                    self._preferred[idb] = 1 - pref
            if c_ids is not None:
                c_corners = np.asarray(c_corners).reshape(-1, 2)
                c_ids = np.asarray(c_ids).reshape(-1)
                for cid, corner in zip(c_ids, c_corners):
                    seen_keys.append([idb, cid])
                    seen_data.append(corner)
                if draw:
                    aruco.drawDetectedCornersCharuco(
                        im_idea, c_corners[:, None, :] / d_f, c_ids[:, None])

        if draw:
            cv2.imshow("detections", im_idea)
            cv2.waitKey(wait_len)

        if redistort is not None and seen_data:
            seen_data = list(redistort(np.asarray(seen_data)))
        return ImageDetection(keys=seen_keys, image_points=seen_data)
