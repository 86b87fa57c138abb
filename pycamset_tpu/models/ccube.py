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
    rim_px = int(draw_res[0] * line_fraction)
    rows, cols = np.indices(draw_res)
    # distance of each pixel to the nearest canvas edge; the rim is black
    to_edge = np.minimum(np.minimum(rows, cols),
                         np.minimum(draw_res[0] - 1 - rows,
                                    draw_res[1] - 1 - cols))
    face = np.where(to_edge < rim_px, 0.0, 255.0)
    half_margin_px = int(border_fraction * draw_res[0] / 2)
    return face, half_margin_px


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
        edge_m = length / 1000          # the cube edge, metres
        self.length = edge_m
        self.n_points = n_points
        self.input_border_fraction = border_fraction
        self.actual_border_fraction = None
        self.line_fraction = line_fraction
        self.aruco_dict = aruco_dict
        self.square_size = edge_m * (1 - border_fraction) / n_points

        # a charuco face carries one marker per white square: half the board
        # for even n, (n-1)(n+1)/2 for odd n
        per_face = (n_points ** 2 if n_points % 2 == 0
                    else (n_points - 1) * (n_points + 1)) // 2
        self.markers_per_face = per_face
        self.a_dicts = split_aruco_dictionary(per_face, self.aruco_dict)
        if len(self.a_dicts) < 6:
            raise ValueError("Input dictionary of marker didn't contain "
                             "enough markers for this cube")

        def build_face_boards(use_legacy):
            made = []
            for sub_dict in self.a_dicts[:6]:
                b = aruco.CharucoBoard((n_points, n_points), self.square_size,
                                       markerLength=0.75 * self.square_size,
                                       dictionary=sub_dict)
                b.setLegacyPattern(bool(use_legacy))
                made.append(b)
            return made

        # both pattern layouts built up front: the version-drift fallback
        # must never mutate a shared board (detection runs on a thread pool)
        self.boards = build_face_boards(legacy)
        self._alt_boards = build_face_boards(not legacy)

        self.draw_res = draw_res
        self.dpi = draw_res[0] / edge_m / 39.3701  # px per inch at true scale
        self.textures = self._render_face_textures()

        # world model: per-face chessboard corners, shifted into the bordered
        # face frame, placed onto the cube by the face transforms
        margin_m = edge_m * border_fraction / 2
        corner_grids = np.array(
            [b.getChessboardCorners() for b in self.boards]
        ) + [margin_m, margin_m, 0]
        self.base_face = edge_m * np.array(
            [[0, 1, 0], [1, 1, 0], [1, 0, 0], [0, 0, 0]], dtype=float)
        self.faceData = FaceToShape(
            face_local_coords=corner_grids,
            face_transforms=[make_4x4h_tform(*t) for t in TFORMS],
            scale_factor=edge_m)
        self.point_data = self.faceData.point_data
        self._process_data()

        self.board_detectors = None
        self._alt_detectors = None
        self._fast_detectors = None
        self._alt_fast_detectors = None
        self._marker_detector = None
        self._preferred = [0] * 6   # sticky per-face pattern (atomic writes)
        self._given_legacy_warning = False
        # measured on the reference cube dataset the single-window fast
        # pass loses corners (small faces, 6x6 markers) and the per-face
        # fallback doubles the work — the ladder stays opt-in here, unlike
        # the planar board where it is a 1.5-2.7x win at equal counts
        self.fast_detection = False
        # ROI fast pass (default ON): ONE marker sweep with the union of
        # the six face sub-dictionaries locates the visible faces, then
        # each face's Charuco detection runs only inside its bounding
        # window — invisible faces skip detection entirely. Any face whose
        # windowed pass underperforms falls back to the full frame, and a
        # sweep that finds nothing falls back to the original 6-face loop.
        self.roi_detection = True

        base = (aruco.getPredefinedDictionary(aruco_dict)
                if isinstance(aruco_dict, int) else aruco_dict)
        union = aruco.Dictionary(0, base.markerSize)
        union.bytesList = np.array(base.bytesList[:6 * per_face])
        self._union_dict = union  # ids: face = id // per_face

    def _render_face_textures(self) -> list[np.ndarray]:
        """Six face images: bordered board patterns with an index label."""
        blank, inset = make_blank_square(
            self.draw_res, self.line_fraction, self.input_border_fraction)
        blank = blank.astype(np.uint8)  # cv2 5.0 putText wants 8U
        board_px = tuple(r - 2 * inset for r in self.draw_res)
        faces = []
        for face_idx, board in enumerate(self.boards):
            tex = blank.copy()
            tex[inset:-inset, inset:-inset] = board.generateImage(board_px)
            side = tex.shape[0]
            cv2.putText(tex, str(face_idx), (side // 100, side // 100 * 99),
                        cv2.FONT_HERSHEY_SIMPLEX, 1.5, 0, int(side / 500))
            faces.append(tex)
        return faces

    def _warn_flip_once(self):
        if not self._given_legacy_warning:
            logging.warning("Found markers, but no corners, trying "
                            "using alternative board detection")
            self._given_legacy_warning = True

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

        def default_name(suffix):
            return (f"Ccube_length_{self.length * 1000:.2f}mm"
                    f"_{self.n_points}_points_at"
                    f"_{self.square_size * 1000:.2f}mm{suffix}")

        def surround_and_save(artwork, destination):
            pad_px = int(border_width * 0.0393701 * self.dpi)  # mm -> px
            page = np.full(tuple(np.array(artwork.shape) + 2 * pad_px), 255.0)
            page[pad_px:-pad_px, pad_px:-pad_px] = artwork
            with Image.fromarray(page.astype(np.uint8)) as sheet:
                sheet.save(fp=destination, resolution=self.dpi)

        if individual_faces:
            for face_idx, face in enumerate(self.textures):
                surround_and_save(
                    face, f_out or Path(default_name(f"_face_{face_idx}.png")))
                f_out = None
            return

        net = self.faceData.draw_net(self.textures, NET_FORMS)
        surround_and_save(net, f_out or default_name(".pdf"))

    def _locate_face_rois(self, image):
        """One union-dictionary marker sweep -> per-face bounding windows.

        :return: {face_idx: (x0, y0, x1, y1)} for faces with at least one
            detected marker, or None when the sweep found nothing (caller
            falls back to full-frame detection for every face).
        """
        corners, ids, _rej = self._marker_detector.detectMarkers(image)
        if ids is None or len(ids) == 0:
            return None
        ids = np.asarray(ids).reshape(-1)
        h, w = image.shape[:2]
        rois = {}
        for f in range(6):
            sel = np.nonzero(ids // self.markers_per_face == f)[0]
            if sel.size == 0:
                continue
            pts = np.concatenate(
                [np.asarray(corners[i]).reshape(-1, 2) for i in sel])
            x0, y0 = pts.min(axis=0)
            x1, y1 = pts.max(axis=0)
            # outermost chessboard corners sit within ~1 square of the
            # outer markers; 1.5 squares of margin absorbs perspective
            m = 1.5 * max(x1 - x0, y1 - y0) / max(self.n_points, 1) + 8
            rois[f] = (max(int(x0 - m), 0), max(int(y0 - m), 0),
                       min(int(np.ceil(x1 + m)), w),
                       min(int(np.ceil(y1 + m)), h))
        return rois or None

    def find_in_image(self, image, draw=False, camera: Camera | None = None,
                      wait_len=1) -> ImageDetection:
        """Detect all 6 faces; keys are (face_id, corner_id) pairs.

        When a camera model is given, detection runs on the undistorted view
        and corners are mapped back (board-aware detection).
        """
        from pycamset_tpu.models.abstract_target import (
            fast_detector_params, undistort_for_detection)
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
            self._fast_detectors = [
                aruco.CharucoDetector(b, params, fast_detector_params())
                for b in self.boards]
            self._alt_fast_detectors = [
                aruco.CharucoDetector(b, params, fast_detector_params())
                for b in self._alt_boards]
        if self._marker_detector is None:
            self._marker_detector = aruco.ArucoDetector(
                self._union_dict, aruco.DetectorParameters())

        if draw:
            preview_hw = [480, 640]  # (h, w) to match the image shape order
            shrink = int(max(min(np.array(image.shape[:2]) / preview_hw), 1))
            preview = downsample_valid(image.copy(), shrink).astype(np.uint8)
            if preview.ndim == 2:
                preview = np.repeat(preview[..., None], 3, axis=-1)

        from pycamset_tpu.models.abstract_target import (
            FAST_DETECTION_MIN_CORNERS, ladder_detect_board)
        found_keys: list = []
        found_px: list = []
        # a cube face carries at most (n-1)^2 corners — the fast-pass
        # acceptance threshold must fit inside that
        max_per_face = (self.n_points - 1) ** 2
        face_min = max(6, min(FAST_DETECTION_MIN_CORNERS, max_per_face // 2))
        rois = self._locate_face_rois(image) if self.roi_detection else None
        for face_idx in range(len(self.boards)):
            full_pair = (self.board_detectors[face_idx],
                         self._alt_detectors[face_idx])
            fast_pair = (self._fast_detectors[face_idx],
                         self._alt_fast_detectors[face_idx])

            def detect(img):
                return ladder_detect_board(
                    img, full_pair, fast_pair, self._preferred[face_idx],
                    face_min, use_fast=self.fast_detection,
                    on_flip=self._warn_flip_once)

            if rois is not None:
                roi = rois.get(face_idx)
                if roi is None:
                    continue  # no marker of this face anywhere in the image
                x0, y0, x1, y1 = roi
                corners, corner_ids, self._preferred[face_idx] = detect(
                    image[y0:y1, x0:x1])
                if corners is not None:
                    corners = corners + np.array([x0, y0], dtype=float)
                if corners is None or len(corners) < face_min:
                    # windowed pass underperformed: full frame decides
                    fc, fi, self._preferred[face_idx] = detect(image)
                    if fc is not None and (corners is None
                                           or len(fc) > len(corners)):
                        corners, corner_ids = fc, fi
            else:
                corners, corner_ids, self._preferred[face_idx] = detect(image)
            if corner_ids is None:
                continue
            found_keys.extend([face_idx, cid] for cid in corner_ids)
            found_px.extend(corners)
            if draw:
                aruco.drawDetectedCornersCharuco(
                    preview, corners[:, None, :] / shrink, corner_ids[:, None])

        if draw:
            cv2.imshow("detections", preview)
            cv2.waitKey(wait_len)

        if found_px:
            found_px = list(self._refine_photometric(
                image, np.asarray(found_px)))
        if redistort is not None and found_px:
            found_px = list(redistort(np.asarray(found_px)))
        return ImageDetection(keys=found_keys, image_points=found_px)
