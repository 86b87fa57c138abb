"""ArUco grid-board calibration target (OpenCV detection frontend).

Beyond the reference's target families (planar ChArUco and the Ccube —
pyCamSet/calibration_targets/): a planar board of pure ArUco markers
(cv2.aruco.GridBoard). Marker-only boards are common in the wild — they
print smaller, detect at steeper angles and lower resolution than
chessboard corners, and robotics datasets frequently ship them. Each
detected marker contributes its four corners as target features, so one
board of n markers yields up to 4n keyed detections per image. The
target rides the whole pipeline unchanged (detection folder driver,
PnP seeding, device bundle adjustment, tracking, fleet, monitoring).
"""
from __future__ import annotations

import cv2
import numpy as np
from cv2 import aruco

from pycamset_tpu.models.abstract_target import AbstractTarget
from pycamset_tpu.models.camera import Camera
from pycamset_tpu.models.detections import ImageDetection
from pycamset_tpu.utils.general_utils import downsample_valid


class ArucoGrid(AbstractTarget):
    """A planar grid of ArUco markers; dimensions are given in mm.

    :param num_markers_x / num_markers_y: grid size in markers.
    :param marker_size: marker side in mm.
    :param separation: gap between neighbouring markers in mm.
    :param a_dict: the aruco dictionary to use.
    :param first_id: id of the first marker (boards from one dictionary
        can coexist in a scene when their id ranges are disjoint).
    """

    def __init__(self, num_markers_x, num_markers_y, marker_size,
                 separation, a_dict=cv2.aruco.DICT_4X4_1000,
                 first_id: int = 0):
        super().__init__(inputs=locals())
        self.marker_size = marker_size
        marker_m = marker_size / 1000          # mm -> metres
        sep_m = separation / 1000

        self.a_dict = aruco.getPredefinedDictionary(a_dict)
        n = num_markers_x * num_markers_y
        ids = np.arange(first_id, first_id + n, dtype=np.int32)
        self.board = aruco.GridBoard((num_markers_x, num_markers_y),
                                     marker_m, sep_m, self.a_dict, ids)
        # (n, 4, 3) object corners, flattened to keys = marker*4 + corner
        # in the detector's corner order (TL, TR, BR, BL)
        obj = np.asarray(self.board.getObjPoints(), dtype=np.float64)
        self.point_data = obj.reshape(-1, 3)
        self._id_to_index = {int(i): k for k, i in enumerate(ids)}

        from pycamset_tpu.models.abstract_target import fast_detector_params
        # marker corners are quad-fit estimates (ChArUco gets chessboard
        # subpixel corners for free; plain aruco does not) — subpixel
        # refinement is what brings grid boards to calibration grade
        fast_p, full_p = fast_detector_params(), aruco.DetectorParameters()
        for p in (fast_p, full_p):
            p.cornerRefinementMethod = aruco.CORNER_REFINE_SUBPIX
        self.detectors = [
            aruco.ArucoDetector(self.a_dict, fast_p),
            aruco.ArucoDetector(self.a_dict, full_p),
        ]
        self.fast_detection = True
        self._process_data()

    def _detect_markers(self, image):
        """Fast-first marker sweep with the default-parameter fallback."""
        best = (None, None)
        detectors = self.detectors if self.fast_detection \
            else self.detectors[1:]
        for det in detectors:
            corners, ids, _rej = det.detectMarkers(image)
            if ids is None:
                continue
            keep = [k for k, i in enumerate(np.asarray(ids).ravel())
                    if int(i) in self._id_to_index]
            if not keep:
                continue
            if best[0] is None or len(keep) > len(best[0]):
                best = ([corners[k] for k in keep],
                        np.asarray(ids).ravel()[keep])
            if len(best[0]) == len(self._id_to_index):
                break                       # every marker found
        return best

    def find_in_image(self, image, draw=False, camera: Camera | None = None,
                      wait_len=1) -> ImageDetection:
        """Detect the board's markers; each contributes 4 corner keys."""
        from pycamset_tpu.models.abstract_target import (
            undistort_for_detection)
        image, redistort = undistort_for_detection(image, camera)

        corners, ids = self._detect_markers(image)
        if corners is None:
            return ImageDetection()
        px = np.concatenate([np.asarray(c).reshape(4, 2) for c in corners])
        keys = np.concatenate([
            4 * self._id_to_index[int(i)] + np.arange(4) for i in ids])

        if redistort is not None:
            px = redistort(px)

        if draw:
            preview_hw = [480, 640]
            shrink = int(max(min(np.array(image.shape[:2]) / preview_hw), 1))
            preview = downsample_valid(image.copy(), shrink).astype(np.uint8)
            if preview.ndim == 2:
                preview = np.repeat(preview[..., None], 3, axis=-1)
            aruco.drawDetectedMarkers(
                preview, [np.asarray(c).reshape(1, 4, 2) / shrink
                          for c in corners], ids.reshape(-1, 1))
            cv2.imshow("detections", preview)
            cv2.waitKey(wait_len)

        return ImageDetection(keys, px)

    def plot(self, imres=None):
        """Draw the board as a matplotlib image."""
        from matplotlib import pyplot as plt
        plt.imshow(self.render(imres), cmap="gray")
        plt.show()

    def render(self, imres=None, margin_px: int = 20,
               px_per_m: float = 6000.0) -> np.ndarray:
        """Rasterize the board with a quiet-zone margin (border markers
        are undetectable without one). With the default aspect-true size,
        object coordinates map to pixels as ``px = x * px_per_m +
        margin_px`` on both axes."""
        if imres is None:
            span = self.point_data.reshape(-1, 3)
            imres = (int(round(float(span[:, 0].max()) * px_per_m))
                     + 2 * margin_px,
                     int(round(float(span[:, 1].max()) * px_per_m))
                     + 2 * margin_px)
        return self.board.generateImage(tuple(imres), np.empty(0),
                                        margin_px, 1)

    def save_to_pdf(self, f_loc="aruco_grid.pdf"):
        """Write a true-scale printable PDF via matplotlib.

        The raster is generated at a fixed 6000 px/m (render), so sizing
        the figure at 6000 px per metre of paper prints the markers at
        their physical dimensions.
        """
        from matplotlib import pyplot as plt
        im = self.render()
        px_per_m = 6000.0
        inch = 0.0254
        fig = plt.figure(figsize=(im.shape[1] / px_per_m / inch,
                                  im.shape[0] / px_per_m / inch))
        ax = fig.add_axes([0, 0, 1, 1])
        ax.imshow(im, cmap="gray", interpolation="nearest")
        ax.set_axis_off()
        fig.savefig(f_loc, dpi=px_per_m * inch)
        plt.close(fig)
        return f_loc
