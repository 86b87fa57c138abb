"""The Camera model: pinhole + Brown–Conrady with derived state.

Capability parity target (reference, behaviour only):
pyCamSet/cameras/camera.py:63-548 — state (extrinsic 4x4, intrinsic 3x3,
5-param distortion, res, name), derived state on update (cam_to_world,
position, view/up vectors, fov, 3x4 projection, optional sensor map),
project_points, im_to_world_ray, undistort, mesh builders, intrinsic editing
(scale_self_2n, crop_to_roi, transform), MVSNet export.

Compute path: batched projection/undistortion run through the jitted JAX
kernels in pycamset_tpu.ops, so the same code path that the TPU bundle
adjustment uses also serves the user-facing API.
"""
from __future__ import annotations

import logging
import math
from copy import deepcopy
from pathlib import Path

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from pycamset_tpu.ops.distortion import distort_pixels, undistort_pixels
from pycamset_tpu.utils.general_utils import (
    distort_points, h_tform, sensor_map, vector_cam_points)

DEFAULT_RES = [1000, 1000]
DEFAULT_CAMERA_MATRIX = np.array(
    [[1000.0, 0.0, DEFAULT_RES[0] / 2],
     [0.0, 1000.0, DEFAULT_RES[1] / 2],
     [0.0, 0.0, 1.0]])

_distort_pixels_j = jax.jit(distort_pixels)
_undistort_pixels_j = jax.jit(undistort_pixels, static_argnames=("iters",))


class SimpleMesh:
    """A minimal stand-in for pyvista.PolyData (verts + faces) used when
    pyvista is unavailable. Faces use the pyvista flat [n, i0, i1, ...] format.
    """

    def __init__(self, verts: np.ndarray, faces: np.ndarray):
        self.points = np.asarray(verts)
        self.faces = np.asarray(faces).reshape(-1)


def _make_mesh(verts, faces):
    try:
        import pyvista as pv
        return pv.PolyData(verts, faces)
    except Exception:
        return SimpleMesh(verts, np.concatenate([np.asarray(f) for f in faces]))


class Camera:
    """An object-oriented pinhole + distortion camera model."""

    def __init__(self, extrinsic=None, intrinsic=None, res=None,
                 distortion_coefs=None, name: str | None = None,
                 minimal: bool = True):
        """
        :param extrinsic: 4x4 world->camera transform.
        :param intrinsic: 3x3 pinhole intrinsic matrix.
        :param res: camera resolution.
        :param distortion_coefs: 5-parameter Brown–Conrady model [k1,k2,p1,p2,k3].
        :param name: camera name.
        :param minimal: skip eager sensor-map generation (lazy for hi-res cams).
        """
        self.res = DEFAULT_RES if res is None else res
        self.extrinsic = np.eye(4) if extrinsic is None else np.asarray(extrinsic, dtype=float)
        self.intrinsic = (DEFAULT_CAMERA_MATRIX.copy() if intrinsic is None
                          else np.asarray(intrinsic, dtype=float))
        self.original_matrix = deepcopy(self.intrinsic)
        self.distortion_coefs = (np.zeros(5) if distortion_coefs is None
                                 else np.asarray(distortion_coefs, dtype=float).reshape(-1))
        self.cam_to_world = None
        self.down_scale_factor = 0
        self.name = name
        self.minimal = minimal
        self._update_state()

    # ------------------------------------------------------------ equality

    def __eq__(self, other):
        if not isinstance(other, Camera):
            return False
        return bool(
            np.allclose(self.intrinsic, other.intrinsic)
            and np.allclose(self.extrinsic, other.extrinsic)
            and np.allclose(np.reshape(self.distortion_coefs, -1),
                            np.reshape(other.distortion_coefs, -1)))

    # ------------------------------------------------------- derived state

    def _update_state(self):
        """Recalculate all state derived from the camera parameters."""
        self.cam_to_world = np.linalg.inv(self.extrinsic)
        self.position = (self.cam_to_world @ [0, 0, 0, 1])[:3]
        self.view = (self.cam_to_world @ [0, 0, 1, 0])[:3]
        self.u_axis = (self.cam_to_world @ [0, -1, 0, 0])[:3]
        if not self.minimal:
            self._make_sensormap()
        else:
            self.sensor_map = None
            self.world_sensor_map = None
        self.focal_point = self.position + self.intrinsic[0, 0] / 1000 * self.view
        self.fov = self._cam_fov()
        self.proj = self._calc_projection_matrix()

    def _cam_fov(self):
        return 180 / math.pi * (2 * np.arctan2(self.res[1] / 2, self.intrinsic[0, 0]))

    def _calc_projection_matrix(self):
        return self.intrinsic @ self.extrinsic[:3, :4]

    def set_extrinsic(self, new_extrinsic):
        self.extrinsic = np.asarray(new_extrinsic, dtype=float)
        self._update_state()

    def set_distortion_coefs(self, dist_coefs):
        self.distortion_coefs = np.asarray(dist_coefs, dtype=float).reshape(-1)
        self._update_state()

    def set_minimal(self, minimal: bool):
        self.minimal = minimal
        self.sensor_map = None
        self.world_sensor_map = None
        self._update_state()

    # ----------------------------------------------------------- projection

    def project_points(self, points, mode: str = "opencv", distort: bool = True):
        """Project world points to pixel coordinates.

        :param points: (n,3) world points.
        :param mode: 'opencv' returns (u,v); 'image' returns (v,u).
        :param distort: apply the lens distortion model.
        """
        centered = h_tform(np.asarray(points, dtype=float), self.proj)
        if centered.ndim == 1:
            centered = centered[None, ...]
        if distort and not np.allclose(self.distortion_coefs, 0):
            centered = np.array(_distort_pixels_j(
                jnp.asarray(centered), jnp.asarray(self.intrinsic),
                jnp.asarray(np.reshape(self.distortion_coefs, -1))))
        if mode == "image":
            return centered[:, ::-1]
        return centered

    def undistort_points(self, uv, iters: int = 8):
        """Invert lens distortion on pixel coordinates (n,2)."""
        return np.array(_undistort_pixels_j(
            jnp.asarray(uv, dtype=float), jnp.asarray(self.intrinsic),
            jnp.asarray(np.reshape(self.distortion_coefs, -1)), iters=iters))

    def _is_in_image(self, cords) -> bool:
        truths = []
        for cord, res in zip(np.asarray(cords).squeeze(), self.res):
            truths.append(0 < cord < res)
        return bool(np.all(truths))

    def can_image(self, pt) -> bool:
        """True if a world point projects inside the image bounds."""
        uv = self.project_points(np.asarray(pt)[None, ...])
        return self._is_in_image(uv)

    # ------------------------------------------------------------ ray casts

    def _compute_world_sensor_map(self):
        pts = np.ones(tuple(self.res))[..., np.newaxis]
        temp_ext = self.cam_to_world[np.newaxis, np.newaxis, ...]
        temp_map = np.concatenate((self.sensor_map, pts), axis=-1)[..., np.newaxis]
        s_map = (temp_ext @ temp_map)[:, :, :3, 0]
        s_map -= self.position
        return s_map

    def _make_sensormap(self, mode="linear", distort=True):
        self.sensor_map = sensor_map(
            mode, self.intrinsic, tuple(self.res),
            dist_coefs=self.distortion_coefs if distort else None)
        self.world_sensor_map = self._compute_world_sensor_map()

    def get_image_cord_sensor_map(self):
        """Sensor map in image (v,u) order rather than opencv (u,v)."""
        return np.transpose(self.world_sensor_map, (1, 0, 2))

    def im_to_world_ray(self, cord, depth_im=None, distort=True, use_vector=False):
        """Pixel coordinate(s) (n,2) -> world-space ray endpoints.

        With a depth image the ray length is set from the depth at the pixel.
        """
        if isinstance(cord, list):
            cord = np.array(cord)
        if cord.ndim == 1:
            cord = cord[None, ...]

        if use_vector:
            if distort:
                cord = self.undistort_points(cord)
            rays = vector_cam_points("linear", cord, self.intrinsic, self.cam_to_world)
            return rays / 10 + self.position

        self._make_sensormap(distort=distort)
        rays = self.world_sensor_map[cord[:, 0], cord[:, 1], :]
        if depth_im is not None:
            length = depth_im[cord[:, 1], cord[:, 0]]
            if np.any(np.isnan(length)):
                logging.warning("Nan length found in depth image used for ray")
            rays = rays * length[:, None]
        return rays + self.position

    # ----------------------------------------------------------- image edit

    def undistort(self, image: np.ndarray) -> np.ndarray:
        """Undistort an image with the camera parameters (OpenCV remap)."""
        return cv2.undistort(image, self.intrinsic,
                             np.asarray(self.distortion_coefs, dtype=float))

    def view_sensor_distortion(self, ax=None):
        """Quiver plot of the sensor distortion field."""
        from matplotlib import pyplot as plt
        grid = np.meshgrid(np.arange(0, self.res[0], 100),
                           np.arange(0, self.res[1], 100))
        grid = np.c_[grid[0].ravel(), grid[1].ravel()]
        n_grid = np.array([distort_points(g, self.intrinsic, self.distortion_coefs)
                           for g in grid])
        shift = n_grid - grid
        target = ax if ax is not None else plt.gca()
        target.quiver(grid[:, 0], grid[:, 1], shift[:, 0], shift[:, 1],
                      angles="xy", scale_units="xy", scale=1)
        target.set_aspect("equal")
        target.set_title(f"Distortion in camera {self.name}")
        if ax is None:
            plt.show()

    def scale_self_2n(self, down_scale_factor: int = 1):
        """Downscale the intrinsics by a power of two."""
        self.down_scale_factor = down_scale_factor
        sf = float(-down_scale_factor)
        scale_mat = np.array(
            [[2.0 ** sf, 0.0, 2.0 ** (sf - 1.0) - 0.5],
             [0.0, 2.0 ** sf, 2.0 ** (sf - 1.0) - 0.5],
             [0.0, 0.0, 1.0]])
        self.res = [int(self.res[0] * 2 ** sf), int(self.res[1] * 2 ** sf)]
        self.intrinsic = scale_mat @ self.intrinsic
        self._update_state()

    def crop_to_roi(self, roi):
        """Alter intrinsics to mimic a cropped sensor. roi=[ymin,xmin,xmax,ymax]."""
        [ymin, xmin, xmax, ymax] = roi
        if xmax > self.res[0] or ymax > self.res[1]:
            raise ValueError("crop bounds outside of camera viewpoint")
        self.intrinsic = self.intrinsic - np.array(
            [[0, 0, xmin], [0, 0, ymin], [0, 0, 0]], dtype=float)
        self._update_state()

    def reset_to_original_params(self):
        self.intrinsic = self.original_matrix
        self._update_state()

    def transform(self, transformation_matrix):
        """Post-multiply the extrinsic by a 4x4 homogeneous transform."""
        self.extrinsic = self.extrinsic @ transformation_matrix
        self._update_state()

    # -------------------------------------------------------------- exports

    def to_MVSnet_txt(self, f_loc: Path, depth_range: tuple[float, float],
                      depth_steps: int, crop=None) -> None:
        """Write the camera to the MVSNet cam.txt format."""
        with open(f_loc, "w") as f:
            f.write("extrinsic\n")
            for row in self.extrinsic:
                f.write(f"{row[0]} {row[1]} {row[2]} {row[3]}\n")
            f.write("\nintrinsic\n")
            if crop is None:
                for row in self.intrinsic:
                    f.write(f"{row[0]} {row[1]} {row[2]}\n")
            else:
                row = self.intrinsic[0]
                f.write(f"{row[0]} {row[1]} {row[2] - crop[1, 0]}\n")
                row = self.intrinsic[1]
                f.write(f"{row[0]} {row[1]} {row[2] - crop[0, 0]}\n")
                row = self.intrinsic[2]
                f.write(f"{row[0]} {row[1]} {row[2]}\n")
            f.write(f"\n{depth_range[0]} "
                    f"{(depth_range[1] - depth_range[0]) / depth_steps} "
                    f"{depth_steps} {depth_range[1]}\n")

    # ------------------------------------------------------------ viz meshes

    def get_mesh(self, scale: float = 0.025):
        """A wireframe camera glyph mesh in world coordinates."""
        cam_len = max(scale, 0.03)
        p1 = self.position
        pts = np.array([[0, 0], [0, self.res[1]],
                        [self.res[0], 0], [self.res[0], self.res[1]]])
        pt_100 = np.array([[0, 0], [100, 0], [0, 100], [100, 100]])
        vs = vector_cam_points("linear", pts, self.intrinsic, self.cam_to_world)
        v100 = vector_cam_points("linear", pt_100, self.intrinsic, self.cam_to_world)
        [p2, p3, p4, p5] = vs * cam_len + p1
        [p6, p7, p8, p9] = v100 * cam_len + p1
        pn = p2 + (p2 - p3) / 3 + (p4 - p2) / 2
        verts = np.stack((p1, p2, p3, p4, p5, pn, p6, p7, p8, p9))
        faces = np.array([[3, 0, 1, 2], [3, 0, 2, 4], [3, 0, 4, 3],
                          [3, 0, 3, 1], [3, 1, 3, 5], [3, 6, 7, 8], [3, 7, 8, 9]])
        return _make_mesh(verts, faces)

    def get_viewcone(self, view_len: float = 1, triangle: bool = False):
        """A mesh of the region that projects onto the camera sensor."""
        p1 = self.position
        pts = np.array([[0, 0], [0, self.res[1]],
                        [self.res[0], 0], [self.res[0], self.res[1]]])
        vs = vector_cam_points("linear", pts, self.intrinsic, self.cam_to_world)
        if triangle:
            [p6, p7, p8, p9] = vs * view_len + p1
            verts = np.stack((p6, p7, p8, p9, p1))
            faces = np.array([[3, 0, 1, 2], [3, 2, 3, 0], [3, 4, 1, 0],
                              [3, 4, 2, 1], [3, 4, 3, 2], [3, 4, 0, 3]])
        else:
            cam_len = 0.025
            [p2, p3, p4, p5] = vs * cam_len + p1
            [p6, p7, p8, p9] = vs * view_len + p1
            verts = np.stack((p2, p3, p4, p5, p6, p7, p8, p9))
            faces = np.array([[3, 0, 1, 2], [3, 2, 3, 0], [3, 4, 5, 6],
                              [3, 6, 7, 4], [3, 0, 1, 5], [3, 5, 4, 0],
                              [3, 1, 2, 6], [3, 6, 5, 1], [3, 2, 3, 7],
                              [3, 7, 6, 2], [3, 3, 0, 4], [3, 4, 7, 3]])
        return _make_mesh(verts, faces)
