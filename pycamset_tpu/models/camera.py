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
DEFAULT_FOCAL_PX = 1000.0

# vector-mode rays are returned as short segments so downstream consumers
# (viz, nearest-point queries) get a point near the camera, not at unit range
VECTOR_RAY_SEGMENT = 0.1
# the focal point marker is drawn this many world units per 1000 focal px
FOCAL_MARKER_PER_KPX = 1.0 / 1000.0


def _default_intrinsic() -> np.ndarray:
    k = np.eye(3)
    k[0, 0] = k[1, 1] = DEFAULT_FOCAL_PX
    k[0, 2] = DEFAULT_RES[0] / 2
    k[1, 2] = DEFAULT_RES[1] / 2
    return k


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
        from pycamset_tpu.utils.optional import import_pyvista
        pv = import_pyvista()
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
        self.extrinsic = (np.eye(4) if extrinsic is None
                          else np.asarray(extrinsic, dtype=float))
        self.intrinsic = (_default_intrinsic() if intrinsic is None
                          else np.asarray(intrinsic, dtype=float))
        self.original_matrix = deepcopy(self.intrinsic)
        self.distortion_coefs = (np.zeros(5) if distortion_coefs is None
                                 else np.ravel(np.asarray(distortion_coefs,
                                                          dtype=float)))
        self.cam_to_world: np.ndarray | None = None
        self.down_scale_factor: int = 0
        self.name = name
        self.minimal = bool(minimal)
        self._update_state()

    # ------------------------------------------------------------ equality

    def __eq__(self, other):
        if not isinstance(other, Camera):
            return False
        same = (np.allclose(self.intrinsic, other.intrinsic)
                and np.allclose(self.extrinsic, other.extrinsic)
                and np.allclose(np.ravel(self.distortion_coefs),
                                np.ravel(other.distortion_coefs)))
        return bool(same)

    # ------------------------------------------------------- derived state

    def _update_state(self):
        """Recalculate all state derived from the camera parameters."""
        c2w = np.linalg.inv(self.extrinsic)
        self.cam_to_world = c2w
        # columns of the rotation part are the camera axes in world space
        self.position = c2w[:3, 3]
        self.view = c2w[:3, 2]
        self.u_axis = -c2w[:3, 1]
        if self.minimal:
            self.sensor_map = self.world_sensor_map = None
        else:
            self._make_sensormap()
        focal_px = self.intrinsic[0, 0]
        self.focal_point = (self.position
                            + FOCAL_MARKER_PER_KPX * focal_px * self.view)
        self.fov = self._cam_fov()
        self.proj = self._calc_projection_matrix()

    def _cam_fov(self):
        half_height = self.res[1] / 2
        return math.degrees(2.0 * np.arctan2(half_height, self.intrinsic[0, 0]))

    def _calc_projection_matrix(self):
        return self.intrinsic @ self.extrinsic[:3]

    def set_extrinsic(self, new_extrinsic):
        self.extrinsic = np.asarray(new_extrinsic, dtype=float)
        self._update_state()

    def set_distortion_coefs(self, dist_coefs):
        self.distortion_coefs = np.ravel(np.asarray(dist_coefs, dtype=float))
        self._update_state()

    def set_minimal(self, minimal: bool):
        self.minimal = bool(minimal)
        self.sensor_map = self.world_sensor_map = None
        self._update_state()

    # ----------------------------------------------------------- projection

    def project_points(self, points, mode: str = "opencv", distort: bool = True):
        """Project world points to pixel coordinates.

        :param points: (n,3) world points.
        :param mode: 'opencv' returns (u,v); 'image' returns (v,u).
        :param distort: apply the lens distortion model.
        """
        uv = np.atleast_2d(h_tform(np.asarray(points, dtype=float), self.proj))
        dist = np.ravel(self.distortion_coefs)
        # a 4-wide vector is the fisheye marker: even all-zero coefficients
        # mean the EQUIDISTANT mapping (r -> atan r), never pinhole
        if distort and (dist.size == 4 or np.any(dist)):
            uv = np.array(_distort_pixels_j(
                jnp.asarray(uv), jnp.asarray(self.intrinsic),
                jnp.asarray(dist)))
        return uv[:, ::-1] if mode == "image" else uv

    def undistort_points(self, uv, iters: int = 8):
        """Invert lens distortion on pixel coordinates (n,2)."""
        return np.array(_undistort_pixels_j(
            jnp.asarray(uv, dtype=float), jnp.asarray(self.intrinsic),
            jnp.asarray(np.ravel(self.distortion_coefs)), iters=iters))

    def _is_in_image(self, cords) -> bool:
        uv = np.ravel(np.asarray(cords))
        wh = np.asarray(self.res, dtype=float)
        return bool(np.all((uv > 0) & (uv < wh)))

    def can_image(self, pt) -> bool:
        """True if a world point projects inside the image bounds."""
        return self._is_in_image(self.project_points(np.asarray(pt)[None]))

    # ------------------------------------------------------------ ray casts

    def _compute_world_sensor_map(self):
        # pixel rays live in camera space; the world map is the same field
        # rotated into world axes (translation cancels: the map is stored
        # relative to the camera centre)
        rot_c2w = self.cam_to_world[:3, :3]
        return np.einsum("ij,uvj->uvi", rot_c2w, self.sensor_map)

    def _make_sensormap(self, mode="linear", distort=True):
        self.sensor_map = sensor_map(
            mode, self.intrinsic, tuple(self.res),
            dist_coefs=self.distortion_coefs if distort else None)
        self.world_sensor_map = self._compute_world_sensor_map()

    def get_image_cord_sensor_map(self):
        """Sensor map in image (v,u) order rather than opencv (u,v)."""
        return self.world_sensor_map.transpose(1, 0, 2)

    def im_to_world_ray(self, cord, depth_im=None, distort=True, use_vector=False):
        """Pixel coordinate(s) (n,2) -> world-space ray endpoints.

        With a depth image the ray length is set from the depth at the pixel.
        """
        px = np.atleast_2d(np.asarray(cord))

        if use_vector:
            src = self.undistort_points(px) if distort else px
            dirs = vector_cam_points("linear", src, self.intrinsic,
                                     self.cam_to_world)
            return self.position + VECTOR_RAY_SEGMENT * dirs

        self._make_sensormap(distort=distort)
        dirs = self.world_sensor_map[px[:, 0], px[:, 1]]
        if depth_im is not None:
            depth = depth_im[px[:, 1], px[:, 0]]
            if np.any(np.isnan(depth)):
                logging.warning("Nan length found in depth image used for ray")
            dirs = depth[:, None] * dirs
        return self.position + dirs

    # ----------------------------------------------------------- image edit

    def undistort(self, image: np.ndarray) -> np.ndarray:
        """Undistort an image with the camera parameters (OpenCV remap).

        A 4-wide distortion vector marks the fisheye (Kannala-Brandt)
        model and routes through cv2.fisheye."""
        dist = np.ravel(np.asarray(self.distortion_coefs, dtype=float))
        if dist.size == 4:
            return cv2.fisheye.undistortImage(
                image, self.intrinsic, dist, Knew=self.intrinsic)
        return cv2.undistort(image, self.intrinsic, dist)

    def view_sensor_distortion(self, ax=None):
        """Quiver plot of the sensor distortion field."""
        from matplotlib import pyplot as plt
        uu, vv = np.meshgrid(np.arange(0, self.res[0], 100),
                             np.arange(0, self.res[1], 100))
        ideal = np.column_stack([uu.ravel(), vv.ravel()])
        warped = np.array([distort_points(p, self.intrinsic,
                                          self.distortion_coefs)
                           for p in ideal])
        delta = warped - ideal
        axis = plt.gca() if ax is None else ax
        axis.quiver(ideal[:, 0], ideal[:, 1], delta[:, 0], delta[:, 1],
                    angles="xy", scale_units="xy", scale=1)
        axis.set_aspect("equal")
        axis.set_title(f"Distortion in camera {self.name}")
        if ax is None:
            plt.show()

    def scale_self_2n(self, down_scale_factor: int = 1):
        """Downscale the intrinsics by a power of two."""
        self.down_scale_factor = down_scale_factor
        shrink = 0.5 ** down_scale_factor
        # averaging 1/shrink pixels moves the pixel-centre origin: the new
        # principal point picks up a (shrink/2 - 1/2) px offset
        centre_shift = (shrink - 1.0) / 2.0
        rescale = np.diag([shrink, shrink, 1.0])
        rescale[:2, 2] = centre_shift
        self.res = [int(n * shrink) for n in self.res]
        self.intrinsic = rescale @ self.intrinsic
        self._update_state()

    def crop_to_roi(self, roi):
        """Alter intrinsics to mimic a cropped sensor. roi=[ymin,xmin,xmax,ymax]."""
        ymin, xmin, xmax, ymax = roi
        if xmax > self.res[0] or ymax > self.res[1]:
            raise ValueError("crop bounds outside of camera viewpoint")
        self.intrinsic = self.intrinsic.copy()
        self.intrinsic[0, 2] -= xmin
        self.intrinsic[1, 2] -= ymin
        self._update_state()

    def reset_to_original_params(self):
        self.intrinsic = np.asarray(self.original_matrix)
        self._update_state()

    def transform(self, transformation_matrix):
        """Post-multiply the extrinsic by a 4x4 homogeneous transform."""
        self.set_extrinsic(self.extrinsic @ np.asarray(transformation_matrix))

    # -------------------------------------------------------------- exports

    def to_MVSnet_txt(self, f_loc: Path, depth_range: tuple[float, float],
                      depth_steps: int, crop=None) -> None:
        """Write the camera to the MVSNet cam.txt format."""
        k = self.intrinsic.copy()
        if crop is not None:
            k[0, 2] -= crop[1, 0]
            k[1, 2] -= crop[0, 0]
        near, far = depth_range
        step = (far - near) / depth_steps

        def block(mat):
            return "\n".join(" ".join(str(v) for v in row) for row in mat)

        text = (f"extrinsic\n{block(self.extrinsic)}\n\n"
                f"intrinsic\n{block(k)}\n\n"
                f"{near} {step} {depth_steps} {far}\n")
        Path(f_loc).write_text(text)

    # ------------------------------------------------------------ viz meshes

    def _corner_rays(self) -> np.ndarray:
        """World-space unit rays through the four sensor corners."""
        w, h = self.res[0], self.res[1]
        corners = np.array([[0, 0], [0, h], [w, 0], [w, h]])
        return vector_cam_points("linear", corners, self.intrinsic,
                                 self.cam_to_world)

    def get_mesh(self, scale: float = 0.025):
        """A wireframe camera glyph mesh in world coordinates."""
        body_len = max(scale, 0.03)
        centre = self.position
        # frustum corners, plus a small 100x100-px patch marking sensor origin
        frustum = centre + body_len * self._corner_rays()
        patch_px = np.array([[0, 0], [100, 0], [0, 100], [100, 100]])
        patch = centre + body_len * vector_cam_points(
            "linear", patch_px, self.intrinsic, self.cam_to_world)
        c00, c01, c10, c11 = frustum
        # the "up" fin above the top edge of the frustum
        fin = c00 + (c00 - c01) / 3 + (c10 - c00) / 2
        verts = np.vstack([centre[None], frustum, fin[None], patch])
        tris = [(0, 1, 2), (0, 2, 4), (0, 4, 3), (0, 3, 1), (1, 3, 5),
                (6, 7, 8), (7, 8, 9)]
        faces = np.array([[3, *t] for t in tris])
        return _make_mesh(verts, faces)

    def get_viewcone(self, view_len: float = 1, triangle: bool = False):
        """A mesh of the region that projects onto the camera sensor."""
        rays = self._corner_rays()
        far_plane = self.position + view_len * rays
        if triangle:
            verts = np.vstack([far_plane, self.position[None]])
            tris = [(0, 1, 2), (2, 3, 0), (4, 1, 0), (4, 2, 1), (4, 3, 2),
                    (4, 0, 3)]
            faces = np.array([[3, *t] for t in tris])
        else:
            near_len = 0.025
            near_plane = self.position + near_len * rays
            verts = np.vstack([near_plane, far_plane])
            tris = [(0, 1, 2), (2, 3, 0), (4, 5, 6), (6, 7, 4), (0, 1, 5),
                    (5, 4, 0), (1, 2, 6), (6, 5, 1), (2, 3, 7), (7, 6, 2),
                    (3, 0, 4), (4, 7, 3)]
            faces = np.array([[3, *t] for t in tris])
        return _make_mesh(verts, faces)
