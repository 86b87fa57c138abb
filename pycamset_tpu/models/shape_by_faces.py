"""FaceToShape: build 3D calibration solids from per-face 2D patterns.

Capability parity targets (reference, behaviour only):
pyCamSet/calibration_targets/shape_by_faces.py — place per-face local
coordinates onto a 3D solid via per-face 4x4 transforms with a scale trick,
textured mesh visualisation, printable 2D net rendering; make_tforms recovers
face transforms for a solid by rigid fitting.
pyCamSet/calibration_targets/net_maker.py — generic net unfolding from
shared-edge connectivity.

Mesh drawing needs pyvista (optional); net rendering is numpy + OpenCV.
"""
from __future__ import annotations

import cv2
import numpy as np

import jax.numpy as jnp

from pycamset_tpu.ops.transforms import rigid_fit
from pycamset_tpu.utils.general_utils import h_tform


def _rigid_fit_np(src: np.ndarray, dst: np.ndarray):
    rmat, t = rigid_fit(jnp.asarray(src, dtype=jnp.float64),
                        jnp.asarray(dst, dtype=jnp.float64))
    return np.asarray(rmat), np.asarray(t)


def _cube_faces(size: float):
    """Vertices + quad faces of an axis-aligned cube of edge `size`."""
    half = size / 2
    verts = np.array([[x, y, z] for x in (-half, half)
                      for y in (-half, half) for z in (-half, half)])
    quads = np.array([
        [0, 1, 3, 2], [4, 6, 7, 5], [0, 4, 5, 1],
        [2, 3, 7, 6], [0, 2, 6, 4], [1, 5, 7, 3]])
    return verts, quads


def make_tforms(base_face: np.ndarray, shape: str):
    """Recover (rvec, t) transforms mapping a base face onto each face of a
    named solid ('cube'; 'Icosahedron' requires pyvista)."""
    edge = base_face[:, 1].max() - base_face[:, 1].min()
    if shape == "cube":
        verts, faces = _cube_faces(edge)
    else:
        from pycamset_tpu.utils.optional import import_pyvista
        pv = import_pyvista()
        solid = {"Icosahedron": pv.Icosahedron}[shape]()
        verts, faces = solid.points, solid.regular_faces

    def fit_one(face):
        rmat, t = _rigid_fit_np(base_face, verts[np.asarray(face)])
        return cv2.Rodrigues(rmat)[0], t

    return [fit_one(face) for face in faces]


def print_formatted_transforms(tforms):
    """Print (rvec, t) tuples as pasteable python source."""
    def fmt(arr):
        return np.array2string(np.asarray(arr).squeeze(), precision=3,
                               separator=",")

    body = "".join(f"\t({fmt(r)},{fmt(t)}),\n" for r, t in tforms)
    print("TFORMS = [\n" + body + "]")


class FaceToShape:
    """A geometric shape from (u,...,w) faces and per-face 6dof transforms.

    The scale factor divides the local coordinates before the transform and
    multiplies after, so one set of unit-cube transforms defines a scaled
    family of polyhedra.
    """

    def __init__(self, face_local_coords, face_transforms, scale_factor=1.0):
        """
        :param face_local_coords: local corner coordinates per face (one
            (n,3) face is tiled across all transforms).
        :param face_transforms: 4x4 face->shape transforms.
        :param scale_factor: pre/post scaling of the transforms.
        """
        face_local_coords = np.asarray(face_local_coords, dtype=float)
        face_transforms = np.asarray(face_transforms, dtype=float)

        self.same_face = False
        if face_local_coords.ndim == 2:
            nfaces = int(np.prod(face_transforms.shape[:-2]))
            face_local_coords = np.tile(
                face_local_coords[None, ...], [nfaces, 1, 1]).reshape(
                (*face_transforms.shape[:-2], *face_local_coords.shape))
            self.same_face = True

        ppf = face_local_coords.shape[-2]
        self.sf = scale_factor
        self.face_local_coords = face_local_coords
        self.face_transforms = face_transforms
        flat_local = face_local_coords.reshape((-1, ppf, 3))
        flat_tform = face_transforms.reshape((-1, 4, 4))
        point_data = np.empty_like(flat_local)
        for i, (tform, points) in enumerate(zip(flat_tform, flat_local)):
            point_data[i] = h_tform(points / scale_factor, tform) * scale_factor
        self.point_data = point_data.reshape(face_local_coords.shape)

    def face_mesh_geometry(self, face_corners):
        """World-space textured-face geometry, computed in pure numpy.

        The single geometry source for BOTH the pyvista scene
        (draw_meshes) and headless consumers/tests: per face, the
        transformed corner points, the flat pyvista-format face array,
        and the texture-plane anchors (origin / point_u / point_v = the
        corners texture_map_to_plane keys the UVs on).

        :return: list of dicts {points (n,3), faces (n+1,), origin,
            point_u, point_v}.
        """
        face_corners = np.asarray(face_corners, dtype=float)
        flat_tform = self.face_transforms.reshape((-1, 4, 4))
        if face_corners.ndim == 2:
            face_corners = np.tile(face_corners[None, ...],
                                   [flat_tform.shape[0], 1, 1])
        out = []
        for face_corner, face_transform in zip(face_corners, flat_tform):
            n = len(face_corner)
            # identical to the __init__ point placement: scale down,
            # rigid-transform, scale back (the scale trick)
            pts = h_tform(face_corner / self.sf, face_transform) * self.sf
            out.append({
                "points": pts,
                "faces": np.array([n, *range(n)]),
                "origin": pts[0], "point_u": pts[1], "point_v": pts[3],
            })
        return out

    def draw_meshes(self, face_corners, face_images, return_scene=False):
        """Textured 3D visualisation of the solid (requires pyvista)."""
        from pycamset_tpu.utils.optional import import_pyvista
        pv = import_pyvista()
        meshes = []
        for g in self.face_mesh_geometry(face_corners):
            mesh = pv.PolyData(g["points"], faces=g["faces"].tolist())
            mesh.texture_map_to_plane(
                origin=g["origin"], point_u=g["point_u"],
                point_v=g["point_v"], inplace=True)
            meshes.append(mesh)
        scene = pv.Plotter()
        for mesh, texture in zip(meshes, face_images):
            scene.add_mesh(mesh,
                           texture=pv.numpy_to_texture(texture.astype(np.uint8)))
        scene.add_mesh(pv.PolyData(self.point_data.reshape((-1, 3))), color="r")
        if return_scene:
            return scene
        scene.add_axes()
        scene.show()

    def draw_net(self, net_images, net_transforms) -> np.ndarray:
        """Render a printable 2D net of the faces onto one canvas.

        :param net_images: per-face texture images.
        :param net_transforms: 3x3 2D homogeneous transforms (unit-square
            coordinates) placing each face on the net.
        """
        # unit-square transforms -> pixel transforms, tracking the bounding
        # box each placed face covers
        px_tforms = []
        extents = []
        for im, unit_tform in zip(net_images, net_transforms):
            h, w = im.shape[:2]
            in_px = (np.diag([h, w, 1.0])
                     @ np.asarray(unit_tform, dtype=float)
                     @ np.diag([1.0 / h, 1.0 / w, 1.0]))
            px_tforms.append(in_px)
            extents.append(h_tform_2d(np.zeros(2), in_px))
            extents.append(h_tform_2d(np.array([h, w], dtype=float), in_px))

        extents = np.array(extents)
        shift = -extents.min(axis=0).astype(int)
        page_shape = (extents.max(axis=0) + shift).astype(int)

        shift_h = np.eye(3)
        shift_h[:2, 2] = shift
        swap_uv = np.array([[0, 1, 0], [1, 0, 0], [0, 0, 1]], dtype=float)

        # compose faces subtractively: ink accumulates where any face is dark
        page = np.full(tuple(page_shape), 255.0)
        for im, in_px in zip(net_images, px_tforms):
            placement = swap_uv @ shift_h @ in_px @ swap_uv
            ink = np.zeros(tuple(page_shape))
            ink[: im.shape[0], : im.shape[1]] = 255 - im
            page -= cv2.warpAffine(ink, placement[:2],
                                   dsize=tuple(page_shape[::-1]))
        return page.clip(0, 255)


def h_tform_2d(points: np.ndarray, transform: np.ndarray) -> np.ndarray:
    """2D homogeneous transform of (n,2) (or (2,)) points by a 3x3 matrix."""
    points = np.atleast_2d(np.asarray(points, dtype=float))
    res = points @ transform[:2, :2].T + transform[:2, 2]
    return res.squeeze()


# ------------------------------------------------------------- net unfolding

def make_h(rot: np.ndarray, trans: np.ndarray) -> np.ndarray:
    """2D rotation + translation -> 3x3 homogeneous transform."""
    out = np.eye(3)
    out[:2, :2] = rot
    out[:2, 2] = np.asarray(trans).reshape(-1)
    return out


def make_ragged_faces(face_array):
    """Unroll a pyvista-style flat face array to per-face point-index lists."""
    ragged = []
    ptr = 0
    while ptr < len(face_array):
        n = face_array[ptr]
        ragged.append(list(face_array[ptr + 1: ptr + 1 + n]))
        ptr += 1 + n
    return ragged


def _rigid_fit_2d(src: np.ndarray, dst: np.ndarray):
    """2-point 2D rigid fit (rotation + translation)."""
    v_s = src[1] - src[0]
    v_d = dst[1] - dst[0]
    ang = np.arctan2(v_d[1], v_d[0]) - np.arctan2(v_s[1], v_s[0])
    rot = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
    t = dst[0] - rot @ src[0]
    return rot, t


def make_net_tforms(base_shape, face_connectivity, connections):
    """Unfold an object face by face into a planar net.

    :param base_shape: 2D corner coordinates of a single face.
    :param face_connectivity: flat [n, i0.., n, i0..] face index array.
    :param connections: the unwinding tree
        [n_connected, base_face, connected..., n_connected, base_face, ...].
    :return: per-face 3x3 net transforms.
    """
    face_points = make_ragged_faces(face_connectivity)
    tforms: list = [None] * len(face_points)
    placed: set = set()
    base_shape = np.asarray(base_shape, dtype=float)

    def edge_coords(point_ids, shared_pair):
        """Base-face coordinates of a face's two shared-edge corners."""
        return np.array([base_shape[point_ids.index(pid)]
                         for pid in shared_pair])

    cursor = 0
    while cursor < len(connections):
        fan_out, parent = connections[cursor], connections[cursor + 1]
        if cursor == 0:
            # the first parent anchors the net at the origin
            placed.add(parent)
            tforms[parent] = np.eye(3)
        if parent not in placed:
            raise ValueError(
                f"Attempted to add faces to {parent} without first "
                f"defining the location of {parent}.")
        parent_pts = list(face_points[parent])
        cursor += 2

        for child in connections[cursor:cursor + fan_out]:
            child_pts = list(face_points[child])
            shared = sorted(set(parent_pts) & set(child_pts))
            if len(shared) != 2:
                raise ValueError(
                    f"faces {parent} and {child} do not share "
                    "enough points to estimate the transformation between them")
            if child in placed:
                raise ValueError(
                    f"Face {child} was added to the tree multiple times.")
            placed.add(child)
            rot, t = _rigid_fit_2d(edge_coords(child_pts, shared),
                                   edge_coords(parent_pts, shared))
            tforms[child] = tforms[parent] @ make_h(rot, t)
        cursor += fan_out
    return tforms
