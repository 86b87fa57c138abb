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
    size = np.max(base_face[:, 1]) - np.min(base_face[:, 1])
    if shape == "cube":
        verts, faces = _cube_faces(size)
    else:
        import pyvista as pv
        poly = {"Icosahedron": pv.Icosahedron}[shape]()
        verts, faces = poly.points, poly.regular_faces
    tforms = []
    for face in faces:
        local_face = np.array([verts[f] for f in face])
        rmat, t = _rigid_fit_np(base_face, local_face)
        rvec, _ = cv2.Rodrigues(rmat)
        tforms.append((rvec, t))
    return tforms


def print_formatted_transforms(tforms):
    """Print (rvec, t) tuples as pasteable python source."""
    print("TFORMS = [")
    for tform in tforms:
        s0 = np.array2string(np.asarray(tform[0]).squeeze(), precision=3,
                             separator=",")
        s1 = np.array2string(np.asarray(tform[1]).squeeze(), precision=3,
                             separator=",")
        print(f"\t({s0},{s1}),")
    print("]")


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

    def draw_meshes(self, face_corners, face_images, return_scene=False):
        """Textured 3D visualisation of the solid (requires pyvista)."""
        import pyvista as pv
        face_corners = np.asarray(face_corners, dtype=float)
        flat_tform = self.face_transforms.reshape((-1, 4, 4))
        if face_corners.ndim == 2:
            face_corners = np.tile(face_corners[None, ...],
                                   [flat_tform.shape[0], 1, 1])
        meshes = []
        for face_corner, face_transform in zip(face_corners, flat_tform):
            n = len(face_corner)
            mesh = pv.PolyData(face_corner, faces=[n] + list(range(n)))
            mesh.scale(1 / self.sf, inplace=True)
            mesh.transform(face_transform, inplace=True)
            mesh.scale(self.sf, inplace=True)
            mesh.texture_map_to_plane(
                origin=mesh.points[0], point_u=mesh.points[1],
                point_v=mesh.points[3], inplace=True)
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
        net_tforms = []
        canvas_locs = []
        for im, base_form in zip(net_images, net_transforms):
            new_tform = (np.diag([im.shape[0], im.shape[1], 1.0])
                         @ np.asarray(base_form, dtype=float)
                         @ np.diag([1 / im.shape[0], 1 / im.shape[1], 1.0]))
            net_tforms.append(new_tform)
            canvas_locs.append(h_tform_2d(np.zeros(2), new_tform))
            canvas_locs.append(h_tform_2d(np.array(im.shape, dtype=float), new_tform))

        canvas_locs = np.array(canvas_locs)
        offset = -np.amin(canvas_locs, axis=0).astype(int)
        canvas_shape = (np.amax(canvas_locs, axis=0) + offset).astype(int)

        blank_canvas = np.ones(canvas_shape) * 255
        fo_tform = np.eye(3)
        fo_tform[:2, -1] = offset.T
        permute = np.array([[0, 1, 0], [1, 0, 0], [0, 0, 1]], dtype=float)

        for im, tform in zip(net_images, net_tforms):
            applied = permute @ fo_tform @ tform @ permute
            unwarped = np.zeros(canvas_shape)
            unwarped[: im.shape[0], : im.shape[1]] = 255 - im  # subtractive
            warped = cv2.warpAffine(unwarped, applied[:2],
                                    dsize=tuple(canvas_shape[::-1]))
            blank_canvas -= warped
        return blank_canvas.clip(0, 255)


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
    ragged = make_ragged_faces(face_connectivity)
    tforms: list = [None] * len(ragged)
    added = set()
    cpoint = 0
    base_shape = np.asarray(base_shape, dtype=float)

    while cpoint < len(connections):
        num_connect = connections[cpoint]
        base_face = connections[cpoint + 1]
        bfp = list(ragged[base_face])
        if cpoint == 0:
            added.add(base_face)
            tforms[base_face] = np.eye(3)
        if base_face not in added:
            raise ValueError(
                f"Attempted to add faces to {base_face} without first "
                f"defining the location of {base_face}.")
        cpoint += 2
        for _ in range(num_connect):
            connected_face = connections[cpoint]
            cfp = list(ragged[connected_face])
            shared = list(set(bfp).intersection(set(cfp)))
            if len(shared) != 2:
                raise ValueError(
                    f"faces {base_face} and {connected_face} do not share "
                    "enough points to estimate the transformation between them")
            if connected_face in added:
                raise ValueError(
                    f"Face {connected_face} was added to the tree multiple times.")
            added.add(connected_face)
            pb = np.array([base_shape[bfp.index(shared[0])],
                           base_shape[bfp.index(shared[1])]])
            cb = np.array([base_shape[cfp.index(shared[0])],
                           base_shape[cfp.index(shared[1])]])
            rot, t = _rigid_fit_2d(cb, pb)
            tforms[connected_face] = tforms[base_face] @ make_h(rot, t)
            cpoint += 1
    return tforms
