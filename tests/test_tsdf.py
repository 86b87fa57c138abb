"""TSDF fusion + marching tetrahedra (reconstruction/tsdf.py).

Beyond-reference: the reference never produces a surface (it exports
MVS inputs only, /root/reference/pyCamSet/reconstruction/acmmp_utils.py).
Oracles: a LINEAR signed-distance field meshes to exact vertex positions
(the zero crossing of linear interpolation is exact), and an analytic
sphere SDF meshes to the sphere radius within a voxel.
"""
import numpy as np
import pytest

from pycamset_tpu.reconstruction.tsdf import (
    dense_mesh,
    marching_tetrahedra,
    tsdf_fuse,
)

from tests.test_fusion import H, W, _make_cam, _render  # noqa: E402


def _grid(dims, origin, voxel):
    ax = [origin[i] + (np.arange(dims[i]) + 0.5) * voxel for i in range(3)]
    return np.meshgrid(*ax, indexing="ij")


class TestMarchingTetrahedra:
    def test_linear_field_is_exact(self):
        """Plane SDF z - 2.3: every mesh vertex sits at z = 2.3 exactly."""
        dims, origin, voxel = (8, 9, 10), (0.0, 0.0, 0.0), 0.5
        xs, ys, zs = _grid(dims, origin, voxel)
        verts, faces = marching_tetrahedra(zs - 2.3, origin=origin,
                                           voxel=voxel)
        assert len(verts) > 50
        np.testing.assert_allclose(verts[:, 2], 2.3, atol=1e-12)
        assert faces.min() >= 0 and faces.max() < len(verts)

    def test_sphere_radius_and_orientation(self):
        dims, origin, voxel = (40, 40, 40), (-2.0, -2.0, -2.0), 0.1
        xs, ys, zs = _grid(dims, origin, voxel)
        r = np.sqrt(xs**2 + ys**2 + zs**2)
        verts, faces = marching_tetrahedra(r - 1.3, origin=origin,
                                           voxel=voxel)
        rad = np.linalg.norm(verts, axis=1)
        assert np.abs(rad - 1.3).max() < 0.05
        # normals oriented inside -> outside (away from the centre)
        tri = verts[faces]
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        centroid = tri.mean(axis=1)
        assert ((n * centroid).sum(axis=1) > 0).mean() > 0.99

    def test_watertight_edges(self):
        """Every edge of a closed surface is shared by exactly 2 faces."""
        dims, origin, voxel = (24, 24, 24), (-1.2, -1.2, -1.2), 0.1
        xs, ys, zs = _grid(dims, origin, voxel)
        r = np.sqrt(xs**2 + ys**2 + zs**2)
        verts, faces = marching_tetrahedra(r - 0.8, origin=origin,
                                           voxel=voxel)
        edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                                faces[:, [2, 0]]])
        edges = np.sort(edges, axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).all()

    def test_mask_excludes_cubes(self):
        dims, origin, voxel = (8, 8, 8), (0.0, 0.0, 0.0), 0.5
        xs, ys, zs = _grid(dims, origin, voxel)
        vol = zs - 1.9
        mask = np.ones(dims, dtype=bool)
        mask[:4] = False
        verts, _ = marching_tetrahedra(vol, origin=origin, voxel=voxel,
                                       mask=mask)
        # cubes touching masked voxels (x-index <= 3) produce nothing
        assert verts[:, 0].min() > origin[0] + 4 * voxel

    def test_empty_field(self):
        verts, faces = marching_tetrahedra(np.ones((5, 5, 5)))
        assert verts.shape == (0, 3) and faces.shape == (0, 3)


@pytest.fixture(scope="module")
def rig():
    cams = [_make_cam(0, 0), _make_cam(0.4, 0), _make_cam(-0.4, 0),
            _make_cam(0, 0.4)]
    rendered = [_render(c) for c in cams]
    return cams, [r[0] for r in rendered], [r[1] for r in rendered]


class TestTsdfFuse:
    def test_plane_zero_crossing(self, rig):
        """Exact depths of the z=5 background plane: the fused TSDF
        changes sign at z = 5 in a bump-free grid region."""
        cams, _, gt = rig
        voxel = 0.02
        origin = (0.9, -0.4, 4.7)
        dims = (40, 40, 30)
        tsdf, wsum = tsdf_fuse(cams, gt, origin, voxel, dims)
        verts, faces = marching_tetrahedra(tsdf, origin=origin,
                                           voxel=voxel, mask=wsum >= 2)
        assert len(verts) > 200
        assert np.abs(np.median(verts[:, 2]) - 5.0) < voxel
        assert np.abs(verts[:, 2] - 5.0).max() < 3 * voxel

    def test_float32_inputs_run_in_float32(self, rig):
        cams, _, gt = rig
        tsdf, wsum = tsdf_fuse(cams, [d.astype(np.float32) for d in gt],
                               (0.9, -0.4, 4.7), 0.05, (16, 16, 12))
        assert tsdf.dtype == np.float32 and wsum.dtype == np.float32

    def test_weight_counts_views(self, rig):
        cams, _, gt = rig
        tsdf, wsum = tsdf_fuse(cams, gt, (0.9, -0.4, 4.7), 0.05,
                               (16, 16, 12))
        assert wsum.max() <= 4
        assert (wsum >= 2).any()

    def test_bad_args_raise(self, rig):
        cams, _, gt = rig
        with pytest.raises(ValueError, match="one depth map per camera"):
            tsdf_fuse(cams, gt[:2], (0, 0, 0), 0.1, (8, 8, 8))
        with pytest.raises(ValueError, match="one resolution"):
            tsdf_fuse(cams, [gt[0][:, :40]] + gt[1:], (0, 0, 0), 0.1,
                      (8, 8, 8))


class TestDenseMesh:
    def test_end_to_end(self, rig):
        cams, ims, _ = rig
        out = dense_mesh(cams, ims, near=2.5, far=8.0, n_planes=64,
                         dims_cap=96)
        assert out["verts"].shape[0] > 1000
        assert out["faces"].shape[0] > 1000
        # the scene is two fronto-parallel planes; the mesh must hug them
        z = out["verts"][:, 2]
        near_plane = np.minimum(np.abs(z - 5.0), np.abs(z - 3.5))
        assert np.median(near_plane) < 2 * out["voxel"]
