"""Multi-view plane-sweep depth (reconstruction/plane_sweep.py).

Beyond-reference: the reference only EXPORTS data for external MVS
(/root/reference/pyCamSet/reconstruction/acmmp_utils.py); it computes no
multi-view depth itself. These tests validate the in-framework sweep on
synthetic multi-view renders with known geometry.
"""
import numpy as np
import pytest

from pycamset_tpu.models.camera import Camera
from pycamset_tpu.reconstruction.plane_sweep import (
    depth_to_cloud,
    inverse_depth_planes,
    plane_sweep_depth,
    planesweep_homographies,
)

H, W = 96, 128
K = np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]])


def _texture(x, y):
    """Smooth band-limited world-plane texture (avoids warp aliasing)."""
    return (np.sin(7.1 * x) * np.cos(5.3 * y) + 0.6 * np.sin(13.7 * x + 2.1 * y)
            + 0.4 * np.cos(3.3 * x - 9.1 * y) + 0.5 * np.sin(17.0 * y)) * 60 + 128


def _make_cam(tx, ty):
    ext = np.eye(4)
    ext[:3, 3] = [-tx, -ty, 0.0]  # world->cam; centre at (tx, ty, 0)
    return Camera(extrinsic=ext, intrinsic=K, res=(W, H))


def _render(cam, bump=True):
    """Ray-cast the two-plane scene: background z=5, bump patch z=3.5."""
    u, v = np.meshgrid(np.arange(W, dtype=float), np.arange(H, dtype=float))
    pix = np.stack([u.ravel(), v.ravel(), np.ones(H * W)])
    rays = np.linalg.inv(cam.intrinsic) @ pix
    rot = cam.cam_to_world[:3, :3]
    origin = cam.cam_to_world[:3, 3:4]
    d_w = rot @ rays
    im = np.zeros(H * W)
    planes = [(5.0, None)] + ([(3.5, "bump")] if bump else [])
    for z0, region in planes:
        s = (z0 - origin[2]) / d_w[2]
        p = origin + d_w * s
        val = _texture(p[0], p[1])
        if region is None:
            im = val
        else:
            mask = (np.abs(p[0]) < 0.8) & (np.abs(p[1]) < 0.8)
            im = np.where(mask, val, im)
    return im.reshape(H, W)


def _gt_depth():
    u, v = np.meshgrid(np.arange(W, dtype=float), np.arange(H, dtype=float))
    rays = np.linalg.inv(K) @ np.stack([u.ravel(), v.ravel(), np.ones(H * W)])
    bump = (np.abs(rays[0] * 3.5) < 0.8) & (np.abs(rays[1] * 3.5) < 0.8)
    return np.where(bump, 3.5, 5.0).reshape(H, W)


@pytest.fixture(scope="module")
def rig():
    ref = _make_cam(0, 0)
    srcs = [_make_cam(0.4, 0), _make_cam(-0.4, 0), _make_cam(0, 0.4)]
    return ref, srcs, _render(ref), [_render(c) for c in srcs]


class TestPlaneSweep:
    def test_two_plane_scene_recovered(self, rig):
        ref, srcs, ref_im, src_ims = rig
        depth, cost = plane_sweep_depth(
            ref, srcs, ref_im, src_ims, near=2.5, far=8.0, n_planes=64)
        gt = _gt_depth()
        valid = np.isfinite(depth)
        assert valid.mean() > 0.85
        err = np.abs(depth - gt)[valid]
        assert np.median(err) < 0.02           # subpixel-plane accuracy
        assert (err < 0.02 * gt[valid]).mean() > 0.75

    def test_top_k_improves_occlusion_edges(self, rig):
        ref, srcs, ref_im, src_ims = rig
        d_all, _ = plane_sweep_depth(
            ref, srcs, ref_im, src_ims, near=2.5, far=8.0, n_planes=64)
        d_k2, _ = plane_sweep_depth(
            ref, srcs, ref_im, src_ims, near=2.5, far=8.0, n_planes=64,
            top_k=2)
        gt = _gt_depth()

        def med(d):
            v = np.isfinite(d)
            return np.median(np.abs(d - gt)[v])

        assert med(d_k2) <= med(d_all) + 1e-6

    def test_sgm_regularized_volume_stays_accurate(self, rig):
        ref, srcs, ref_im, src_ims = rig
        depth, _ = plane_sweep_depth(
            ref, srcs, ref_im, src_ims, near=2.5, far=8.0, n_planes=64,
            regularize=True)
        gt = _gt_depth()
        valid = np.isfinite(depth)
        assert valid.mean() > 0.85
        assert np.median(np.abs(depth - gt)[valid]) < 0.05

    def test_textureless_region_rejected(self, rig):
        ref, srcs, ref_im, src_ims = rig
        flat = np.full_like(ref_im, 128.0)
        flat_srcs = [np.full_like(s, 128.0) for s in src_ims]
        depth, _ = plane_sweep_depth(
            ref, srcs, flat, flat_srcs, near=2.5, far=8.0, n_planes=16)
        # ZNCC is undefined on constant windows -> everything invalid
        assert np.isfinite(depth).mean() < 0.05

    def test_depth_to_cloud_lies_on_scene_planes(self, rig):
        ref, srcs, ref_im, src_ims = rig
        depth, _ = plane_sweep_depth(
            ref, srcs, ref_im, src_ims, near=2.5, far=8.0, n_planes=64)
        pts, cols = depth_to_cloud(ref, depth)
        assert cols is None
        assert pts.shape[0] == np.isfinite(depth).sum()
        # every world point close to one of the two scene planes
        d5 = np.abs(pts[:, 2] - 5.0)
        d35 = np.abs(pts[:, 2] - 3.5)
        assert np.median(np.minimum(d5, d35)) < 0.02

    def test_depth_to_cloud_colors_follow_mask(self, rig):
        ref = rig[0]
        depth = np.full((H, W), np.nan)
        depth[10, 20] = 4.0
        colors = np.arange(H * W, dtype=float).reshape(H, W)
        pts, cols = depth_to_cloud(ref, depth, colors)
        assert pts.shape == (1, 3)
        assert cols.item() == colors[10, 20]


class TestHomographies:
    def test_plane_point_maps_ref_to_src(self):
        """H must map a ref pixel to the src pixel of the SAME world point
        on the fronto-parallel plane."""
        ref = _make_cam(0, 0)
        src = _make_cam(0.3, 0.1)
        z = 4.2
        homs = planesweep_homographies(ref, [src], np.array([z]))
        pix_r = np.array([37.0, 61.0, 1.0])
        ray = np.linalg.inv(K) @ pix_r
        p_cam = ray * z                               # ref-frame 3D point
        p_w = ref.cam_to_world[:3, :3] @ p_cam + ref.cam_to_world[:3, 3]
        p_s = src.extrinsic[:3, :3] @ p_w + src.extrinsic[:3, 3]
        pix_s = K @ p_s
        pix_s = pix_s[:2] / pix_s[2]
        via_h = homs[0, 0] @ pix_r
        via_h = via_h[:2] / via_h[2]
        np.testing.assert_allclose(via_h, pix_s, atol=1e-9)

    def test_inverse_depth_spacing(self):
        d = inverse_depth_planes(2.0, 8.0, 7)
        np.testing.assert_allclose(1.0 / d, np.linspace(0.5, 0.125, 7))
        with pytest.raises(ValueError):
            inverse_depth_planes(-1.0, 8.0, 4)
        with pytest.raises(ValueError):
            inverse_depth_planes(8.0, 2.0, 4)

    def test_bad_args_raise(self, rig):
        ref, srcs, ref_im, src_ims = rig
        with pytest.raises(ValueError, match="depths= or near="):
            plane_sweep_depth(ref, srcs, ref_im, src_ims)
        with pytest.raises(ValueError, match="two plane depths"):
            plane_sweep_depth(ref, srcs, ref_im, src_ims,
                              depths=np.array([3.0]))
