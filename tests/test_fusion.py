"""Multi-view depth fusion (reconstruction/fusion.py).

Beyond-reference: the reference exports pair.txt / MVSNet cams for an
EXTERNAL fusion stage (/root/reference/pyCamSet/reconstruction/
acmmp_utils.py:24-83); these tests validate the in-framework
consistency-filtered fusion on synthetic multi-view renders with known
two-plane geometry.
"""
import numpy as np
import pytest

from pycamset_tpu.models.camera import Camera
from pycamset_tpu.reconstruction.fusion import (
    dense_reconstruct,
    fuse_depth_maps,
)
from pycamset_tpu.reconstruction.plane_sweep import plane_sweep_depth

H, W = 96, 128
K = np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]])
TARGET = np.array([0.0, 0.0, 4.25])  # cameras converge here


def _texture(x, y):
    """Smooth band-limited world-plane texture (avoids warp aliasing)."""
    return (np.sin(7.1 * x) * np.cos(5.3 * y)
            + 0.6 * np.sin(13.7 * x + 2.1 * y)
            + 0.4 * np.cos(3.3 * x - 9.1 * y) + 0.5 * np.sin(17.0 * y)) * 60 + 128


def _make_cam(tx, ty):
    """Camera at (tx, ty, 0) looking at TARGET (small convergence)."""
    centre = np.array([tx, ty, 0.0])
    z = TARGET - centre
    z = z / np.linalg.norm(z)
    x = np.cross([0.0, 1.0, 0.0], z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, :3] = np.stack([x, y, z], axis=1)
    c2w[:3, 3] = centre
    return Camera(extrinsic=np.linalg.inv(c2w), intrinsic=K, res=(W, H))


def _render(cam):
    """Ray-cast the two-plane scene (background z=5, bump z=3.5).

    :return: (image (H, W), per-pixel ref-frame depth (H, W)).
    """
    u, v = np.meshgrid(np.arange(W, dtype=float), np.arange(H, dtype=float))
    pix = np.stack([u.ravel(), v.ravel(), np.ones(H * W)])
    rays = np.linalg.inv(cam.intrinsic) @ pix
    rot = cam.cam_to_world[:3, :3]
    origin = cam.cam_to_world[:3, 3:4]
    d_w = rot @ rays
    im = np.zeros(H * W)
    depth = np.zeros(H * W)
    for z0, region in [(5.0, None), (3.5, "bump")]:
        s = (z0 - origin[2]) / d_w[2]
        p = origin + d_w * s
        val = _texture(p[0], p[1])
        z_cam = s * rays[2]             # depth along the camera z axis
        if region is None:
            im, depth = val, z_cam
        else:
            mask = (np.abs(p[0]) < 0.8) & (np.abs(p[1]) < 0.8)
            im = np.where(mask, val, im)
            depth = np.where(mask, z_cam, depth)
    return im.reshape(H, W), depth.reshape(H, W)


@pytest.fixture(scope="module")
def rig():
    cams = [_make_cam(0, 0), _make_cam(0.4, 0), _make_cam(-0.4, 0),
            _make_cam(0, 0.4)]
    rendered = [_render(c) for c in cams]
    return cams, [r[0] for r in rendered], [r[1] for r in rendered]


@pytest.fixture(scope="module")
def swept(rig):
    cams, ims, _ = rig
    depths = []
    for i, cam in enumerate(cams):
        srcs = [j for j in range(len(cams)) if j != i]
        d, _ = plane_sweep_depth(cam, [cams[j] for j in srcs], ims[i],
                                 [ims[j] for j in srcs],
                                 near=2.5, far=8.0, n_planes=64)
        depths.append(d.astype(np.float64))
    return depths


def _plane_err(pts):
    return np.minimum(np.abs(pts[:, 2] - 5.0), np.abs(pts[:, 2] - 3.5))


class TestFuseDepthMaps:
    def test_fused_cloud_on_scene_planes(self, rig, swept):
        cams, _, _ = rig
        out = fuse_depth_maps(cams, swept, min_consistent=2)
        assert out["points"].shape[0] > 0.5 * H * W
        assert np.median(_plane_err(out["points"])) < 0.02
        assert out["n_consistent"].min() >= 2
        assert set(np.unique(out["view"])) <= set(range(4))

    def test_consumption_deduplicates(self, rig, swept):
        """Each surface patch is emitted once: the fused count is far
        below the raw sum of valid per-view pixels."""
        cams, _, _ = rig
        out = fuse_depth_maps(cams, swept, min_consistent=1)
        raw = sum(int(np.isfinite(d).sum()) for d in swept)
        assert out["points"].shape[0] < 0.6 * raw

    def test_ground_truth_depths_fuse_exactly(self, rig):
        """With exact rendered depths every pixel is mutually consistent
        and the fused points land on the planes to float accuracy."""
        cams, _, gt = rig
        out = fuse_depth_maps(cams, gt, min_consistent=2, max_px=0.75,
                              max_rel=0.005)
        assert np.median(_plane_err(out["points"])) < 1e-6
        # occlusion-edge pixels can disagree; the bulk must survive
        assert out["points"].shape[0] > 0.4 * H * W

    def test_corrupted_view_filtered_out(self, rig, swept):
        cams, _, _ = rig
        bad = [d.copy() for d in swept]
        bad[2] = bad[2] + 0.8                      # systematic shift
        out = fuse_depth_maps(cams, bad, min_consistent=2)
        # the corrupted view corroborates nothing and emits (almost)
        # nothing; the others still fuse cleanly
        frac_bad = float(np.mean(out["view"] == 2))
        assert frac_bad < 0.02
        assert np.median(_plane_err(out["points"])) < 0.02

    def test_colors_sampled_at_emitting_pixel(self, rig, swept):
        cams, ims, _ = rig
        out = fuse_depth_maps(cams, swept, min_consistent=2,
                              colors=[im.astype(float) for im in ims])
        assert out["colors"].shape == (out["points"].shape[0],)
        assert np.all(np.isfinite(out["colors"]))

    def test_float32_inputs_run_in_float32(self, rig):
        """f32 depths must not up-promote (the chip tier feeds f32)."""
        cams, _, gt = rig
        out = fuse_depth_maps(cams, [d.astype(np.float32) for d in gt],
                              min_consistent=2, max_px=0.75, max_rel=0.005)
        assert out["points"].dtype == np.float32
        assert np.median(_plane_err(out["points"])) < 1e-3

    def test_bad_args_raise(self, rig, swept):
        cams, _, _ = rig
        with pytest.raises(ValueError, match="one depth map per camera"):
            fuse_depth_maps(cams, swept[:3])
        with pytest.raises(ValueError, match="at least two"):
            fuse_depth_maps(cams[:1], swept[:1])
        with pytest.raises(ValueError, match="one resolution"):
            fuse_depth_maps(cams, [swept[0][:, :64]] + swept[1:])
        with pytest.raises(ValueError, match="one colors array"):
            fuse_depth_maps(cams, swept, colors=[swept[0]])


class TestDenseReconstruct:
    def test_end_to_end(self, rig):
        cams, ims, _ = rig
        out = dense_reconstruct(cams, ims, near=2.5, far=8.0, n_planes=64)
        assert len(out["depths"]) == 4
        assert all(d is not None for d in out["depths"])
        assert np.median(_plane_err(out["points"])) < 0.02
        assert out["colors"].shape[0] == out["points"].shape[0]

    def test_isolated_view_skipped(self, rig):
        cams, ims, _ = rig
        # the converging rig subtends ~6-15 deg; a 30-deg minimum
        # isolates every camera except none -> all skipped -> error
        with pytest.raises(ValueError, match="fewer than two views"):
            dense_reconstruct(cams, ims, near=2.5, far=8.0,
                              min_angle=30.0)

    def test_arg_validation(self, rig):
        cams, ims, _ = rig
        with pytest.raises(ValueError, match="one image per camera"):
            dense_reconstruct(cams, ims[:2], near=2.5, far=8.0)
