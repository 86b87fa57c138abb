"""On-device census SGM matcher: quality, invalidation, cv2 oracle, e2e.

Reference behaviour target: pyCamSet delegates dense stereo to
cv2.StereoBM / MATLAB disparitySGM (reconstruction_utils.py:113-158);
here the matcher itself is in-framework, so these tests hold it to
quantitative disparity accuracy on synthetic pairs with exact ground
truth, agreement with cv2.StereoSGBM as an oracle, and the full
rectify -> match -> reproject pipeline.
"""
import cv2
import numpy as np
import pytest

from pycamset_tpu.reconstruction.dense_stereo import (
    census_transform, make_sgm_matcher, sgm_disparity)


def _smooth_noise(rng, shape, sigma=1.2):
    return cv2.GaussianBlur(
        rng.uniform(0, 255, shape).astype(np.float32), (0, 0), sigma)


@pytest.fixture(scope="module")
def const_pair():
    """Random-dot pair with exact integer disparity 7 everywhere."""
    rng = np.random.default_rng(0)
    h, w, d0 = 64, 96, 7
    tex = _smooth_noise(rng, (h, w + d0), sigma=1.0)
    return tex[:, :w], tex[:, d0:d0 + w], d0


@pytest.fixture(scope="module")
def ramp_pair():
    """Slanted-surface pair: disparity ramps 4..14 across the width.

    right[xr] samples the left texture at xr + ramp(xr), so the
    disparity at LEFT pixel x solves d = ramp(x - d) — the implicit
    closed form below, not ramp(x).
    """
    rng = np.random.default_rng(1)
    h, w = 72, 128
    tex = _smooth_noise(rng, (h, w + 40))
    x = np.arange(w, dtype=np.float32)
    map_x = np.tile(x + 4 + 10 * x / (w - 1), (h, 1)).astype(np.float32)
    map_y = np.tile(np.arange(h, dtype=np.float32)[:, None], (1, w))
    right = cv2.remap(tex, map_x, map_y, cv2.INTER_LINEAR)
    s = 10.0 / (w - 1)
    gt = np.tile((4 + s * x) / (1 + s), (h, 1))
    return tex[:, :w], right, gt


class TestCensus:
    def test_word_width_and_borders(self):
        rng = np.random.default_rng(2)
        im = rng.uniform(0, 1, (10, 12)).astype(np.float32)
        w5 = np.asarray(census_transform(im, 5))
        w3 = np.asarray(census_transform(im, 3))
        assert w5.dtype == np.uint32 and w3.dtype == np.uint32
        assert int(w5.max()) < 2 ** 24 and int(w3.max()) < 2 ** 8
        # identical images -> zero hamming distance everywhere
        assert np.array_equal(w5, np.asarray(census_transform(im, 5)))

    def test_window_validation(self):
        with pytest.raises(ValueError):
            census_transform(np.zeros((4, 4), np.float32), 7)


class TestSGMQuality:
    def test_constant_disparity(self, const_pair):
        left, right, d0 = const_pair
        disp = sgm_disparity(left, right, max_disp=32)
        valid = np.isfinite(disp)
        assert valid.mean() > 0.85
        err = np.abs(disp[valid] - d0)
        assert np.median(err) < 0.1
        assert (err < 0.5).mean() > 0.95

    def test_subpixel_ramp(self, ramp_pair):
        left, right, gt = ramp_pair
        disp = sgm_disparity(left, right, max_disp=32)
        valid = np.isfinite(disp)
        assert valid.mean() > 0.9
        err = np.abs(disp - gt)[valid]
        assert np.median(err) < 0.25
        assert np.percentile(err, 90) < 0.5

    def test_four_directions_and_window3(self, const_pair):
        left, right, d0 = const_pair
        disp = sgm_disparity(left, right, max_disp=32, directions=4,
                             census_window=3)
        valid = np.isfinite(disp)
        assert valid.mean() > 0.7
        assert np.median(np.abs(disp[valid] - d0)) < 0.25

    def test_textureless_is_invalidated(self):
        flat = np.full((48, 64), 100.0, np.float32)
        disp = sgm_disparity(flat, flat, max_disp=16)
        assert np.isfinite(disp).mean() < 0.05

    def test_left_border_has_no_match(self, const_pair):
        left, right, d0 = const_pair
        disp = sgm_disparity(left, right, max_disp=32)
        # x < d0: the matching right pixel is off-frame
        assert np.isfinite(disp[:, :d0]).mean() < 0.3

    def test_occlusion_and_discontinuity(self):
        """Foreground strip (d=12) over background (d=5): both layers
        recover their disparity and the left-right check invalidates
        the occluded background band."""
        rng = np.random.default_rng(5)
        h, w = 64, 96
        bg = _smooth_noise(rng, (h, w + 16), sigma=1.0)
        fg = _smooth_noise(rng, (h, 24), sigma=1.0)
        left = bg[:, :w].copy()
        left[:, 40:60] = fg[:, :20]
        right = bg[:, 5:w + 5].copy()
        right[:, 28:48] = fg[:, :20]
        disp = sgm_disparity(left, right, max_disp=32)
        fin = np.isfinite(disp)
        assert abs(np.nanmedian(disp[:, 42:58]) - 12) < 0.5
        assert abs(np.nanmedian(disp[:, 8:30]) - 5) < 0.5
        # background left x in [33, 40) is hidden behind the strip in
        # the right image -> no correct match exists
        occl = fin[:, 33:40].mean()
        rest = fin[:, 8:30].mean()
        assert occl < 0.4 * rest

    def test_config_reuses_compiled_matcher(self):
        assert make_sgm_matcher(max_disp=32) is make_sgm_matcher(max_disp=32)


class TestOracle:
    def test_agrees_with_cv2_sgbm(self, ramp_pair):
        left, right, _ = ramp_pair
        disp = sgm_disparity(left, right, max_disp=32)
        sgbm = cv2.StereoSGBM_create(
            minDisparity=0, numDisparities=32, blockSize=5, P1=8 * 25,
            P2=32 * 25, uniquenessRatio=5, mode=cv2.STEREO_SGBM_MODE_HH)
        dref = sgbm.compute(left.astype(np.uint8),
                            right.astype(np.uint8)).astype(np.float32) / 16
        both = np.isfinite(disp) & (dref > 0)
        assert both.mean() > 0.5
        assert (np.abs(disp - dref)[both] <= 1.0).mean() > 0.9


class TestPipeline:
    def test_stereo_reconstruct_sgm_recovers_plane_depth(self):
        """rectify -> SGM -> reproject on a synthetic fronto-parallel
        plane: recovered cloud depth within 2% of the true plane."""
        from pycamset_tpu.models.camera import Camera
        from pycamset_tpu.reconstruction.reconstruction_utils import (
            stereo_reconstruct)

        w, h, f, z0, base = 160, 120, 200.0, 1.0, 0.08
        k = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
        e0 = np.eye(4)
        e1 = np.eye(4)
        e1[0, 3] = -base  # camera 1 sits at +x: world -> cam subtracts
        cam0 = Camera(extrinsic=e0, intrinsic=k, res=[w, h])
        cam1 = Camera(extrinsic=e1, intrinsic=k, res=[w, h])

        # texture on the z = z0 plane, sampled by pinhole projection:
        # pixel (u, v) of cam c sees plane point x = (u - cx) z0/f + tx
        rng = np.random.default_rng(4)
        tex = _smooth_noise(rng, (512, 512), sigma=1.5)

        def render(tx):
            u, v = np.meshgrid(np.arange(w), np.arange(h))
            x = (u - w / 2) * z0 / f + tx
            y = (v - h / 2) * z0 / f
            # sample the texture on a 4 px/world-unit grid centred at 0
            mx = (x * 320 + 256).astype(np.float32)
            my = (y * 320 + 256).astype(np.float32)
            return cv2.remap(tex, mx, my, cv2.INTER_LINEAR)

        im0, im1 = render(0.0), render(base)
        cloud = stereo_reconstruct(
            cam0, cam1, im0, im1, num_disp=32, matcher="sgm",
            mind=0.5, maxd=1.5)
        pts = np.asarray(cloud.points if hasattr(cloud, "points") else cloud)
        assert pts.shape[0] > 0.3 * w * h
        z = pts[:, 2]
        assert abs(np.median(z) - z0) < 0.02 * z0
        assert (np.abs(z - z0) < 0.05 * z0).mean() > 0.9

    def test_unknown_matcher_raises(self):
        from pycamset_tpu.models.camera import Camera
        from pycamset_tpu.reconstruction.reconstruction_utils import (
            stereo_reconstruct)
        cam = Camera(res=[32, 24])
        im = np.zeros((24, 32), np.uint8)
        with pytest.raises(ValueError, match="unknown matcher"):
            stereo_reconstruct(cam, cam, im, im, matcher="nope")
