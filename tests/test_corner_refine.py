"""Photometric X-corner refinement (models/corner_refine.py).

Accuracy oracle: checkerboards rendered with exact, analytically-known
corner positions (supersampled render + box downsample + Gaussian blur +
noise). The feature claim is that the saddle-model fit beats
cv2.cornerSubPix on the same imagery; the tests assert that ordering and
an absolute accuracy bar, plus the host-side guard behaviour.
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from pycamset_tpu.models.corner_refine import (
    refine_corners_photometric, saddle_refine)

SQ = 40   # square edge in rendered px
N_SQ = 8  # squares per board edge
SS = 4    # supersampling factor


def render_board(h33, blur_sigma, noise, rng, out_wh=(640, 480)):
    """Render a homography-warped checkerboard with known geometry."""
    out_w, out_h = out_wh
    ys, xs = np.meshgrid(
        (np.arange(out_h * SS) + 0.5) / SS - 0.5,
        (np.arange(out_w * SS) + 0.5) / SS - 0.5, indexing="ij")
    pts = np.stack([xs.ravel(), ys.ravel(), np.ones(xs.size)])
    src = np.linalg.inv(h33) @ pts
    src = src[:2] / src[2]
    bx = np.floor(src[0] / SQ).astype(int)
    by = np.floor(src[1] / SQ).astype(int)
    board_edge = SQ * N_SQ
    inside = ((src[0] >= 0) & (src[0] < board_edge)
              & (src[1] >= 0) & (src[1] < board_edge))
    val = np.where((bx + by) % 2 == 0, 40.0, 220.0)
    val = np.where(inside, val, 160.0)
    im = val.reshape(out_h * SS, out_w * SS)
    im = im.reshape(out_h, SS, out_w, SS).mean(axis=(1, 3))
    if blur_sigma > 0:
        im = cv2.GaussianBlur(im, (0, 0), blur_sigma)
    im = im + rng.normal(0, noise, im.shape)
    return np.clip(im, 0, 255)


def gt_corners(h33, out_wh=(640, 480), margin=20):
    gx, gy = np.meshgrid(np.arange(1, N_SQ) * SQ, np.arange(1, N_SQ) * SQ)
    pts = np.stack([gx.ravel(), gy.ravel(), np.ones(gx.size)])
    out = h33 @ pts
    gt = (out[:2] / out[2]).T
    keep = ((gt[:, 0] > margin) & (gt[:, 0] < out_wh[0] - margin)
            & (gt[:, 1] > margin) & (gt[:, 1] < out_wh[1] - margin))
    return gt[keep]


def _warp():
    c, s = np.cos(0.23), np.sin(0.23)
    return np.array([[c, -s, 140.0], [s, c, 70.0], [2e-4, -1.5e-4, 1.0]])


class TestAccuracy:
    def test_beats_cornersubpix_on_blurred_noisy_board(self):
        rng = np.random.default_rng(7)
        h33 = _warp()
        im = render_board(h33, blur_sigma=1.5, noise=4.0, rng=rng)
        gt = gt_corners(h33)
        start = gt + rng.uniform(-0.7, 0.7, gt.shape)

        pts = start.astype(np.float32).reshape(-1, 1, 2).copy()
        cv2.cornerSubPix(
            im.astype(np.uint8), pts, (9, 9), (-1, -1),
            (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 0.01))
        err_cv = np.linalg.norm(pts.reshape(-1, 2) - gt, axis=1)

        refined = refine_corners_photometric(im.astype(np.float32), start)
        err_ph = np.linalg.norm(refined - gt, axis=1)

        assert err_ph.mean() < 0.6 * err_cv.mean()
        assert err_ph.mean() < 0.06
        assert err_ph.max() < 0.25

    def test_sharp_clean_board_reaches_centipixel(self):
        rng = np.random.default_rng(11)
        h33 = _warp()
        im = render_board(h33, blur_sigma=0.8, noise=1.0, rng=rng)
        gt = gt_corners(h33)
        start = gt + rng.uniform(-0.6, 0.6, gt.shape)
        refined = refine_corners_photometric(im.astype(np.float32), start)
        err = np.linalg.norm(refined - gt, axis=1)
        assert err.mean() < 0.02

    def test_core_recovers_model_generated_positions(self):
        # patches synthesized from the model itself: exact recovery modulo
        # noise, in one vmapped dispatch
        rng = np.random.default_rng(3)
        P, n = 19, 32
        half = P // 2
        span = np.arange(P) - half
        uu, vv = np.meshgrid(span, span, indexing="xy")
        true_xy = rng.uniform(-0.5, 0.5, (n, 2))
        patches = np.empty((n, P, P), dtype=np.float32)
        for i, (x, y) in enumerate(true_xy):
            t1 = rng.uniform(0, np.pi)
            t2 = t1 + np.pi / 2 + rng.uniform(-0.2, 0.2)
            d1 = np.cos(t1) * (uu - x) + np.sin(t1) * (vv - y)
            d2 = np.cos(t2) * (uu - x) + np.sin(t2) * (vv - y)
            patches[i] = (128 + 90 * np.tanh(0.9 * d1) * np.tanh(0.9 * d2)
                          + rng.normal(0, 2.0, (P, P)))
        xy, cost0, cost, contrast = saddle_refine(
            patches, np.zeros((n, 2), np.float32))
        err = np.linalg.norm(np.asarray(xy) - true_xy, axis=1)
        assert err.mean() < 0.02
        assert np.all(np.asarray(cost) <= np.asarray(cost0))
        assert np.all(np.asarray(contrast) > 0.1)


class TestGuards:
    def test_border_and_flat_corners_keep_input(self):
        rng = np.random.default_rng(5)
        im = np.full((100, 100), 128.0, np.float32)
        im += rng.normal(0, 1.0, im.shape).astype(np.float32)
        corners = np.array([[3.0, 50.0],     # too close to the border
                            [50.0, 50.0]])   # flat patch: no contrast
        out = refine_corners_photometric(im, corners)
        np.testing.assert_allclose(out, corners)

    def test_empty_input_passthrough(self):
        im = np.zeros((50, 50), np.float32)
        out = refine_corners_photometric(im, np.empty((0, 2)))
        assert out.shape == (0, 2)

    def test_divergent_fit_keeps_input(self):
        # a step edge (single line, not an X-corner) must not be "refined"
        # off to a far-away saddle
        im = np.full((60, 60), 40.0, np.float32)
        im[:, 30:] = 220.0
        corners = np.array([[30.0, 30.0]])
        out = refine_corners_photometric(im, corners)
        assert np.linalg.norm(out - corners) <= 2.0 + 1e-6


class TestIntegration:
    def test_charuco_flag_runs_and_stays_close(self):
        from pycamset_tpu.models.charuco import ChArUco
        target = ChArUco(6, 6, 40.0)
        board_im = np.asarray(
            target.board.generateImage((480, 480))).astype(np.uint8)
        im = cv2.GaussianBlur(board_im, (0, 0), 1.0)

        base = target.find_in_image(im)
        target.photometric_refine = True
        refined = target.find_in_image(im)

        assert len(refined.image_points) == len(base.image_points)
        delta = np.linalg.norm(
            np.asarray(refined.image_points) - np.asarray(base.image_points),
            axis=1)
        assert delta.max() < 1.0       # same corners, nudged
        assert delta.mean() > 1e-5     # ...but actually adjusted

    def test_cli_flag_wiring(self):
        import argparse

        from pycamset_tpu.__main__ import _make_target
        ns = argparse.Namespace(
            target="charuco", nx=6, ny=6, square=4.0, adict="DICT_4X4_1000",
            legacy=False, photometric_refine=True)
        t = _make_target(ns)
        assert t.photometric_refine is True

        ns_grid = argparse.Namespace(
            target="grid", nx=4, ny=4, marker_size=30.0, separation=6.0,
            adict="DICT_4X4_1000", first_id=0, photometric_refine=True)
        with pytest.raises(SystemExit):
            _make_target(ns_grid)
