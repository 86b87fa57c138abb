"""Stereo rectification and dense reconstruction helpers (host OpenCV).

Capability parity target (reference, behaviour only):
pyCamSet/reconstruction/reconstruction_utils.py — cv2.stereoRectify wrappers
over Camera objects, image remapping, StereoBM reconstruction, disparity ->
point cloud with depth masking.

Point clouds are returned as (n,3) numpy arrays (wrapped in pyvista PolyData
when pyvista is available).
"""
from __future__ import annotations

import logging
import cv2
import numpy as np

from pycamset_tpu.models.camera import Camera


def _as_cloud(points: np.ndarray, scalars=None):
    try:
        from pycamset_tpu.utils.optional import import_pyvista
        pv = import_pyvista()
        cloud = pv.PolyData(points)
        if scalars is not None:
            cloud["i"] = scalars
        return cloud
    except Exception:
        return points


def undistort_im(image, cam: Camera) -> np.ndarray:
    """Undistort an image with a camera model (keeps the intrinsic).

    A 4-wide distortion vector marks the fisheye (Kannala-Brandt) model
    and routes through cv2.fisheye."""
    dist = np.ravel(np.asarray(cam.distortion_coefs, dtype=float))
    if dist.size == 4:
        return cv2.fisheye.undistortImage(image, cam.intrinsic, dist,
                                          Knew=cam.intrinsic)
    return cv2.undistort(image, cam.intrinsic, dist, None, cam.intrinsic)


def depth_image_ptcloud_mask(depth_im, mind, maxd) -> np.ndarray:
    """Validity mask for a reprojected cloud: finite and inside [mind, maxd]."""
    z = depth_im[:, -1]
    finite = np.all(np.isfinite(depth_im), axis=-1)
    return finite & (z >= mind) & (z <= maxd)


def remap_im(im, cam: Camera, new_rot, new_proj, new_size) -> np.ndarray:
    """Remap an image onto a rectified projection.

    Fisheye cameras (4-wide distortion) reach this only pre-undistorted
    (rectify_camera_images), so the Brown map must not misread the 4-wide
    vector; zero coefficients are used in that case."""
    dist = np.ravel(np.asarray(cam.distortion_coefs, dtype=float))
    if dist.size == 4:
        dist = np.zeros(5)
    maps = cv2.initUndistortRectifyMap(
        cam.intrinsic, dist, new_rot, new_proj, tuple(new_size),
        cv2.CV_32FC1)
    return cv2.remap(im, *maps, cv2.INTER_CUBIC)


def rectify_camera_pair(cam_0: Camera, cam_1: Camera, zero_flag: bool = False):
    """Rectification matrices for a camera pair (cv2.stereoRectify).

    :return: (p0, p1, q, r0, r1, roi0)
    """
    cam0_to_cam1 = cam_1.extrinsic @ cam_0.cam_to_world
    rel_rot = np.ascontiguousarray(cam0_to_cam1[:3, :3])
    rel_t = np.ascontiguousarray(cam0_to_cam1[:3, 3]).reshape(3, 1)
    if np.linalg.norm(rel_t) < 1e-12:
        # cv2.stereoRectify asserts (nt > 0) with an opaque message here
        raise ValueError(
            "cameras are co-located (zero baseline) — stereo rectification "
            "needs two distinct viewpoints")

    def dist_of(cam):
        dist = np.ravel(np.asarray(cam.distortion_coefs, dtype=float))
        if dist.size == 4 and not zero_flag:
            raise ValueError(
                "fisheye cameras rectify via the pre-undistorted pipeline "
                "only — call rectify_camera_images (which undistorts "
                "through cv2.fisheye first), not rectify_camera_pair on "
                "raw images")
        if zero_flag or dist.size == 4:
            return np.zeros(5)
        return dist

    size = tuple(cam_0.res)
    r0, r1, p0, p1, q, roi0, _roi1 = cv2.stereoRectify(
        cam_0.intrinsic, dist_of(cam_0), cam_1.intrinsic, dist_of(cam_1),
        size, rel_rot, rel_t, flags=cv2.CALIB_ZERO_DISPARITY, alpha=1,
        newImageSize=size)
    return p0, p1, q, r0, r1, roi0


def rectify_camera_images(cam_0: Camera, cam_1: Camera, im_0, im_1):
    """Rectify a stereo pair of images.

    :return: (rectified im_0, rectified im_1, q reprojection matrix)
    """
    # undistort first, then rectify with zeroed coefficients: one resample
    # path for arbitrary distortion models
    p0, p1, q, r0, r1, _ = rectify_camera_pair(cam_0, cam_1, zero_flag=True)
    rect0 = remap_im(undistort_im(im_0, cam_0), cam_0, r0, p0, cam_0.res)
    rect1 = remap_im(undistort_im(im_1, cam_1), cam_1, r1, p1, cam_1.res)
    return rect0, rect1, q


def disparity_to_ptcld(disp, q, mind: float = 0.5, maxd: float = 2.5):
    """Disparity image + q matrix -> depth-masked point cloud.

    :return: (cloud, mask)
    """
    xyz = cv2.reprojectImageTo3D((disp / 16).astype("float32"), q)
    xyz = xyz.reshape(-1, 3)
    keep = depth_image_ptcloud_mask(xyz, mind, maxd)
    return _as_cloud(xyz[keep]), keep


def matlab_stereo(im0, im1, disp_range=(128, 256), uniqueness_thresh=25,
                  plot=False):
    """MATLAB disparitySGM, if a matlab engine is installed."""
    try:
        from matlab.engine import start_matlab
    except ImportError:
        logging.info("matlab engine not installed")
        raise
    engine = start_matlab()
    disp = np.asarray(engine.disparitySGM(
        im0, im1, "DisparityRange", np.asarray(disp_range, dtype="int32"),
        "UniquenessThreshold", uniqueness_thresh)) - 1
    if plot:
        from matplotlib import pyplot as plt
        plt.imshow(disp)
        plt.colorbar()
        plt.show()
    return disp


def stereo_reconstruct(cam_0: Camera, cam_1: Camera, im_0, im_1,
                       num_disp: int = 256, blockSize: int = 25,
                       matlab: bool = False, plot: bool = False,
                       mind: float = 0.0, maxd: float = 2.0,
                       matcher: str = "bm", return_scalars: bool = False,
                       **matcher_options):
    """Dense stereo point cloud via rectify -> dense matching -> reproject.

    :param matcher: "bm" (cv2.StereoBM, the reference's default), "sgm"
        (the on-device census SGM matcher — ``dense_stereo.sgm_disparity``,
        extra keyword options forwarded), or "matlab" (parity with the
        reference's gated disparitySGM path; ``matlab=True`` still selects
        it for signature compatibility).
    :param return_scalars: return ``(points (n, 3), gray (n,))`` numpy
        arrays instead of the cloud wrapper (the CLI's PLY path).
    """
    if matlab:
        matcher = "matlab"
    if matcher not in ("bm", "sgm", "matlab"):
        raise ValueError(f"unknown matcher {matcher!r} "
                         "(expected 'bm', 'sgm' or 'matlab')")
    rect0, rect1, q = rectify_camera_images(cam_0, cam_1, im_0, im_1)
    # dense matchers want single-channel input
    if np.asarray(rect0).ndim == 3:
        rect0 = cv2.cvtColor(rect0, cv2.COLOR_BGR2GRAY)
    if np.asarray(rect1).ndim == 3:
        rect1 = cv2.cvtColor(rect1, cv2.COLOR_BGR2GRAY)
    if matcher == "matlab":
        disp = matlab_stereo(rect0, rect1,
                             disp_range=(num_disp - 128, num_disp), plot=plot)
    elif matcher == "sgm":
        from pycamset_tpu.reconstruction.dense_stereo import sgm_disparity
        disp = sgm_disparity(rect0, rect1, max_disp=num_disp,
                             **matcher_options)
        if plot:
            from matplotlib import pyplot as plt
            plt.imshow(disp)
            plt.show()
    elif matcher == "bm":
        bm = cv2.StereoBM_create(numDisparities=num_disp,
                                 blockSize=blockSize)
        disp = bm.compute(rect0.astype(np.uint8),
                          rect1.astype(np.uint8)) / 16
        if plot:
            from matplotlib import pyplot as plt
            plt.imshow(disp)
            plt.show()

    xyz = cv2.reprojectImageTo3D(disp.astype("float32"), q).reshape(-1, 3)
    keep = depth_image_ptcloud_mask(xyz, mind, maxd)
    if return_scalars:
        return xyz[keep], np.asarray(rect0).ravel()[keep]
    cloud = _as_cloud(xyz[keep], scalars=np.asarray(rect0).ravel()[keep])
    if plot and not isinstance(cloud, np.ndarray):
        from pycamset_tpu.utils.optional import import_pyvista
        pv = import_pyvista()
        pv.set_plot_theme("Document")
        cloud.plot(cmap="gray", point_size=0.75)
    return cloud
