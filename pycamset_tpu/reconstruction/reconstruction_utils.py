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
from functools import reduce

import cv2
import numpy as np

from pycamset_tpu.models.camera import Camera


def _as_cloud(points: np.ndarray, scalars=None):
    try:
        import pyvista as pv
        cloud = pv.PolyData(points)
        if scalars is not None:
            cloud["i"] = scalars
        return cloud
    except Exception:
        return points


def undistort_im(image, cam: Camera) -> np.ndarray:
    """Undistort an image with a camera model (keeps the intrinsic)."""
    return cv2.undistort(image, cam.intrinsic,
                         np.asarray(cam.distortion_coefs, dtype=float),
                         None, cam.intrinsic)


def depth_image_ptcloud_mask(depth_im, mind, maxd) -> np.ndarray:
    """Validity mask for a reprojected cloud: finite and inside [mind, maxd]."""
    t_nan = np.any(np.isnan(depth_im), axis=-1)
    t_inf = np.any(np.isinf(depth_im), axis=-1)
    t_hgh = depth_im[:, -1] > maxd
    t_low = depth_im[:, -1] < mind
    return ~reduce(np.logical_or, [t_nan, t_inf, t_hgh, t_low])


def remap_im(im, cam: Camera, new_rot, new_proj, new_size) -> np.ndarray:
    """Remap an image onto a rectified projection."""
    maps = cv2.initUndistortRectifyMap(
        cam.intrinsic, np.asarray(cam.distortion_coefs, dtype=float),
        new_rot, new_proj, tuple(new_size), cv2.CV_32FC1)
    return cv2.remap(im, *maps, cv2.INTER_CUBIC)


def rectify_camera_pair(cam_0: Camera, cam_1: Camera, zero_flag: bool = False):
    """Rectification matrices for a camera pair (cv2.stereoRectify).

    :return: (p0, p1, q, r0, r1, roi0)
    """
    rot_t = cam_1.extrinsic @ cam_0.cam_to_world
    rot = np.ascontiguousarray(rot_t[:3, :3])
    trans = np.ascontiguousarray(rot_t[:3, 3]).reshape(3, 1)
    d0 = np.zeros(5) if zero_flag else np.asarray(cam_0.distortion_coefs, dtype=float)
    d1 = np.zeros(5) if zero_flag else np.asarray(cam_1.distortion_coefs, dtype=float)
    r0, r1, p0, p1, q, s0, s1 = cv2.stereoRectify(
        cam_0.intrinsic, d0, cam_1.intrinsic, d1, tuple(cam_0.res),
        rot, trans, flags=cv2.CALIB_ZERO_DISPARITY, alpha=1,
        newImageSize=tuple(cam_0.res))
    return p0, p1, q, r0, r1, s0


def rectify_camera_images(cam_0: Camera, cam_1: Camera, im_0, im_1):
    """Rectify a stereo pair of images.

    :return: (rectified im_0, rectified im_1, q reprojection matrix)
    """
    zero_flag = True
    p0, p1, q, r0, r1, _ = rectify_camera_pair(cam_0, cam_1, zero_flag=zero_flag)
    new_im0 = remap_im(undistort_im(im_0, cam_0) if zero_flag else im_0,
                       cam_0, r0, p0, cam_0.res)
    new_im1 = remap_im(undistort_im(im_1, cam_1) if zero_flag else im_1,
                       cam_1, r1, p1, cam_1.res)
    return new_im0, new_im1, q


def disparity_to_ptcld(disp, q, mind: float = 0.5, maxd: float = 2.5):
    """Disparity image + q matrix -> depth-masked point cloud.

    :return: (cloud, mask)
    """
    pts = cv2.reprojectImageTo3D((disp / 16).astype("float32"), q)
    flat = np.reshape(pts, (-1, 3))
    mask = depth_image_ptcloud_mask(flat, mind, maxd)
    return _as_cloud(flat[mask]), mask


def matlab_stereo(im0, im1, disp_range=(128, 256), uniqueness_thresh=25,
                  plot=False):
    """MATLAB disparitySGM, if a matlab engine is installed."""
    try:
        from matlab.engine import start_matlab
    except ImportError as e:
        logging.info("matlab engine not installed")
        raise e
    m = start_matlab()
    disp = np.array(m.disparitySGM(
        im0, im1, "DisparityRange", np.array(disp_range).astype("int32"),
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
                       mind: float = 0.0, maxd: float = 2.0):
    """Dense stereo point cloud via rectify -> block matching -> reproject."""
    r0, r1, q = rectify_camera_images(cam_0, cam_1, im_0, im_1)
    if matlab:
        disp = matlab_stereo(r0, r1, disp_range=(num_disp - 128, num_disp),
                             plot=plot)
    else:
        stereo = cv2.StereoBM_create(numDisparities=num_disp,
                                     blockSize=blockSize)
        disp = stereo.compute(r0.astype(np.uint8), r1.astype(np.uint8)) / 16
        if plot:
            from matplotlib import pyplot as plt
            plt.imshow(disp)
            plt.show()

    pts = cv2.reprojectImageTo3D(disp.astype("float32"), q)
    flat = np.reshape(pts, (-1, 3))
    mask = depth_image_ptcloud_mask(flat, mind, maxd)
    cloud = _as_cloud(flat[mask], scalars=np.asarray(r0).flatten()[mask])
    if plot and not isinstance(cloud, np.ndarray):
        import pyvista as pv
        pv.set_plot_theme("Document")
        cloud.plot(cmap="gray", point_size=0.75)
    return cloud
