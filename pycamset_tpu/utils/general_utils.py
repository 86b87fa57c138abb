"""Host-side general utilities (numpy / file discovery / diagnostics).

Capability parity targets (reference, behaviour only):
pyCamSet/utils/general_utils.py — h_tform, make_4x4h_tform, ext_4x4_to_rod,
plane_fit, average_tforms, mad_outlier_detection, benchmark, glob_ims,
get_subfolder_names, split_aruco_dictionary, sensor_map and friends.

These run on the host around the device compute path, so they are plain numpy.
natsort is not available in this environment, so a minimal natural-sort key is
implemented locally.
"""
from __future__ import annotations

import logging
import math
import re
import time
from pathlib import Path

import cv2
import numpy as np

IM_SUFFIXES = {".png", ".bmp", ".tiff", ".jpg", ".jpeg"}


def natsort_key(s):
    """Natural-sort key: splits digit runs so 'im2' < 'im10'."""
    return [int(t) if t.isdigit() else t.lower()
            for t in re.split(r"(\d+)", str(s))]


def natsorted(seq):
    return sorted(seq, key=natsort_key)


def default_thread_count() -> int:
    """Host thread-pool size for the OpenCV frontend (detection, PnP).

    Mirrors the reference's heuristic (camera_calibrator.py:57-58):
    min(max(1, cpu_count - 2), 20). OpenCV releases the GIL inside its C++
    calls, so Python threads give real parallelism here.
    """
    import os
    return min(max(1, (os.cpu_count() or 2) - 2), 20)


def thread_map(fn, items, n_threads: int | None = None) -> list:
    """Order-preserving parallel map over a host thread pool.

    Serial when n_threads == 1 or there is a single item (keeps tracebacks
    simple and avoids pool overhead on tiny workloads).
    """
    items = list(items)
    if n_threads is None:
        n_threads = default_thread_count()
    n_threads = min(n_threads, len(items)) if items else 1
    if n_threads <= 1:
        return [fn(it) for it in items]
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=n_threads) as ex:
        return list(ex.map(fn, items))


def glob_ims(loc: Path) -> list[Path]:
    """All images at any depth below the input path."""
    return [p.resolve() for p in Path(loc).glob("**/*") if p.suffix.lower() in IM_SUFFIXES]


def glob_ims_local(loc: Path) -> list[Path]:
    """All images directly in this folder."""
    return [p.resolve() for p in Path(loc).glob("*") if p.suffix.lower() in IM_SUFFIXES]


def get_subfolder_names(f_loc: Path, return_full_path: bool = False):
    """Natural-sorted subfolders of a directory (usually the camera names)."""
    subs = natsorted([p for p in Path(f_loc).glob("*/") if p.is_dir()])
    if return_full_path:
        return subs
    return [p.parts[-1] for p in subs]


def _convert_nested(d, from_type, converter):
    """In-place recursive conversion of from_type values in a nested dict."""
    if isinstance(d, dict):
        for k, v in d.items():
            if isinstance(v, dict):
                _convert_nested(v, from_type, converter)
            elif isinstance(v, from_type):
                d[k] = converter(v)
    return d


def list_dict_to_np_array(d):
    """Recursively convert lists in a nested dict to numpy arrays (in place)."""
    return _convert_nested(d, list, np.array)


def numpy_dict_to_list(d):
    """Recursively convert numpy arrays in a nested dict to lists (in place)."""
    return _convert_nested(d, np.ndarray, lambda a: a.tolist())


# ---------------------------------------------------------------- geometry

def h_tform(points: np.ndarray, transform: np.ndarray, fill: float = 1) -> np.ndarray:
    """Homogeneous transform of an (n,3) point array.

    With fill=1, the result is dehomogenised by its last component and that
    component is dropped: a (4,4) rigid transform returns (n,3) points, a
    (3,4) projective matrix returns (n,2) pixels. fill=0 transforms direction
    vectors (no translation, no divide).
    """
    points = np.asarray(points, dtype=float)
    squeeze = points.ndim == 1
    if squeeze:
        points = points[None, ...]
    res = points @ transform[:, :3].T + fill * transform[:, 3]
    if fill == 1:
        res = res[:, :-1] / res[:, -1:]
    else:
        res = res[:, :-1] if transform.shape[0] == 4 else res
    return res.squeeze() if squeeze else res


def make_4x4h_tform(rvec, trans, mode: str = "opencv") -> np.ndarray:
    """Rodrigues rotation (or 3x3 matrix) + translation -> 4x4 transform.

    mode='opencv' gives [R|t]; mode='mvg' gives [R|-R t].
    """
    rvec = np.asarray(rvec, dtype=float).squeeze()
    trans = np.asarray(trans, dtype=float).squeeze()
    if rvec.ndim < 2:
        rot, _ = cv2.Rodrigues(rvec)
    else:
        rot = rvec
    if mode == "mvg":
        t = -(rot @ trans)
    elif mode == "opencv":
        t = trans
    else:
        raise ValueError(f"{mode} is an invalid 4x4 type")
    out = np.eye(4)
    out[:3, :3] = rot
    out[:3, 3] = t
    return out


def ext_4x4_to_rod(h4: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """4x4 (or 3x4) transform -> (rvec, tvec)."""
    rot, _ = cv2.Rodrigues(np.asarray(h4, dtype=float)[:3, :3])
    return rot.squeeze(), np.asarray(h4)[:3, 3]


def flatten_pose_list(pose_list) -> np.ndarray:
    """Flatten a list of 4x4 poses to a single [rvec,t,rvec,t,...] vector."""
    return np.concatenate(
        [part for pose in pose_list for part in ext_4x4_to_rod(pose)])


def plane_fit(points: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Fit a plane to (d, n) points; returns (centroid, unit normal)."""
    points = np.reshape(points, (np.shape(points)[0], -1))
    centroid = points.mean(axis=1)
    spread = points - centroid[:, None]
    # the normal is the least-significant principal axis of the scatter
    return centroid, np.linalg.svd(spread @ spread.T)[0][:, -1]


def approx_average_quaternion(quats) -> np.ndarray:
    """Eigenvector-based average of unit quaternions (Markley's method)."""
    q = np.array([qq for qq in quats if not np.any(np.isnan(qq))])
    w = np.ones(len(q)) / len(q)
    return np.linalg.eigh(np.einsum("ij,ik,i->jk", q, q, w))[1][:, -1]


def average_tforms(tforms: list[np.ndarray]) -> np.ndarray:
    """Average a list of 4x4 rigid transforms (quaternion mean + mean trans)."""
    from scipy.spatial.transform import Rotation as R
    finite = [t for t in tforms if np.all(np.isfinite(t))]
    if not finite:
        return np.full((4, 4), np.nan)
    if len(finite) == 1:
        return finite[0]
    mean_quat = approx_average_quaternion(
        [R.from_matrix(t[:3, :3]).as_quat(canonical=True) for t in finite])
    mean = np.eye(4)
    mean[:3, :3] = R.from_quat(mean_quat).as_matrix()
    mean[:3, 3] = np.mean([t[:3, -1] for t in finite], axis=0)
    return mean


def get_close_square_tuple(n) -> tuple[int, int]:
    x = math.ceil(math.sqrt(n))
    return (x, math.ceil(n / x))


def grouper(iterable, n, fillvalue=None):
    """Iterate n items at a time (last group padded with fillvalue)."""
    from itertools import zip_longest
    # n references to ONE iterator: zip_longest pulls n consecutive items
    return zip_longest(*([iter(iterable)] * n), fillvalue=fillvalue)


def colourmap_to_colour_list(length, colourmap):
    """Sample a matplotlib colormap into a list of RGB uint8 triples."""
    pts = np.linspace(0, 1, length)
    return [np.array(colourmap(pt, bytes=True))[:3] for pt in pts]


# ------------------------------------------------------------- diagnostics

def mad_outlier_detection(data, out_thresh: float = 3, draw: bool = True):
    """Median-absolute-deviation outlier detection.

    Returns the outlier indices (as from np.nonzero) or None if there are none.
    """
    data = np.asarray(data, dtype=float)
    centre = np.median(data)
    mad = np.median(np.abs(data - centre))
    if mad == 0:
        return None
    deviation = np.abs(data - centre) / mad
    if not np.any(deviation > out_thresh):
        return None

    flagged = np.nonzero(deviation > out_thresh)
    logging.critical("found outliers in indicies:"
                     + "".join(f" {idx}" for idx in flagged))
    logging.critical("These may prevent calibration conversion")
    if draw:
        from matplotlib import pyplot as plt
        _fig, ax = plt.subplots(1, 1)
        ax.plot(deviation, ".")
        ax.set_title("Found outliers: displaying mad outlier threshold as red line")
        ax.axhline(out_thresh, color="r")
        plt.show()
    return flagged


def benchmark(func, repeats: int = 100, mode: str = "ms",
              timer=time.perf_counter_ns, max_runtime: float = 100):
    """Time a callable; prints mean/median/stdev and a terminal histogram."""
    ns_to = {"us": 1e-3, "ms": 1e-6, "s": 1e-9}
    times = []
    budget_end = timer() + max_runtime / ns_to["s"]
    for _ in range(repeats):
        t0 = timer()
        func()
        t1 = timer()
        times.append(t1 - t0)
        if t1 > budget_end:
            print(f"Exceeded given max_runtime of {max_runtime} seconds.")
            break
    times = np.array(times, dtype=float) * ns_to[mode]
    mean, stdev, median = np.mean(times), np.std(times), np.median(times)
    print(f"Mean: {mean:.2f} {mode}, median: {median:.2f} {mode}, stdev: {stdev:.2f} {mode}")
    # terminal histogram (uniplot is unavailable; ascii fallback)
    lo = max(mean - 3 * stdev, times.min())
    hi = min(mean + 5 * stdev, times.max()) or 1.0
    if hi > lo:
        hist, edges = np.histogram(times, bins=20, range=(lo, hi))
        top = hist.max() or 1
        for h, e in zip(hist, edges):
            print(f"{e:10.3f} {mode} | {'#' * int(40 * h / top)}")
    return {"mean": mean, "median": median, "stdev": stdev, "unit": mode,
            "times": times}


# ----------------------------------------------------------- detection utils

def split_aruco_dictionary(split_size: int, a_dict=None):
    """Split one aruco dictionary into disjoint sub-dictionaries of split_size."""
    from cv2 import aruco
    if a_dict is None:
        a_dict = aruco.DICT_6X6_250
    base = (aruco.getPredefinedDictionary(a_dict)
            if isinstance(a_dict, int) else a_dict)
    codes = base.bytesList

    def carve(lo):
        piece = aruco.Dictionary(0, base.markerSize)
        piece.bytesList = np.array(codes[lo:lo + split_size])
        return piece

    return [carve(lo) for lo in
            range(0, (len(codes) // split_size) * split_size, split_size)]


def downsample_valid(inp: np.ndarray, d_factor: int, invalid=None) -> np.ndarray:
    """Averaging downsample by an integer factor (crops the remainder)."""
    if d_factor == 1:
        return inp
    shape = np.array(inp.shape)
    up_to = shape - shape % d_factor
    im = inp[: up_to[0], : up_to[1]]
    return np.mean(
        im.reshape(im.shape[0] // d_factor, d_factor,
                   im.shape[1] // d_factor, d_factor), axis=(1, 3))


# --------------------------------------------------------------- sensor maps

def distort_points(pts: np.ndarray, intrinsics: np.ndarray,
                   dist_coef: np.ndarray) -> np.ndarray:
    """Distort pixel points (host-side numpy): Brown–Conrady, or the
    fisheye (Kannala-Brandt) model when the vector is 4 wide."""
    centre = intrinsics[:2, -1]
    focal = np.diag(intrinsics)[:2]
    x, y = (np.asarray(pts, dtype=float) - centre) / focal
    r2 = x ** 2 + y ** 2
    d = np.reshape(dist_coef, (-1,))
    if d.size == 4:
        r = np.sqrt(r2 + 1e-18)
        theta = np.arctan(r)
        t2 = theta * theta
        theta_d = theta * (1 + t2 * (d[0] + t2 * (d[1] + t2 * (d[2]
                                                               + t2 * d[3]))))
        return np.array([x, y]) * (theta_d / r) * focal + centre
    k1, k2, p1, p2, k3 = d[:5]
    radial = 1 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
    if d.size >= 8:  # rational model: radial becomes a polynomial ratio
        radial = radial / (1 + d[5] * r2 + d[6] * r2 ** 2 + d[7] * r2 ** 3)
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x ** 2)
    yd = y * radial + p1 * (r2 + 2 * y ** 2) + 2 * p2 * x * y
    if d.size >= 12:  # thin-prism terms
        xd = xd + r2 * (d[8] + r2 * d[9])
        yd = yd + r2 * (d[10] + r2 * d[11])
    return np.array([xd, yd]) * focal + centre


def px_array(res=(32, 32), startZero: bool = False):
    """Index grid helper for sensor-map construction."""
    if startZero:
        xs, ys = np.arange(res[0]), np.arange(res[1])
    else:
        # centred grids: x runs high-to-low, y low-to-high, both length res
        first_x = res[0] // 2
        xs = np.arange(first_x, first_x - res[0], -1)
        first_y = -((res[1] + 1) // 2)
        ys = np.arange(first_y, first_y + res[1])
    y, x = np.meshgrid(ys, xs)
    return x, y, np.ones(tuple(res))


def vector_cam_points(map_type, pts, intrinsics, cam_to_world):
    """Back-project pixel points to world-frame ray directions."""
    if map_type not in ("normalised", "linear"):
        raise ValueError("Invalid sensor map type")
    px = np.asarray(pts, dtype=float)
    homog = np.hstack([px, np.ones((len(px), 1))])
    rays = homog @ np.linalg.inv(intrinsics).T
    if map_type == "normalised":
        rays = rays / np.linalg.norm(rays, axis=-1, keepdims=True)
    return h_tform(rays, cam_to_world, fill=0)


def sensor_map(map_type, intrinsics, res=(1600, 1200), dist_coefs=None):
    """Per-pixel ray directions for a camera (precomputed ray cast)."""
    if map_type not in ("normalised", "linear"):
        raise ValueError("Invalid sensor map type")
    u, v, _ = px_array(res=res, startZero=True)
    px = np.stack([u.ravel(), v.ravel()], axis=1).astype(float)
    if dist_coefs is not None:
        kmat = np.asarray(intrinsics, dtype=float)
        dist = np.ravel(np.asarray(dist_coefs, dtype=float))
        if dist.size == 4:  # the fisheye marker width
            norm = cv2.fisheye.undistortPoints(
                px.reshape(1, -1, 2), kmat, dist).reshape(-1, 2)
            px = norm * np.diag(kmat)[:2] + kmat[:2, 2]
        else:
            px = cv2.undistortImagePoints(px, kmat, dist).reshape(-1, 2)
    homog = np.hstack([px, np.ones((len(px), 1))])
    rays = (homog @ np.linalg.inv(intrinsics).T).reshape(res[0], res[1], 3)
    if map_type == "normalised":
        rays = rays / np.linalg.norm(rays, axis=-1, keepdims=True)
    return rays


def adaptive_decimated_charuco_detection_stereo(
        frame, charuco_board, aruco_dict=None,
        rescale_corners_to_original: bool = True, max_decimation: int = 12):
    """Sweep decimation factors and keep the one detecting the most corners.

    Useful for very high resolution images where full-res detection fails.
    (Implemented with the CharucoDetector API; the legacy detectMarkers /
    interpolateCornersCharuco functions were removed in OpenCV 5.)

    :return: (corners (n,2) or None, ids (n,) or None, optimal_decimation)
    """
    from cv2 import aruco
    detector = aruco.CharucoDetector(charuco_board)
    best = (None, None, 1)
    max_corners = 0
    for d in range(1, max_decimation):
        dec = frame[::d, ::d]
        c_corners, c_ids, _, _ = detector.detectBoard(np.ascontiguousarray(dec))
        if c_corners is not None and len(c_corners) > max_corners:
            max_corners = len(c_corners)
            best = (np.asarray(c_corners).reshape(-1, 2),
                    np.asarray(c_ids).reshape(-1), d)
    corners, ids, d = best
    if corners is not None and rescale_corners_to_original:
        corners = corners * d
    return corners, ids, d


def write_colour_ply(f_name, verts, cols):
    """Write an ascii colour point cloud."""
    header = "\n".join([
        "ply", "format ascii 1.0", f"element vertex {len(verts)}",
        "property float x", "property float y", "property float z",
        "property uchar red", "property uchar green", "property uchar blue",
        "end_header", ""])
    rows = "".join(
        f"{v[0]:.8f} {v[1]:.8f} {v[2]:.8f} {c[0]} {c[1]} {c[2]} \n"
        for v, c in zip(verts, cols))
    Path(f_name).write_text(header + rows)


def write_mesh_ply(f_name, verts, faces):
    """Write an ascii triangle mesh."""
    header = "\n".join([
        "ply", "format ascii 1.0", f"element vertex {len(verts)}",
        "property float x", "property float y", "property float z",
        f"element face {len(faces)}",
        "property list uchar int vertex_indices", "end_header", ""])
    vrows = "".join(f"{v[0]:.8f} {v[1]:.8f} {v[2]:.8f}\n" for v in verts)
    frows = "".join(f"3 {f[0]} {f[1]} {f[2]}\n" for f in faces)
    Path(f_name).write_text(header + vrows + frows)
