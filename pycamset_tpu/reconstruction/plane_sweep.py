"""Multi-view plane-sweep depth maps in pure JAX.

Beyond-reference capability: the reference prepares data for an EXTERNAL
multi-view stereo pipeline (ACMMP pair/cam export,
``pyCamSet/reconstruction/acmmp_utils.py``) but computes no multi-view
depth itself. This module sweeps fronto-parallel planes through the
reference camera's frustum, scores every (pixel, plane) hypothesis by
ZNCC against homography-warped source views, optionally regularises the
cost volume with the SGM path aggregation from
``reconstruction.dense_stereo``, and extracts a subpixel depth map plus
a world-frame point cloud.

TPU-first notes: homographies are built host-side (tiny) and the whole
sweep jit-compiles to one XLA program — warps are vmapped gathers over
the plane axis, ZNCC windows are ``lax.reduce_window`` box sums, and
the plane axis (ideally a multiple of 8) is the innermost grid of the
(Z, H, W) volume. Planes are swept uniformly in INVERSE depth so a
pixel of disparity error costs constant depth-resolution everywhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pycamset_tpu.models.camera import Camera


def inverse_depth_planes(near: float, far: float, n_planes: int) -> np.ndarray:
    """Depths uniform in inverse depth, near -> far (host numpy)."""
    if not (0 < near < far):
        raise ValueError("need 0 < near < far")
    return 1.0 / np.linspace(1.0 / near, 1.0 / far, n_planes)


def planesweep_homographies(ref_cam: Camera, src_cams: list[Camera],
                            depths: np.ndarray) -> np.ndarray:
    """(S, Z, 3, 3) pixel homographies ref -> src for fronto-parallel
    planes at the given REF-frame depths: H = K_s (R + t n^T / z) K_r^-1
    with [R|t] the ref->src relative pose and n = e_z."""
    k_r_inv = np.linalg.inv(ref_cam.intrinsic)
    out = np.empty((len(src_cams), len(depths), 3, 3))
    for s, cam in enumerate(src_cams):
        rel = cam.extrinsic @ ref_cam.cam_to_world
        r, t = rel[:3, :3], rel[:3, 3]
        for zi, z in enumerate(np.asarray(depths, dtype=float)):
            h = r.copy()
            h[:, 2] += t / z
            out[s, zi] = cam.intrinsic @ h @ k_r_inv
    return out


def bilinear_sample(im: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Bilinear lookup of im (H, W) at float pixel coords.

    :return: (values, in-bounds validity) with invalid values zeroed.
    """
    h, w = im.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(im.dtype)
    fy = (y - y0).astype(im.dtype)
    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    valid = (xi >= 0) & (xi <= w - 2) & (yi >= 0) & (yi <= h - 2)
    xi = jnp.clip(xi, 0, w - 2)
    yi = jnp.clip(yi, 0, h - 2)
    v00 = im[yi, xi]
    v01 = im[yi, xi + 1]
    v10 = im[yi + 1, xi]
    v11 = im[yi + 1, xi + 1]
    val = ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
           + (v10 * (1 - fx) + v11 * fx) * fy)
    return jnp.where(valid, val, 0.0), valid


def _box(x: jnp.ndarray, window: int) -> jnp.ndarray:
    # init value must match the operand dtype exactly (x64 mode would
    # weak-promote a python float to f64)
    return jax.lax.reduce_window(x, x.dtype.type(0), jax.lax.add,
                                 (window, window), (1, 1), "SAME")


def _box_counts(h: int, w: int, window: int) -> np.ndarray:
    """(H, W) SAME-padded box-window pixel counts, computed host-side.

    Equivalent to ``_box(ones((h, w)), window)`` but avoids a slow XLA
    constant-fold of the reduce_window at trace time.
    """
    r = window // 2

    def axis(n):
        i = np.arange(n)
        return np.minimum(i + r, n - 1) - np.maximum(i - r, 0) + 1.0

    return np.outer(axis(h), axis(w))


def _zncc_cost(ref: jnp.ndarray, warped: jnp.ndarray, valid: jnp.ndarray,
               window: int, counts: jnp.ndarray):
    """1 - ZNCC over a (window x window) box; a window is valid only if
    every warped pixel inside it landed in the source frame."""
    eps = 1e-6
    ea = _box(ref, window) / counts
    eb = _box(warped, window) / counts
    eab = _box(ref * warped, window) / counts
    eaa = _box(ref * ref, window) / counts
    ebb = _box(warped * warped, window) / counts
    va = eaa - ea * ea
    vb = ebb - eb * eb
    zncc = (eab - ea * eb) / jnp.sqrt(jnp.maximum(va * vb, eps * eps))
    win_valid = jax.lax.reduce_window(
        valid.astype(ref.dtype), ref.dtype.type(1), jax.lax.min,
        (window, window), (1, 1), "SAME") > 0.5
    return 1.0 - jnp.clip(zncc, -1.0, 1.0), win_valid


@functools.partial(
    jax.jit, static_argnames=("window", "top_k", "regularize", "p1", "p2",
                              "min_sources", "max_cost"))
def _sweep(ref_im, src_ims, homs, depths, *, window: int, top_k: int,
           regularize: bool, p1: float, p2: float, min_sources: int,
           max_cost: float):
    h, w = ref_im.shape
    n_src = src_ims.shape[0]
    u, v = jnp.meshgrid(jnp.arange(w, dtype=ref_im.dtype),
                        jnp.arange(h, dtype=ref_im.dtype))
    ones = jnp.ones_like(u)
    counts = jnp.asarray(_box_counts(h, w, window), ref_im.dtype)

    def plane_cost(hom_s, src):
        """Cost slab (H, W) + validity for ONE (source, plane) pair."""
        xs = hom_s[0, 0] * u + hom_s[0, 1] * v + hom_s[0, 2] * ones
        ys = hom_s[1, 0] * u + hom_s[1, 1] * v + hom_s[1, 2] * ones
        zs = hom_s[2, 0] * u + hom_s[2, 1] * v + hom_s[2, 2] * ones
        zs = jnp.where(jnp.abs(zs) < 1e-9, 1e-9, zs)
        warped, valid = bilinear_sample(src, xs / zs, ys / zs)
        return _zncc_cost(ref_im, warped, valid, window, counts)

    def all_sources(homs_z):
        """(S, H, W) costs + validity for one plane across sources."""
        cs, vs = [], []
        for s in range(n_src):
            c, ok = plane_cost(homs_z[s], src_ims[s])
            cs.append(c)
            vs.append(ok)
        return jnp.stack(cs), jnp.stack(vs)

    # vmap the whole per-plane computation over the Z axis
    costs, valids = jax.vmap(all_sources)(homs.transpose(1, 0, 2, 3))
    # (Z, S, H, W) -> aggregate over sources: mean of the top_k cheapest
    # VALID sources (robust to per-view occlusion). Invalid windows take
    # the maximum possible ZNCC cost (2.0) so they can never pass the
    # max_cost acceptance test via the sentinel itself.
    costs = jnp.where(valids, costs, jnp.float32(2.0))
    k = min(top_k, n_src)
    cheap = -jax.lax.top_k(-costs.transpose(0, 2, 3, 1), k)[0]  # (Z,H,W,k)
    vol = cheap.mean(axis=-1)                                   # (Z, H, W)
    n_valid = valids.sum(axis=1)                                # (Z, H, W)

    if regularize:
        from pycamset_tpu.reconstruction.dense_stereo import aggregate_volume
        vol = aggregate_volume(vol.transpose(1, 2, 0), p1, p2,
                               8).transpose(2, 0, 1) / 8.0

    zbest = jnp.argmin(vol, axis=0).astype(jnp.int32)           # (H, W)
    zm = jnp.clip(zbest - 1, 0, vol.shape[0] - 1)
    zp = jnp.clip(zbest + 1, 0, vol.shape[0] - 1)
    take = lambda idx: jnp.take_along_axis(vol, idx[None], axis=0)[0]
    cmin, cm, cp = take(zbest), take(zm), take(zp)
    denom = cm - 2.0 * cmin + cp
    delta = jnp.where(denom > 1e-9, 0.5 * (cm - cp)
                      / jnp.maximum(denom, 1e-9), 0.0)
    interior = (zbest > 0) & (zbest < vol.shape[0] - 1)
    delta = jnp.where(interior, jnp.clip(delta, -0.5, 0.5), 0.0)

    # interpolate depth in INVERSE depth between neighbouring planes
    inv_d = 1.0 / depths
    iv0 = inv_d[zbest]
    iv_n = jnp.where(delta >= 0, inv_d[zp], inv_d[zm])
    inv_best = iv0 + jnp.abs(delta) * (iv_n - iv0)
    depth = 1.0 / inv_best

    nv_best = jnp.take_along_axis(n_valid, zbest[None], axis=0)[0]
    ok = (cmin <= max_cost) & (nv_best >= min_sources)
    depth = jnp.where(ok, depth, jnp.float32(jnp.nan))
    return depth, cmin


def plane_sweep_depth(ref_cam: Camera, src_cams: list[Camera], ref_im,
                      src_ims, depths=None, near: float = None,
                      far: float = None, n_planes: int = 64,
                      window: int = 7, top_k: int = None,
                      regularize: bool = False, p1: float = 0.02,
                      p2: float = 0.2, min_sources: int = 1,
                      max_cost: float = 0.8):
    """Dense REF-frame depth from N undistorted views by plane sweep.

    :param depths: explicit plane depths (ref-frame z); or pass
        near/far (+ n_planes) for an inverse-depth sweep.
    :param top_k: aggregate the k cheapest per-pixel source costs
        (defaults to all sources; lower it for occlusion robustness).
    :param regularize: smooth the cost volume with the 8-path SGM
        aggregation along the plane axis (p1/p2 in ZNCC cost units).
    :param max_cost: 1 - ZNCC acceptance threshold (0.8 ~ ZNCC 0.2).
    :return: (depth (H, W) float32 with NaN invalid, photometric cost).

    Images must be single-channel and undistorted (``undistort_im``);
    the sweep scores fronto-parallel planes of the REFERENCE camera.
    """
    if depths is None:
        if near is None or far is None:
            raise ValueError("pass depths= or near=/far=")
        depths = inverse_depth_planes(near, far, n_planes)
    depths = np.asarray(depths, dtype=np.float32)
    if depths.ndim != 1 or depths.size < 2:
        raise ValueError("need at least two plane depths")

    def prep(im):
        im = np.asarray(im)
        if im.ndim == 3:
            im = im.mean(axis=2)
        return jnp.asarray(im, jnp.float32)

    homs = planesweep_homographies(ref_cam, src_cams, depths)
    depth, cost = _sweep(
        prep(ref_im), jnp.stack([prep(im) for im in src_ims]),
        jnp.asarray(homs, jnp.float32), jnp.asarray(depths),
        window=window, top_k=len(src_cams) if top_k is None else top_k,
        regularize=regularize, p1=p1, p2=p2, min_sources=min_sources,
        max_cost=max_cost)
    return np.asarray(jax.device_get(depth)), np.asarray(
        jax.device_get(cost))


def depth_to_cloud(ref_cam: Camera, depth: np.ndarray, colors=None):
    """Back-project a ref-frame depth map to a world-frame point cloud.

    :return: (points (n, 3), colors (n,) or None) — NaN depths dropped.
    """
    h, w = depth.shape
    u, v = np.meshgrid(np.arange(w, dtype=float), np.arange(h, dtype=float))
    keep = np.isfinite(depth).ravel()
    pix = np.stack([u.ravel(), v.ravel(), np.ones(h * w)], axis=0)
    rays = np.linalg.inv(ref_cam.intrinsic) @ pix            # (3, N)
    pts_cam = rays * depth.ravel()[None, :]
    pts_w = (ref_cam.cam_to_world[:3, :3] @ pts_cam
             + ref_cam.cam_to_world[:3, 3:4]).T[keep]
    if colors is not None:
        return pts_w, np.asarray(colors).reshape(h * w, -1)[keep].squeeze()
    return pts_w, None
