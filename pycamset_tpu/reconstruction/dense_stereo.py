"""TPU-native dense stereo: census-cost semi-global matching in pure JAX.

Capability parity target (reference, behaviour only):
``pyCamSet/reconstruction/reconstruction_utils.py:113-158`` — the
reference delegates dense matching to ``cv2.StereoBM`` or, when a MATLAB
engine happens to be installed, ``disparitySGM``. This module replaces
the external dependency with an on-device matcher that jit-compiles to a
single XLA program:

- census transform (5x5 default, bits packed into one uint32 word) and
  Hamming matching costs via ``lax.population_count``;
- 8-path semi-global aggregation expressed as ``lax.scan`` dynamic
  programming: horizontal paths scan the width axis with an (H, D)
  carry, vertical and diagonal paths scan the height axis with a (W, D)
  carry (diagonals roll the carry one column per row and restart the
  wrapped column);
- winner-take-all with parabolic subpixel refinement, a uniqueness
  ratio test, left-right consistency from the SAME aggregated volume
  (cost_R[y, x, d] = cost_L[y, x + d, d]) and a 3x3 median.

TPU-first layout notes: the volume is kept (H, W, D) so the disparity
axis rides the 128-wide lane dimension (pick ``max_disp`` a multiple of
128 for large problems); every shape is static and the scans carry 2-D
slabs, so Mosaic/XLA pipeline them without host round trips. Invalid
pixels come back as NaN, which flows through
``depth_image_ptcloud_mask`` / ``cv2.reprojectImageTo3D`` as non-finite
points and is dropped by the existing cloud masking.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BIG = np.float32(1e9)


def census_transform(im: jnp.ndarray, window: int = 5) -> jnp.ndarray:
    """Census bit words per pixel (uint32; window in {3, 5} -> 8/24 bits).

    Each bit records neighbour > centre over the (window x window)
    support (centre excluded), replicate-padded at the image border.
    """
    if window not in (3, 5):
        raise ValueError("census window must be 3 or 5 (<=31 bits/word)")
    h, w = im.shape
    r = window // 2
    im = im.astype(jnp.float32)
    pad = jnp.pad(im, r, mode="edge")
    word = jnp.zeros(im.shape, jnp.uint32)
    bit = 0
    for dy in range(window):
        for dx in range(window):
            if dy == r and dx == r:
                continue
            nb = jax.lax.dynamic_slice(pad, (dy, dx), (h, w))
            word = word | (nb > im).astype(jnp.uint32) << np.uint32(bit)
            bit += 1
    return word


def census_cost_volume(c0: jnp.ndarray, c1: jnp.ndarray,
                       max_disp: int) -> jnp.ndarray:
    """(H, W, D) float32 Hamming distances between census words.

    Disparity d matches left pixel x to right pixel x - d; the x < d
    band (no counterpart in the right image) replicates the right
    image's first column rather than taking a sentinel max cost — a
    max-cost wall would seed a P1-per-step ramp along the disparity
    axis during aggregation that leaks "uniqueness" into textureless
    regions. The band is invalidated explicitly by the matcher's
    x - d >= 0 test instead.
    """
    w = c0.shape[1]
    slabs = []
    for d in range(max_disp):
        shifted = jnp.pad(c1, ((0, 0), (d, 0)), mode="edge")[:, :w]
        slabs.append(jax.lax.population_count(
            jnp.bitwise_xor(c0, shifted)).astype(jnp.float32))
    return jnp.stack(slabs, axis=-1)


def _sgm_step(lp: jnp.ndarray, c: jnp.ndarray, p1: float,
              p2: float) -> jnp.ndarray:
    """One SGM recurrence step: (S, D) previous path costs -> current.

    L(d) = C(d) + min(Lp(d), Lp(d+-1) + P1, min_d' Lp(d') + P2) - min_d'.
    """
    s, d = lp.shape
    m = lp.min(axis=-1, keepdims=True)
    big = jnp.full((s, 1), _BIG, lp.dtype)
    up = jnp.concatenate([lp[:, 1:], big], axis=1)
    dn = jnp.concatenate([big, lp[:, :-1]], axis=1)
    best = jnp.minimum(jnp.minimum(lp, m + p2),
                       jnp.minimum(up, dn) + p1)
    return c + best - m


def _scan_rows(vol: jnp.ndarray, p1: float, p2: float,
               col_shift: int) -> jnp.ndarray:
    """Aggregate along +row direction; col_shift -1/0/+1 selects the
    diagonal (the carry rolls one column per row; the wrapped column has
    no predecessor on the path and restarts at the raw cost)."""
    h, w, d = vol.shape

    def step(lp, c):
        if col_shift:
            lp = jnp.roll(lp, col_shift, axis=0)
            edge = 0 if col_shift > 0 else w - 1
            restart = (jnp.arange(w) == edge)[:, None]
        else:
            restart = None
        l_cur = _sgm_step(lp, c, p1, p2)
        if restart is not None:
            l_cur = jnp.where(restart, c, l_cur)
        return l_cur, l_cur

    l0 = vol[0]
    _, rest = jax.lax.scan(step, l0, vol[1:])
    return jnp.concatenate([l0[None], rest], axis=0)


def aggregate_volume(cost: jnp.ndarray, p1: float, p2: float,
                     directions: int = 8) -> jnp.ndarray:
    """Sum of per-direction SGM path costs over 4 or 8 directions."""
    if directions not in (4, 8):
        raise ValueError("directions must be 4 or 8")
    # vertical: scan rows top->bottom and bottom->top
    agg = _scan_rows(cost, p1, p2, 0)
    agg += _scan_rows(cost[::-1], p1, p2, 0)[::-1]
    # horizontal: transpose so the scan axis is W
    cost_t = cost.transpose(1, 0, 2)
    agg += _scan_rows(cost_t, p1, p2, 0).transpose(1, 0, 2)
    agg += _scan_rows(cost_t[::-1], p1, p2, 0)[::-1].transpose(1, 0, 2)
    if directions == 8:
        for flip in (False, True):
            v = cost[::-1] if flip else cost
            for cs in (1, -1):
                a = _scan_rows(v, p1, p2, cs)
                agg += a[::-1] if flip else a
    return agg


def _wta_subpixel(vol: jnp.ndarray, subpixel: bool = True):
    """Winner-take-all over the last axis + parabolic refinement.

    :return: (disp float32, cmin, dbest int32)
    """
    dmax = vol.shape[-1]
    dbest = jnp.argmin(vol, axis=-1).astype(jnp.int32)
    cmin = jnp.min(vol, axis=-1)
    if not subpixel:
        return dbest.astype(jnp.float32), cmin, dbest
    dm = jnp.clip(dbest - 1, 0, dmax - 1)
    dp = jnp.clip(dbest + 1, 0, dmax - 1)
    cm = jnp.take_along_axis(vol, dm[..., None], axis=-1)[..., 0]
    cp = jnp.take_along_axis(vol, dp[..., None], axis=-1)[..., 0]
    denom = cm - 2.0 * cmin + cp
    delta = jnp.where(denom > 1e-6, 0.5 * (cm - cp)
                      / jnp.maximum(denom, 1e-6), 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    interior = (dbest > 0) & (dbest < dmax - 1)
    disp = dbest.astype(jnp.float32) + jnp.where(interior, delta, 0.0)
    return disp, cmin, dbest


def _second_best(vol: jnp.ndarray, dbest: jnp.ndarray) -> jnp.ndarray:
    """Min cost over disparities more than 1 away from the winner."""
    dmax = vol.shape[-1]
    ds = jnp.arange(dmax)
    near = jnp.abs(ds[None, None, :] - dbest[..., None]) <= 1
    return jnp.min(jnp.where(near, _BIG, vol), axis=-1)


def _right_volume(vol: jnp.ndarray) -> jnp.ndarray:
    """Right-view cost volume from the left one: the pair (x_l, x_r)
    scored by cost_L[y, x_l, d] with x_l = x_r + d, so
    cost_R[y, x, d] = cost_L[y, x + d, d] (out of range -> big)."""
    h, w, dmax = vol.shape
    xs = jnp.arange(w)[:, None] + jnp.arange(dmax)[None, :]
    idx = jnp.broadcast_to(jnp.clip(xs, 0, w - 1)[None], (h, w, dmax))
    vol_r = jnp.take_along_axis(vol, idx, axis=1)
    return jnp.where((xs >= w)[None], _BIG, vol_r)


def _median3(im: jnp.ndarray) -> jnp.ndarray:
    """3x3 median with replicate borders."""
    h, w = im.shape
    pad = jnp.pad(im, 1, mode="edge")
    stack = jnp.stack([jax.lax.dynamic_slice(pad, (dy, dx), (h, w))
                       for dy in range(3) for dx in range(3)], axis=-1)
    return jnp.sort(stack, axis=-1)[..., 4]


@functools.lru_cache(maxsize=16)
def make_sgm_matcher(max_disp: int = 64, p1: float = 6.0, p2: float = 64.0,
                     census_window: int = 5, directions: int = 8,
                     uniqueness: float = 5.0, lr_max_diff: float = 1.0,
                     subpixel: bool = True, median: bool = True):
    """Build a jitted SGM matcher ``f(im_left, im_right) -> disparity``.

    Disparity is float32 with NaN at pixels failing the uniqueness or
    left-right test; the config is closed over so repeated calls at one
    setting reuse a single compiled program (lru-cached factory).
    """

    def match(im0: jnp.ndarray, im1: jnp.ndarray) -> jnp.ndarray:
        c0 = census_transform(im0, census_window)
        c1 = census_transform(im1, census_window)
        cost = census_cost_volume(c0, c1, max_disp)
        vol = aggregate_volume(cost, p1, p2, directions)

        disp, cmin, dbest = _wta_subpixel(vol, subpixel)
        valid = jnp.isfinite(disp)
        if uniqueness > 0:
            c2 = _second_best(vol, dbest)
            valid &= (c2 - cmin) >= uniqueness * 0.01 * jnp.maximum(c2, 1.0)
        if lr_max_diff >= 0:
            vol_r = _right_volume(vol)
            disp_r = jnp.argmin(vol_r, axis=-1).astype(jnp.float32)
            w = disp.shape[1]
            xr = jnp.clip(jnp.round(jnp.arange(w)[None, :] - disp)
                          .astype(jnp.int32), 0, w - 1)
            dr_at = jnp.take_along_axis(disp_r, xr, axis=1)
            valid &= jnp.abs(disp - dr_at) <= lr_max_diff
            valid &= (jnp.arange(w)[None, :] - disp) >= 0
        if median:
            disp = _median3(disp)
        return jnp.where(valid, disp, jnp.float32(jnp.nan))

    return jax.jit(match)


def sgm_disparity(im0, im1, max_disp: int = 64, **config) -> np.ndarray:
    """Host convenience wrapper: grayscale-converts, runs the jitted
    matcher, returns a float32 numpy disparity (NaN = invalid).

    Drop-in for the reference's external matchers in
    ``stereo_reconstruct`` (see ``matcher="sgm"`` there).
    """
    def prep(im):
        im = np.asarray(im)
        if im.ndim == 3:
            im = im.mean(axis=2)
        return jnp.asarray(im, jnp.float32)

    matcher = make_sgm_matcher(max_disp=max_disp, **config)
    return np.asarray(jax.device_get(matcher(prep(im0), prep(im1))))
