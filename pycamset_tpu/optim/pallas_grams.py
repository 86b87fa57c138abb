"""Pallas TPU kernel: fused residual + Jacobian + gram for the template chain.

The XLA path materialises the (B, K, 2, 21) Jacobian tensor to HBM between
the jacfwd and the gram einsums. This kernel keeps everything in VMEM: one
grid step processes a tile of 8 (cam, image) blocks, computes the 21
closed-form Jacobian columns and the residual as (8, K) vectors (perfect VPU
tiling), and accumulates the full extended gram

    G = [J | r]^T [J | r]   (per block, 22 x 22)

whose slices give every normal-equation piece: Hcc/ Hii / Wci blocks, the
gradients (last column), and the cost (corner). Per-block rotation matrices
and their Rodrigues derivatives are tiny and parameter-dependent, so they
are precomputed in plain jnp and passed in as a packed (B, PPB) operand.

Derivation shared with optim/analytic.py (parity-tested against it and
against jacfwd). Both the template chain (b=6, c=0) and the self-cal /
free-point chains (c=3; per-key couplings and a sequential-grid-accumulated
Hkk/gk) share one projection core (_projection_columns) parametrised over
the intrinsic width: a=15 standard, a=18 rational, a=22 thin-prism, a=24
tilted/Scheimpflug. PER_GROUP chains reach these kernels through the
key-grid expansion in make_structured_neq.

Robust losses (optim/losses.py) fold in-kernel: the per-observation IRLS
sqrt-weight multiplies every Jacobian column and the residual, and the gram
corner — used only for the cost — is replaced by the true robust cost
sum(rho(||r||^2)) so the LM gain ratio sees the robust objective.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pycamset_tpu.ops.rotations import rodrigues_to_matrix

BLOCK_TILE = 16     # blocks per grid step (sublane dimension); 16 measured
                    # faster than 8 at every rig size on v5e (kernel-only
                    # sweep: -7% at 25.6k blocks, >5x at 1.6k blocks, where
                    # the 2x-fewer grid steps amortise per-step DMA issue)
GRAM_W = 22         # 15 cam + 6 pose + 1 residual column (standard model)


def _layout(intr_w: int):
    """Packed per-block parameter row layout for an intr_w-wide intrinsic:
    [intr | Re(9) | dRe(27) | te(3) | Rp(9) | dRp(27) | tp(3) | ReRp(9)],
    padded to a multiple of 8 lanes. The tilted model (intr_w = 18) appends
    the sensor-tilt homography and its taux/tauy derivatives
    [Mt(9) | dMx(9) | dMy(9)] — PER_CAM-constant, so precomputed like Re."""
    off = {"intr": 0, "re": intr_w, "dre": intr_w + 9, "te": intr_w + 36,
           "rp": intr_w + 39, "drp": intr_w + 48, "tp": intr_w + 75,
           "rerp": intr_w + 78, "mt": intr_w + 87, "dmx": intr_w + 96,
           "dmy": intr_w + 105}
    width = intr_w + (114 if intr_w >= 18 else 87)
    ppb = -(-width // 8) * 8
    return off, ppb


# standard-model layout constants (the self-cal kernel uses these directly)
_OFFS9, PPB = _layout(9)
_OFF_INTR = _OFFS9["intr"]
_OFF_RE = _OFFS9["re"]
_OFF_DRE = _OFFS9["dre"]
_OFF_TE = _OFFS9["te"]
_OFF_RP = _OFFS9["rp"]
_OFF_DRP = _OFFS9["drp"]
_OFF_TP = _OFFS9["tp"]
_OFF_RERP = _OFFS9["rerp"]


def pack_block_params(cam_b: jnp.ndarray, im_b: jnp.ndarray,
                      intr_w: int = 9) -> jnp.ndarray:
    """(B, intr_w+6) cam params + (B,6) poses -> packed (B, PPB) operand."""
    _, ppb = _layout(intr_w)

    def one(cam, pose6):
        re = rodrigues_to_matrix(cam[intr_w:intr_w + 3])
        dre = jnp.moveaxis(
            jax.jacfwd(rodrigues_to_matrix)(cam[intr_w:intr_w + 3]), -1, 0)
        rp = rodrigues_to_matrix(pose6[:3])
        drp = jnp.moveaxis(jax.jacfwd(rodrigues_to_matrix)(pose6[:3]), -1, 0)
        parts = [cam[:intr_w], re.reshape(-1), dre.reshape(-1),
                 cam[intr_w + 3:intr_w + 6],
                 rp.reshape(-1), drp.reshape(-1), pose6[3:],
                 (re @ rp).reshape(-1)]
        if intr_w >= 18:  # tilted model: pack Mt and dMt/d(taux,tauy)
            from pycamset_tpu.ops.distortion import _tilt_matrix
            mt = _tilt_matrix(cam[16], cam[17])
            dmt = jax.jacfwd(lambda t: _tilt_matrix(t[0], t[1]))(cam[16:18])
            parts.extend([mt.reshape(-1), dmt[..., 0].reshape(-1),
                          dmt[..., 1].reshape(-1)])
        row = jnp.concatenate(parts)
        return jnp.pad(row, (0, ppb - row.shape[0]))

    return jax.vmap(one)(cam_b, im_b)


def _make_gram_kernel(rho_fn=None, weight_fn=None, intr_w: int = 9,
                      semantics: str = "component"):
    """Template-chain kernel factory; robust-loss fns fold in when given.

    intr_w selects the camera model: 9 = standard (5-coef polynomial
    radial), 12 = rational (8-coef, radial = num/den), 16 = thin-prism
    (12-coef, + s1..s4 prism terms), 18 = tilted (14-coef, + taux/tauy
    sensor-tilt homography).
    """

    def _gram_kernel(params_ref, tpl_ref, uv_ref, mask_ref, out_ref):
        _gram_kernel_body(params_ref, tpl_ref, uv_ref, mask_ref, out_ref,
                          rho_fn, weight_fn, intr_w, semantics)

    return _gram_kernel


# Mosaic lowers neither atan nor atan2; the fisheye kernel needs arctan on
# [0, inf). Branchless reduction atan(r) = pi/2 - atan(1/r) for r > 1, with
# a 12-term even-polynomial minimax fit of atan(z)/z on [0, 1] (max abs
# error 5.3e-11 — far below the f32 kernel noise floor).
_ATAN_COEFS = (
    0.99999999994739608, -0.33333331721055626, 0.19999918070479689,
    -0.14284074982722841, 0.11093997231858699, -0.089837756280694986,
    0.072560280218021633, -0.054472057202362319, 0.034441516800498333,
    -0.016284717861245711, 0.0049238824145839645, -0.00069807067691300792)


def _kernel_atan(r):
    """arctan for r >= 0, in primitives Mosaic can lower."""
    big = r > 1.0
    z = jnp.where(big, 1.0 / r, r)
    z2 = z * z
    acc = jnp.full_like(z, _ATAN_COEFS[-1])
    for c in _ATAN_COEFS[-2::-1]:
        acc = acc * z2 + c
    atan_z = z * acc
    return jnp.where(big, jnp.pi / 2 - atan_z, atan_z)


def _zmul(p, *facs):
    """p * facs..., propagating None as a structural (exact) zero.

    The affine-intrinsic Jacobian columns vanish identically in one
    residual component (fx, px have zero v-derivatives; fy, py zero
    u-derivatives; thin-prism s1/s2 and s3/s4 likewise) — tracking the
    zeros symbolically lets the gram loops skip ~17% of their (T, K)
    products instead of multiplying materialised zero vectors."""
    if p is None:
        return None
    for f in facs:
        p = p * f
    return p


def _zpair(ui, vi, uj, vj):
    """ui*uj + vi*vj with None as structural zero; None when all vanish."""
    tu = None if (ui is None or uj is None) else ui * uj
    tv = None if (vi is None or vj is None) else vi * vj
    if tu is None:
        return tv
    if tv is None:
        return tu
    return tu + tv


def _fisheye_columns(col, offs, x, y, r2):
    """Kannala-Brandt distorted-normalized coords + partials for the kernel
    core (intr layout [fx,px,fy,py,k1..k4]); mirrors
    analytic._fisheye_partials_tail on the (8, K) grid."""
    k1, k2, k3, k4 = (col(offs["intr"] + 4 + i) for i in range(4))
    r = jnp.sqrt(r2 + 1e-18)
    inv_r = 1.0 / r
    theta = _kernel_atan(r)
    t2 = theta * theta
    poly = 1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))
    s_ = theta * poly * inv_r
    xd = s_ * x
    yd = s_ * y
    jxd, jyd = [], []
    tp = t2 * theta
    for _ in range(4):
        jxd.append(x * tp * inv_r)
        jyd.append(y * tp * inv_r)
        tp = tp * t2
    dtheta_d = poly + 2.0 * t2 * (k1 + t2 * (2.0 * k2
                                             + t2 * (3.0 * k3
                                                     + t2 * 4.0 * k4)))
    g = (dtheta_d / (1.0 + r2) - s_) * inv_r * inv_r
    dxd_dx = s_ + x * x * g
    dxd_dy = x * y * g
    dyd_dx = dxd_dy
    dyd_dy = s_ + y * y * g
    return xd, yd, jxd, jyd, dxd_dx, dxd_dy, dyd_dx, dyd_dy


def _brown_columns(col, offs, intr_w, x, y, r2):
    """Brown-family distorted-normalized coords + partials for the kernel
    core (standard/rational/thin-prism/tilted intr layouts)."""
    k1, k2, p1, p2, k3 = (col(offs["intr"] + 4 + i) for i in range(5))
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    num = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    dnum = k1 + r2 * (2.0 * k2 + 3.0 * k3 * r2)
    if intr_w >= 12:  # rational model: radial is a polynomial ratio
        k4, k5, k6 = (col(offs["intr"] + 9 + i) for i in range(3))
        den = 1.0 + r2 * (k4 + r2 * (k5 + r2 * k6))
        dden = k4 + r2 * (2.0 * k5 + 3.0 * k6 * r2)
        inv_den = 1.0 / den
        radial = num * inv_den
        dradial = (dnum - radial * dden) * inv_den
    else:
        inv_den = 1.0
        radial = num
        dradial = dnum
    xy = x * y
    xd = x * radial + 2.0 * p1 * xy + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * xy
    if intr_w >= 16:  # thin-prism terms
        s1, s2, s3, s4 = (col(offs["intr"] + 12 + i) for i in range(4))
        xd = xd + r2 * (s1 + r2 * s2)
        yd = yd + r2 * (s3 + r2 * s4)

    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)

    # d(xd,yd)/d(dist coefs) — affine intrinsics fold in after the (possible)
    # tilt chain (numerator k's see 1/den; denominator k's are
    # -radial * r2^i / den)
    jxd = [x * r2 * inv_den, x * r2 * r2 * inv_den, 2.0 * xy,
           r2 + 2.0 * x * x, x * r2 ** 3 * inv_den]
    jyd = [y * r2 * inv_den, y * r2 * r2 * inv_den,
           r2 + 2.0 * y * y, 2.0 * xy, y * r2 ** 3 * inv_den]
    if intr_w >= 12:
        for i in (1, 2, 3):
            jxd.append(-x * radial * r2 ** i * inv_den)
            jyd.append(-y * radial * r2 ** i * inv_den)
    if intr_w >= 16:  # prism columns: d(xd)/ds1 = r2, /ds2 = r4 (x only)
        jxd.extend([r2, r2 * r2, None, None])
        jyd.extend([None, None, r2, r2 * r2])

    # d(xd,yd)/d(x,y)
    dxd_dx = radial + 2.0 * x * x * dradial + 2.0 * p1 * y + 6.0 * p2 * x
    dxd_dy = 2.0 * xy * dradial + 2.0 * p1 * x + 2.0 * p2 * y
    dyd_dx = dxd_dy
    dyd_dy = radial + 2.0 * y * y * dradial + 6.0 * p1 * y + 2.0 * p2 * x
    if intr_w >= 16:
        # prism breaks the dyd_dx == dxd_dy symmetry:
        # d(prism_x)/d(x,y) = (s1 + 2 s2 r2) * (2x, 2y); same with s3/s4
        dpx = s1 + 2.0 * s2 * r2
        dpy = s3 + 2.0 * s4 * r2
        dxd_dx = dxd_dx + 2.0 * x * dpx
        dxd_dy = dxd_dy + 2.0 * y * dpx
        dyd_dx = dyd_dx + 2.0 * x * dpy
        dyd_dy = dyd_dy + 2.0 * y * dpy

    if intr_w >= 18:
        # tilted/Scheimpflug model: (xd,yd) -> homography Mt (packed
        # per-block, PER_CAM-constant). Every existing column and the
        # d/d(x,y) chain pass through the 2x2 homography Jacobian; the
        # taux/tauy columns come from the packed dMt matrices.
        # the homography mixes u/v halves, so the prism structural zeros
        # stop being zeros: materialise them before the 2x2 chain below
        jxd = [zero if j is None else j for j in jxd]
        jyd = [zero if j is None else j for j in jyd]
        m = [col(offs["mt"] + i) for i in range(9)]
        iw = 1.0 / (m[6] * xd + m[7] * yd + m[8])
        xtl = (m[0] * xd + m[1] * yd + m[2]) * iw
        ytl = (m[3] * xd + m[4] * yd + m[5]) * iw
        a00 = (m[0] - xtl * m[6]) * iw
        a01 = (m[1] - xtl * m[7]) * iw
        a10 = (m[3] - ytl * m[6]) * iw
        a11 = (m[4] - ytl * m[7]) * iw
        jxd, jyd = ([a00 * jx + a01 * jy for jx, jy in zip(jxd, jyd)],
                    [a10 * jx + a11 * jy for jx, jy in zip(jxd, jyd)])
        for base in ("dmx", "dmy"):
            dm = [col(offs[base] + i) for i in range(9)]
            dw = dm[6] * xd + dm[7] * yd + dm[8]
            jxd.append((dm[0] * xd + dm[1] * yd + dm[2] - xtl * dw) * iw)
            jyd.append((dm[3] * xd + dm[4] * yd + dm[5] - ytl * dw) * iw)
        dxd_dx, dxd_dy, dyd_dx, dyd_dy = (
            a00 * dxd_dx + a01 * dyd_dx, a00 * dxd_dy + a01 * dyd_dy,
            a10 * dxd_dx + a11 * dyd_dx, a10 * dxd_dy + a11 * dyd_dy)
        xd, yd = xtl, ytl
    return xd, yd, jxd, jyd, dxd_dx, dxd_dy, dyd_dx, dyd_dy


def _projection_columns(prm, pts3, uv, mask, offs, intr_w, rho_fn, weight_fn,
                        semantics="component"):
    """Shared projection math: residuals + camera/pose Jacobian columns.

    pts3 is the (3, K) 3D point table (the constant template for the
    template chain, the free PER_KEY points for self-cal). Returns
    (ju, jv, r_u, r_v, rcost, mu, mv, du_xc, dv_xc, col)
    where ju/jv hold the a+6 camera+pose columns (row-mask NOT applied),
    mu/mv carry the per-row IRLS sqrt-weights when the loss is robust
    (identical under per-observation semantics, distinct per component), and
    col/du_xc/dv_xc let callers build extra columns (e.g. the self-cal
    chain's per-key Jk)."""

    def col(off):                             # (8, 1) scalar-per-block column
        return prm[:, off:off + 1]

    xt = [pts3[i:i + 1, :] for i in range(3)]  # 3 x (1, K)

    # Xw = Rp @ Xt + tp ; per-component (8, K)
    def rot_apply(base, vecs):
        return [col(base + 3 * a + 0) * vecs[0] + col(base + 3 * a + 1) * vecs[1]
                + col(base + 3 * a + 2) * vecs[2] for a in range(3)]

    xw = rot_apply(offs["rp"], xt)
    xw = [xw[a] + col(offs["tp"] + a) for a in range(3)]
    xc = rot_apply(offs["re"], xw)
    xc = [xc[a] + col(offs["te"] + a) for a in range(3)]

    fx, px, fy, py = (col(offs["intr"] + i) for i in range(4))

    inv_z = 1.0 / xc[2]
    x = xc[0] * inv_z
    y = xc[1] * inv_z
    r2 = x * x + y * y
    if intr_w == 8:
        (xd, yd, jxd, jyd, dxd_dx, dxd_dy, dyd_dx,
         dyd_dy) = _fisheye_columns(col, offs, x, y, r2)
    else:
        (xd, yd, jxd, jyd, dxd_dx, dxd_dy, dyd_dx,
         dyd_dy) = _brown_columns(col, offs, intr_w, x, y, r2)
    one = jnp.ones_like(x)

    r_u = (fx * xd + px - uv[:, 0, :]) * mask
    r_v = (fy * yd + py - uv[:, 1, :]) * mask
    rcost = None
    mu = mv = mask
    if weight_fn is not None and semantics == "component":
        # scipy semantics: rho per residual component
        su = r_u * r_u
        sv = r_v * r_v
        rcost = jnp.sum((rho_fn(su) + rho_fn(sv)) * mask, axis=1)
        swu = jnp.sqrt(weight_fn(su))
        swv = jnp.sqrt(weight_fn(sv))
        mu = mask * swu
        mv = mask * swv
        r_u = r_u * swu
        r_v = r_v * swv
    elif weight_fn is not None:               # robust loss: IRLS weights
        s_obs = r_u * r_u + r_v * r_v
        sw = jnp.sqrt(weight_fn(s_obs))
        rcost = jnp.sum(rho_fn(s_obs) * mask, axis=1)   # (8,) true cost
        mu = mv = mask * sw
        r_u = r_u * sw
        r_v = r_v * sw

    # d(u,v)/d intr — [fx, px, fy, py | dist coefs]; None = structural zero
    ju = [xd, one, None, None] + [_zmul(j, fx) for j in jxd]
    jv = [None, None, yd, one] + [_zmul(j, fy) for j in jyd]

    du_dx = fx * dxd_dx
    du_dy = fx * dxd_dy
    dv_dx = fy * dyd_dx
    dv_dy = fy * dyd_dy
    du_xc = [du_dx * inv_z, du_dy * inv_z, -(du_dx * x + du_dy * y) * inv_z]
    dv_xc = [dv_dx * inv_z, dv_dy * inv_z, -(dv_dx * x + dv_dy * y) * inv_z]

    # extrinsic rotation: dXc/drve[j] = dRe[j] @ Xw
    for j in range(3):
        dxc = [col(offs["dre"] + 9 * j + 3 * a + 0) * xw[0]
               + col(offs["dre"] + 9 * j + 3 * a + 1) * xw[1]
               + col(offs["dre"] + 9 * j + 3 * a + 2) * xw[2]
               for a in range(3)]
        ju.append(du_xc[0] * dxc[0] + du_xc[1] * dxc[1] + du_xc[2] * dxc[2])
        jv.append(dv_xc[0] * dxc[0] + dv_xc[1] * dxc[1] + dv_xc[2] * dxc[2])
    # extrinsic translation: dXc/dte = I
    ju.extend(du_xc)
    jv.extend(dv_xc)

    # pose rotation: dXc/drvp[j] = Re @ (dRp[j] @ Xt)
    for j in range(3):
        dxw = [col(offs["drp"] + 9 * j + 3 * a + 0) * xt[0]
               + col(offs["drp"] + 9 * j + 3 * a + 1) * xt[1]
               + col(offs["drp"] + 9 * j + 3 * a + 2) * xt[2]
               for a in range(3)]
        dxc = rot_apply(offs["re"], dxw)
        ju.append(du_xc[0] * dxc[0] + du_xc[1] * dxc[1] + du_xc[2] * dxc[2])
        jv.append(dv_xc[0] * dxc[0] + dv_xc[1] * dxc[1] + dv_xc[2] * dxc[2])
    # pose translation: dXc/dtp = Re
    for bcol in range(3):
        re_col = [col(offs["re"] + 3 * a + bcol) for a in range(3)]
        ju.append(du_xc[0] * re_col[0] + du_xc[1] * re_col[1]
                  + du_xc[2] * re_col[2])
        jv.append(dv_xc[0] * re_col[0] + dv_xc[1] * re_col[1]
                  + dv_xc[2] * re_col[2])

    return ju, jv, r_u, r_v, rcost, mu, mv, du_xc, dv_xc, col


def _gram_kernel_body(params_ref, tpl_ref, uv_ref, mask_ref, out_ref,
                      rho_fn, weight_fn, intr_w, semantics="component"):
    """One grid step: 8 blocks x K keys -> 8 extended (a+7)x(a+7) grams."""
    offs, _ = _layout(intr_w)
    gram_w = intr_w + 6 + 6 + 1
    (ju, jv, r_u, r_v, rcost, mu, mv, _, _, _) = _projection_columns(
        params_ref[:], tpl_ref[:], uv_ref[:], mask_ref[:], offs, intr_w,
        rho_fn, weight_fn, semantics)

    # extended columns: [J row-masked | r]
    ju = [_zmul(j, mu) for j in ju] + [r_u]
    jv = [_zmul(j, mv) for j in jv] + [r_v]

    # accumulate the symmetric gram per block (structural-zero pairs skip
    # their (8, K) products and reduce to a constant)
    zb = jnp.zeros(r_u.shape[:1], r_u.dtype)
    gvals = [[None] * gram_w for _ in range(gram_w)]
    for i in range(gram_w):
        for j in range(i, gram_w):
            p = _zpair(ju[i], jv[i], ju[j], jv[j])
            g = zb if p is None else jnp.sum(p, axis=1)  # (8,)
            gvals[i][j] = g
            gvals[j][i] = g
    if weight_fn is not None:
        # corner is only read as the cost: report the robust cost, not r~^2
        gvals[gram_w - 1][gram_w - 1] = rcost
    rows = [jnp.stack(gvals[i], axis=-1) for i in range(gram_w)]
    out_ref[:] = jnp.stack(rows, axis=1)


def template_gram_pallas(packed: jnp.ndarray, tpl_t: jnp.ndarray,
                         uv_t: jnp.ndarray, mask: jnp.ndarray,
                         loss: str = "linear",
                         f_scale: float = 1.0,
                         intr_w: int = 9,
                         loss_semantics: str = "component") -> jnp.ndarray:
    """Extended per-block grams for the template chain.

    :param packed: (B, PPB) from pack_block_params. :param tpl_t: (3, K).
    :param uv_t: (B, 2, K). :param mask: (B, K).
    :param intr_w: 9 (standard), 12 (rational) or 16 (thin-prism).
    :return: (B, W, W) grams of [Jc | Ji | r], W = intr_w + 13
        (IRLS-weighted when loss is robust; corner carries the robust cost).
    """
    from pycamset_tpu.optim.losses import make_loss
    gram_w = intr_w + 13
    ppb = packed.shape[1]
    if loss != "linear":
        rho_fn, weight_fn = make_loss(loss, f_scale)
        kernel = _make_gram_kernel(rho_fn, weight_fn, intr_w,
                                   semantics=loss_semantics)
    else:
        kernel = _make_gram_kernel(intr_w=intr_w)
    b, k = mask.shape
    b_pad = ((b + BLOCK_TILE - 1) // BLOCK_TILE) * BLOCK_TILE
    if b_pad != b:
        # pad with copies of block 0 under a zero mask (keeps lanes finite)
        reps = b_pad - b
        packed = jnp.concatenate([packed, jnp.tile(packed[:1], (reps, 1))])
        uv_t = jnp.concatenate([uv_t, jnp.zeros((reps, *uv_t.shape[1:]),
                                                uv_t.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((reps, k), mask.dtype)])
    # index maps derive every constant from the i32 program id: with x64
    # enabled, literal 0 becomes i64 and Mosaic fails to legalize the
    # mixed-type index tuple
    grid = (b_pad // BLOCK_TILE,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_TILE, ppb), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, k), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_TILE, 2, k), lambda i: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_TILE, k), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_TILE, gram_w, gram_w),
                               lambda i: (i, i * 0, i * 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, gram_w, gram_w), uv_t.dtype),
    )(packed, tpl_t, uv_t, mask)
    return out[:b]


def _pad_image_axis(n_cams: int, n_ims: int, i_pad: int):
    """Pad the image-minor block axis to the tile multiple.

    Returns padi(x, fill): (n_cams*n_ims, ...) -> (n_cams*i_pad, ...).
    fill="edge" replicates a real block (NaN-safety: params stay finite),
    fill="zero" zeroes (uv/mask rows — masked slots contribute exact 0).
    """
    reps = i_pad - n_ims

    def padi(x, fill):
        x = x.reshape(n_cams, n_ims, *x.shape[1:])
        if fill == "edge":
            pad = jnp.repeat(x[:, :1], reps, axis=1)
        else:
            pad = jnp.zeros((n_cams, reps) + x.shape[2:], x.dtype)
        return jnp.concatenate([x, pad], axis=1).reshape(
            (n_cams * i_pad,) + x.shape[2:])

    return padi


def _make_fused_template_kernel(rho_fn=None, weight_fn=None, intr_w: int = 9,
                                semantics: str = "component",
                                steps_per_cam: int = 1):
    """Template-chain kernel emitting REDUCED normal-equation pieces.

    Same projection core as _make_gram_kernel, but the column masks fold
    in-kernel and the outputs are routed straight to their consumers: the
    cam blocks (hcc, gc) accumulate across the image-minor grid steps of
    each camera, and only the per-block couplings (wci), pose grams
    (gii, gi) and cost corners leave VMEM — 7x less HBM write traffic than
    the full (a+7)^2 per-block gram, and no host-side re-read/mask pass.
    """

    def _kernel(params_ref, tpl_ref, uv_ref, mask_ref,
                hcc_ref, gc_ref, wci_ref, gii_ref, gi_ref, corner_ref):
        _fused_template_body(params_ref, tpl_ref, uv_ref, mask_ref,
                             hcc_ref, gc_ref, wci_ref,
                             gii_ref, gi_ref, corner_ref, rho_fn, weight_fn,
                             intr_w, semantics, steps_per_cam)

    return _kernel


def _fused_template_body(params_ref, tpl_ref, uv_ref, mask_ref,
                         hcc_ref, gc_ref, wci_ref, gii_ref,
                         gi_ref, corner_ref, rho_fn, weight_fn, intr_w,
                         semantics, steps_per_cam):
    offs, _ = _layout(intr_w)
    a = intr_w + 6
    gram_w = a + 6 + 1
    w = gram_w - 1
    (ju, jv, r_u, r_v, rcost, mu, mv, _, _, _) = _projection_columns(
        params_ref[:], tpl_ref[:], uv_ref[:], mask_ref[:], offs, intr_w,
        rho_fn, weight_fn, semantics)

    # column masks are NOT applied here: every output of this kernel is a
    # K-reduced piece, so the 0/1 cmask/imask products move out of the
    # (T, K) domain onto the tiny reduced arrays (make_pallas_template_
    # grams_fused post-multiplies) — ~40 fewer (T, K) vector ops per tile
    ju = [_zmul(j, mu) for j in ju] + [r_u]
    jv = [_zmul(j, mv) for j in jv] + [r_v]

    zb = jnp.zeros(r_u.shape[:1], r_u.dtype)
    gvals = [[None] * gram_w for _ in range(gram_w)]
    for i in range(gram_w):
        for j in range(i, gram_w):
            p = _zpair(ju[i], jv[i], ju[j], jv[j])
            g = zb if p is None else jnp.sum(p, axis=1)  # (T,)
            gvals[i][j] = g
            gvals[j][i] = g
    if weight_fn is not None:
        gvals[w][w] = rcost

    # per-cam accumulators: the grid is image-minor within each camera, so
    # each (1, .) cam block is revisited on steps_per_cam consecutive steps
    # np.int32 constant: a bare Python int is weak-i64 under x64 and the
    # i32->i64 convert has no Mosaic lowering (RecursionError)
    @pl.when(pl.program_id(0) % np.int32(steps_per_cam) == 0)
    def _():
        hcc_ref[:] = jnp.zeros_like(hcc_ref)
        gc_ref[:] = jnp.zeros_like(gc_ref)

    cc = jnp.stack([jnp.stack([gvals[i][j] for j in range(a)], axis=-1)
                    for i in range(a)], axis=1)               # (T, a, a)
    hcc_ref[:] += jnp.sum(cc, axis=0)[None]
    # gc rides a (C, 1, a) array so its block's trailing dims equal the
    # array's (Mosaic rejects a (1, a) block over (C, a) — sublane dim 1)
    gc_ref[:] += jnp.sum(
        jnp.stack([gvals[i][w] for i in range(a)], axis=-1), axis=0)[None,
                                                                     None]

    # per-block pieces
    wci_ref[:] = jnp.stack(
        [jnp.stack([gvals[i][a + j] for j in range(6)], axis=-1)
         for i in range(a)], axis=1)                           # (T, a, 6)
    gii_ref[:] = jnp.stack(
        [jnp.stack([gvals[a + i][a + j] for j in range(6)], axis=-1)
         for i in range(6)], axis=1)                           # (T, 6, 6)
    gi_ref[:] = jnp.stack([gvals[a + i][w] for i in range(6)], axis=-1)
    corner_ref[:] = gvals[w][w][:, None]


def make_pallas_template_grams_fused(widths, n_cams: int, n_ims: int,
                                     loss: str = "linear",
                                     f_scale: float = 1.0,
                                     loss_semantics: str = "component",
                                     tile: int | None = None):
    """Fused-reduction template gram builder (Pallas, TPU).

    Contract differs from make_pallas_template_grams: it returns the
    REDUCED pieces directly —
    grams(cam_b, im_b, tpl, uv, mask, cmask_b, imask_b) ->
    (hcc (C,a,a), hii (I,6,6), wci (C,I,a,6), gc (C,a), gi (I,6), cost) —
    with the cam-axis sums accumulated in-kernel and only
    a*6 + 36 + 6 + 1 floats per block written to HBM instead of the full
    (a+7)^2 gram plus its masked re-read.
    """
    from pycamset_tpu.optim.losses import make_loss
    a, bwidth = widths.a, widths.b
    assert (bwidth, widths.c) == (6, 0) and a in (14, 15, 18, 22, 24)
    intr_w = a - 6
    _, ppb = _layout(intr_w)

    t = tile if tile is not None else BLOCK_TILE
    i_pad = -(-n_ims // t) * t
    spc = i_pad // t
    if loss != "linear":
        rho_fn, weight_fn = make_loss(loss, f_scale)
        kernel = _make_fused_template_kernel(rho_fn, weight_fn, intr_w,
                                             semantics=loss_semantics,
                                             steps_per_cam=spc)
    else:
        kernel = _make_fused_template_kernel(intr_w=intr_w,
                                             steps_per_cam=spc)

    def grams(cam_b, im_b, tpl, uv, mask, cmask_b, imask_b):
        dtype = uv.dtype
        _, k = mask.shape
        packed = pack_block_params(cam_b, im_b, intr_w=intr_w)
        uv_t = uv.transpose(0, 2, 1)
        if i_pad != n_ims:
            padi = _pad_image_axis(n_cams, n_ims, i_pad)
            packed = padi(packed, "edge")
            uv_t = padi(uv_t, "zero")
            mask_p = padi(mask, "zero")
        else:
            mask_p = mask

        b_pad = n_cams * i_pad
        grid = (b_pad // t,)
        hcc, gc, wci, gii, gi, corner = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((t, ppb), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, k), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 2, k), lambda i: (i, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, k), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, a, a),
                             lambda i: (i // np.int32(spc), i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, a),
                             lambda i: (i // np.int32(spc), i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, a, 6), lambda i: (i, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 6, 6), lambda i: (i, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 6), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 1), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_cams, a, a), dtype),
                jax.ShapeDtypeStruct((n_cams, 1, a), dtype),
                jax.ShapeDtypeStruct((b_pad, a, 6), dtype),
                jax.ShapeDtypeStruct((b_pad, 6, 6), dtype),
                jax.ShapeDtypeStruct((b_pad, 6), dtype),
                jax.ShapeDtypeStruct((b_pad, 1), dtype),
            ),
        )(packed, tpl.T, uv_t, mask_p)

        # column masks, applied post-reduction (cmask is per camera —
        # constant across the images of one cam — and imask per image, so
        # masking the reduced pieces equals the per-column in-kernel
        # products the kernel used to do, at K-free cost)
        cm = cmask_b.reshape(n_cams, n_ims, a)[:, 0]
        im_b = imask_b.reshape(n_cams, n_ims, 6)
        hcc = hcc * cm[:, :, None] * cm[:, None, :]
        wci = (wci.reshape(n_cams, i_pad, a, 6)[:, :n_ims]
               * cm[:, None, :, None] * im_b[:, :, None, :])
        gii_m = (gii.reshape(n_cams, i_pad, 6, 6)[:, :n_ims]
                 * im_b[:, :, :, None] * im_b[:, :, None, :])
        hii = jnp.sum(gii_m, axis=0)
        gi_r = jnp.sum(gi.reshape(n_cams, i_pad, 6)[:, :n_ims] * im_b,
                       axis=0)
        cost = jnp.sum(corner.reshape(n_cams, i_pad)[:, :n_ims])
        return hcc, hii, wci, gc[:, 0] * cm, gi_r, cost

    return grams


def _make_fused_selfcal_kernel(rho_fn=None, weight_fn=None, intr_w: int = 9,
                               semantics: str = "component",
                               steps_per_cam: int = 1):
    """Self-cal kernel emitting REDUCED normal-equation pieces.

    Same projection + free-point columns as _selfcal_kernel_body, but the
    camera-axis reductions fold in-kernel: hcc, gc AND the (a, 3, K) point
    couplings wck accumulate across the image-minor grid steps of each
    camera, so the (B, K, a, 3) coupling tensor (106 MB at 16x100) never
    exists in HBM. Only wik (the smaller b*3 coupling), the per-block pose
    pieces and the resident hkk/gk accumulator leave VMEM — ~3.5x less
    write traffic and no XLA-side transpose/reshape/sum over the big array.
    """

    def _kernel(params_ref, pts_ref, uv_ref, mask_ref, imask_ref,
                kmask_ref, hcc_ref, gc_ref, wck_ref, wik_ref, wci_ref,
                gii_ref, gi_ref, corner_ref, hkkgk_ref):
        _fused_selfcal_body(params_ref, pts_ref, uv_ref, mask_ref,
                            imask_ref, kmask_ref, hcc_ref, gc_ref, wck_ref,
                            wik_ref, wci_ref, gii_ref, gi_ref, corner_ref,
                            hkkgk_ref, rho_fn, weight_fn, intr_w, semantics,
                            steps_per_cam)

    return _kernel


def _fused_selfcal_body(params_ref, pts_ref, uv_ref, mask_ref,
                        imask_ref, kmask_ref, hcc_ref, gc_ref, wck_ref,
                        wik_ref, wci_ref, gii_ref, gi_ref, corner_ref,
                        hkkgk_ref, rho_fn, weight_fn, intr_w, semantics,
                        steps_per_cam):
    offs, _ = _layout(intr_w)
    a = intr_w + 6
    gram_w = a + 6 + 1
    w = gram_w - 1
    imask = imask_ref[:]
    kmask = kmask_ref[:]                      # (3, K)
    (ju, jv, r_u, r_v, rcost, mu, mv, du_xc, dv_xc, col) = _projection_columns(
        params_ref[:], pts_ref[:], uv_ref[:], mask_ref[:], offs, intr_w,
        rho_fn, weight_fn, semantics)

    # cmask is hoisted out of the kernel (the camera side of every output —
    # hcc, gc, wci, wck — is per-cam-masked post-reduction by the wrapper);
    # imask stays in-kernel because the unreduced wik rows consume it here
    ju = ([_zmul(ju[i], mu) for i in range(a)]
          + [ju[a + i] * mu * imask[:, i:i + 1] for i in range(6)] + [r_u])
    jv = ([_zmul(jv[i], mv) for i in range(a)]
          + [jv[a + i] * mv * imask[:, i:i + 1] for i in range(6)] + [r_v])

    # Jk columns (free point): d(u,v)/dXt = d_xc @ (Re Rp), masked by kmask
    jku, jkv = [], []
    for j in range(3):
        rerp_col = [col(offs["rerp"] + 3 * a_ + j) for a_ in range(3)]
        km = kmask[j:j + 1, :]
        jku.append((du_xc[0] * rerp_col[0] + du_xc[1] * rerp_col[1]
                    + du_xc[2] * rerp_col[2]) * mu * km)
        jkv.append((dv_xc[0] * rerp_col[0] + dv_xc[1] * rerp_col[1]
                    + dv_xc[2] * rerp_col[2]) * mv * km)

    zb = jnp.zeros(r_u.shape[:1], r_u.dtype)
    gvals = [[None] * gram_w for _ in range(gram_w)]
    for i in range(gram_w):
        for j in range(i, gram_w):
            p = _zpair(ju[i], jv[i], ju[j], jv[j])
            g = zb if p is None else jnp.sum(p, axis=1)  # (T,)
            gvals[i][j] = g
            gvals[j][i] = g
    if weight_fn is not None:
        gvals[w][w] = rcost

    # per-cam accumulators (image-minor grid: steps_per_cam consecutive
    # revisits per cam block; np.int32 — see _fused_template_body)
    @pl.when(pl.program_id(0) % np.int32(steps_per_cam) == 0)
    def _():
        hcc_ref[:] = jnp.zeros_like(hcc_ref)
        gc_ref[:] = jnp.zeros_like(gc_ref)
        wck_ref[:] = jnp.zeros_like(wck_ref)

    cc = jnp.stack([jnp.stack([gvals[i][j] for j in range(a)], axis=-1)
                    for i in range(a)], axis=1)               # (T, a, a)
    hcc_ref[:] += jnp.sum(cc, axis=0)[None]
    gc_ref[:] += jnp.sum(
        jnp.stack([gvals[i][w] for i in range(a)], axis=-1), axis=0)[None,
                                                                     None]
    # wck rows (a*3, K): per-cam sum over the tile's blocks of Jc^T Jk
    wck_ref[:] += jnp.stack(
        [jnp.sum(_zpair(ju[i], jv[i], jku[j], jkv[j]), axis=0)
         for i in range(a) for j in range(3)], axis=0)[None]

    # per-block pieces
    wik_ref[:] = jnp.stack([ju[a + i] * jku[j] + jv[a + i] * jkv[j]
                            for i in range(6) for j in range(3)], axis=1)
    wci_ref[:] = jnp.stack(
        [jnp.stack([gvals[i][a + j] for j in range(6)], axis=-1)
         for i in range(a)], axis=1)                           # (T, a, 6)
    gii_ref[:] = jnp.stack(
        [jnp.stack([gvals[a + i][a + j] for j in range(6)], axis=-1)
         for i in range(6)], axis=1)                           # (T, 6, 6)
    gi_ref[:] = jnp.stack([gvals[a + i][w] for i in range(6)], axis=-1)
    corner_ref[:] = gvals[w][w][:, None]

    # per-key diag + gradient, accumulated across the whole grid
    hk_rows = [jnp.sum(jku[i] * jku[j] + jkv[i] * jkv[j], axis=0)
               for i in range(3) for j in range(3)]
    gk_rows = [jnp.sum(jku[i] * r_u + jkv[i] * r_v, axis=0) for i in range(3)]
    pad = [jnp.zeros_like(hk_rows[0])] * 4
    update = jnp.stack(hk_rows + gk_rows + pad, axis=0)  # (16, K)

    @pl.when(pl.program_id(0) == 0)
    def _():
        hkkgk_ref[:] = jnp.zeros_like(hkkgk_ref)

    hkkgk_ref[:] += update


def make_pallas_selfcal_grams_fused(widths, n_cams: int, n_ims: int,
                                    loss: str = "linear",
                                    f_scale: float = 1.0,
                                    loss_semantics: str = "component",
                                    tile: int | None = None):
    """Fused-reduction self-cal gram builder (Pallas, TPU).

    Contract (reduced pieces, vs make_pallas_selfcal_grams's per-block):
    grams(cam_b, im_b, keyp, uv, mask, cmask_b, imask_b, kmask) ->
    (hcc (C,a,a), hii (I,6,6), hkk (K,3,3), wci (C,I,a,6),
     wck (C,K,a,3), wik (I,K,6,3), gc (C,a), gi (I,6), gk (K,3), cost).
    The image axis pads to the block tile (pad blocks replicate a real
    block with mask=0, contributing exact zeros through mu/mv).
    """
    from pycamset_tpu.optim.losses import make_loss
    a, bw, c = widths.a, widths.b, widths.c
    assert a in (14, 15, 18, 22, 24) and (bw, c) == (6, 3)
    intr_w = a - 6
    _, ppb = _layout(intr_w)

    t = tile if tile is not None else BLOCK_TILE
    i_pad = -(-n_ims // t) * t
    spc = i_pad // t
    if loss != "linear":
        rho_fn, weight_fn = make_loss(loss, f_scale)
        kernel = _make_fused_selfcal_kernel(rho_fn, weight_fn, intr_w,
                                            semantics=loss_semantics,
                                            steps_per_cam=spc)
    else:
        kernel = _make_fused_selfcal_kernel(intr_w=intr_w, steps_per_cam=spc)

    def grams(cam_b, im_b, keyp, uv, mask, cmask_b, imask_b, kmask):
        dtype = uv.dtype
        _, k = mask.shape
        packed = pack_block_params(cam_b, im_b, intr_w=intr_w)
        uv_t = uv.transpose(0, 2, 1)
        if i_pad != n_ims:
            padi = _pad_image_axis(n_cams, n_ims, i_pad)
            packed = padi(packed, "edge")
            uv_t = padi(uv_t, "zero")
            mask_p = padi(mask, "zero")
            imask_p = padi(imask_b, "edge")
        else:
            mask_p, imask_p = mask, imask_b

        b_pad = n_cams * i_pad
        grid = (b_pad // t,)
        (hcc, gc, wck_r, wik_r, wci, gii, gi, corner,
         hkkgk) = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((t, ppb), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, k), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 2, k), lambda i: (i, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, k), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 6), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, k), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, a, a),
                             lambda i: (i // np.int32(spc), i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, a),
                             lambda i: (i // np.int32(spc), i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, a * 3, k),
                             lambda i: (i // np.int32(spc), i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 6 * 3, k), lambda i: (i, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, a, 6), lambda i: (i, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 6, 6), lambda i: (i, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 6), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 1), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, k), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_cams, a, a), dtype),
                jax.ShapeDtypeStruct((n_cams, 1, a), dtype),
                jax.ShapeDtypeStruct((n_cams, a * 3, k), dtype),
                jax.ShapeDtypeStruct((b_pad, 6 * 3, k), dtype),
                jax.ShapeDtypeStruct((b_pad, a, 6), dtype),
                jax.ShapeDtypeStruct((b_pad, 6, 6), dtype),
                jax.ShapeDtypeStruct((b_pad, 6), dtype),
                jax.ShapeDtypeStruct((b_pad, 1), dtype),
                jax.ShapeDtypeStruct((16, k), dtype),
            ),
        )(packed, keyp.T, uv_t, mask_p, imask_p, kmask.T)

        # cmask post-reduction (per camera — constant across its images):
        # the camera side of hcc/gc/wci/wck replaces the per-column
        # in-kernel products at K-free (or one-pass) cost
        cm = cmask_b.reshape(n_cams, n_ims, a)[:, 0]
        hcc = hcc * cm[:, :, None] * cm[:, None, :]
        wci_r = (wci.reshape(n_cams, i_pad, a, 6)[:, :n_ims]
                 * cm[:, None, :, None])
        hii = jnp.sum(gii.reshape(n_cams, i_pad, 6, 6)[:, :n_ims], axis=0)
        gi_r = jnp.sum(gi.reshape(n_cams, i_pad, 6)[:, :n_ims], axis=0)
        cost = jnp.sum(corner.reshape(n_cams, i_pad)[:, :n_ims])
        wck = (wck_r.transpose(0, 2, 1).reshape(n_cams, k, a, 3)
               * cm[:, None, :, None])
        wik = jnp.sum(
            wik_r.reshape(n_cams, i_pad, 6 * 3, k)[:, :n_ims], axis=0
        ).transpose(0, 2, 1).reshape(n_ims, k, 6, 3)
        hkk = hkkgk[:9].T.reshape(k, 3, 3)
        gk = hkkgk[9:12].T
        return (hcc, hii, hkk, wci_r, wck, wik, gc[:, 0] * cm, gi_r, gk,
                cost)

    return grams


def _make_selfcal_kernel(rho_fn=None, weight_fn=None, intr_w: int = 9,
                         semantics: str = "component"):
    """Self-cal kernel factory; robust-loss fns fold in when given; intr_w
    selects the camera model as in _make_gram_kernel."""

    def _selfcal_kernel(params_ref, pts_ref, uv_ref, mask_ref, cmask_ref,
                        imask_ref, kmask_ref, out_ref, wck_ref, wik_ref,
                        hkkgk_ref):
        _selfcal_kernel_body(params_ref, pts_ref, uv_ref, mask_ref,
                             cmask_ref, imask_ref, kmask_ref, out_ref,
                             wck_ref, wik_ref, hkkgk_ref, rho_fn, weight_fn,
                             intr_w, semantics)

    return _selfcal_kernel


def _selfcal_kernel_body(params_ref, pts_ref, uv_ref, mask_ref, cmask_ref,
                         imask_ref, kmask_ref, out_ref, wck_ref, wik_ref,
                         hkkgk_ref, rho_fn, weight_fn, intr_w,
                         semantics="component"):
    """Self-cal chain: per-block extended grams + per-key pieces.

    Shares _projection_columns with the template chain, with the template
    point replaced by the free PER_KEY point; additionally emits Jk-derived
    tensors: wck (per block, Jc^T Jk), wik (Ji^T Jk), and hkk/gk accumulated
    across the sequential grid into a shared output block.
    """
    offs, _ = _layout(intr_w)
    a = intr_w + 6
    gram_w = a + 6 + 1
    cmask = cmask_ref[:]                      # (8, a)
    imask = imask_ref[:]                      # (8, 6)
    kmask = kmask_ref[:]                      # (3, K)
    (ju, jv, r_u, r_v, rcost, mu, mv, du_xc, dv_xc, col) = _projection_columns(
        params_ref[:], pts_ref[:], uv_ref[:], mask_ref[:], offs, intr_w,
        rho_fn, weight_fn, semantics)

    # column masks in-kernel (the per-key outputs are too large to re-mask
    # outside): ju/jv columns 0..a-1 by cmask, a..a+5 by imask; rows by mu/mv
    colm = ([cmask[:, i:i + 1] for i in range(a)]
            + [imask[:, i:i + 1] for i in range(6)])
    ju = [_zmul(j, mu, cm) for j, cm in zip(ju, colm)] + [r_u]
    jv = [_zmul(j, mv, cm) for j, cm in zip(jv, colm)] + [r_v]

    # Jk columns (free point): d(u,v)/dXt = d_xc @ (Re Rp), masked by kmask
    jku, jkv = [], []
    for j in range(3):
        rerp_col = [col(offs["rerp"] + 3 * a_ + j) for a_ in range(3)]
        km = kmask[j:j + 1, :]
        jku.append((du_xc[0] * rerp_col[0] + du_xc[1] * rerp_col[1]
                    + du_xc[2] * rerp_col[2]) * mu * km)
        jkv.append((dv_xc[0] * rerp_col[0] + dv_xc[1] * rerp_col[1]
                    + dv_xc[2] * rerp_col[2]) * mv * km)

    # per-block extended gram (cam+pose+residual)
    zb = jnp.zeros(r_u.shape[:1], r_u.dtype)
    gvals = [[None] * gram_w for _ in range(gram_w)]
    for i in range(gram_w):
        for j in range(i, gram_w):
            p = _zpair(ju[i], jv[i], ju[j], jv[j])
            g = zb if p is None else jnp.sum(p, axis=1)
            gvals[i][j] = g
            gvals[j][i] = g
    if weight_fn is not None:
        gvals[gram_w - 1][gram_w - 1] = rcost
    rows = [jnp.stack(gvals[i], axis=-1) for i in range(gram_w)]
    out_ref[:] = jnp.stack(rows, axis=1)

    # per-(block, key) couplings, laid out (8, a*c | b*c, K)
    wck_rows = [_zpair(ju[i], jv[i], jku[j], jkv[j])
                for i in range(a) for j in range(3)]
    wck_ref[:] = jnp.stack(wck_rows, axis=1)            # (8, a*3, K)
    wik_rows = [ju[a + i] * jku[j] + jv[a + i] * jkv[j]
                for i in range(6) for j in range(3)]
    wik_ref[:] = jnp.stack(wik_rows, axis=1)            # (8, 18, K)

    # per-key diag + gradient, accumulated across the sequential grid
    hk_rows = [jnp.sum(jku[i] * jku[j] + jkv[i] * jkv[j], axis=0)
               for i in range(3) for j in range(3)]
    gk_rows = [jnp.sum(jku[i] * r_u + jkv[i] * r_v, axis=0) for i in range(3)]
    pad = [jnp.zeros_like(hk_rows[0])] * 4
    update = jnp.stack(hk_rows + gk_rows + pad, axis=0)  # (16, K)

    @pl.when(pl.program_id(0) == 0)
    def _():
        hkkgk_ref[:] = jnp.zeros_like(hkkgk_ref)

    hkkgk_ref[:] += update


def make_pallas_selfcal_grams(widths, loss: str = "linear",
                              f_scale: float = 1.0,
                              loss_semantics: str = "component"):
    """Drop-in per-block gram builder for the self-cal chain (Pallas);
    serves the standard (a=15), rational (a=18), thin-prism (a=22) and
    tilted (a=24) camera models."""
    from pycamset_tpu.optim.losses import make_loss
    a, bw, c = widths.a, widths.b, widths.c
    assert a in (14, 15, 18, 22, 24) and (bw, c) == (6, 3)
    intr_w = a - 6
    gram_w = a + 6 + 1
    _, ppb = _layout(intr_w)
    if loss != "linear":
        rho_fn, weight_fn = make_loss(loss, f_scale)
        kernel = _make_selfcal_kernel(rho_fn, weight_fn, intr_w,
                                      semantics=loss_semantics)
    else:
        kernel = _make_selfcal_kernel(intr_w=intr_w)

    def grams(cam_b, im_b, keyp, tpl, uv, mask, cmask_b, imask_b, kmask):
        dtype = uv.dtype
        bb, k = mask.shape
        b_pad = ((bb + BLOCK_TILE - 1) // BLOCK_TILE) * BLOCK_TILE
        packed = pack_block_params(cam_b, im_b, intr_w=intr_w)
        uv_t = uv.transpose(0, 2, 1)
        cm, im_, mk = cmask_b, imask_b, mask
        if b_pad != bb:
            reps = b_pad - bb
            packed = jnp.concatenate([packed, jnp.tile(packed[:1], (reps, 1))])
            uv_t = jnp.concatenate(
                [uv_t, jnp.zeros((reps, 2, k), dtype)])
            mk = jnp.concatenate([mk, jnp.zeros((reps, k), dtype)])
            cm = jnp.concatenate([cm, jnp.zeros((reps, a), dtype)])
            im_ = jnp.concatenate([im_, jnp.zeros((reps, bw), dtype)])

        grid = (b_pad // BLOCK_TILE,)
        g, wck_r, wik_r, hkkgk = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BLOCK_TILE, ppb), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, k), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK_TILE, 2, k), lambda i: (i, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK_TILE, k), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK_TILE, a), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK_TILE, bw), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, k), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((BLOCK_TILE, gram_w, gram_w),
                             lambda i: (i, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK_TILE, a * c, k),
                             lambda i: (i, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK_TILE, bw * c, k),
                             lambda i: (i, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, k), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b_pad, gram_w, gram_w), dtype),
                jax.ShapeDtypeStruct((b_pad, a * c, k), dtype),
                jax.ShapeDtypeStruct((b_pad, bw * c, k), dtype),
                jax.ShapeDtypeStruct((16, k), dtype),
            ),
        )(packed, keyp.T, uv_t, mk, cm, im_, kmask.T)

        g = g[:bb]
        cost = jnp.sum(g[:, a + bw, a + bw])
        gcc_b = g[:, :a, :a]
        gii_b = g[:, a:a + bw, a:a + bw]
        wci_b = g[:, :a, a:a + bw]
        gc_b = g[:, :a, a + bw]
        gi_b = g[:, a:a + bw, a + bw]

        # (B, a*c, K) -> (B, K, a, c)
        wck_b = wck_r[:bb].transpose(0, 2, 1).reshape(bb, k, a, c)
        wik_b = wik_r[:bb].transpose(0, 2, 1).reshape(bb, k, bw, c)
        hkk = hkkgk[:9].T.reshape(k, 3, 3)
        gk = hkkgk[9:12].T
        return gcc_b, gii_b, wci_b, hkk, wck_b, wik_b, gc_b, gi_b, gk, cost

    return grams


def make_pallas_freepoint_grams(widths, loss: str = "linear",
                                f_scale: float = 1.0,
                                loss_semantics: str = "component"):
    """Per-block gram builder for the pose-free free-point chain.

    Reuses the self-cal kernel with identity poses (rvec = t = 0 packs to
    Rp = I) and fully-masked pose columns, then strips the zero-width pose
    outputs. ~25% wasted lanes on the masked columns — still far ahead of
    the XLA path.
    """
    from pycamset_tpu.optim.structured import GroupWidths
    a, bw, c = widths.a, widths.b, widths.c
    assert a in (14, 15, 18, 22, 24) and (bw, c) == (0, 3)
    inner = make_pallas_selfcal_grams(GroupWidths(a, 6, 3), loss=loss,
                                      f_scale=f_scale,
                                      loss_semantics=loss_semantics)

    def grams(cam_b, im_b, keyp, tpl, uv, mask, cmask_b, imask_b, kmask):
        bb = mask.shape[0]
        dtype = uv.dtype
        im_fake = jnp.zeros((bb, 6), dtype)
        imask_fake = jnp.zeros((bb, 6), dtype)
        (gcc_b, _gii, _wci, hkk, wck_b, _wik, gc_b, _gi, gk,
         cost) = inner(cam_b, im_fake, keyp, tpl, uv, mask, cmask_b,
                       imask_fake, kmask)
        k_pad = mask.shape[1]
        return (gcc_b, jnp.zeros((bb, 0, 0), dtype),
                jnp.zeros((bb, a, 0), dtype), hkk, wck_b,
                jnp.zeros((bb, k_pad, 0, c), dtype), gc_b,
                jnp.zeros((bb, 0), dtype), gk, cost)

    return grams


def make_pallas_freepoint_grams_fused(widths, n_cams: int, n_ims: int,
                                      loss: str = "linear",
                                      f_scale: float = 1.0,
                                      loss_semantics: str = "component",
                                      tile: int | None = None):
    """Fused-reduction builder for the pose-free free-point chain.

    Same delegation as make_pallas_freepoint_grams — the fused self-cal
    kernel runs with identity poses and fully-masked pose columns — but
    the camera-axis reductions (hcc, gc, wck) fold in-kernel. Returns the
    REDUCED contract with the zero-width pose fields stripped:
    (hcc (C,a,a), hkk (K,3,3), wck (C,K,a,3), gc (C,a), gk (K,3), cost).
    """
    from pycamset_tpu.optim.structured import GroupWidths
    a, bw, c = widths.a, widths.b, widths.c
    assert a in (14, 15, 18, 22, 24) and (bw, c) == (0, 3)
    inner = make_pallas_selfcal_grams_fused(
        GroupWidths(a, 6, 3), n_cams, n_ims, loss=loss, f_scale=f_scale,
        loss_semantics=loss_semantics, tile=tile)

    def grams(cam_b, im_b, keyp, uv, mask, cmask_b, imask_b, kmask):
        bb = mask.shape[0]
        dtype = uv.dtype
        im_fake = jnp.zeros((bb, 6), dtype)
        imask_fake = jnp.zeros((bb, 6), dtype)
        (hcc, _hii, hkk, _wci, wck, _wik, gc, _gi, gk, cost) = inner(
            cam_b, im_fake, keyp, uv, mask, cmask_b, imask_fake, kmask)
        return hcc, hkk, wck, gc, gk, cost

    return grams


# ------------------------------------------------- mixed / grouped chains
#
# Multi-target chains put a per-GROUP SE(3) between the image pose and the
# 3D point:  Xc = Re (Rp (Rg Xp + tg) + tp) + te.  The per-key group data
# (Rg, dRg, the point, and the pre-transformed point Xg = Rg Xp + tg) is
# PER_KEY-constant, so — like the per-block rotations — it is precomputed
# in plain jnp and streamed in as a (KD_ROWS, K) operand.

_KD_XG = 0      # rows 0-2:   Xg = Rg @ Xp + tg  (the chain's input point)
_KD_RG = 3      # rows 3-11:  Rg
_KD_DRG = 12    # rows 12-38: dRg/drvg (3 x 3x3)
_KD_XP = 39     # rows 39-41: the raw point Xp (free key or template)
KD_ROWS = 48    # padded to a lane multiple


def pack_key_group_data(grp6_per_key: jnp.ndarray,
                        pts_per_key: jnp.ndarray) -> jnp.ndarray:
    """(K, 6) per-key group poses + (K, 3) points -> (KD_ROWS, K) operand."""

    def one(g6, p):
        rg = rodrigues_to_matrix(g6[:3])
        drg = jnp.moveaxis(jax.jacfwd(rodrigues_to_matrix)(g6[:3]), -1, 0)
        xg = rg @ p + g6[3:]
        row = jnp.concatenate([xg, rg.reshape(-1), drg.reshape(-1), p])
        return jnp.pad(row, (0, KD_ROWS - row.shape[0]))

    return jax.vmap(one)(grp6_per_key, pts_per_key).T


def _make_mixed_kernel(rho_fn=None, weight_fn=None, intr_w: int = 9,
                       semantics: str = "component",
                       with_key_cols: bool = True):
    def _mixed_kernel(params_ref, kd_ref, uv_ref, mask_ref, cmask_ref,
                      imask_ref, ckmask_ref, out_ref, wcc_ref, wic_ref,
                      acc_ref):
        _mixed_kernel_body(params_ref, kd_ref, uv_ref, mask_ref, cmask_ref,
                           imask_ref, ckmask_ref, out_ref, wcc_ref, wic_ref,
                           acc_ref, rho_fn, weight_fn, intr_w, semantics,
                           with_key_cols)

    return _mixed_kernel


def _mixed_kernel_body(params_ref, kd_ref, uv_ref, mask_ref, cmask_ref,
                       imask_ref, ckmask_ref, out_ref, wcc_ref, wic_ref,
                       acc_ref, rho_fn, weight_fn, intr_w,
                       semantics="component", with_key_cols=True):
    """Mixed multi-target chain: per-block grams + 9-wide c-axis pieces.

    The c-axis is chain-ordered [group rvec 3 | group t 3 | point 3]
    (point columns dropped when with_key_cols=False — the pure grouped
    template chain). Reuses _projection_columns with the pre-transformed
    per-key point Xg standing in for the template."""
    offs, _ = _layout(intr_w)
    a = intr_w + 6
    cw = 9 if with_key_cols else 6
    gram_w = a + 6 + 1
    prm = params_ref[:]
    kd = kd_ref[:]
    cmask = cmask_ref[:]
    imask = imask_ref[:]
    ckmask = ckmask_ref[:]                    # (cw, K)
    (ju, jv, r_u, r_v, rcost, mu, mv, du_xc, dv_xc, col) = _projection_columns(
        prm, kd[_KD_XG:_KD_XG + 3, :], uv_ref[:], mask_ref[:], offs, intr_w,
        rho_fn, weight_fn, semantics)

    colm = ([cmask[:, i:i + 1] for i in range(a)]
            + [imask[:, i:i + 1] for i in range(6)])
    ju = [_zmul(j, mu, cm) for j, cm in zip(ju, colm)] + [r_u]
    jv = [_zmul(j, mv, cm) for j, cm in zip(jv, colm)] + [r_v]

    def kd_row(i):                            # (1, K) per-key constant row
        return kd[i:i + 1, :]

    def chain_dxc(dxc, j):
        """(du.dxc, dv.dxc) for one world-space direction triple."""
        km = ckmask[j:j + 1, :]
        u = (du_xc[0] * dxc[0] + du_xc[1] * dxc[1] + du_xc[2] * dxc[2])
        v = (dv_xc[0] * dxc[0] + dv_xc[1] * dxc[1] + dv_xc[2] * dxc[2])
        return u * mu * km, v * mv * km

    jcu, jcv = [], []
    # group rotation: dXc/drvg[j] = (Re Rp) (dRg[j] Xp)
    for j in range(3):
        w = [kd_row(_KD_DRG + 9 * j + 3 * b_ + 0) * kd_row(_KD_XP + 0)
             + kd_row(_KD_DRG + 9 * j + 3 * b_ + 1) * kd_row(_KD_XP + 1)
             + kd_row(_KD_DRG + 9 * j + 3 * b_ + 2) * kd_row(_KD_XP + 2)
             for b_ in range(3)]
        dxc = [col(offs["rerp"] + 3 * a_ + 0) * w[0]
               + col(offs["rerp"] + 3 * a_ + 1) * w[1]
               + col(offs["rerp"] + 3 * a_ + 2) * w[2] for a_ in range(3)]
        u, v = chain_dxc(dxc, j)
        jcu.append(u)
        jcv.append(v)
    # group translation: dXc/dtg = Re Rp (per-block columns)
    for j in range(3):
        dxc = [col(offs["rerp"] + 3 * a_ + j) for a_ in range(3)]
        u, v = chain_dxc(dxc, 3 + j)
        jcu.append(u)
        jcv.append(v)
    if with_key_cols:
        # point: dXc/dXp = (Re Rp) Rg (columns vary per key)
        for j in range(3):
            dxc = [col(offs["rerp"] + 3 * a_ + 0) * kd_row(_KD_RG + 0 + j)
                   + col(offs["rerp"] + 3 * a_ + 1) * kd_row(_KD_RG + 3 + j)
                   + col(offs["rerp"] + 3 * a_ + 2) * kd_row(_KD_RG + 6 + j)
                   for a_ in range(3)]
            u, v = chain_dxc(dxc, 6 + j)
            jcu.append(u)
            jcv.append(v)

    # per-block extended gram over [cam | im | r]
    zb = jnp.zeros(r_u.shape[:1], r_u.dtype)
    gvals = [[None] * gram_w for _ in range(gram_w)]
    for i in range(gram_w):
        for j in range(i, gram_w):
            p = _zpair(ju[i], jv[i], ju[j], jv[j])
            g = zb if p is None else jnp.sum(p, axis=1)
            gvals[i][j] = g
            gvals[j][i] = g
    if weight_fn is not None:
        gvals[gram_w - 1][gram_w - 1] = rcost
    rows = [jnp.stack(gvals[i], axis=-1) for i in range(gram_w)]
    out_ref[:] = jnp.stack(rows, axis=1)

    # per-(block, key) couplings against the c columns
    wcc_ref[:] = jnp.stack([_zpair(ju[i], jv[i], jcu[j], jcv[j])
                            for i in range(a) for j in range(cw)], axis=1)
    wic_ref[:] = jnp.stack([ju[a + i] * jcu[j] + jv[a + i] * jcv[j]
                            for i in range(6) for j in range(cw)], axis=1)

    # per-key c-gram + c-gradient, accumulated across the sequential grid
    hk_rows = [jnp.sum(jcu[i] * jcu[j] + jcv[i] * jcv[j], axis=0)
               for i in range(cw) for j in range(cw)]
    gk_rows = [jnp.sum(jcu[i] * r_u + jcv[i] * r_v, axis=0)
               for i in range(cw)]
    body = hk_rows + gk_rows
    acc_rows = acc_ref.shape[0]
    pad = [jnp.zeros_like(body[0])] * (acc_rows - len(body))
    update = jnp.stack(body + pad, axis=0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += update


def _mixed_grams_factory(widths, loss, f_scale, loss_semantics,
                         with_key_cols):
    """Shared builder behind the mixed (c=9) and grouped (c=6) chains."""
    from pycamset_tpu.optim.losses import make_loss
    a, bw = widths.a, widths.b
    cw = 9 if with_key_cols else 6
    assert a in (14, 15, 18, 22, 24) and bw == 6 and widths.c == cw
    intr_w = a - 6
    gram_w = a + 6 + 1
    _, ppb = _layout(intr_w)
    acc_rows = -(-(cw * cw + cw) // 8) * 8
    if loss != "linear":
        rho_fn, weight_fn = make_loss(loss, f_scale)
        kernel = _make_mixed_kernel(rho_fn, weight_fn, intr_w,
                                    semantics=loss_semantics,
                                    with_key_cols=with_key_cols)
    else:
        kernel = _make_mixed_kernel(intr_w=intr_w,
                                    with_key_cols=with_key_cols)

    # the (T, a*cw, k) + (T, 6*cw, k) output blocks are double-buffered in
    # scoped VMEM; at T=16 the bench mixed shape (k=384, a=15, cw=9) costs
    # 16.9M against the 16M limit (measured OOM), so this family caps at 8
    tile = min(BLOCK_TILE, 8)

    def grams(cam_b, im_b, keyp, tpl, uv, mask, cmask_b, imask_b, kmask):
        dtype = uv.dtype
        bb, k = mask.shape
        b_pad = ((bb + tile - 1) // tile) * tile
        packed = pack_block_params(cam_b, im_b, intr_w=intr_w)
        # chain order: keyp = [group pose 6 | free point 3]; the grouped
        # template chain (no key columns) takes the point from tpl
        pts = keyp[:, 6:9] if with_key_cols else tpl[:, :3]
        kd = pack_key_group_data(keyp[:, :6], pts).astype(dtype)
        uv_t = uv.transpose(0, 2, 1)
        cm, im_, mk = cmask_b, imask_b, mask
        if b_pad != bb:
            reps = b_pad - bb
            packed = jnp.concatenate([packed, jnp.tile(packed[:1], (reps, 1))])
            uv_t = jnp.concatenate([uv_t, jnp.zeros((reps, 2, k), dtype)])
            mk = jnp.concatenate([mk, jnp.zeros((reps, k), dtype)])
            cm = jnp.concatenate([cm, jnp.zeros((reps, a), dtype)])
            im_ = jnp.concatenate([im_, jnp.zeros((reps, 6), dtype)])

        grid = (b_pad // tile,)
        g, wcc_r, wic_r, acc = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, ppb), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KD_ROWS, k), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 2, k), lambda i: (i, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, k), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, a), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 6), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cw, k), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((tile, gram_w, gram_w),
                             lambda i: (i, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, a * cw, k),
                             lambda i: (i, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 6 * cw, k),
                             lambda i: (i, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((acc_rows, k), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b_pad, gram_w, gram_w), dtype),
                jax.ShapeDtypeStruct((b_pad, a * cw, k), dtype),
                jax.ShapeDtypeStruct((b_pad, 6 * cw, k), dtype),
                jax.ShapeDtypeStruct((acc_rows, k), dtype),
            ),
        )(packed, kd, uv_t, mk, cm, im_, kmask.T)

        g = g[:bb]
        cost = jnp.sum(g[:, a + 6, a + 6])
        gcc_b = g[:, :a, :a]
        gii_b = g[:, a:a + 6, a:a + 6]
        wci_b = g[:, :a, a:a + 6]
        gc_b = g[:, :a, a + 6]
        gi_b = g[:, a:a + 6, a + 6]
        wck_b = wcc_r[:bb].transpose(0, 2, 1).reshape(bb, k, a, cw)
        wik_b = wic_r[:bb].transpose(0, 2, 1).reshape(bb, k, 6, cw)
        hkk = acc[:cw * cw].T.reshape(k, cw, cw)
        gk = acc[cw * cw:cw * cw + cw].T
        return gcc_b, gii_b, wci_b, hkk, wck_b, wik_b, gc_b, gi_b, gk, cost

    return grams


def _make_fused_mixed_kernel(rho_fn=None, weight_fn=None, intr_w: int = 9,
                             semantics: str = "component",
                             with_key_cols: bool = True,
                             steps_per_cam: int = 1):
    """Mixed-chain kernel emitting REDUCED normal-equation pieces.

    Same projection + c-axis columns as _mixed_kernel_body, but hcc, gc
    and the (a*cw, K) couplings wcc accumulate per camera in-kernel (the
    grid is image-minor within each camera), so the (B, K, a, cw)
    coupling tensor (~530 MB at the bench 2-target shape) never exists in
    HBM and its XLA transpose/reshape/sum passes disappear. Only wic (the
    smaller 6*cw coupling), the per-block pose pieces and the resident
    hkk/gk accumulator are written per block.
    """

    def _kernel(params_ref, kd_ref, uv_ref, mask_ref, cmask_ref, imask_ref,
                ckmask_ref, hcc_ref, gc_ref, wcc_ref, wic_ref, wci_ref,
                gii_ref, gi_ref, corner_ref, acc_ref):
        _fused_mixed_body(params_ref, kd_ref, uv_ref, mask_ref, cmask_ref,
                          imask_ref, ckmask_ref, hcc_ref, gc_ref, wcc_ref,
                          wic_ref, wci_ref, gii_ref, gi_ref, corner_ref,
                          acc_ref, rho_fn, weight_fn, intr_w, semantics,
                          with_key_cols, steps_per_cam)

    return _kernel


def _fused_mixed_body(params_ref, kd_ref, uv_ref, mask_ref, cmask_ref,
                      imask_ref, ckmask_ref, hcc_ref, gc_ref, wcc_ref,
                      wic_ref, wci_ref, gii_ref, gi_ref, corner_ref,
                      acc_ref, rho_fn, weight_fn, intr_w, semantics,
                      with_key_cols, steps_per_cam):
    offs, _ = _layout(intr_w)
    a = intr_w + 6
    cw = 9 if with_key_cols else 6
    gram_w = a + 6 + 1
    w = gram_w - 1
    prm = params_ref[:]
    kd = kd_ref[:]
    cmask = cmask_ref[:]
    imask = imask_ref[:]
    ckmask = ckmask_ref[:]                    # (cw, K)
    (ju, jv, r_u, r_v, rcost, mu, mv, du_xc, dv_xc, col) = _projection_columns(
        prm, kd[_KD_XG:_KD_XG + 3, :], uv_ref[:], mask_ref[:], offs, intr_w,
        rho_fn, weight_fn, semantics)

    colm = ([cmask[:, i:i + 1] for i in range(a)]
            + [imask[:, i:i + 1] for i in range(6)])
    ju = [_zmul(j, mu, cm) for j, cm in zip(ju, colm)] + [r_u]
    jv = [_zmul(j, mv, cm) for j, cm in zip(jv, colm)] + [r_v]

    def kd_row(i):                            # (1, K) per-key constant row
        return kd[i:i + 1, :]

    def chain_dxc(dxc, j):
        km = ckmask[j:j + 1, :]
        u = (du_xc[0] * dxc[0] + du_xc[1] * dxc[1] + du_xc[2] * dxc[2])
        v = (dv_xc[0] * dxc[0] + dv_xc[1] * dxc[1] + dv_xc[2] * dxc[2])
        return u * mu * km, v * mv * km

    jcu, jcv = [], []
    # group rotation: dXc/drvg[j] = (Re Rp) (dRg[j] Xp)
    for j in range(3):
        w_ = [kd_row(_KD_DRG + 9 * j + 3 * b_ + 0) * kd_row(_KD_XP + 0)
              + kd_row(_KD_DRG + 9 * j + 3 * b_ + 1) * kd_row(_KD_XP + 1)
              + kd_row(_KD_DRG + 9 * j + 3 * b_ + 2) * kd_row(_KD_XP + 2)
              for b_ in range(3)]
        dxc = [col(offs["rerp"] + 3 * a_ + 0) * w_[0]
               + col(offs["rerp"] + 3 * a_ + 1) * w_[1]
               + col(offs["rerp"] + 3 * a_ + 2) * w_[2] for a_ in range(3)]
        u, v = chain_dxc(dxc, j)
        jcu.append(u)
        jcv.append(v)
    # group translation: dXc/dtg = Re Rp (per-block columns)
    for j in range(3):
        dxc = [col(offs["rerp"] + 3 * a_ + j) for a_ in range(3)]
        u, v = chain_dxc(dxc, 3 + j)
        jcu.append(u)
        jcv.append(v)
    if with_key_cols:
        # point: dXc/dXp = (Re Rp) Rg (columns vary per key)
        for j in range(3):
            dxc = [col(offs["rerp"] + 3 * a_ + 0) * kd_row(_KD_RG + 0 + j)
                   + col(offs["rerp"] + 3 * a_ + 1) * kd_row(_KD_RG + 3 + j)
                   + col(offs["rerp"] + 3 * a_ + 2) * kd_row(_KD_RG + 6 + j)
                   for a_ in range(3)]
            u, v = chain_dxc(dxc, 6 + j)
            jcu.append(u)
            jcv.append(v)

    zb = jnp.zeros(r_u.shape[:1], r_u.dtype)
    gvals = [[None] * gram_w for _ in range(gram_w)]
    for i in range(gram_w):
        for j in range(i, gram_w):
            p = _zpair(ju[i], jv[i], ju[j], jv[j])
            g = zb if p is None else jnp.sum(p, axis=1)
            gvals[i][j] = g
            gvals[j][i] = g
    if weight_fn is not None:
        gvals[w][w] = rcost

    # per-cam accumulators (image-minor grid: steps_per_cam consecutive
    # revisits per cam block; np.int32 — see _fused_template_body)
    @pl.when(pl.program_id(0) % np.int32(steps_per_cam) == 0)
    def _():
        hcc_ref[:] = jnp.zeros_like(hcc_ref)
        gc_ref[:] = jnp.zeros_like(gc_ref)
        wcc_ref[:] = jnp.zeros_like(wcc_ref)

    cc = jnp.stack([jnp.stack([gvals[i][j] for j in range(a)], axis=-1)
                    for i in range(a)], axis=1)               # (T, a, a)
    hcc_ref[:] += jnp.sum(cc, axis=0)[None]
    gc_ref[:] += jnp.sum(
        jnp.stack([gvals[i][w] for i in range(a)], axis=-1), axis=0)[None,
                                                                     None]
    wcc_ref[:] += jnp.stack(
        [jnp.sum(_zpair(ju[i], jv[i], jcu[j], jcv[j]), axis=0)
         for i in range(a) for j in range(cw)], axis=0)[None]

    # per-block pieces
    wic_ref[:] = jnp.stack([ju[a + i] * jcu[j] + jv[a + i] * jcv[j]
                            for i in range(6) for j in range(cw)], axis=1)
    wci_ref[:] = jnp.stack(
        [jnp.stack([gvals[i][a + j] for j in range(6)], axis=-1)
         for i in range(a)], axis=1)                           # (T, a, 6)
    gii_ref[:] = jnp.stack(
        [jnp.stack([gvals[a + i][a + j] for j in range(6)], axis=-1)
         for i in range(6)], axis=1)                           # (T, 6, 6)
    gi_ref[:] = jnp.stack([gvals[a + i][w] for i in range(6)], axis=-1)
    corner_ref[:] = gvals[w][w][:, None]

    # per-key c-gram + c-gradient, accumulated across the whole grid
    hk_rows = [jnp.sum(jcu[i] * jcu[j] + jcv[i] * jcv[j], axis=0)
               for i in range(cw) for j in range(cw)]
    gk_rows = [jnp.sum(jcu[i] * r_u + jcv[i] * r_v, axis=0)
               for i in range(cw)]
    body = hk_rows + gk_rows
    acc_rows = acc_ref.shape[0]
    pad = [jnp.zeros_like(body[0])] * (acc_rows - len(body))
    update = jnp.stack(body + pad, axis=0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += update


def make_pallas_mixed_grams_fused(widths, n_cams: int, n_ims: int,
                                  loss: str = "linear", f_scale: float = 1.0,
                                  loss_semantics: str = "component",
                                  with_key_cols: bool = True,
                                  tile: int = 8):
    """Fused-reduction mixed/grouped gram builder (Pallas, TPU).

    Contract (REDUCED pieces, vs _mixed_grams_factory's per-block):
    grams(cam_b, im_b, keyp, tpl, uv, mask, cmask_b, imask_b, kmask) ->
    (hcc (C,a,a), hii (I,6,6), hkk_f (K,cw,cw), wci (C,I,a,6),
     wck_f (C,K,a,cw), wik_f (I,K,6,cw), gc (C,a), gi (I,6),
     gk_f (K,cw), cost). The image axis pads to the tile (pad blocks
    replicate a real block with mask=0 — exact-zero contributions).
    The tile stays at 8: this family's per-key output blocks OOM scoped
    VMEM at 16 (see _mixed_grams_factory).
    """
    from pycamset_tpu.optim.losses import make_loss
    a, bw = widths.a, widths.b
    cw = 9 if with_key_cols else 6
    assert a in (14, 15, 18, 22, 24) and bw == 6 and widths.c == cw
    intr_w = a - 6
    _, ppb = _layout(intr_w)
    acc_rows = -(-(cw * cw + cw) // 8) * 8

    t = tile
    i_pad = -(-n_ims // t) * t
    spc = i_pad // t
    if loss != "linear":
        rho_fn, weight_fn = make_loss(loss, f_scale)
        kernel = _make_fused_mixed_kernel(rho_fn, weight_fn, intr_w,
                                          semantics=loss_semantics,
                                          with_key_cols=with_key_cols,
                                          steps_per_cam=spc)
    else:
        kernel = _make_fused_mixed_kernel(intr_w=intr_w,
                                          with_key_cols=with_key_cols,
                                          steps_per_cam=spc)

    def grams(cam_b, im_b, keyp, tpl, uv, mask, cmask_b, imask_b, kmask):
        dtype = uv.dtype
        _, k = mask.shape
        packed = pack_block_params(cam_b, im_b, intr_w=intr_w)
        pts = keyp[:, 6:9] if with_key_cols else tpl[:, :3]
        kd = pack_key_group_data(keyp[:, :6], pts).astype(dtype)
        uv_t = uv.transpose(0, 2, 1)
        if i_pad != n_ims:
            padi = _pad_image_axis(n_cams, n_ims, i_pad)
            packed = padi(packed, "edge")
            uv_t = padi(uv_t, "zero")
            mask_p = padi(mask, "zero")
            cmask_p = padi(cmask_b, "edge")
            imask_p = padi(imask_b, "edge")
        else:
            mask_p, cmask_p, imask_p = mask, cmask_b, imask_b

        b_pad = n_cams * i_pad
        grid = (b_pad // t,)
        (hcc, gc, wcc_r, wic_r, wci, gii, gi, corner,
         acc) = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((t, ppb), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KD_ROWS, k), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 2, k), lambda i: (i, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, k), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, a), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 6), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cw, k), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, a, a),
                             lambda i: (i // np.int32(spc), i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, a),
                             lambda i: (i // np.int32(spc), i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, a * cw, k),
                             lambda i: (i // np.int32(spc), i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 6 * cw, k), lambda i: (i, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, a, 6), lambda i: (i, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 6, 6), lambda i: (i, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 6), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, 1), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((acc_rows, k), lambda i: (i * 0, i * 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_cams, a, a), dtype),
                jax.ShapeDtypeStruct((n_cams, 1, a), dtype),
                jax.ShapeDtypeStruct((n_cams, a * cw, k), dtype),
                jax.ShapeDtypeStruct((b_pad, 6 * cw, k), dtype),
                jax.ShapeDtypeStruct((b_pad, a, 6), dtype),
                jax.ShapeDtypeStruct((b_pad, 6, 6), dtype),
                jax.ShapeDtypeStruct((b_pad, 6), dtype),
                jax.ShapeDtypeStruct((b_pad, 1), dtype),
                jax.ShapeDtypeStruct((acc_rows, k), dtype),
            ),
        )(packed, kd, uv_t, mask_p, cmask_p, imask_p, kmask.T)

        wci_r = wci.reshape(n_cams, i_pad, a, 6)[:, :n_ims]
        hii = jnp.sum(gii.reshape(n_cams, i_pad, 6, 6)[:, :n_ims], axis=0)
        gi_r = jnp.sum(gi.reshape(n_cams, i_pad, 6)[:, :n_ims], axis=0)
        cost = jnp.sum(corner.reshape(n_cams, i_pad)[:, :n_ims])
        wck_f = wcc_r.transpose(0, 2, 1).reshape(n_cams, k, a, cw)
        wik_f = jnp.sum(
            wic_r.reshape(n_cams, i_pad, 6 * cw, k)[:, :n_ims], axis=0
        ).transpose(0, 2, 1).reshape(n_ims, k, 6, cw)
        hkk_f = acc[:cw * cw].T.reshape(k, cw, cw)
        gk_f = acc[cw * cw:cw * cw + cw].T
        return (hcc, hii, hkk_f, wci_r, wck_f, wik_f, gc[:, 0], gi_r,
                gk_f, cost)

    return grams


def make_pallas_mixed_grams(widths, loss: str = "linear",
                            f_scale: float = 1.0,
                            loss_semantics: str = "component"):
    """Per-block gram builder for the MIXED multi-target self-cal chain
    (Projection* + Extrinsic3D + RigidTform3d + GroupRigidTform3d +
    FreePoint): c-axis = [group pose 6 | free point 3]. Same contract as
    make_block_grams with GroupWidths(a, 6, 9)."""
    return _mixed_grams_factory(widths, loss, f_scale, loss_semantics,
                                with_key_cols=True)


def make_pallas_grouped_grams(widths, loss: str = "linear",
                              f_scale: float = 1.0,
                              loss_semantics: str = "component"):
    """Per-block gram builder for the pure grouped template chain
    (Projection* + Extrinsic3D + RigidTform3d + GroupTemplatePoints):
    c-axis = the 6 group-pose columns, the 3D point comes from the
    template table. Same contract as make_block_grams with
    GroupWidths(a, 6, 6)."""
    return _mixed_grams_factory(widths, loss, f_scale, loss_semantics,
                                with_key_cols=False)


def make_pallas_template_grams(widths, loss: str = "linear",
                               f_scale: float = 1.0,
                               loss_semantics: str = "component"):
    """A drop-in per-block gram builder using the Pallas kernel.

    Same contract as make_block_grams for the template chain (c == 0);
    serves the standard (a=15), rational (a=18), thin-prism (a=22) and
    tilted (a=24) camera models.
    grams(cam_b, im_b, keyp, tpl, uv, mask, cmask_b, imask_b, kmask) ->
    (gcc_b, gii_b, wci_b, hkk, wck_b, wik_b, gc_b, gi_b, gk, cost).
    """
    a, bwidth = widths.a, widths.b
    assert (bwidth, widths.c) == (6, 0) and a in (14, 15, 18, 22, 24)
    intr_w = a - 6

    def grams(cam_b, im_b, keyp, tpl, uv, mask, cmask_b, imask_b, kmask):
        packed = pack_block_params(cam_b, im_b, intr_w=intr_w)
        g = template_gram_pallas(packed, tpl.T, uv.transpose(0, 2, 1), mask,
                                 loss=loss, f_scale=f_scale, intr_w=intr_w,
                                 loss_semantics=loss_semantics)

        cost = jnp.sum(g[:, a + bwidth, a + bwidth])
        cmask2 = cmask_b[:, :, None] * cmask_b[:, None, :]
        imask2 = imask_b[:, :, None] * imask_b[:, None, :]
        gcc_b = g[:, :a, :a] * cmask2
        gii_b = g[:, a:a + bwidth, a:a + bwidth] * imask2
        wci_b = (g[:, :a, a:a + bwidth]
                 * cmask_b[:, :, None] * imask_b[:, None, :])
        gc_b = g[:, :a, a + bwidth] * cmask_b
        gi_b = g[:, a:a + bwidth, a + bwidth] * imask_b

        bb, k_pad = mask.shape
        dtype = uv.dtype
        hkk = jnp.zeros((k_pad, 0, 0), dtype)
        wck_b = jnp.zeros((bb, k_pad, a, 0), dtype)
        wik_b = jnp.zeros((bb, k_pad, bwidth, 0), dtype)
        gk = jnp.zeros((k_pad, 0), dtype)
        return gcc_b, gii_b, wci_b, hkk, wck_b, wik_b, gc_b, gi_b, gk, cost

    return grams
