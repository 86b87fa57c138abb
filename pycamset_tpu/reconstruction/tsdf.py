"""TSDF fusion + marching-tetrahedra meshing: depth maps to a surface.

Completes the in-framework MVS pipeline (plane sweep -> fusion -> MESH);
the reference stops at exporting inputs for external MVS tools
(``pyCamSet/reconstruction/acmmp_utils.py``) and never produces a
surface. Design:

- **TSDF fusion** runs on-device: one jitted program builds the voxel
  grid with broadcasted iotas, projects every voxel into each depth map
  (``lax.scan`` over views), and accumulates the truncated signed
  distance as a running weighted mean. Voxels are only updated in front
  of / just behind observed surface (the standard KinectFusion rule).
- **Marching tetrahedra** runs host-side (numpy): each cube splits into
  6 tetrahedra around its main diagonal, and every tetrahedron's
  surface piece follows from its 4 corner signs alone — no 256-entry
  case table to transcribe (and get wrong). Zero crossings interpolate
  linearly, so a LINEAR SDF field meshes to exact vertex positions —
  the unit-test oracle. Triangles are oriented by the local
  inside->outside direction, and vertices dedup to a watertight index.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pycamset_tpu.models.camera import Camera

# the 6 tetrahedra of a cube, as corner indices of the standard corner
# order (x + 2y + 4z bit layout below); all share the 0-6 main diagonal
_CUBE_OFFSETS = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
                          [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]])
_TETS = np.array([[0, 1, 3, 7], [0, 3, 2, 7], [0, 2, 6, 7],
                  [0, 6, 4, 7], [0, 4, 5, 7], [0, 5, 1, 7]])


@functools.partial(jax.jit, static_argnames=("dims",))
def _tsdf_accumulate(depths, projs, origin, voxel, trunc, dims):
    """Scan the views, returning (tsdf (X,Y,Z) in [-1, 1], weight)."""
    nx, ny, nz = dims
    ix = jax.lax.broadcasted_iota(depths.dtype, dims, 0)
    iy = jax.lax.broadcasted_iota(depths.dtype, dims, 1)
    iz = jax.lax.broadcasted_iota(depths.dtype, dims, 2)
    xs = origin[0] + (ix + 0.5) * voxel
    ys = origin[1] + (iy + 0.5) * voxel
    zs = origin[2] + (iz + 0.5) * voxel
    h, w = depths.shape[1:]

    def step(carry, view):
        tsdf, wsum = carry
        depth, proj = view
        u = proj[0, 0] * xs + proj[0, 1] * ys + proj[0, 2] * zs + proj[0, 3]
        v = proj[1, 0] * xs + proj[1, 1] * ys + proj[1, 2] * zs + proj[1, 3]
        z = proj[2, 0] * xs + proj[2, 1] * ys + proj[2, 2] * zs + proj[2, 3]
        safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
        ui = jnp.round(u / safe_z).astype(jnp.int32)
        vi = jnp.round(v / safe_z).astype(jnp.int32)
        inb = (z > 0) & (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
        d = depth[jnp.clip(vi, 0, h - 1), jnp.clip(ui, 0, w - 1)]
        sdf = d - z                       # + in front of surface, - behind
        # observe free space fully, the near side of the surface down to
        # -trunc; never carve behind the observed surface
        ok = inb & jnp.isfinite(d) & (sdf > -trunc)
        obs = jnp.clip(sdf / trunc, -1.0, 1.0)
        okf = ok.astype(tsdf.dtype)
        new_w = wsum + okf
        tsdf = (tsdf * wsum + obs * okf) / jnp.maximum(new_w, 1.0)
        return (tsdf, new_w), None

    init = (jnp.zeros(dims, depths.dtype), jnp.zeros(dims, depths.dtype))
    (tsdf, wsum), _ = jax.lax.scan(step, init, (depths, projs))
    return tsdf, wsum


def tsdf_fuse(cams: list[Camera], depths, origin, voxel: float,
              dims: tuple[int, int, int], trunc: float | None = None):
    """Fuse per-view depth maps into a truncated signed distance grid.

    :param cams: one Camera per depth map (undistorted pinhole domain).
    :param depths: (H, W) maps, NaN = invalid (``plane_sweep_depth``).
    :param origin: world position of the grid corner (voxel (0,0,0)'s
        low corner; centres sit half a voxel in).
    :param voxel: edge length of one voxel.
    :param dims: grid shape (nx, ny, nz).
    :param trunc: truncation band (default 3 voxels).
    :return: (tsdf (nx,ny,nz) in [-1,1], weight (nx,ny,nz) = number of
        views that observed each voxel).
    """
    depths = [np.asarray(d) for d in depths]
    depths = [d.astype(np.float64) if d.dtype.kind != "f" else d
              for d in depths]
    if len(depths) != len(cams):
        raise ValueError("need exactly one depth map per camera")
    shape = depths[0].shape
    if any(d.shape != shape for d in depths):
        raise ValueError("all depth maps must share one resolution")
    trunc = 3.0 * voxel if trunc is None else float(trunc)
    dt = np.result_type(*[d.dtype for d in depths])
    projs = np.stack([c.intrinsic @ c.extrinsic[:3, :4] for c in cams])
    tsdf, wsum = _tsdf_accumulate(
        jnp.asarray(np.stack(depths), dt), jnp.asarray(projs, dt),
        jnp.asarray(np.asarray(origin), dt),
        dt.type(voxel), dt.type(trunc), tuple(int(d) for d in dims))
    return np.asarray(jax.device_get(tsdf)), np.asarray(
        jax.device_get(wsum))


def _emit_tet_triangles(vals, pts, iso):
    """Surface triangles of tetrahedra from 4 corner values + positions.

    :param vals: (M, 4) corner values, finite. :param pts: (M, 4, 3).
    :return: (T, 3, 3) triangle vertex positions, oriented so normals
        point from inside (val < iso) to outside.
    """
    inside = vals < iso
    tris = []

    def cross_pt(rows, a, b):
        va, vb = vals[rows, a], vals[rows, b]
        t = ((iso - va) / (vb - va))[:, None]
        return pts[rows, a] + t * (pts[rows, b] - pts[rows, a])

    code = (inside * np.array([1, 2, 4, 8])).sum(axis=1)
    for c in range(1, 15):
        rows = np.flatnonzero(code == c)
        if rows.size == 0:
            continue
        ins = [i for i in range(4) if c & (1 << i)]
        outs = [i for i in range(4) if not c & (1 << i)]
        if len(ins) == 1:
            i = ins[0]
            tris.append(np.stack([cross_pt(rows, i, o) for o in outs],
                                 axis=1))
        elif len(ins) == 3:
            o = outs[0]
            tris.append(np.stack([cross_pt(rows, i, o) for i in ins],
                                 axis=1))
        else:                              # 2 in / 2 out -> quad
            i0, i1 = ins
            o0, o1 = outs
            q = [cross_pt(rows, i0, o0), cross_pt(rows, i0, o1),
                 cross_pt(rows, i1, o1), cross_pt(rows, i1, o0)]
            tris.append(np.stack([q[0], q[1], q[2]], axis=1))
            tris.append(np.stack([q[0], q[2], q[3]], axis=1))
        # orient: normal along the local inside -> outside direction
        t = tris[-1] if len(ins) != 2 else None
        for k in (1, 2) if len(ins) == 2 else (1,):
            tri = tris[-k]
            n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
            grad = (pts[rows][:, outs].mean(axis=1)
                    - pts[rows][:, ins].mean(axis=1))
            flip = (n * grad).sum(axis=1) < 0
            tri[flip] = tri[flip][:, ::-1]
    if not tris:
        return np.zeros((0, 3, 3))
    return np.concatenate(tris, axis=0)


def marching_tetrahedra(vol: np.ndarray, origin=(0.0, 0.0, 0.0),
                        voxel: float = 1.0, iso: float = 0.0,
                        mask: np.ndarray | None = None):
    """Extract the iso-surface of a scalar grid as a triangle mesh.

    :param vol: (nx, ny, nz) scalar field sampled at VOXEL CENTRES.
    :param mask: optional (nx, ny, nz) validity (e.g. tsdf weight > 0);
        cubes with any invalid corner are skipped.
    :return: (verts (V, 3) world coords, faces (T, 3) int indices);
        vertices are deduplicated, triangles wound so normals point
        toward increasing field values (outside, for a signed distance).
    """
    vol = np.asarray(vol, dtype=np.float64)
    ok = np.isfinite(vol)
    if mask is not None:
        ok &= np.asarray(mask, dtype=bool)
    # gather the 8 corner values per cube; keep cubes that are fully
    # valid and straddle the iso level
    corners = np.stack([vol[o[0]:vol.shape[0] - 1 + o[0],
                            o[1]:vol.shape[1] - 1 + o[1],
                            o[2]:vol.shape[2] - 1 + o[2]]
                        for o in _CUBE_OFFSETS], axis=-1)
    valid = np.stack([ok[o[0]:ok.shape[0] - 1 + o[0],
                         o[1]:ok.shape[1] - 1 + o[1],
                         o[2]:ok.shape[2] - 1 + o[2]]
                      for o in _CUBE_OFFSETS], axis=-1).all(axis=-1)
    cross = valid & (corners.min(axis=-1) < iso) & (corners.max(axis=-1)
                                                    >= iso)
    cix, ciy, ciz = np.nonzero(cross)
    if cix.size == 0:
        return np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int64)
    base = np.stack([cix, ciy, ciz], axis=1).astype(np.float64)
    cpts = ((base[:, None, :] + _CUBE_OFFSETS[None] + 0.5) * voxel
            + np.asarray(origin, dtype=np.float64)[None, None])
    cvals = corners[cix, ciy, ciz]                    # (M, 8)

    tris = [_emit_tet_triangles(cvals[:, tet], cpts[:, tet], iso)
            for tet in _TETS]
    tris = np.concatenate(tris, axis=0)               # (T, 3, 3)

    # dedup vertices (zero crossings on shared edges coincide exactly up
    # to fp rounding; quantise at 1e-9 voxels)
    flat = tris.reshape(-1, 3)
    keys = np.round(flat / (1e-9 * voxel)).astype(np.int64)
    _, idx, inv = np.unique(keys, axis=0, return_index=True,
                            return_inverse=True)
    verts = flat[idx]
    faces = inv.reshape(-1, 3)
    # drop degenerate triangles (two corners on the same dedup vertex)
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2]))
    return verts, faces[good]


def dense_mesh(cams: list[Camera], images, near: float, far: float,
               voxel: float | None = None, dims_cap: int = 160,
               trunc: float | None = None, min_weight: int = 2,
               pad_voxels: int = 4, **recon_kwargs):
    """Full MVS to a triangle mesh: sweep, fuse, TSDF, march.

    :param voxel: voxel edge; default sizes the fused cloud's robust
        bounding box to at most ``dims_cap`` voxels per axis.
    :param min_weight: views that must have observed a voxel for its
        cubes to mesh.
    :param recon_kwargs: forwarded to ``dense_reconstruct``.
    :return: ``dense_reconstruct`` dict + ``verts``/``faces`` and the
        grid (``tsdf``, ``tsdf_weight``, ``origin``, ``voxel``).
    """
    from pycamset_tpu.reconstruction.fusion import dense_reconstruct

    out = dense_reconstruct(cams, images, near=near, far=far,
                            **recon_kwargs)
    pts = out["points"]
    if pts.shape[0] < 100:
        raise ValueError("too few fused points to bound a TSDF volume")
    lo = np.percentile(pts, 1.0, axis=0)
    hi = np.percentile(pts, 99.0, axis=0)
    if voxel is None:
        voxel = float(np.max(hi - lo) / dims_cap)
    lo = lo - pad_voxels * voxel
    hi = hi + pad_voxels * voxel
    dims = tuple(int(np.ceil((hi[i] - lo[i]) / voxel)) for i in range(3))

    kept = [i for i, d in enumerate(out["depths"]) if d is not None]
    tsdf, wsum = tsdf_fuse([cams[i] for i in kept],
                           [out["depths"][i] for i in kept],
                           lo, voxel, dims, trunc=trunc)
    verts, faces = marching_tetrahedra(tsdf, origin=lo, voxel=voxel,
                                       mask=wsum >= min_weight)
    out.update(verts=verts, faces=faces, tsdf=tsdf, tsdf_weight=wsum,
               origin=lo, voxel=voxel)
    return out
