"""Fused Pallas kernels inside the sharded backends — interpret mode on the
8-device virtual CPU mesh.

The chip tier proves the fused-sharded composition compiles through Mosaic
and matches the per-block path, but its mesh has ONE device, so the
per-device slab dims equal the global dims there. These tests force the
fused dispatch on the CPU mesh (backend proxy + pallas interpret shim) and
check parity against the XLA closed form with genuinely LOCAL slabs:
c_loc < n_cams (cam axis), i_loc < n_ims (pose axis), k_loc < k_pad (key
axis) — i.e. that the shard-local in-kernel accumulations really are
completed by the psum.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pycamset_tpu.optim.blocks import (Extrinsic3D, FreePoint, Projection,
                                       RigidTform3d, TemplatePoints)
from pycamset_tpu.optim.chain import OptimFunction
from pycamset_tpu.optim.structured import (
    ParamPieces, build_block_arrays, chain_widths, make_structured_neq,
    split_full_params)
from pycamset_tpu.parallel.mesh import detection_mesh
from pycamset_tpu.parallel.sharded_structured import (
    make_key_sharded_structured_neq, make_pose_sharded_structured_neq,
    make_sharded_structured_neq, shard_block_arrays, shard_key_arrays)
from pycamset_tpu.utils.synthetic import make_synthetic_rig

pytestmark = [
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 virtual devices"),
    pytest.mark.slow,  # interpret-mode kernels: ~10 min for the file
]


class _JaxTPUProxy:
    """jax with default_backend() reporting 'tpu' (fused dispatch check)."""

    def __getattr__(self, name):
        return getattr(jax, name)

    @staticmethod
    def default_backend():
        return "tpu"


@pytest.fixture
def fused_on_cpu(monkeypatch):
    """Route resolve_*_fused dispatch to the Pallas kernels (backend proxy)
    and run those kernels in interpret mode on the CPU devices."""
    from jax.experimental import pallas as pl

    import pycamset_tpu.optim.pallas_grams as pg
    import pycamset_tpu.optim.structured as structured
    import pycamset_tpu.optim.structured_mixed as structured_mixed

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    shim = type(pl)("pl_shim")
    shim.pallas_call = interp
    shim.BlockSpec = pl.BlockSpec
    shim.when = pl.when
    shim.program_id = pl.program_id
    monkeypatch.setattr(pg, "pl", shim)
    proxy = _JaxTPUProxy()
    monkeypatch.setattr(structured, "jax", proxy)
    monkeypatch.setattr(structured_mixed, "jax", proxy)
    return monkeypatch


def _template_setup(n_cams, n_ims, grid=4, seed=7):
    rig = make_synthetic_rig(n_cams=n_cams, n_ims=n_ims, grid=grid,
                             visibility=0.85, noise_px=0.4, seed=seed)
    n_keys = rig["n_keys"]
    op_fun = OptimFunction([Projection(), Extrinsic3D(), TemplatePoints()])
    widths = chain_widths(op_fun)
    struct = op_fun.param_struct(n_cams, n_ims, n_keys)
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys,
                                k_pad_multiple=8)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(jnp.float64)
    tpl_pad = np.zeros((k_pad, 3))
    tpl_pad[:n_keys] = rig["template"]
    tpl_pad[n_keys:] = rig["template"][0]
    tpl = jnp.asarray(tpl_pad)
    full = np.concatenate([rig["intr"].ravel(), rig["extr"].ravel(),
                           rig["poses"].ravel()])
    pieces = split_full_params(jnp.asarray(full), op_fun, struct,
                               n_cams, n_ims, n_keys, widths)
    pieces = ParamPieces(pieces.cam, pieces.im, jnp.zeros((k_pad, 0)))
    colmask = ParamPieces(jnp.ones((n_cams, widths.a)),
                          jnp.ones((n_ims, widths.b)).at[0].set(0.0),
                          jnp.ones((k_pad, 0)))
    return op_fun, widths, pieces, colmask, uv, mask, tpl


def _selfcal_setup(n_cams, n_ims, grid=4, seed=3, k_pad_multiple=8):
    rig = make_synthetic_rig(n_cams=n_cams, n_ims=n_ims, grid=grid,
                             visibility=0.85, noise_px=0.4, seed=seed)
    n_keys = rig["n_keys"]
    op_fun = OptimFunction([Projection(), Extrinsic3D(), RigidTform3d(),
                            FreePoint()])
    widths = chain_widths(op_fun)
    struct = op_fun.param_struct(n_cams, n_ims, n_keys)
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys,
                                k_pad_multiple=k_pad_multiple)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(jnp.float64)
    full = np.concatenate([rig["intr"].ravel(), rig["extr"].ravel(),
                           rig["poses"].ravel(), rig["template"].ravel()])
    p = split_full_params(jnp.asarray(full), op_fun, struct,
                          n_cams, n_ims, n_keys, widths)
    key = jnp.tile(p.key[:1], (k_pad, 1)).at[:n_keys].set(p.key)
    kmask = (jnp.ones((k_pad, 3)).at[n_keys:].set(0.0)
             .at[0].set(0.0).at[1].set(0.0).at[2, 0].set(0.0))
    pieces = ParamPieces(p.cam, p.im, key)
    colmask = ParamPieces(jnp.ones((n_cams, widths.a)),
                          jnp.ones((n_ims, widths.b)).at[0].set(0.0), kmask)
    tpl = jnp.zeros((k_pad, 3))
    return op_fun, widths, pieces, colmask, uv, mask, tpl


def _ref_neq(monkeypatch, make, *args, **kw):
    """Reference neq on the pure-XLA closed form (no Pallas dispatch)."""
    with monkeypatch.context() as m:
        m.setenv("PYCAMSET_NO_PALLAS", "1")
        return jax.jit(make(*args, **kw))


def _assert_neq_close(ref, got, tol=1e-9):
    for name, r, g in zip(ref._fields, ref, got):
        r, g = np.asarray(r), np.asarray(g)
        if r.size == 0:
            continue
        scale = np.abs(r).max() + 1e-12
        np.testing.assert_allclose(g / scale, r / scale, rtol=0, atol=tol,
                                   err_msg=name)


def test_cam_sharded_fused_template_local_slabs(fused_on_cpu):
    """c_loc = 1 < n_cams = 8: per-cam pieces placed at each device's
    offset, per-image sums completed by the psum."""
    from pycamset_tpu.optim.structured import resolve_fused_grams

    n_cams, n_ims = 8, 16
    (op_fun, widths, pieces, colmask, uv, mask,
     tpl) = _template_setup(n_cams, n_ims)
    ref = _ref_neq(fused_on_cpu, make_structured_neq, op_fun, widths,
                   n_cams, n_ims)(pieces, uv, mask, tpl, colmask)

    mesh = detection_mesh(8)
    assert resolve_fused_grams(op_fun, widths, 1, n_ims) is not None
    neq = jax.jit(make_sharded_structured_neq(op_fun, widths, n_cams,
                                              n_ims, mesh))
    uv_s, mask_s = shard_block_arrays(mesh, uv, mask, n_cams)
    got = neq(pieces, uv_s, mask_s, tpl, colmask)
    _assert_neq_close(ref, got)


def test_pose_sharded_fused_selfcal_local_slabs(fused_on_cpu):
    """i_loc = 8 < n_ims = 64 on the self-cal chain: the per-key couplings
    (wck/hkk/gk) are image-partial in-kernel and psum-completed."""
    from pycamset_tpu.optim.structured import resolve_fused_grams

    n_cams, n_ims = 2, 64
    (op_fun, widths, pieces, colmask, uv, mask,
     tpl) = _selfcal_setup(n_cams, n_ims)
    ref = _ref_neq(fused_on_cpu, make_structured_neq, op_fun, widths,
                   n_cams, n_ims)(pieces, uv, mask, tpl, colmask)

    mesh = detection_mesh(8)
    assert resolve_fused_grams(op_fun, widths, n_cams, 8) is not None
    neq = jax.jit(make_pose_sharded_structured_neq(op_fun, widths, n_cams,
                                                   n_ims, mesh))
    uv_s, mask_s = shard_block_arrays(mesh, uv, mask, n_cams,
                                      shard_axis="pose")
    got = neq(pieces, uv_s, mask_s, tpl, colmask)
    _assert_neq_close(ref, got)


def test_cam_sharded_fused_selfcal_with_image_padding(fused_on_cpu):
    """i_loc = 20 pads to 24 inside the kernel (tile 8, 20% <= the 25%
    policy): exercises the _pad_image_axis edge-replication and the
    [:, :n_ims] trimming INSIDE the shard_map region."""
    from pycamset_tpu.optim.structured import resolve_fused_grams

    n_cams, n_ims = 8, 20
    (op_fun, widths, pieces, colmask, uv, mask,
     tpl) = _selfcal_setup(n_cams, n_ims)
    ref = _ref_neq(fused_on_cpu, make_structured_neq, op_fun, widths,
                   n_cams, n_ims)(pieces, uv, mask, tpl, colmask)

    mesh = detection_mesh(8)
    assert resolve_fused_grams(op_fun, widths, 1, n_ims) is not None
    neq = jax.jit(make_sharded_structured_neq(op_fun, widths, n_cams,
                                              n_ims, mesh))
    uv_s, mask_s = shard_block_arrays(mesh, uv, mask, n_cams)
    got = neq(pieces, uv_s, mask_s, tpl, colmask)
    _assert_neq_close(ref, got)


def test_key_sharded_fused_selfcal_local_keys(fused_on_cpu):
    """k_loc = k_pad/8 on the self-cal chain: per-key pieces stay sharded
    (lane axis sliced), per-cam/per-im partial sums psum."""
    n_cams, n_ims = 2, 8
    (op_fun, widths, pieces, colmask, uv, mask,
     tpl) = _selfcal_setup(n_cams, n_ims, grid=5, k_pad_multiple=8)
    assert mask.shape[1] % 8 == 0
    ref = _ref_neq(fused_on_cpu, make_structured_neq, op_fun, widths,
                   n_cams, n_ims)(pieces, uv, mask, tpl, colmask)

    mesh = detection_mesh(8)
    neq = jax.jit(make_key_sharded_structured_neq(op_fun, widths, n_cams,
                                                  n_ims, mesh))
    uv_s, mask_s, tpl_s, pieces_s, colmask_s = shard_key_arrays(
        mesh, uv, mask, tpl, pieces, colmask, n_cams)
    got = neq(pieces_s, uv_s, mask_s, tpl_s, colmask_s)
    _assert_neq_close(ref, got)


@pytest.mark.parametrize("shard_axis,n_cams,n_ims",
                         [("cam", 8, 8), ("pose", 2, 64), ("key", 2, 8)])
def test_sharded_fused_mixed_local_slabs(fused_on_cpu, shard_axis, n_cams,
                                         n_ims):
    """The fused MIXED kernel with local slab dims on all three sharding
    axes vs the single-device XLA closed form."""
    import sys
    from pathlib import Path

    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, str(Path(__file__).parent))
    from test_sharded_mixed import _problem

    from pycamset_tpu.optim.structured_mixed import (
        MixedPieces, make_mixed_structured_neq)
    from pycamset_tpu.parallel.mesh import DETECTION_AXIS
    from pycamset_tpu.parallel.sharded_mixed import (
        make_key_sharded_mixed_neq, make_sharded_mixed_neq)

    (op_fun, widths, pieces, colmask, uv, mask, tpl, gok, rig,
     _b) = _problem(n_cams=n_cams, n_ims=n_ims)
    with fused_on_cpu.context() as m:
        m.setenv("PYCAMSET_NO_PALLAS", "1")
        ref_neq = jax.jit(make_mixed_structured_neq(
            op_fun, widths, n_cams, n_ims, gok, 2))
    ref = ref_neq(pieces, uv, mask, tpl, colmask)

    mesh = detection_mesh(8)
    if shard_axis == "key":
        k_pad = mask.shape[-1]
        key_row = NamedSharding(mesh, P(DETECTION_AXIS))
        rep = NamedSharding(mesh, P())
        uv_s = jax.device_put(
            jnp.reshape(uv, (n_cams, n_ims, k_pad, 2)),
            NamedSharding(mesh, P(None, None, DETECTION_AXIS, None)))
        mask_s = jax.device_put(
            jnp.reshape(mask, (n_cams, n_ims, k_pad)),
            NamedSharding(mesh, P(None, None, DETECTION_AXIS)))
        tpl_s = jax.device_put(tpl, key_row)
        pieces_s = MixedPieces(jax.device_put(pieces.cam, rep),
                               jax.device_put(pieces.im, rep),
                               jax.device_put(pieces.key, key_row),
                               jax.device_put(pieces.grp, rep))
        colmask_s = MixedPieces(jax.device_put(colmask.cam, rep),
                                jax.device_put(colmask.im, rep),
                                jax.device_put(colmask.key, key_row),
                                jax.device_put(colmask.grp, rep))
        neq = jax.jit(make_key_sharded_mixed_neq(
            op_fun, widths, n_cams, n_ims, mesh, gok, 2))
        got = neq(pieces_s, uv_s, mask_s, tpl_s, colmask_s)
    else:
        neq = jax.jit(make_sharded_mixed_neq(
            op_fun, widths, n_cams, n_ims, mesh, gok, 2,
            shard_axis=shard_axis))
        uv_s, mask_s = shard_block_arrays(mesh, uv, mask, n_cams,
                                          shard_axis=shard_axis)
        got = neq(pieces, uv_s, mask_s, tpl, colmask)
    _assert_neq_close(ref, got)


def _freepoint_setup(n_cams, n_ims, grid=4, seed=13):
    from pycamset_tpu.optim.blocks import FreePoint

    rig = make_synthetic_rig(n_cams=n_cams, n_ims=n_ims, grid=grid,
                             visibility=0.9, noise_px=0.4, seed=seed)
    n_keys = rig["n_keys"]
    op_fun = OptimFunction([Projection(), Extrinsic3D(), FreePoint()])
    widths = chain_widths(op_fun)
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys,
                                k_pad_multiple=8)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(jnp.float64)
    cam = jnp.asarray(np.concatenate([rig["intr"], rig["extr"]], axis=1))
    key = jnp.concatenate([jnp.asarray(rig["template"]),
                           jnp.tile(jnp.asarray(rig["template"][:1]),
                                    (k_pad - n_keys, 1))])
    pieces = ParamPieces(cam, jnp.zeros((n_ims, 0)), key)
    kmask = (jnp.ones((k_pad, 3)).at[n_keys:].set(0.0).at[:3].set(0.0))
    colmask = ParamPieces(jnp.ones((n_cams, widths.a)).at[0].set(0.0),
                          jnp.zeros((n_ims, 0)), kmask)
    tpl = jnp.zeros((k_pad, 3))
    return op_fun, widths, pieces, colmask, uv, mask, tpl


@pytest.mark.parametrize("shard_axis,n_cams,n_ims",
                         [("cam", 8, 8), ("pose", 2, 64), ("key", 2, 8)])
def test_sharded_fused_freepoint_all_axes(fused_on_cpu, shard_axis, n_cams,
                                          n_ims):
    """The fused FREEPOINT branches (zero-width pose fillers) on all three
    sharding axes vs the XLA closed form."""
    (op_fun, widths, pieces, colmask, uv, mask,
     tpl) = _freepoint_setup(n_cams, n_ims)
    ref = _ref_neq(fused_on_cpu, make_structured_neq, op_fun, widths,
                   n_cams, n_ims)(pieces, uv, mask, tpl, colmask)

    mesh = detection_mesh(8)
    if shard_axis == "key":
        neq = jax.jit(make_key_sharded_structured_neq(
            op_fun, widths, n_cams, n_ims, mesh))
        uv_s, mask_s, tpl_s, pieces_s, colmask_s = shard_key_arrays(
            mesh, uv, mask, tpl, pieces, colmask, n_cams)
        got = neq(pieces_s, uv_s, mask_s, tpl_s, colmask_s)
    else:
        make = (make_sharded_structured_neq if shard_axis == "cam"
                else make_pose_sharded_structured_neq)
        neq = jax.jit(make(op_fun, widths, n_cams, n_ims, mesh))
        uv_s, mask_s = shard_block_arrays(mesh, uv, mask, n_cams,
                                          shard_axis=shard_axis)
        got = neq(pieces, uv_s, mask_s, tpl, colmask)
    _assert_neq_close(ref, got)


def _grouped_setup(n_cams, n_ims, grid=4, seed=21, n_groups=2):
    from pycamset_tpu.optim.blocks import GroupTemplatePoints, RigidTform3d

    rig = make_synthetic_rig(n_cams=n_cams, n_ims=n_ims, grid=grid,
                             visibility=0.9, noise_px=0.4, seed=seed)
    n_keys = rig["n_keys"]
    op_fun = OptimFunction([Projection(), Extrinsic3D(), RigidTform3d(),
                            GroupTemplatePoints()])
    widths = chain_widths(op_fun)
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys,
                                k_pad_multiple=8)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(jnp.float64)
    tpl_pad = np.zeros((k_pad, 3))
    tpl_pad[:n_keys] = rig["template"]
    tpl_pad[n_keys:] = rig["template"][0]
    gok = np.concatenate([(np.arange(n_keys) >= n_keys // 2).astype(np.int64),
                          np.zeros(k_pad - n_keys, np.int64)])
    cam = jnp.asarray(np.concatenate([rig["intr"], rig["extr"]], axis=1))
    grp = jnp.asarray(np.array([[0.0] * 6,
                                [0.02, -0.01, 0.03, 0.005, -0.01, 0.02]]))
    pieces = ParamPieces(cam, jnp.asarray(rig["poses"]), grp)
    colmask = ParamPieces(jnp.ones((n_cams, widths.a)),
                          jnp.ones((n_ims, widths.b)).at[0].set(0.0),
                          jnp.ones((n_groups, 6)).at[0].set(0.0))
    return (op_fun, widths, pieces, colmask, uv, mask,
            jnp.asarray(tpl_pad), gok, n_groups)


@pytest.mark.parametrize("shard_axis,n_cams,n_ims",
                         [("cam", 8, 8), ("pose", 2, 64)])
def test_sharded_fused_grouped_axes(fused_on_cpu, shard_axis, n_cams,
                                    n_ims):
    """The fused GROUPED branches (per-key pieces group-reduced before the
    psum) on the cam and pose axes vs the XLA closed form."""
    (op_fun, widths, pieces, colmask, uv, mask, tpl, gok,
     n_groups) = _grouped_setup(n_cams, n_ims)
    ref = _ref_neq(fused_on_cpu, make_structured_neq, op_fun, widths,
                   n_cams, n_ims, group_of_key=gok,
                   n_groups=n_groups)(pieces, uv, mask, tpl, colmask)

    mesh = detection_mesh(8)
    make = (make_sharded_structured_neq if shard_axis == "cam"
            else make_pose_sharded_structured_neq)
    neq = jax.jit(make(op_fun, widths, n_cams, n_ims, mesh,
                       group_of_key=gok, n_groups=n_groups))
    uv_s, mask_s = shard_block_arrays(mesh, uv, mask, n_cams,
                                      shard_axis=shard_axis)
    got = neq(pieces, uv_s, mask_s, tpl, colmask)
    _assert_neq_close(ref, got)
