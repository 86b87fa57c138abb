"""Multi-device sharding tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pycamset_tpu.optim.blocks import Extrinsic3D, Projection, TemplatePoints
from pycamset_tpu.optim.chain import OptimFunction
from pycamset_tpu.optim.structured import (
    ParamPieces, build_block_arrays, chain_widths, make_structured_neq,
    split_full_params)
from pycamset_tpu.parallel.mesh import detection_mesh
from pycamset_tpu.parallel.sharded_structured import (
    choose_shard_axis, make_pose_sharded_structured_neq,
    make_sharded_structured_neq, make_sharded_structured_solver,
    pad_pose_axis, shard_block_arrays)
from pycamset_tpu.utils.synthetic import make_synthetic_rig

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def setup(n_cams=8, n_ims=4):
    rig = make_synthetic_rig(n_cams=n_cams, n_ims=n_ims, grid=4,
                             visibility=0.85, noise_px=0.4, seed=7)
    n_cams, n_ims, n_keys = rig["n_cams"], rig["n_ims"], rig["n_keys"]
    op_fun = OptimFunction([Projection(), Extrinsic3D(), TemplatePoints()])
    widths = chain_widths(op_fun)
    struct = op_fun.param_struct(n_cams, n_ims, n_keys)
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys,
                                k_pad_multiple=8)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(jnp.float64)
    tpl_pad = np.zeros((k_pad, 3))
    tpl_pad[:n_keys] = rig["template"]
    tpl = jnp.asarray(tpl_pad)
    full = np.concatenate([rig["intr"].ravel(), rig["extr"].ravel(),
                           rig["poses"].ravel()])
    pieces = split_full_params(jnp.asarray(full), op_fun, struct,
                               n_cams, n_ims, n_keys, widths)
    pieces = ParamPieces(pieces.cam, pieces.im, jnp.zeros((k_pad, 0)))
    colmask = ParamPieces(jnp.ones((n_cams, widths.a)),
                          jnp.ones((n_ims, widths.b)).at[0].set(0.0),
                          jnp.ones((k_pad, 0)))
    return op_fun, widths, struct, pieces, colmask, uv, mask, tpl, n_cams, n_ims, blocks


def test_sharded_neq_matches_single_device():
    (op_fun, widths, struct, pieces, colmask, uv, mask, tpl,
     n_cams, n_ims, blocks) = setup()
    mesh = detection_mesh(8)
    uv_s, mask_s = shard_block_arrays(mesh, uv, mask, n_cams)

    neq_single = jax.jit(make_structured_neq(op_fun, widths, n_cams, n_ims))
    neq_sharded = jax.jit(
        make_sharded_structured_neq(op_fun, widths, n_cams, n_ims, mesh))

    ref = neq_single(pieces, uv, mask, tpl, colmask)
    got = neq_sharded(pieces, uv_s, mask_s, tpl, colmask)
    for name, r, g in zip(ref._fields, ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-10,
                                   atol=1e-10, err_msg=name)


def test_sharded_lm_step_runs_and_converges():
    (op_fun, widths, struct, pieces, colmask, uv, mask, tpl,
     n_cams, n_ims, blocks) = setup()
    mesh = detection_mesh(8)
    uv_s, mask_s = shard_block_arrays(mesh, uv, mask, n_cams)

    # perturb then solve on the mesh
    pert = ParamPieces(
        pieces.cam + np.random.default_rng(0).normal(
            size=pieces.cam.shape) * 1e-4,
        pieces.im, pieces.key)
    solve = make_sharded_structured_solver(
        op_fun, widths, n_cams, n_ims, mesh, colmask, max_nfev=30)
    res = solve(pert, uv_s, mask_s, tpl)
    rms = float(np.sqrt(float(res.cost) / (2 * blocks.n_real)))
    assert rms < 0.45  # at the injected 0.4 px noise floor


def test_pose_sharded_neq_matches_single_device():
    # few cameras, many poses: the camera axis (3) cannot shard over 8
    # devices; the pose axis (16) can
    (op_fun, widths, struct, pieces, colmask, uv, mask, tpl,
     n_cams, n_ims, blocks) = setup(n_cams=3, n_ims=16)
    mesh = detection_mesh(8)
    assert choose_shard_axis(n_cams, n_ims, 8) == "pose"
    uv_s, mask_s = shard_block_arrays(mesh, uv, mask, n_cams,
                                      shard_axis="pose")

    neq_single = jax.jit(make_structured_neq(op_fun, widths, n_cams, n_ims))
    neq_sharded = jax.jit(make_pose_sharded_structured_neq(
        op_fun, widths, n_cams, n_ims, mesh))

    ref = neq_single(pieces, uv, mask, tpl, colmask)
    got = neq_sharded(pieces, uv_s, mask_s, tpl, colmask)
    for name, r, g in zip(ref._fields, ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-10,
                                   atol=1e-10, err_msg=name)


def test_pose_sharded_lm_converges():
    (op_fun, widths, struct, pieces, colmask, uv, mask, tpl,
     n_cams, n_ims, blocks) = setup(n_cams=3, n_ims=16)
    mesh = detection_mesh(8)
    uv_s, mask_s = shard_block_arrays(mesh, uv, mask, n_cams,
                                      shard_axis="pose")
    pert = ParamPieces(
        pieces.cam + np.random.default_rng(0).normal(
            size=pieces.cam.shape) * 1e-4,
        pieces.im, pieces.key)
    solve = make_sharded_structured_solver(
        op_fun, widths, n_cams, n_ims, mesh, colmask, max_nfev=30,
        shard_axis="pose")
    res = solve(pert, uv_s, mask_s, tpl)
    rms = float(np.sqrt(float(res.cost) / (2 * blocks.n_real)))
    assert rms < 0.45


def _selfcal_setup(n_cams=8, n_ims=4):
    from pycamset_tpu.optim.blocks import FreePoint, RigidTform3d
    rig = make_synthetic_rig(n_cams=n_cams, n_ims=n_ims, grid=4,
                             visibility=0.85, noise_px=0.4, seed=3)
    n_keys = rig["n_keys"]
    op_fun = OptimFunction(
        [Projection(), Extrinsic3D(), RigidTform3d(), FreePoint()])
    widths = chain_widths(op_fun)
    struct = op_fun.param_struct(n_cams, n_ims, n_keys)
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys,
                                k_pad_multiple=8)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(jnp.float64)
    full = np.concatenate([rig["intr"].ravel(), rig["extr"].ravel(),
                           rig["poses"].ravel(), rig["template"].ravel()])
    pieces = split_full_params(jnp.asarray(full), op_fun, struct,
                               n_cams, n_ims, n_keys, widths)
    key = jnp.tile(pieces.key[:1], (k_pad, 1)).at[:n_keys].set(pieces.key)
    pieces = ParamPieces(pieces.cam, pieces.im, key)
    # 7-coordinate gauge fix on the first three points + pad freeze
    kmask = jnp.ones((k_pad, 3)).at[n_keys:].set(0.0)
    kmask = kmask.at[0].set(0.0).at[1].set(0.0).at[2, 0].set(0.0)
    colmask = ParamPieces(jnp.ones((n_cams, widths.a)),
                          jnp.ones((n_ims, widths.b)).at[0].set(0.0),
                          kmask)
    return (op_fun, widths, pieces, colmask, uv, mask,
            jnp.zeros((k_pad, 3)), n_cams, n_ims)


def test_sharded_selfcal_neq_matches_single_device():
    """The sharded reductions must also hold for chains WITH key params
    (hkk/gk psum'd, wck placed at the camera offset, wik partial-summed)."""
    (op_fun, widths, pieces, colmask, uv, mask, tpl,
     n_cams, n_ims) = _selfcal_setup()
    mesh = detection_mesh(8)
    uv_s, mask_s = shard_block_arrays(mesh, uv, mask, n_cams)

    neq_single = jax.jit(make_structured_neq(op_fun, widths, n_cams, n_ims))
    neq_sharded = jax.jit(
        make_sharded_structured_neq(op_fun, widths, n_cams, n_ims, mesh))
    ref = neq_single(pieces, uv, mask, tpl, colmask)
    got = neq_sharded(pieces, uv_s, mask_s, tpl, colmask)
    for name, r, g in zip(ref._fields, ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-9,
                                   atol=1e-9, err_msg=name)


def test_sharded_selfcal_lm_converges():
    (op_fun, widths, pieces, colmask, uv, mask, tpl,
     n_cams, n_ims) = _selfcal_setup()
    mesh = detection_mesh(8)
    uv_s, mask_s = shard_block_arrays(mesh, uv, mask, n_cams)
    pert = ParamPieces(
        pieces.cam + np.random.default_rng(0).normal(
            size=pieces.cam.shape) * 1e-4, pieces.im, pieces.key)
    solve = make_sharded_structured_solver(
        op_fun, widths, n_cams, n_ims, mesh, colmask, max_nfev=30)
    res = solve(pert, uv_s, mask_s, tpl)
    assert np.isfinite(float(res.cost))
    # the self-cal solve reaches the injected noise floor on the mesh
    n_obs = float(np.asarray(mask).sum())
    rms = float(np.sqrt(float(res.cost) / (2 * n_obs)))
    assert rms < 0.45


def test_choose_shard_axis():
    assert choose_shard_axis(16, 96, 8) == "pose"    # both divide, more ims
    assert choose_shard_axis(16, 100, 4) == "pose"
    assert choose_shard_axis(16, 6, 8) == "cam"      # only cams divide
    assert choose_shard_axis(3, 16, 8) == "pose"     # only poses divide
    assert choose_shard_axis(128, 64, 8) == "cam"    # both divide, more cams
    # neither divides: the pose axis pads, so it is always an answer
    assert choose_shard_axis(3, 5, 8) == "pose"


def _grouped_setup(n_cams=8, n_ims=4):
    """A PER_GROUP-keyed (multi-target style) chain on the synthetic rig.

    The numbers need not describe a physically consistent two-target scene:
    these tests check that the sharded normal equations match the
    single-device ones bit-for-bit given identical inputs.
    """
    from pycamset_tpu.optim.blocks import (
        ParamSpec, RigidTform3d, TemplatePoints, key_type)

    class GroupTemplatePoints(TemplatePoints):
        params = ParamSpec(key_type.PER_GROUP, 6)

    rig = make_synthetic_rig(n_cams=n_cams, n_ims=n_ims, grid=4,
                             visibility=0.85, noise_px=0.4, seed=9)
    n_keys = rig["n_keys"]
    op_fun = OptimFunction(
        [Projection(), Extrinsic3D(), RigidTform3d(), GroupTemplatePoints()])
    widths = chain_widths(op_fun)
    assert widths.key_link == key_type.PER_GROUP and widths.c == 6
    n_groups = 2
    struct = op_fun.param_struct(n_cams, n_ims, n_keys, n_groups=n_groups)
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys,
                                k_pad_multiple=8)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(jnp.float64)
    tpl_pad = np.zeros((k_pad, 3))
    tpl_pad[:n_keys] = rig["template"]
    tpl_pad[n_keys:] = rig["template"][0]
    gok = (np.arange(n_keys) >= n_keys // 2).astype(np.int64)
    gok_pad = np.concatenate([gok, np.zeros(k_pad - n_keys, np.int64)])

    rel = np.array([[0.0] * 6, [0.05, -0.03, 0.08, 0.02, -0.01, 0.04]])
    full = np.concatenate([rig["intr"].ravel(), rig["extr"].ravel(),
                           rig["poses"].ravel(), rel.ravel()])
    pieces = split_full_params(jnp.asarray(full), op_fun, struct,
                               n_cams, n_ims, n_keys, widths)
    colmask = ParamPieces(
        jnp.ones((n_cams, widths.a)),
        jnp.ones((n_ims, widths.b)).at[0].set(0.0),
        jnp.ones((n_groups, 6)).at[0].set(0.0))  # group 0 = identity, fixed
    return (op_fun, widths, pieces, colmask, uv, mask,
            jnp.asarray(tpl_pad), gok_pad, n_groups, n_cams, n_ims)


@pytest.mark.parametrize("axis", ["cam", "pose"])
def test_grouped_sharded_neq_matches_single_device(axis):
    """PER_GROUP chains ride the sharded path: per-group rows expand onto
    the key grid on-device and the gram pieces reduce back before the psum."""
    (op_fun, widths, pieces, colmask, uv, mask, tpl, gok_pad, n_groups,
     n_cams, n_ims) = _grouped_setup(
        n_cams=8 if axis == "cam" else 3, n_ims=4 if axis == "cam" else 16)
    mesh = detection_mesh(8)
    uv_s, mask_s = shard_block_arrays(mesh, uv, mask, n_cams,
                                      shard_axis=axis)
    neq_single = jax.jit(make_structured_neq(
        op_fun, widths, n_cams, n_ims, group_of_key=gok_pad,
        n_groups=n_groups))
    make = (make_sharded_structured_neq if axis == "cam"
            else make_pose_sharded_structured_neq)
    neq_sharded = jax.jit(make(op_fun, widths, n_cams, n_ims, mesh,
                               group_of_key=gok_pad, n_groups=n_groups))
    ref = neq_single(pieces, uv, mask, tpl, colmask)
    got = neq_sharded(pieces, uv_s, mask_s, tpl, colmask)
    assert ref.hkk.shape == (n_groups, 6, 6)
    for name, r, g in zip(ref._fields, ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-9,
                                   atol=1e-9, err_msg=name)


def test_grouped_sharded_lm_converges():
    (op_fun, widths, pieces, colmask, uv, mask, tpl, gok_pad, n_groups,
     n_cams, n_ims) = _grouped_setup()
    mesh = detection_mesh(8)
    uv_s, mask_s = shard_block_arrays(mesh, uv, mask, n_cams)
    solve = make_sharded_structured_solver(
        op_fun, widths, n_cams, n_ims, mesh, colmask, max_nfev=30,
        group_of_key=gok_pad, n_groups=n_groups)
    res = solve(pieces, uv_s, mask_s, tpl)
    assert np.isfinite(float(res.cost))
    # the grouped solve absorbs the injected rel-pose offset: group 1's
    # recovered pose moves toward identity (the rig was generated ungrouped)
    assert float(jnp.abs(res.x.key[1]).max()) < 0.05


def test_pad_pose_axis_non_divisible_rig():
    """3 cams x 5 ims shards over 8 devices by padding the image axis with
    fully-masked images; the padded sharded neq equals the unpadded
    single-device neq on every real entry and is zero on pad entries."""
    (op_fun, widths, struct, pieces, colmask, uv, mask, tpl,
     n_cams, n_ims, blocks) = setup(n_cams=3, n_ims=5)
    assert choose_shard_axis(n_cams, n_ims, 8) == "pose"
    mesh = detection_mesh(8)

    ref = jax.jit(make_structured_neq(op_fun, widths, n_cams, n_ims))(
        pieces, uv, mask, tpl, colmask)

    uv_p, mask_p, pieces_p, colmask_p, n_ims_pad = pad_pose_axis(
        uv, mask, pieces, colmask, n_cams, 8)
    assert n_ims_pad == 8
    uv_s, mask_s = shard_block_arrays(mesh, uv_p, mask_p, n_cams,
                                      shard_axis="pose")
    got = jax.jit(make_pose_sharded_structured_neq(
        op_fun, widths, n_cams, n_ims_pad, mesh))(
        pieces_p, uv_s, mask_s, tpl, colmask_p)

    np.testing.assert_allclose(np.asarray(got.hcc), np.asarray(ref.hcc),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(got.gc), np.asarray(ref.gc),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(got.hii[:n_ims]),
                               np.asarray(ref.hii), rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(got.hii[n_ims:]), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.wci[:, :n_ims]),
                               np.asarray(ref.wci), rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(float(got.cost), float(ref.cost), rtol=1e-12)

    # and the padded solve converges to the same noise floor
    pert = ParamPieces(
        pieces_p.cam + np.random.default_rng(0).normal(
            size=pieces_p.cam.shape) * 1e-4, pieces_p.im, pieces_p.key)
    solve = make_sharded_structured_solver(
        op_fun, widths, n_cams, n_ims_pad, mesh, colmask_p, max_nfev=30,
        shard_axis="pose")
    res = solve(pert, uv_s, mask_s, tpl)
    rms = float(np.sqrt(float(res.cost) / (2 * blocks.n_real)))
    assert rms < 0.45


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def test_key_sharded_selfcal_neq_matches_single_device():
    """Key-axis sharding: per-key pieces come back SHARDED (never psum'd);
    values must still match the single-device neq exactly."""
    from pycamset_tpu.parallel.sharded_structured import (
        make_key_sharded_structured_neq, shard_key_arrays)
    (op_fun, widths, pieces, colmask, uv, mask, tpl,
     n_cams, n_ims) = _selfcal_setup()
    mesh = detection_mesh(8)
    uv_s, mask_s, tpl_s, pieces_s, colmask_s = shard_key_arrays(
        mesh, uv, mask, tpl, pieces, colmask, n_cams)

    neq_single = jax.jit(make_structured_neq(op_fun, widths, n_cams, n_ims))
    neq_sharded = jax.jit(make_key_sharded_structured_neq(
        op_fun, widths, n_cams, n_ims, mesh))
    ref = neq_single(pieces, uv, mask, tpl, colmask)
    got = neq_sharded(pieces_s, uv_s, mask_s, tpl_s, colmask_s)
    for name, r, g in zip(ref._fields, ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-9,
                                   atol=1e-9, err_msg=name)


def test_key_sharded_100k_point_freepoint_solve():
    """The SfM-scale target: >=100k free points solve on the mesh with the
    key axis sharded, so the (C, K, a, 3) coupling tensor lives K/n_dev per
    device and never crosses ICI."""
    import jax.numpy as jnp
    from pycamset_tpu.optim.blocks import Extrinsic3D, FreePoint, Projection
    from pycamset_tpu.optim.structured import ParamPieces
    from pycamset_tpu.parallel.sharded_structured import shard_key_arrays
    from pycamset_tpu.ops.projection import project_world_points

    rng = np.random.default_rng(0)
    n_cams, n_keys = 4, 102_400
    pts = rng.uniform([-0.5, -0.5, 0.8], [0.5, 0.5, 1.6],
                      size=(n_keys, 3))
    intr = np.tile([1400.0, 800, 1400, 600, -0.08, 0.01, 1e-4, -1e-4, 0.0],
                   (n_cams, 1))
    extr = np.stack([np.concatenate([rng.normal(size=3) * 0.05,
                                     [0.3 * c - 0.45, 0.0, 0.0]])
                     for c in range(n_cams)])
    uv = np.stack([np.asarray(project_world_points(
        jnp.asarray(intr[c]), jnp.asarray(extr[c]), jnp.asarray(pts)))
        for c in range(n_cams)])                       # (C, K, 2)
    uv += rng.normal(size=uv.shape) * 0.3

    op_fun = OptimFunction([Projection(), Extrinsic3D(), FreePoint()])
    widths = chain_widths(op_fun)
    assert (widths.b, widths.c) == (0, 3)
    dtype = jnp.float64
    uv_b = jnp.asarray(uv, dtype)                      # B = C (n_ims = 1)
    mask_b = jnp.ones((n_cams, n_keys), dtype)
    tpl = jnp.zeros((n_keys, 3), dtype)
    # perturb the structure seed; gauge: cam 0 + first 3 points fixed
    pieces = ParamPieces(
        jnp.asarray(np.concatenate([intr, extr], axis=1), dtype),
        jnp.zeros((1, 0), dtype),
        jnp.asarray(pts + rng.normal(size=pts.shape) * 2e-3, dtype))
    colmask = ParamPieces(
        jnp.ones((n_cams, widths.a), dtype).at[0].set(0.0),
        jnp.ones((1, 0), dtype),
        jnp.ones((n_keys, 3), dtype).at[:3].set(0.0))
    pieces = pieces._replace(key=pieces.key.at[:3].set(jnp.asarray(pts[:3],
                                                                   dtype)))

    mesh = detection_mesh(8)
    uv_s, mask_s, tpl_s, pieces_s, colmask_s = shard_key_arrays(
        mesh, uv_b, mask_b, tpl, pieces, colmask, n_cams)
    solve = make_sharded_structured_solver(
        op_fun, widths, n_cams, 1, mesh, colmask_s, max_nfev=30,
        shard_axis="key")
    res = solve(pieces_s, uv_s, mask_s, tpl_s)
    rms = float(np.sqrt(float(res.cost) / (2 * n_cams * n_keys)))
    assert rms < 0.35, rms                             # 0.3 px noise floor
    assert res.x.key.shape == (n_keys, 3)
