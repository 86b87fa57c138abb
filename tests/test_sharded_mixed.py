"""Sharded multi-target (mixed PER_KEY+PER_GROUP) backend parity.

The arrow-structured mixed system (optim/structured_mixed.py) sharded over
the camera or pose axis of an 8-virtual-device mesh must reproduce the
single-device normal equations and land on the same LM minimum
(parallel/sharded_mixed.py).
"""
import numpy as np
import pytest


def _problem(n_cams=8, n_ims=4, grid=4, seed=11, dtype=None):
    import jax.numpy as jnp

    from pycamset_tpu.optim.blocks import (
        Extrinsic3D, FreePoint, GroupRigidTform3d, Projection, RigidTform3d)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import build_block_arrays
    from pycamset_tpu.optim.structured_mixed import (
        MixedPieces, mixed_chain_widths)
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=n_cams, n_ims=n_ims, grid=grid,
                             visibility=0.85, noise_px=0.4, seed=seed)
    n_keys = rig["n_keys"]
    op_fun = OptimFunction([Projection(), Extrinsic3D(), RigidTform3d(),
                            GroupRigidTform3d(), FreePoint()])
    widths = mixed_chain_widths(op_fun)
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys,
                                k_pad_multiple=8)
    k_pad = blocks.uv.shape[1]
    dtype = dtype or jnp.float64
    uv, mask = blocks.as_device(dtype)
    gok = np.zeros(k_pad, np.int64)
    gok[:n_keys] = np.arange(n_keys) >= n_keys // 2
    grp = np.array([[0.0] * 6, [0.04, -0.02, 0.06, 0.01, -0.02, 0.03]])
    key_pad = np.concatenate(
        [rig["template"], np.repeat(rig["template"][:1], k_pad - n_keys, 0)])
    pieces = MixedPieces(
        jnp.asarray(np.concatenate([rig["intr"], rig["extr"]], 1), dtype),
        jnp.asarray(rig["poses"], dtype),
        jnp.asarray(key_pad, dtype),
        jnp.asarray(grp, dtype))
    kmask = (jnp.ones((k_pad, 3), dtype).at[n_keys:].set(0.0)
             .at[0].set(0.0).at[1].set(0.0).at[2, 0].set(0.0))
    colmask = MixedPieces(
        jnp.ones((n_cams, 15), dtype),
        jnp.ones((n_ims, 6), dtype).at[0].set(0.0),
        kmask,
        jnp.ones((2, 6), dtype).at[0].set(0.0))
    tpl = jnp.zeros((k_pad, 3), dtype)
    return (op_fun, widths, pieces, colmask, uv, mask, tpl, gok, rig,
            blocks)


@pytest.mark.parametrize("shard_axis,n_cams,n_ims",
                         [("cam", 8, 4), ("pose", 3, 16)])
def test_sharded_mixed_neq_matches_single_device(shard_axis, n_cams, n_ims):
    import jax

    from pycamset_tpu.optim.structured_mixed import make_mixed_structured_neq
    from pycamset_tpu.parallel.mesh import detection_mesh
    from pycamset_tpu.parallel.sharded_mixed import make_sharded_mixed_neq
    from pycamset_tpu.parallel.sharded_structured import shard_block_arrays

    (op_fun, widths, pieces, colmask, uv, mask, tpl, gok, rig,
     _b) = _problem(n_cams=n_cams, n_ims=n_ims)
    mesh = detection_mesh(8)
    uv_s, mask_s = shard_block_arrays(mesh, uv, mask, n_cams,
                                      shard_axis=shard_axis)

    ref_neq = jax.jit(make_mixed_structured_neq(
        op_fun, widths, n_cams, n_ims, gok, 2))
    got_neq = jax.jit(make_sharded_mixed_neq(
        op_fun, widths, n_cams, n_ims, mesh, gok, 2,
        shard_axis=shard_axis))

    ref = ref_neq(pieces, uv, mask, tpl, colmask)
    got = got_neq(pieces, uv_s, mask_s, tpl, colmask)
    for name, r, g in zip(ref._fields, ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-9, atol=1e-9, err_msg=name)


def test_sharded_mixed_solve_matches_single_device():
    import jax

    from pycamset_tpu.optim.structured_lm import structured_lm_solve
    from pycamset_tpu.optim.structured_mixed import (
        make_mixed_ops, make_mixed_structured_neq)
    from pycamset_tpu.parallel.mesh import detection_mesh
    from pycamset_tpu.parallel.sharded_mixed import make_sharded_mixed_solver
    from pycamset_tpu.parallel.sharded_structured import shard_block_arrays

    (op_fun, widths, pieces, colmask, uv, mask, tpl, gok, rig,
     blocks) = _problem()
    n_cams, n_ims = rig["n_cams"], rig["n_ims"]
    mesh = detection_mesh(8)
    uv_s, mask_s = shard_block_arrays(mesh, uv, mask, n_cams)

    solve_s = make_sharded_mixed_solver(
        op_fun, widths, n_cams, n_ims, mesh, colmask, gok, 2, max_nfev=10)
    res_s = solve_s(pieces, uv_s, mask_s, tpl)

    neq1 = make_mixed_structured_neq(op_fun, widths, n_cams, n_ims, gok, 2)
    ops = make_mixed_ops(neq1.onehot)

    @jax.jit
    def solve1(p):
        return structured_lm_solve(
            lambda q: neq1(q, uv, mask, tpl, colmask), p,
            max_nfev=10, ops=ops)

    res_1 = solve1(pieces)
    assert int(res_s.nit) == int(res_1.nit)
    np.testing.assert_allclose(float(res_s.cost), float(res_1.cost),
                               rtol=1e-9)
    rms = float(np.sqrt(float(res_s.cost) / (2 * blocks.n_real)))
    assert rms < 0.4 * 1.25  # reaches the injected noise floor


def test_key_sharded_mixed_neq_matches_single_device():
    """Key-axis sharding of the mixed system (the 100k+-point scaling
    mode): sharded per-key pieces + psum'd group/cam/im partial sums must
    reproduce the single-device normal equations."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pycamset_tpu.optim.structured_mixed import make_mixed_structured_neq
    from pycamset_tpu.optim.structured_mixed import MixedPieces
    from pycamset_tpu.parallel.mesh import DETECTION_AXIS, detection_mesh
    from pycamset_tpu.parallel.sharded_mixed import make_key_sharded_mixed_neq

    (op_fun, widths, pieces, colmask, uv, mask, tpl, gok, rig,
     _b) = _problem(n_cams=3, n_ims=4)
    n_cams, n_ims = rig["n_cams"], rig["n_ims"]
    mesh = detection_mesh(8)
    k_pad = mask.shape[-1]
    assert k_pad % 8 == 0

    key_row = NamedSharding(mesh, P(DETECTION_AXIS))
    rep = NamedSharding(mesh, P())
    uv_s = jax.device_put(
        jnp.reshape(uv, (n_cams, n_ims, k_pad, 2)),
        NamedSharding(mesh, P(None, None, DETECTION_AXIS, None)))
    mask_s = jax.device_put(jnp.reshape(mask, (n_cams, n_ims, k_pad)),
                            NamedSharding(mesh, P(None, None,
                                                  DETECTION_AXIS)))
    tpl_s = jax.device_put(tpl, key_row)
    pieces_s = MixedPieces(jax.device_put(pieces.cam, rep),
                           jax.device_put(pieces.im, rep),
                           jax.device_put(pieces.key, key_row),
                           jax.device_put(pieces.grp, rep))
    colmask_s = MixedPieces(jax.device_put(colmask.cam, rep),
                            jax.device_put(colmask.im, rep),
                            jax.device_put(colmask.key, key_row),
                            jax.device_put(colmask.grp, rep))

    ref_neq = jax.jit(make_mixed_structured_neq(
        op_fun, widths, n_cams, n_ims, gok, 2))
    got_neq = jax.jit(make_key_sharded_mixed_neq(
        op_fun, widths, n_cams, n_ims, mesh, gok, 2))

    ref = ref_neq(pieces, uv, mask, tpl, colmask)
    got = got_neq(pieces_s, uv_s, mask_s, tpl_s, colmask_s)
    for name, r, g in zip(ref._fields, ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-9, atol=1e-9, err_msg=name)
