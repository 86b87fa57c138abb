"""Hardware (real-TPU) test tier: ``PYCAMSET_TPU_TESTS=1 pytest -m tpu -q``.

The default test tier forces the CPU backend, so Pallas kernels are only
ever exercised in interpret mode and all numerics run in float64. This file
runs on the real chip and covers the failure classes that tier cannot see:
compiled-Mosaic kernel behaviour, float32 conditioning, and TPU linear
algebra defects (the rank-2 SVD bug that once broke every planar-target
gauge alignment on hardware — tests/test_ops.py:210 documents the CPU
variant).
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module", autouse=True)
def require_tpu():
    import jax
    if jax.default_backend() != "tpu":
        pytest.skip("requires the real TPU backend")


def _rig_problem(model="standard", chain="template", n_cams=3, n_ims=5,
                 grid=4, noise=0.5, seed=2):
    import jax.numpy as jnp

    from pycamset_tpu.optim.blocks import (
        Extrinsic3D, FreePoint, Projection, ProjectionFisheye,
        ProjectionRational, ProjectionThinPrism, ProjectionTilted,
        RigidTform3d, TemplatePoints)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import (
        ParamPieces, build_block_arrays, chain_widths, split_full_params)
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    proj = {"standard": Projection, "rational": ProjectionRational,
            "thin_prism": ProjectionThinPrism, "tilted": ProjectionTilted,
            "fisheye": ProjectionFisheye}[model]
    rig = make_synthetic_rig(n_cams=n_cams, n_ims=n_ims, grid=grid,
                             visibility=0.85, noise_px=noise, seed=seed,
                             camera_model=model)
    n_keys = rig["n_keys"]
    blocks_list = [proj(), Extrinsic3D()]
    blocks_list += ([RigidTform3d(), FreePoint()] if chain == "selfcal"
                    else [TemplatePoints()])
    op_fun = OptimFunction(blocks_list)
    widths = chain_widths(op_fun)
    struct = op_fun.param_struct(n_cams, n_ims, n_keys)
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys)
    k_pad = blocks.uv.shape[1]
    dtype = jnp.float32
    uv, mask = blocks.as_device(dtype)
    tpl_pad = np.zeros((k_pad, 3))
    tpl_pad[:n_keys] = rig["template"]
    tpl_pad[n_keys:] = rig["template"][0]
    tpl = jnp.asarray(tpl_pad, dtype)
    parts = [rig["intr"].ravel(), rig["extr"].ravel(), rig["poses"].ravel()]
    if chain == "selfcal":
        parts.append(rig["template"].ravel())
    full = np.concatenate(parts)
    p = split_full_params(jnp.asarray(full, dtype), op_fun, struct,
                          n_cams, n_ims, n_keys, widths)
    if chain == "selfcal":
        key = jnp.tile(p.key[:1], (k_pad, 1)).at[:n_keys].set(p.key)
        kmask = jnp.ones((k_pad, 3), dtype).at[n_keys:].set(0.0)
        kmask = kmask.at[0].set(0.0).at[1].set(0.0).at[2, 0].set(0.0)
    else:
        key = jnp.zeros((k_pad, 0), dtype)
        kmask = jnp.ones((k_pad, 0), dtype)
    pieces = ParamPieces(p.cam, p.im, key)
    colmask = ParamPieces(
        jnp.ones((n_cams, widths.a), dtype),
        jnp.ones((n_ims, widths.b), dtype).at[0].set(0.0), kmask)
    return op_fun, widths, pieces, colmask, uv, mask, tpl, blocks, rig


@pytest.mark.parametrize("model,chain", [
    ("standard", "template"), ("rational", "template"),
    ("thin_prism", "template"), ("tilted", "template"),
    ("standard", "selfcal"), ("tilted", "selfcal"),
    ("fisheye", "template"), ("fisheye", "selfcal")])
def test_compiled_pallas_gram_parity(model, chain):
    """COMPILED (Mosaic, not interpret) Pallas grams match the XLA closed
    form on the chip in float32 for every served intrinsic width."""
    import jax.numpy as jnp

    from pycamset_tpu.optim.pallas_grams import (
        make_pallas_selfcal_grams, make_pallas_template_grams)
    from pycamset_tpu.optim.structured import make_block_grams

    (op_fun, widths, pieces, colmask, uv, mask, tpl, blocks,
     rig) = _rig_problem(model=model, chain=chain)
    n_cams, n_ims = rig["n_cams"], rig["n_ims"]
    blk_cam = np.repeat(np.arange(n_cams), n_ims)
    blk_im = np.tile(np.arange(n_ims), n_cams)
    bb = n_cams * n_ims
    cmask_b = jnp.repeat(colmask.cam, n_ims, axis=0)
    imask_b = jnp.tile(colmask.im, (n_cams, 1))
    args = (pieces.cam[blk_cam], pieces.im[blk_im], pieces.key, tpl,
            uv, mask, cmask_b, imask_b, colmask.key)

    ref = make_block_grams(op_fun, widths)(*args)
    maker = (make_pallas_selfcal_grams if chain == "selfcal"
             else make_pallas_template_grams)
    got = maker(widths)(*args)
    names = ["gcc_b", "gii_b", "wci_b", "hkk", "wck_b", "wik_b",
             "gc_b", "gi_b", "gk", "cost"]
    for name, r, g in zip(names, ref, got):
        r, g = np.asarray(r), np.asarray(g)
        if r.size == 0:
            continue
        scale = np.abs(r).max() + 1e-12
        rel = np.abs(r - g).max() / scale
        assert rel < 5e-4, (name, rel)  # f32 accumulation-order tolerance


@pytest.mark.parametrize("semantics", ["observation", "component"])
def test_compiled_pallas_robust_gram_parity(semantics):
    """Compiled robust-loss kernels (IRLS weights folded in-kernel, both
    semantics) match the XLA closed form on the chip."""
    import jax.numpy as jnp

    from pycamset_tpu.optim.pallas_grams import make_pallas_template_grams
    from pycamset_tpu.optim.structured import make_block_grams

    (op_fun, widths, pieces, colmask, uv, mask, tpl, blocks,
     rig) = _rig_problem(noise=3.0)
    n_cams, n_ims = rig["n_cams"], rig["n_ims"]
    blk_cam = np.repeat(np.arange(n_cams), n_ims)
    blk_im = np.tile(np.arange(n_ims), n_cams)
    cmask_b = jnp.repeat(colmask.cam, n_ims, axis=0)
    imask_b = jnp.tile(colmask.im, (n_cams, 1))
    args = (pieces.cam[blk_cam], pieces.im[blk_im], pieces.key, tpl,
            uv, mask, cmask_b, imask_b, colmask.key)
    kw = dict(loss="huber", f_scale=2.0, loss_semantics=semantics)
    ref = make_block_grams(op_fun, widths, **kw)(*args)
    got = make_pallas_template_grams(widths, **kw)(*args)
    for name, r, g in zip(["gcc_b", "gii_b", "wci_b", "hkk", "wck_b",
                           "wik_b", "gc_b", "gi_b", "gk", "cost"], ref, got):
        r, g = np.asarray(r), np.asarray(g)
        if r.size == 0:
            continue
        scale = np.abs(r).max() + 1e-12
        assert np.abs(r - g).max() / scale < 5e-4, name


@pytest.mark.parametrize("chain", ["template", "selfcal"])
def test_solve_converges_and_matches_xla_path(chain):
    """A full LM solve on the chip reaches the injected noise floor, and the
    Pallas-served solve lands on the same minimum as the XLA gram path."""
    import jax
    import jax.numpy as jnp

    from pycamset_tpu.optim.structured import make_structured_neq
    from pycamset_tpu.optim.structured_lm import structured_lm_solve

    (op_fun, widths, pieces, colmask, uv, mask, tpl, blocks,
     rig) = _rig_problem(chain=chain, n_cams=4, n_ims=10, grid=10,
                         noise=0.4)

    def run(no_pallas: bool):
        if no_pallas:
            os.environ["PYCAMSET_NO_PALLAS"] = "1"
        else:
            os.environ.pop("PYCAMSET_NO_PALLAS", None)
        try:
            neq = make_structured_neq(op_fun, widths, rig["n_cams"],
                                      rig["n_ims"])
        finally:
            os.environ.pop("PYCAMSET_NO_PALLAS", None)

        @jax.jit
        def solve(p, uv_, mask_, tpl_):
            return structured_lm_solve(
                lambda pp: neq(pp, uv_, mask_, tpl_, colmask), p,
                max_nfev=40)

        pert = pieces._replace(cam=pieces.cam + jax.random.normal(
            jax.random.PRNGKey(0), pieces.cam.shape,
            pieces.cam.dtype) * 1e-4)
        res = solve(pert, uv, mask, tpl)
        jax.block_until_ready(res.cost)
        return res

    res_pallas = run(no_pallas=False)
    res_xla = run(no_pallas=True)
    n_obs = float(np.asarray(mask).sum())
    rms_p = float(np.sqrt(float(res_pallas.cost) / (2 * n_obs)))
    rms_x = float(np.sqrt(float(res_xla.cost) / (2 * n_obs)))
    assert rms_p < 0.4 * 1.2, rms_p       # noise floor
    assert abs(rms_p - rms_x) < 5e-3, (rms_p, rms_x)


def test_tracker_smoke():
    """TargetTracker end-to-end on the chip: seed, compile, track frames."""
    import pycamset_tpu.utils.general_utils as gu
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.tracking import TargetTracker
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=6, grid=6, visibility=0.9,
                             noise_px=0.3, seed=4)
    k_mats, exts, dists = [], [], []
    for c in range(3):
        i9 = rig["intr"][c]
        k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]],
                                [0, 0, 1]]))
        dists.append(i9[4:])
        exts.append(gu.make_4x4h_tform(rig["extr"][c][:3],
                                       rig["extr"][c][3:]))
    names = ["a", "b", "c"]
    cams = CameraSet(camera_dict=make_cam_dict(
        names, exts, k_mats, dists, [[1600, 1200]] * 3))
    det = TargetDetection(cam_names=names, data=rig["dd"])
    tracker = TargetTracker(cams, FreePointTarget(
        rig["template"].reshape(1, -1, 3)))
    poses, info = tracker.track_batch(det)
    assert poses.shape == (6, 4, 4)
    assert float(np.max(info["rms"])) < 0.5
    for i in range(6):
        want = gu.make_4x4h_tform(rig["poses"][i][:3], rig["poses"][i][3:])
        np.testing.assert_allclose(poses[i], want, atol=5e-3)


def test_rigid_fit_planar_rank2_on_chip():
    """The TPU SVD returns a defective null-space basis for rank-2 inputs;
    rigid_fit's cross-product rebuild must hold in compiled f32 on the
    chip (the regression interpret mode cannot catch)."""
    import jax.numpy as jnp

    from pycamset_tpu.ops import rigid_fit
    from pycamset_tpu.utils.general_utils import make_4x4h_tform

    rng = np.random.default_rng(0)
    src = np.concatenate([rng.normal(size=(30, 2)) * 0.05,
                          np.zeros((30, 1))], axis=1)       # z == 0: rank 2
    t_true = make_4x4h_tform(np.array([0.01, -0.02, 0.3]),
                             np.array([0.1, 0.0, 0.05]))
    dst = src @ t_true[:3, :3].T + t_true[:3, 3]
    r, t = rigid_fit(jnp.asarray(src, jnp.float32),
                     jnp.asarray(dst, jnp.float32))
    r = np.asarray(r)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)
    np.testing.assert_allclose(r, t_true[:3, :3], atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_true[:3, 3], atol=1e-4)

    dst_m = dst * np.array([1.0, 1.0, -1.0])
    r2, _ = rigid_fit(jnp.asarray(src, jnp.float32),
                      jnp.asarray(dst_m, jnp.float32))
    np.testing.assert_allclose(np.linalg.det(np.asarray(r2)), 1.0, atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def _mixed_rig(n_cams=3, n_ims=5, grid=4, seed=5, dtype_name="float32"):
    import jax.numpy as jnp

    from pycamset_tpu.optim.blocks import (
        Extrinsic3D, FreePoint, GroupRigidTform3d, Projection, RigidTform3d)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import build_block_arrays
    from pycamset_tpu.optim.structured_mixed import (
        MixedPieces, mixed_chain_widths)
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    dtype = getattr(jnp, dtype_name)
    rig = make_synthetic_rig(n_cams=n_cams, n_ims=n_ims, grid=grid,
                             visibility=0.85, noise_px=0.4, seed=seed)
    n_keys = rig["n_keys"]
    op_fun = OptimFunction([Projection(), Extrinsic3D(), RigidTform3d(),
                            GroupRigidTform3d(), FreePoint()])
    widths = mixed_chain_widths(op_fun)
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys,
                                k_pad_multiple=8)
    k_pad = blocks.uv.shape[1]
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
    kmask = jnp.ones((k_pad, 3), dtype).at[n_keys:].set(0.0)
    kmask = kmask.at[0].set(0.0).at[1].set(0.0).at[2, 0].set(0.0)  # gauge
    colmask = MixedPieces(
        jnp.ones((n_cams, 15), dtype),
        jnp.ones((n_ims, 6), dtype).at[0].set(0.0),
        kmask,
        jnp.ones((2, 6), dtype).at[0].set(0.0))
    tpl = jnp.zeros((k_pad, 3), dtype)
    return op_fun, widths, pieces, colmask, uv, mask, tpl, gok, rig, blocks


def test_compiled_mixed_gram_parity():
    """The compiled (Mosaic) mixed multi-target kernel matches the XLA
    closed form on the chip — every normal-equation piece, float32."""
    from pycamset_tpu.optim.structured_mixed import make_mixed_structured_neq

    (op_fun, widths, pieces, colmask, uv, mask, tpl, gok, rig,
     _b) = _mixed_rig()

    def build(no_pallas):
        if no_pallas:
            os.environ["PYCAMSET_NO_PALLAS"] = "1"
        try:
            return make_mixed_structured_neq(
                op_fun, widths, rig["n_cams"], rig["n_ims"], gok, 2)
        finally:
            os.environ.pop("PYCAMSET_NO_PALLAS", None)

    ref = build(True)(pieces, uv, mask, tpl, colmask)
    got = build(False)(pieces, uv, mask, tpl, colmask)
    for name, r, g in zip(ref._fields, ref, got):
        r, g = np.asarray(r), np.asarray(g)
        assert r.shape == g.shape, name
        scale = np.abs(r).max() + 1e-12
        assert np.abs(r - g).max() / scale < 5e-4, name


@pytest.mark.parametrize("fused", [False, True])
def test_compiled_grouped_gram_parity(fused):
    """The compiled grouped-template kernel (PER_GROUP c-axis, template
    points) matches the XLA path on the chip — per-block AND
    fused-reduction variants (the latter forced via PYCAMSET_FUSED_MIXED;
    n_ims=8 divides the tile)."""
    import jax.numpy as jnp

    from pycamset_tpu.optim.blocks import (
        Extrinsic3D, ParamSpec, Projection, RigidTform3d, TemplatePoints,
        key_type)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import (
        ParamPieces, build_block_arrays, chain_widths, make_structured_neq)
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    class GroupTemplatePoints(TemplatePoints):
        params = ParamSpec(key_type.PER_GROUP, 6)

    dtype = jnp.float32
    n_cams, n_ims, n_groups = 3, (8 if fused else 5), 2
    rig = make_synthetic_rig(n_cams=n_cams, n_ims=n_ims, grid=4,
                             visibility=0.85, noise_px=0.4, seed=6)
    n_keys = rig["n_keys"]
    op_fun = OptimFunction([Projection(), Extrinsic3D(), RigidTform3d(),
                            GroupTemplatePoints()])
    widths = chain_widths(op_fun)
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys,
                                k_pad_multiple=8)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(dtype)
    tpl_pad = np.zeros((k_pad, 3))
    tpl_pad[:n_keys] = rig["template"]
    tpl_pad[n_keys:] = rig["template"][0]
    gok = np.zeros(k_pad, np.int64)
    gok[:n_keys] = np.arange(n_keys) >= n_keys // 2
    grp = np.array([[0.0] * 6, [0.04, -0.02, 0.06, 0.01, -0.02, 0.03]])
    pieces = ParamPieces(
        jnp.asarray(np.concatenate([rig["intr"], rig["extr"]], 1), dtype),
        jnp.asarray(rig["poses"], dtype),
        jnp.asarray(grp, dtype))
    colmask = ParamPieces(
        jnp.ones((n_cams, widths.a), dtype),
        jnp.ones((n_ims, 6), dtype).at[0].set(0.0),
        jnp.ones((n_groups, 6), dtype).at[0].set(0.0))
    tpl = jnp.asarray(tpl_pad, dtype)

    def build(no_pallas):
        if no_pallas:
            os.environ["PYCAMSET_NO_PALLAS"] = "1"
        else:
            os.environ["PYCAMSET_FUSED_MIXED"] = "1" if fused else "0"
        try:
            return make_structured_neq(op_fun, widths, n_cams, n_ims,
                                       group_of_key=gok, n_groups=n_groups)
        finally:
            os.environ.pop("PYCAMSET_NO_PALLAS", None)
            os.environ.pop("PYCAMSET_FUSED_MIXED", None)

    ref = build(True)(pieces, uv, mask, tpl, colmask)
    got = build(False)(pieces, uv, mask, tpl, colmask)
    for name, r, g in zip(ref._fields, ref, got):
        r, g = np.asarray(r), np.asarray(g)
        assert r.shape == g.shape, name
        scale = np.abs(r).max() + 1e-12
        assert np.abs(r - g).max() / scale < 5e-4, name


def test_fused_selfcal_neq_matches_per_block_on_chip():
    """The fused-reduction self-cal kernel (compiled Mosaic) produces the
    same NormalEq as the per-block kernel + XLA reductions on the chip.
    The small chip rigs pad past the 25%% auto-enable threshold, so both
    paths are forced via PYCAMSET_FUSED_SELFCAL."""
    from pycamset_tpu.optim.structured import make_structured_neq

    (op_fun, widths, pieces, colmask, uv, mask, tpl, blocks,
     rig) = _rig_problem(chain="selfcal", n_ims=8)  # 8 ims: tile-8 no pad

    def build(force):
        os.environ["PYCAMSET_FUSED_SELFCAL"] = force
        try:
            return make_structured_neq(op_fun, widths, rig["n_cams"],
                                       rig["n_ims"])
        finally:
            os.environ.pop("PYCAMSET_FUSED_SELFCAL", None)

    ref = build("0")(pieces, uv, mask, tpl, colmask)
    got = build("1")(pieces, uv, mask, tpl, colmask)
    for name, r, g in zip(ref._fields, ref, got):
        r, g = np.asarray(r), np.asarray(g)
        assert r.shape == g.shape, name
        scale = np.abs(r).max() + 1e-12
        assert np.abs(r - g).max() / scale < 5e-4, name


def test_mixed_kernel_bench_key_width_fits_vmem():
    """Mixed kernel at the bench 2-target KEY width (k_pad=400) compiles
    within scoped VMEM. Regression: BLOCK_TILE=16 put the double-buffered
    (T, a*9, k) + (T, 6*9, k) output blocks 876 KB over the 16 MB scoped
    limit at the bench shape (the mixed family caps its tile at 8 —
    pallas_grams.py::_mixed_grams_factory). Per-step VMEM is independent
    of the block count, so a small rig with a wide key axis reproduces."""
    from pycamset_tpu.optim.structured_mixed import make_mixed_structured_neq

    (op_fun, widths, pieces, colmask, uv, mask, tpl, gok, rig,
     _b) = _mixed_rig(grid=20)
    assert mask.shape[1] >= 384  # at least the bench key width
    neq = make_mixed_structured_neq(
        op_fun, widths, rig["n_cams"], rig["n_ims"], gok, 2)(
        pieces, uv, mask, tpl, colmask)
    assert np.isfinite(float(np.asarray(neq.cost)))


def test_fused_freepoint_neq_matches_per_block_on_chip():
    """The fused freepoint delegation ((b,c)=(0,3): identity poses,
    masked pose columns) matches the per-block kernel + XLA reductions
    on the chip, forced via PYCAMSET_FUSED_SELFCAL."""
    import jax.numpy as jnp

    from pycamset_tpu.optim.blocks import Extrinsic3D, FreePoint, Projection
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import (
        ParamPieces, build_block_arrays, chain_widths, make_structured_neq,
        split_full_params)
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    dtype = jnp.float32
    n_cams, n_ims = 3, 8  # 8 ims: tile-8 no pad
    rig = make_synthetic_rig(n_cams=n_cams, n_ims=n_ims, grid=4,
                             visibility=0.9, noise_px=0.3, seed=12)
    n_keys = rig["n_keys"]
    op_fun = OptimFunction([Projection(), Extrinsic3D(), FreePoint()])
    widths = chain_widths(op_fun)
    struct = op_fun.param_struct(n_cams, n_ims, n_keys)
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(dtype)
    full = np.concatenate([rig["intr"].ravel(), rig["extr"].ravel(),
                           rig["template"].ravel()])
    p = split_full_params(jnp.asarray(full, dtype), op_fun, struct,
                          n_cams, n_ims, n_keys, widths)
    key = jnp.tile(p.key[:1], (k_pad, 1)).at[:n_keys].set(p.key)
    pieces = ParamPieces(p.cam, jnp.zeros((n_ims, 0), dtype), key)
    kmask = jnp.ones((k_pad, 3), dtype).at[n_keys:].set(0.0).at[0].set(0.0)
    colmask = ParamPieces(jnp.ones((n_cams, widths.a), dtype),
                          jnp.ones((n_ims, 0), dtype), kmask)
    tpl = jnp.zeros((k_pad, 3), dtype)

    def build(force):
        os.environ["PYCAMSET_FUSED_SELFCAL"] = force
        try:
            return make_structured_neq(op_fun, widths, n_cams, n_ims)
        finally:
            os.environ.pop("PYCAMSET_FUSED_SELFCAL", None)

    ref = build("0")(pieces, uv, mask, tpl, colmask)
    got = build("1")(pieces, uv, mask, tpl, colmask)
    for name, r, g in zip(ref._fields, ref, got):
        r, g = np.asarray(r), np.asarray(g)
        assert r.shape == g.shape, name
        if r.size == 0:
            continue
        scale = np.abs(r).max() + 1e-12
        assert np.abs(r - g).max() / scale < 5e-4, name


def test_compiled_fused_mixed_neq_parity():
    """The fused-reduction mixed kernel (compiled Mosaic) produces the
    same MixedNormalEq as the XLA path on the chip. Forced via
    PYCAMSET_FUSED_MIXED (the small chip rig pads past the 25%
    auto-enable threshold at n_ims=5; n_ims=8 divides the tile)."""
    from pycamset_tpu.optim.structured_mixed import make_mixed_structured_neq

    (op_fun, widths, pieces, colmask, uv, mask, tpl, gok, rig,
     _b) = _mixed_rig(n_ims=8)

    def build(env, val):
        os.environ[env] = val
        try:
            return make_mixed_structured_neq(
                op_fun, widths, rig["n_cams"], rig["n_ims"], gok, 2)
        finally:
            os.environ.pop(env, None)

    ref = build("PYCAMSET_NO_PALLAS", "1")(pieces, uv, mask, tpl, colmask)
    got = build("PYCAMSET_FUSED_MIXED", "1")(pieces, uv, mask, tpl, colmask)
    for name, r, g in zip(ref._fields, ref, got):
        r, g = np.asarray(r), np.asarray(g)
        assert r.shape == g.shape, name
        scale = np.abs(r).max() + 1e-12
        assert np.abs(r - g).max() / scale < 5e-4, name


def test_mixed_solve_pallas_matches_xla_minimum():
    """A full mixed multi-target LM solve on the chip: the Pallas-served
    solve lands on the XLA path's minimum and reaches the noise floor."""
    import jax

    from pycamset_tpu.optim.structured_lm import structured_lm_solve
    from pycamset_tpu.optim.structured_mixed import (
        make_mixed_ops, make_mixed_structured_neq)

    (op_fun, widths, pieces, colmask, uv, mask, tpl, gok, rig,
     blocks) = _mixed_rig(n_cams=4, n_ims=8, grid=8, seed=7)

    def run(no_pallas):
        if no_pallas:
            os.environ["PYCAMSET_NO_PALLAS"] = "1"
        try:
            neq = make_mixed_structured_neq(
                op_fun, widths, rig["n_cams"], rig["n_ims"], gok, 2)
        finally:
            os.environ.pop("PYCAMSET_NO_PALLAS", None)
        ops = make_mixed_ops(neq.onehot)

        @jax.jit
        def solve(p):
            return structured_lm_solve(
                lambda q: neq(q, uv, mask, tpl, colmask), p,
                max_nfev=40, ops=ops)

        res = solve(pieces)
        jax.block_until_ready(res.cost)
        return res

    res_p = run(False)
    res_x = run(True)
    n_obs = blocks.n_real
    rms_p = float(np.sqrt(float(res_p.cost) / (2 * n_obs)))
    rms_x = float(np.sqrt(float(res_x.cost) / (2 * n_obs)))
    assert rms_p < 0.4 * 1.25, rms_p
    assert abs(rms_p - rms_x) < 5e-3, (rms_p, rms_x)


def test_generic_backend_solve_on_chip():
    """The generic (gather-grouped) fallback backend solves a custom chain
    on the chip — the path non-structured user chains take."""
    import jax.numpy as jnp

    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import (
        FreePointTarget, TemplateBundleHandler)
    import pycamset_tpu.utils.general_utils as gu
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=5, grid=5, visibility=0.9,
                             noise_px=0.3, seed=8)
    k_mats, exts, dists = [], [], []
    for c in range(3):
        i9 = rig["intr"][c]
        k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]],
                                [0, 0, 1]]))
        dists.append(i9[4:])
        exts.append(gu.make_4x4h_tform(rig["extr"][c][:3],
                                       rig["extr"][c][3:]))
    names = ["a", "b", "c"]
    cams = CameraSet(camera_dict=make_cam_dict(
        names, exts, k_mats, dists, [[1600, 1200]] * 3))
    det = TargetDetection(cam_names=names, data=rig["dd"])
    handler = TemplateBundleHandler(
        cams, FreePointTarget(rig["template"].reshape(1, -1, 3)), det,
        options={"outliers": "n", "max_nfev": 30})
    _res, solved = run_bundle_adjustment(handler, backend="generic")
    rms = float(np.mean(np.linalg.norm(
        solved.calibration_result.reshape(-1, 2), axis=1)))
    assert rms < 0.5, rms


def test_tracker_batch_throughput():
    """Tracker batch mode on the chip: many frames in one device call,
    sane per-frame latency once compiled."""
    import time

    import pycamset_tpu.utils.general_utils as gu
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.tracking import TargetTracker
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=4, n_ims=32, grid=6, visibility=0.9,
                             noise_px=0.3, seed=9)
    k_mats, exts, dists = [], [], []
    for c in range(4):
        i9 = rig["intr"][c]
        k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]],
                                [0, 0, 1]]))
        dists.append(i9[4:])
        exts.append(gu.make_4x4h_tform(rig["extr"][c][:3],
                                       rig["extr"][c][3:]))
    names = [f"c{i}" for i in range(4)]
    cams = CameraSet(camera_dict=make_cam_dict(
        names, exts, k_mats, dists, [[1600, 1200]] * 4))
    det = TargetDetection(cam_names=names, data=rig["dd"])
    tracker = TargetTracker(cams, FreePointTarget(
        rig["template"].reshape(1, -1, 3)))
    poses, info = tracker.track_batch(det)       # compile + run
    t0 = time.perf_counter()
    poses, info = tracker.track_batch(det)       # warm
    dt = time.perf_counter() - t0
    assert poses.shape == (32, 4, 4)
    assert float(np.max(info["rms"])) < 0.5
    per_frame_ms = dt / 32 * 1e3
    assert per_frame_ms < 250.0, per_frame_ms    # generous chip bound


def test_adversarial_robust_cell_on_chip():
    """One adversarial battery cell on the real chip: 10% outliers with
    huber/component semantics, device f32 LM vs scipy f64 TRF."""
    import sys
    from pathlib import Path

    import jax.numpy as jnp

    sys.path.insert(0, str(Path(__file__).parent))
    from test_lm_adversarial import _build_pair, _final_costs

    h_dev, h_sp = _build_pair(
        outlier_frac=0.10, seed=43,
        options={"loss": "huber", "f_scale": 2.0,
                 "loss_semantics": "component"})
    c_dev, c_sp = _final_costs(h_dev, h_sp, dtype=jnp.float32)
    assert c_dev <= c_sp * 1.01 + 1e-12, (c_dev, c_sp)


def test_reference_image_e2e_on_chip(tmp_path):
    """The full user flow on the real chip: reference ChArUco images
    (host OpenCV detection + seeding), device LM solve on TPU, at the
    reference accuracy threshold (ref: tests/calibration_test.py:26)."""
    import shutil
    from pathlib import Path

    ref = Path("/root/reference/tests/test_data/calibration_charuco")
    if not ref.exists():
        pytest.skip("reference test data unavailable")
    work = tmp_path / "charuco"
    for sub in ("1", "2", "3"):
        shutil.copytree(ref / sub, work / sub)

    from pycamset_tpu import calibrate_cameras
    from pycamset_tpu.models.charuco import ChArUco

    cams = calibrate_cameras(
        f_loc=work, calibration_target=ChArUco(20, 20, 4, legacy=True),
        save=False, problem_options={"outliers": "n"})
    err = float(np.mean(np.linalg.norm(
        cams.calibration_result.reshape(-1, 2), axis=1)))
    assert err < 1.8, err


def test_fisheye_solve_on_chip_without_pallas():
    """The fisheye chain's NON-Pallas path (closed-form XLA grams) must
    compile and converge in f32 on the chip — the Pallas kernel path is
    covered by test_compiled_pallas_gram_parity[fisheye-*]."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_fisheye_model import _fisheye_handler

    from pycamset_tpu.optim.driver import run_bundle_adjustment

    os.environ["PYCAMSET_NO_PALLAS"] = "1"
    try:
        handler, rig = _fisheye_handler()
        res, _cams = run_bundle_adjustment(handler, backend="structured")
    finally:
        os.environ.pop("PYCAMSET_NO_PALLAS", None)
    rms = float(np.sqrt(np.mean(res["fun"] ** 2)))
    assert rms < 2.0 * rig["noise_px"], rms


def test_sharded_solver_on_chip_one_device_mesh():
    """shard_map + psum wrapping the structured backend (Pallas grams
    inside) must compile through Mosaic and converge on a REAL single-chip
    mesh — the CPU tier only ever sees this composition on virtual
    devices. A 1-device mesh still traces the collective program."""
    import jax.numpy as jnp

    from pycamset_tpu.optim.structured import ParamPieces
    from pycamset_tpu.parallel.mesh import detection_mesh
    from pycamset_tpu.parallel.sharded_structured import (
        make_sharded_structured_solver, shard_block_arrays)

    (op_fun, widths, pieces, colmask, uv, mask, tpl, blocks,
     rig) = _rig_problem(model="standard", chain="template")
    n_cams, n_ims = rig["n_cams"], rig["n_ims"]
    mesh = detection_mesh()          # every (= the one) real device
    uv_s, mask_s = shard_block_arrays(mesh, uv, mask, n_cams)

    pert = ParamPieces(
        pieces.cam + jnp.asarray(np.random.default_rng(0).normal(
            size=pieces.cam.shape) * 1e-4, pieces.cam.dtype),
        pieces.im, pieces.key)
    solve = make_sharded_structured_solver(
        op_fun, widths, n_cams, n_ims, mesh, colmask, max_nfev=40)
    res = solve(pert, uv_s, mask_s, tpl)
    rms = float(np.sqrt(float(res.cost) / (2 * blocks.n_real)))
    assert np.isfinite(rms)
    assert rms < 2.0 * 0.5, rms      # the injected noise floor


def test_sharded_mixed_solver_on_chip_one_device_mesh():
    """The MIXED (multi-target self-cal) sharded solver — arrow-structured
    Schur + the fused mixed Pallas kernel under shard_map — on a real
    single-chip mesh."""
    import sys
    from pathlib import Path

    import jax.numpy as jnp

    sys.path.insert(0, str(Path(__file__).parent))
    from test_sharded_mixed import _problem

    from pycamset_tpu.parallel.mesh import detection_mesh
    from pycamset_tpu.parallel.sharded_mixed import make_sharded_mixed_solver
    from pycamset_tpu.parallel.sharded_structured import shard_block_arrays

    (op_fun, widths, pieces, colmask, uv, mask, tpl, gok, rig,
     blocks) = _problem(n_cams=3, n_ims=5, dtype=jnp.float32)

    mesh = detection_mesh()
    uv_s, mask_s = shard_block_arrays(mesh, uv, mask, rig["n_cams"])
    solve = make_sharded_mixed_solver(
        op_fun, widths, rig["n_cams"], rig["n_ims"], mesh, colmask, gok, 2,
        max_nfev=40)
    res = solve(pieces, uv_s, mask_s, tpl)
    rms = float(np.sqrt(float(res.cost) / (2 * blocks.n_real)))
    assert np.isfinite(rms)
    assert rms < 2.0 * 0.4, rms


@pytest.mark.parametrize("chain,shard_axis,n_ims", [
    ("template", "cam", 16), ("template", "pose", 16),
    ("selfcal", "cam", 8), ("selfcal", "pose", 8),
    ("selfcal", "key", 8)])
def test_sharded_fused_neq_parity_on_chip(chain, shard_axis, n_ims):
    """FUSED Pallas kernels inside the sharded backends (per-device slab
    dims; in-kernel accumulation completed by the psum) must match the
    per-block kernel path on a real 1-device mesh. Tile-aligned image
    axes so the fused padding policy engages (16 for template, 8-ok for
    self-cal) — the small-rig sharded tests above only ever exercise the
    per-block fallback."""
    import jax

    from pycamset_tpu.optim.structured import (
        make_structured_neq, resolve_fused_grams)
    from pycamset_tpu.parallel.mesh import detection_mesh
    from pycamset_tpu.parallel.sharded_structured import (
        make_key_sharded_structured_neq, make_pose_sharded_structured_neq,
        make_sharded_structured_neq, shard_block_arrays, shard_key_arrays)

    (op_fun, widths, pieces, colmask, uv, mask, tpl, blocks,
     rig) = _rig_problem(chain=chain, n_cams=2, n_ims=n_ims)
    n_cams = rig["n_cams"]
    mesh = detection_mesh()          # the one real device
    assert resolve_fused_grams(op_fun, widths, n_cams, n_ims) is not None

    make = {"cam": make_sharded_structured_neq,
            "pose": make_pose_sharded_structured_neq,
            "key": make_key_sharded_structured_neq}[shard_axis]
    neq_sh = jax.jit(make(op_fun, widths, n_cams, n_ims, mesh))
    if shard_axis == "key":
        uv_s, mask_s, tpl_s, pieces_s, colmask_s = shard_key_arrays(
            mesh, uv, mask, tpl, pieces, colmask, n_cams)
        got = neq_sh(pieces_s, uv_s, mask_s, tpl_s, colmask_s)
    else:
        uv_s, mask_s = shard_block_arrays(mesh, uv, mask, n_cams,
                                          shard_axis=shard_axis)
        got = neq_sh(pieces, uv_s, mask_s, tpl, colmask)

    env = ("PYCAMSET_FUSED_TEMPLATE" if chain == "template"
           else "PYCAMSET_FUSED_SELFCAL")
    os.environ[env] = "0"            # reference: the per-block kernel path
    try:
        neq_ref = jax.jit(make_structured_neq(op_fun, widths, n_cams,
                                              n_ims))
    finally:
        os.environ.pop(env, None)
    ref = neq_ref(pieces, uv, mask, tpl, colmask)

    for name, r, g in zip(ref._fields, ref, got):
        r, g = np.asarray(r), np.asarray(g)
        if r.size == 0:
            continue
        rel = np.abs(r - g).max() / (np.abs(r).max() + 1e-12)
        assert rel < 5e-4, (name, rel)  # f32 accumulation-order tolerance


@pytest.mark.parametrize("shard_axis", ["cam", "pose", "key"])
def test_sharded_fused_mixed_neq_parity_on_chip(shard_axis):
    """The fused MIXED kernel inside the sharded mixed backend matches the
    per-block XLA path on a real 1-device mesh (n_ims=8: tile-aligned, so
    resolve_mixed_grams_fused engages for the per-device slab)."""
    import sys
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, str(Path(__file__).parent))
    from test_sharded_mixed import _problem

    from pycamset_tpu.optim.structured_mixed import (
        MixedPieces, make_mixed_structured_neq, resolve_mixed_grams_fused)
    from pycamset_tpu.parallel.mesh import DETECTION_AXIS, detection_mesh
    from pycamset_tpu.parallel.sharded_mixed import (
        make_key_sharded_mixed_neq, make_sharded_mixed_neq)
    from pycamset_tpu.parallel.sharded_structured import shard_block_arrays

    (op_fun, widths, pieces, colmask, uv, mask, tpl, gok, rig,
     _b) = _problem(n_cams=2, n_ims=8, dtype=jnp.float32)
    n_cams, n_ims = rig["n_cams"], rig["n_ims"]
    mesh = detection_mesh()
    assert resolve_mixed_grams_fused(op_fun, widths, n_cams,
                                     n_ims) is not None

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
        neq_sh = jax.jit(make_key_sharded_mixed_neq(
            op_fun, widths, n_cams, n_ims, mesh, gok, 2))
        got = neq_sh(pieces_s, uv_s, mask_s, tpl_s, colmask_s)
    else:
        neq_sh = jax.jit(make_sharded_mixed_neq(
            op_fun, widths, n_cams, n_ims, mesh, gok, 2,
            shard_axis=shard_axis))
        uv_s, mask_s = shard_block_arrays(mesh, uv, mask, n_cams,
                                          shard_axis=shard_axis)
        got = neq_sh(pieces, uv_s, mask_s, tpl, colmask)

    os.environ["PYCAMSET_FUSED_MIXED"] = "0"
    try:
        neq_ref = jax.jit(make_mixed_structured_neq(
            op_fun, widths, n_cams, n_ims, gok, 2))
    finally:
        os.environ.pop("PYCAMSET_FUSED_MIXED", None)
    ref = neq_ref(pieces, uv, mask, tpl, colmask)

    for name, r, g in zip(ref._fields, ref, got):
        r, g = np.asarray(r), np.asarray(g)
        if r.size == 0:
            continue
        rel = np.abs(r - g).max() / (np.abs(r).max() + 1e-12)
        assert rel < 5e-4, (name, rel)


def test_serving_artifact_roundtrip_on_chip(tmp_path):
    """jax.export artifacts must serialize, reload, and bit-match the
    live tracker ON THE TPU backend (the CPU tier proves the logic; the
    chip run proves Mosaic/XLA-TPU lowering of the exported StableHLO)."""
    from tests.test_tracking import _rig

    from pycamset_tpu.serving import export_tracker, load_tracker_artifact
    from pycamset_tpu.tracking import TargetTracker

    cams, target, det, true, rig = _rig(n_ims=6)
    tracker = TargetTracker(cams, target)
    ref_poses, ref_info = tracker.track_batch(det, seed_mode="device")
    path = export_tracker(tracker, tmp_path / "rig.trkz")
    srv = load_tracker_artifact(path)
    poses, info = srv.track_batch(det)
    np.testing.assert_allclose(poses, ref_poses, atol=1e-9)
    np.testing.assert_allclose(poses, true, atol=5e-2)
    p_st, _ = srv.track_stream(det)
    np.testing.assert_allclose(p_st, true, atol=5e-2)


def test_sgm_disparity_on_chip():
    """Census/SGM matcher compiled by Mosaic/XLA-TPU: a textured image
    pair with a known uniform shift must come back at that disparity
    (the CPU tier proves the DP logic; this proves the TPU lowering of
    population_count + the (H, D)/(W, D)-carry scans in f32)."""
    import jax.numpy as jnp

    from pycamset_tpu.reconstruction.dense_stereo import make_sgm_matcher

    rng = np.random.default_rng(5)
    h, w, d_true = 64, 96, 7
    base = rng.uniform(0, 255, (h, w + 32)).astype(np.float32)
    # smooth a little so census windows carry structure, not salt
    k = np.ones((3, 3)) / 9.0
    import scipy.signal as ss
    base = ss.convolve2d(base, k, mode="same", boundary="symm")
    # left pixel x must match right pixel x - d_true, i.e. the right
    # view sees the pattern shifted LEFT: right[j] = base[16 + d + j]
    left = base[:, 16:16 + w]
    right = base[:, 16 + d_true:16 + d_true + w]
    match = make_sgm_matcher(max_disp=16)
    disp = np.asarray(match(jnp.asarray(left), jnp.asarray(right)))
    valid = np.isfinite(disp)
    assert valid.mean() > 0.8
    err = np.abs(disp[valid] - d_true)
    assert np.median(err) < 0.5
    assert (err < 1.0).mean() > 0.95


def test_plane_sweep_on_chip():
    """Plane sweep compiled for TPU: 3 rendered views of a fronto plane
    at z=5 must reconstruct that depth (reduce_window ZNCC + top_k +
    the SGM volume regularisation, all in one TPU program)."""
    from pycamset_tpu.models.camera import Camera
    from pycamset_tpu.reconstruction.plane_sweep import plane_sweep_depth

    h, w = 96, 128
    k = np.array([[120.0, 0, w / 2], [0, 120.0, h / 2], [0, 0, 1]])

    def tex(x, y):
        return (np.sin(7.1 * x) * np.cos(5.3 * y)
                + 0.6 * np.sin(13.7 * x + 2.1 * y)
                + 0.4 * np.cos(3.3 * x - 9.1 * y)) * 60 + 128

    def cam(tx, ty):
        ext = np.eye(4)
        ext[:3, 3] = [-tx, -ty, 0.0]
        return Camera(extrinsic=ext, intrinsic=k, res=(w, h))

    def render(c, z0=5.0):
        u, v = np.meshgrid(np.arange(w, dtype=float),
                           np.arange(h, dtype=float))
        rays = np.linalg.inv(k) @ np.stack(
            [u.ravel(), v.ravel(), np.ones(h * w)])
        rot = c.cam_to_world[:3, :3]
        org = c.cam_to_world[:3, 3:4]
        dw = rot @ rays
        p = org + dw * (z0 - org[2]) / dw[2]
        return tex(p[0], p[1]).reshape(h, w).astype(np.float32)

    ref, srcs = cam(0, 0), [cam(0.4, 0), cam(-0.4, 0), cam(0, 0.4)]
    for reg in (False, True):
        depth, _ = plane_sweep_depth(
            ref, srcs, render(ref), [render(c) for c in srcs],
            near=2.5, far=8.0, n_planes=64, top_k=2, regularize=reg)
        valid = np.isfinite(depth)
        assert valid.mean() > 0.85, reg
        assert np.median(np.abs(depth[valid] - 5.0)) < 0.05, reg


def test_fleet_vmapped_solve_on_chip():
    """Fleet calibration (optim/fleet.py's core pattern): two same-shape
    template rigs batched through ONE jax.vmap'd structured LM solve must
    match their solo solves on the compiled-Mosaic path. n_ims=16 is
    tile-aligned so the FUSED template kernel engages under vmap — this is
    the only tier that can see a Pallas batching-rule defect (interpret
    mode on CPU takes the XLA closed form)."""
    import jax
    import jax.numpy as jnp

    from pycamset_tpu.optim.structured import make_structured_neq
    from pycamset_tpu.optim.structured_lm import structured_lm_solve

    probs = [_rig_problem(n_cams=2, n_ims=16, grid=6, noise=0.3, seed=s)
             for s in (2, 3)]
    op_fun, widths = probs[0][0], probs[0][1]
    neq_raw = make_structured_neq(op_fun, widths, 2, 16)

    def one(pieces, uv, mask, tpl, colmask):
        return structured_lm_solve(
            lambda p: neq_raw(p, uv, mask, tpl, colmask), pieces,
            max_nfev=40)

    stackt = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                    *[(p[2], p[4], p[5], p[6], p[3])
                                      for p in probs])
    res = jax.jit(jax.vmap(one))(*stackt)
    costs = np.asarray(res.cost)

    solo = jax.jit(one)
    for r, p in enumerate(probs):
        ref = solo(p[2], p[4], p[5], p[6], p[3])
        ref_cost = float(np.asarray(ref.cost))
        assert np.isfinite(costs[r])
        assert costs[r] == pytest.approx(ref_cost, rel=2e-4)
        n_real = p[7].n_real
        rms = np.sqrt(costs[r] / (2 * n_real))
        assert rms < 0.3 * 1.25


def test_shared_intrinsics_tied_solve_on_chip():
    """The tied (shared-intrinsics) backend end-to-end on real TPU: the
    untied Pallas grams fold through the tying map inside the jitted LM
    (optim/shared_intr.py), reach the noise floor, and broadcast one lens
    per group. Driver-level (run_bundle_adjustment) so the fold + ops
    injection compile under Mosaic exactly as production dispatches them."""
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import (FreePointTarget,
                                             TemplateBundleHandler)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    gid = [0, 0, 1, 1]
    rig = make_synthetic_rig(n_cams=4, n_ims=8, grid=6, visibility=0.9,
                             noise_px=0.3, seed=15, shared_intrinsics=gid)
    names = [f"cam{c}" for c in range(4)]
    k_mats, exts, dists = [], [], []
    for c in range(4):
        i = rig["intr"][c]
        k_mats.append(np.array([[i[0], 0, i[1]], [0, i[2], i[3]],
                                [0, 0, 1]]))
        dists.append(i[4:])
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        names, exts, k_mats, dists, [[1600, 1200]] * 4))
    target = FreePointTarget(rig["template"].reshape(1, -1, 3))
    det = TargetDetection(cam_names=names, data=rig["dd"])
    handler = TemplateBundleHandler(
        cams, target, det,
        options={"outliers": "n", "shared_intrinsics": ["a", "a", "b", "b"]})
    res, solved = run_bundle_adjustment(handler)

    err = np.mean(np.linalg.norm(res.fun.reshape(-1, 2), axis=1))
    assert err < 2 * rig["noise_px"]
    assert np.array_equal(solved["cam0"].intrinsic, solved["cam1"].intrinsic)
    assert np.array_equal(solved["cam2"].intrinsic, solved["cam3"].intrinsic)
    assert not np.array_equal(solved["cam0"].intrinsic,
                              solved["cam2"].intrinsic)
    assert abs(solved["cam0"].intrinsic[0, 0] - rig["intr"][0][0]) < 5.0


def test_tied_fleet_solve_on_chip():
    """The shared-intrinsics FLEET path on real TPU: fold_tied + tied ops
    under jax.vmap must compile and match the single-rig tied solve on
    the Mosaic path (optim/fleet.py::_build_tied_fleet). n_ims=16 is
    tile-aligned so the fused template kernel engages under vmap."""
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.fleet import run_fleet_bundle_adjustment
    from pycamset_tpu.optim.handlers import (FreePointTarget,
                                             TemplateBundleHandler)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    def handler(seed):
        rig = make_synthetic_rig(n_cams=2, n_ims=16, grid=6,
                                 visibility=1.0, noise_px=0.3, seed=seed,
                                 shared_intrinsics=True)
        names = ["a", "b"]
        k_mats = [np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]],
                            [0, 0, 1]]) for i9 in rig["intr"]]
        exts = [make_4x4h_tform(e[:3], e[3:]) for e in rig["extr"]]
        cams = CameraSet(camera_dict=make_cam_dict(
            names, exts, k_mats, [i9[4:] for i9 in rig["intr"]],
            [[1600, 1200]] * 2))
        return TemplateBundleHandler(
            cams, FreePointTarget(rig["template"].reshape(1, -1, 3)),
            TargetDetection(cam_names=names, data=rig["dd"]),
            options={"outliers": "n", "shared_intrinsics": True,
                     "max_nfev": 40}), rig

    seeds = (21, 22)
    results, camsets = run_fleet_bundle_adjustment(
        [handler(s)[0] for s in seeds])
    for s, res, cs in zip(seeds, results, camsets):
        assert np.isfinite(res.cost)
        assert np.array_equal(cs["a"].intrinsic, cs["b"].intrinsic)
        solo, _ = run_fleet_bundle_adjustment([handler(s)[0]])
        assert res.cost == pytest.approx(solo[0].cost, rel=2e-4)
        err = np.mean(np.linalg.norm(res.fun.reshape(-1, 2), axis=1))
        assert err < 2 * 0.3


def test_temporal_sync_calibration_on_chip():
    """Sync calibration end-to-end on real TPU: the (6I+E) dense arrow
    system, one-hot assembly and Schur clock covariance must survive
    float32 conditioning on hardware (the CPU tier runs it in f64)."""
    from test_sync import _grid_target, _moving_capture, _ring_rig

    from pycamset_tpu.calibration.sync import calibrate_time_offsets

    cams = _ring_rig()
    tpl, target = _grid_target()
    true = np.array([0.0, 0.23, -0.31])
    det, _ = _moving_capture(cams, tpl, 40, true, noise=0.2, seed=4)
    res = calibrate_time_offsets(cams, det, target)
    assert res.offsets[0] == 0.0
    assert np.abs(res.offsets - true).max() < 0.05
    assert (res.offset_sigma[1:] < 0.05).all()
    assert res.rms < 0.35


def test_rolling_shutter_tracking_on_chip():
    """The 12-dof [pose|velocity] tracker state on real TPU float32:
    reaches the injected noise floor where the 6-dof model cannot."""
    from test_sync import _grid_target, _moving_capture, _ring_rig

    from pycamset_tpu.tracking import TargetTracker

    cams = _ring_rig()
    tpl, target = _grid_target()
    true_rs = np.array([0.7, 0.7, 0.7])
    det, knots = _moving_capture(cams, tpl, 24, np.zeros(3),
                                 readouts=true_rs, noise=0.1, seed=9,
                                 linear=True)
    tr_rs = TargetTracker(cams, target, rolling_shutter=true_rs)
    poses, info = tr_rs.track_batch(det)
    assert float(info["rms"].mean()) < 0.13
    true_vel = np.diff(knots, axis=0)[0]
    vel = info["velocity"][1:-1]
    assert np.abs(vel.mean(axis=0) - true_vel).max() < 3e-3
    tr_gs = TargetTracker(cams, target)
    _, info_gs = tr_gs.track_batch(det)
    assert float(info_gs["rms"].mean()) > 1.2 * float(info["rms"].mean())


def test_wand_calibration_on_chip():
    """Targetless wand calibration end-to-end on real TPU: the pose-free
    free-point BA (thousands of free points, pinned lenses, pinned
    camera 0, one pinned coordinate for the scale mode) must hold its
    accuracy in float32 on hardware."""
    from test_wand import (WAND, _relative_errors, _ring_rig,
                           _wand_capture)

    from pycamset_tpu.calibration.wand import calibrate_extrinsics_from_wand

    truth = _ring_rig()
    dd = _wand_capture(truth, noise=0.2, seed=21)
    solved, rep = calibrate_extrinsics_from_wand(
        _ring_rig(scramble=True), dd, wand_template=WAND)
    assert rep["rms_px"] < 0.35
    rot, trans = _relative_errors(solved, truth)
    assert rot < 5e-4 and trans < 3e-3
    assert rep["wand_lengths"]["relative_spread_rms"] < 8e-3


def test_marker_cloud_reconstruction_on_chip():
    """MarkerTriangulator on real TPU float32: DLT + GN pixel polish
    reaches sub-mm at 0.2 px noise; underdetermined markers stay NaN."""
    from test_markers import N_MARKERS, _capture, _rig

    from pycamset_tpu.markers import MarkerTriangulator

    cams = _rig()
    dd, truth = _capture(cams, n_frames=30, noise=0.2, seed=31,
                         occlude={(4, 2)})
    tri = MarkerTriangulator(cams, N_MARKERS)
    pts, info = tri.reconstruct(dd)
    seen = info["n_views"] >= 2
    err = np.linalg.norm(pts - truth, axis=-1)
    assert np.nanmedian(err[seen]) < 5e-4
    assert np.isnan(pts[4, 2]).all()
    assert abs(np.nanmean(info["rms"][seen]) - 0.2) < 0.12


def test_depth_fusion_tsdf_mesh_on_chip():
    """Depth fusion + TSDF accumulation compiled for TPU in float32
    (the CPU tier runs them in f64): exact rendered depths of the
    two-plane scene fuse to a deduplicated cloud on the planes, and the
    TSDF zero-crossing meshes at z = 5 in a bump-free grid window."""
    from test_fusion import _make_cam, _render

    from pycamset_tpu.reconstruction.fusion import fuse_depth_maps
    from pycamset_tpu.reconstruction.tsdf import (marching_tetrahedra,
                                                  tsdf_fuse)

    cams = [_make_cam(0, 0), _make_cam(0.4, 0), _make_cam(-0.4, 0),
            _make_cam(0, 0.4)]
    gt = [_render(c)[1].astype(np.float32) for c in cams]

    out = fuse_depth_maps(cams, gt, min_consistent=2, max_px=0.75,
                          max_rel=0.005)
    pts = out["points"]
    assert pts.shape[0] > 0.3 * gt[0].size
    err = np.minimum(np.abs(pts[:, 2] - 5.0), np.abs(pts[:, 2] - 3.5))
    assert np.median(err) < 1e-3                 # f32 floor, not f64's 1e-6

    voxel, origin, dims = 0.02, (0.9, -0.4, 4.7), (40, 40, 30)
    tsdf, wsum = tsdf_fuse(cams, gt, origin, voxel, dims)
    assert tsdf.dtype == np.float32
    verts, _faces = marching_tetrahedra(tsdf, origin=origin, voxel=voxel,
                                        mask=wsum >= 2)
    assert len(verts) > 200
    assert np.abs(np.median(verts[:, 2]) - 5.0) < voxel


def test_doctor_full_pass_on_chip():
    """The environment self-test passes on the real chip, device smoke
    included (its f32 inputs are the device dtype — f64 programs abort
    the remote compiler). The first fetch may absorb the tunnel's one-off
    d2h bring-up, which downgrades the check to warn, never fail."""
    from pycamset_tpu.utils import doctor

    report = doctor.run_doctor(device=True)
    assert report["ok"], report["checks"]
    assert report["checks"]["devices"]["status"] == "ok"   # real TPU listed
    assert report["checks"]["device"]["status"] in ("ok", "warn")
    assert "tpu" in report["checks"]["device"]["detail"]


def test_het_rig_solve_on_chip():
    """A HETEROGENEOUS rig (fisheye + Brown in one bundle adjustment,
    the selector-extended ProjectionHet chain) compiles and converges in
    f32 on the real chip, and extraction keeps family-correct widths."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_het_rig import _make_het_handler

    from pycamset_tpu.optim.driver import run_bundle_adjustment

    handler, rig, names = _make_het_handler(
        models=("fisheye", "standard", "fisheye"), noise=0.2, seed=13,
        n_ims=8, grid=6)
    res, cams = run_bundle_adjustment(handler, backend="structured")
    rms = float(np.sqrt(np.mean(res["fun"] ** 2)))
    assert rms < 2.0 * rig["noise_px"], rms
    assert np.reshape(cams[names[0]].distortion_coefs, -1).size == 4
    assert np.reshape(cams[names[1]].distortion_coefs, -1).size == 5


def test_rolling_shutter_calibration_on_chip():
    """The RS chain (aux row channel + out-of-order group assembly +
    12-wide pose blocks) compiles and converges in f32 on the real chip,
    recovering the injected readouts."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_rolling_shutter import (TRUE_READOUTS, _grid_template,
                                      _ring_rig, _rs_capture, _rs_handler)

    from pycamset_tpu.optim.driver import run_bundle_adjustment

    cams = _ring_rig()
    tpl = _grid_template()
    noise = 0.2
    dd, _p, _v = _rs_capture(cams, tpl, 10, TRUE_READOUTS, noise=noise,
                             seed=9)
    handler = _rs_handler(cams, tpl, dd, TRUE_READOUTS[0])
    res, _cams = run_bundle_adjustment(handler, backend="structured")
    rms = float(np.sqrt(np.mean(res["fun"] ** 2)))
    assert rms < 2.0 * noise, rms
    got = handler.get_readouts(res["x"])
    assert abs(got["cam1"] - TRUE_READOUTS[1]) < 0.1, got
    assert abs(got["cam2"] - TRUE_READOUTS[2]) < 0.1, got
