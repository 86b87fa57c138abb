"""Pallas fused-gram kernel parity vs the XLA gram path (interpret mode)."""
import numpy as np
import pytest


def _interp_shim(monkeypatch):
    from jax.experimental import pallas as pl

    import pycamset_tpu.optim.pallas_grams as pg
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
    return pg


@pytest.mark.parametrize("model", ["standard", "rational", "thin_prism",
                                   "tilted", "fisheye"])
def test_pallas_selfcal_grams_match_xla(monkeypatch, model):
    import jax.numpy as jnp

    pg = _interp_shim(monkeypatch)
    from pycamset_tpu.optim.blocks import (
        Extrinsic3D, FreePoint, Projection, ProjectionFisheye,
        ProjectionRational, ProjectionThinPrism, ProjectionTilted,
        RigidTform3d)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import (
        build_block_arrays, chain_widths, make_block_grams,
        split_full_params)
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    proj = {"standard": Projection, "rational": ProjectionRational,
            "thin_prism": ProjectionThinPrism, "tilted": ProjectionTilted,
            "fisheye": ProjectionFisheye}[model]
    rig = make_synthetic_rig(n_cams=3, n_ims=5, grid=4, visibility=0.8,
                             noise_px=0.5, seed=2, camera_model=model)
    n_cams, n_ims, n_keys = rig["n_cams"], rig["n_ims"], rig["n_keys"]
    op_fun = OptimFunction(
        [proj(), Extrinsic3D(), RigidTform3d(), FreePoint()])
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
    keyp = jnp.zeros((k_pad, 3)).at[:n_keys].set(pieces.key)
    blk_cam = np.repeat(np.arange(n_cams), n_ims)
    blk_im = np.tile(np.arange(n_ims), n_cams)
    bb = n_cams * n_ims
    cmask = jnp.ones((bb, widths.a)).at[:, 2].set(0.0)
    imask = jnp.ones((bb, 6)).at[:, 4].set(0.0)
    kmask = (jnp.ones((k_pad, 3)).at[n_keys:].set(0.0)
             .at[0].set(0.0).at[2, 1].set(0.0))
    args = (keyp, jnp.zeros((k_pad, 3)), uv, mask, cmask, imask, kmask)

    ref = make_block_grams(op_fun, widths)(
        pieces.cam[blk_cam], pieces.im[blk_im], *args)
    got = pg.make_pallas_selfcal_grams(widths)(
        pieces.cam[blk_cam], pieces.im[blk_im], *args)
    names = ["gcc_b", "gii_b", "wci_b", "hkk", "wck_b", "wik_b",
             "gc_b", "gi_b", "gk", "cost"]
    for name, r, g in zip(names, ref, got):
        r, g = np.asarray(r), np.asarray(g)
        assert r.shape == g.shape, name
        scale = np.abs(r).max() + 1e-12
        assert np.abs(r - g).max() / scale < 1e-6, name


def test_pallas_grams_match_xla(monkeypatch):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    import pycamset_tpu.optim.pallas_grams as pg
    from pycamset_tpu.optim.blocks import (
        Extrinsic3D, Projection, TemplatePoints)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import (
        build_block_arrays, chain_widths, make_block_grams,
        split_full_params)
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    # run the kernel in interpret mode on the CPU backend
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pg, "pl", type(pl)("pl_shim"))
    pg.pl.pallas_call = interp
    pg.pl.BlockSpec = pl.BlockSpec

    rig = make_synthetic_rig(n_cams=3, n_ims=5, grid=4, visibility=0.8,
                             noise_px=0.5, seed=2)
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
    full = np.concatenate([rig["intr"].ravel(), rig["extr"].ravel(),
                           rig["poses"].ravel()])
    pieces = split_full_params(jnp.asarray(full), op_fun, struct,
                               n_cams, n_ims, n_keys, widths)
    blk_cam = np.repeat(np.arange(n_cams), n_ims)
    blk_im = np.tile(np.arange(n_ims), n_cams)
    cam_b = pieces.cam[blk_cam]
    im_b = pieces.im[blk_im]
    bb = n_cams * n_ims
    # fix a couple of columns to exercise the column masks
    cmask = jnp.ones((bb, 15)).at[:, 3].set(0.0)
    imask = jnp.ones((bb, 6)).at[:, 5].set(0.0)
    args = (jnp.zeros((k_pad, 0)), jnp.asarray(tpl_pad), uv, mask,
            cmask, imask, jnp.ones((k_pad, 0)))

    ref = make_block_grams(op_fun, widths)(cam_b, im_b, *args)
    got = pg.make_pallas_template_grams(widths)(cam_b, im_b, *args)
    names = ["gcc_b", "gii_b", "wci_b", "hkk", "wck_b", "wik_b",
             "gc_b", "gi_b", "gk", "cost"]
    for name, r, g in zip(names, ref, got):
        r, g = np.asarray(r), np.asarray(g)
        if r.size == 0:
            continue
        scale = np.abs(r).max() + 1e-12
        assert np.abs(r - g).max() / scale < 1e-6, name


@pytest.mark.parametrize("loss,semantics", [
    ("huber", "observation"), ("cauchy", "observation"),
    ("huber", "component"), ("cauchy", "component")])
def test_pallas_template_grams_robust_match_xla(monkeypatch, loss, semantics):
    import jax.numpy as jnp

    pg = _interp_shim(monkeypatch)
    from pycamset_tpu.optim.blocks import (
        Extrinsic3D, Projection, TemplatePoints)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import (
        build_block_arrays, chain_widths, make_block_grams,
        split_full_params)
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    # large noise so the robust weights differ meaningfully from 1
    rig = make_synthetic_rig(n_cams=3, n_ims=5, grid=4, visibility=0.8,
                             noise_px=3.0, seed=4)
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
    full = np.concatenate([rig["intr"].ravel(), rig["extr"].ravel(),
                           rig["poses"].ravel()])
    pieces = split_full_params(jnp.asarray(full), op_fun, struct,
                               n_cams, n_ims, n_keys, widths)
    blk_cam = np.repeat(np.arange(n_cams), n_ims)
    blk_im = np.tile(np.arange(n_ims), n_cams)
    bb = n_cams * n_ims
    cmask = jnp.ones((bb, 15)).at[:, 3].set(0.0)
    imask = jnp.ones((bb, 6)).at[:, 5].set(0.0)
    args = (jnp.zeros((k_pad, 0)), jnp.asarray(tpl_pad), uv, mask,
            cmask, imask, jnp.ones((k_pad, 0)))

    ref = make_block_grams(op_fun, widths, loss=loss, f_scale=2.0,
                           loss_semantics=semantics)(
        pieces.cam[blk_cam], pieces.im[blk_im], *args)
    got = pg.make_pallas_template_grams(widths, loss=loss, f_scale=2.0,
                                        loss_semantics=semantics)(
        pieces.cam[blk_cam], pieces.im[blk_im], *args)
    names = ["gcc_b", "gii_b", "wci_b", "hkk", "wck_b", "wik_b",
             "gc_b", "gi_b", "gk", "cost"]
    for name, r, g in zip(names, ref, got):
        r, g = np.asarray(r), np.asarray(g)
        if r.size == 0:
            continue
        scale = np.abs(r).max() + 1e-12
        assert np.abs(r - g).max() / scale < 1e-6, name


@pytest.mark.parametrize("model,loss", [("rational", "linear"),
                                        ("rational", "cauchy"),
                                        ("thin_prism", "linear"),
                                        ("thin_prism", "huber"),
                                        ("tilted", "linear"),
                                        ("tilted", "huber"),
                                        ("fisheye", "linear"),
                                        ("fisheye", "huber")])
def test_pallas_extended_template_grams_match_xla(monkeypatch, model, loss):
    """The parametrized kernel serves the RATIONAL (a=18), THIN-PRISM
    (a=22) and TILTED (a=24) models: ratio radial, 1/den numerator columns,
    -radial r2^i/den denominator columns, prism columns + asymmetric dyd_dx,
    and the sensor-tilt homography chain with packed dMt columns."""
    import jax.numpy as jnp

    pg = _interp_shim(monkeypatch)
    from pycamset_tpu.optim.blocks import (
        Extrinsic3D, ProjectionFisheye, ProjectionRational,
        ProjectionThinPrism, ProjectionTilted, TemplatePoints)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import (
        build_block_arrays, chain_widths, make_block_grams,
        split_full_params)
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=5, grid=4, visibility=0.8,
                             noise_px=2.0, seed=6, camera_model=model)
    n_cams, n_ims, n_keys = rig["n_cams"], rig["n_ims"], rig["n_keys"]
    proj = {"rational": ProjectionRational, "thin_prism": ProjectionThinPrism,
            "fisheye": ProjectionFisheye,
            "tilted": ProjectionTilted}[model]()
    op_fun = OptimFunction([proj, Extrinsic3D(), TemplatePoints()])
    widths = chain_widths(op_fun)
    assert widths.a == {"rational": 18, "thin_prism": 22,
                        "tilted": 24, "fisheye": 14}[model]
    struct = op_fun.param_struct(n_cams, n_ims, n_keys)
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys,
                                k_pad_multiple=8)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(jnp.float64)
    tpl_pad = np.zeros((k_pad, 3))
    tpl_pad[:n_keys] = rig["template"]
    full = np.concatenate([rig["intr"].ravel(), rig["extr"].ravel(),
                           rig["poses"].ravel()])
    pieces = split_full_params(jnp.asarray(full), op_fun, struct,
                               n_cams, n_ims, n_keys, widths)
    blk_cam = np.repeat(np.arange(n_cams), n_ims)
    blk_im = np.tile(np.arange(n_ims), n_cams)
    bb = n_cams * n_ims
    cmask = jnp.ones((bb, widths.a)).at[:, 3].set(0.0)
    imask = jnp.ones((bb, 6)).at[:, 5].set(0.0)
    args = (jnp.zeros((k_pad, 0)), jnp.asarray(tpl_pad), uv, mask,
            cmask, imask, jnp.ones((k_pad, 0)))

    ref = make_block_grams(op_fun, widths, loss=loss, f_scale=2.0)(
        pieces.cam[blk_cam], pieces.im[blk_im], *args)
    got = pg.make_pallas_template_grams(widths, loss=loss, f_scale=2.0)(
        pieces.cam[blk_cam], pieces.im[blk_im], *args)
    names = ["gcc_b", "gii_b", "wci_b", "hkk", "wck_b", "wik_b",
             "gc_b", "gi_b", "gk", "cost"]
    for name, r, g in zip(names, ref, got):
        r, g = np.asarray(r), np.asarray(g)
        if r.size == 0:
            continue
        scale = np.abs(r).max() + 1e-12
        assert np.abs(r - g).max() / scale < 1e-6, name


@pytest.mark.parametrize("loss,semantics", [
    ("huber", "observation"), ("soft_l1", "observation"),
    ("huber", "component")])
def test_pallas_selfcal_grams_robust_match_xla(monkeypatch, loss, semantics):
    import jax.numpy as jnp

    pg = _interp_shim(monkeypatch)
    from pycamset_tpu.optim.blocks import (
        Extrinsic3D, FreePoint, Projection, RigidTform3d)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import (
        build_block_arrays, chain_widths, make_block_grams,
        split_full_params)
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=5, grid=4, visibility=0.8,
                             noise_px=3.0, seed=5)
    n_cams, n_ims, n_keys = rig["n_cams"], rig["n_ims"], rig["n_keys"]
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
    keyp = jnp.zeros((k_pad, 3)).at[:n_keys].set(pieces.key)
    blk_cam = np.repeat(np.arange(n_cams), n_ims)
    blk_im = np.tile(np.arange(n_ims), n_cams)
    bb = n_cams * n_ims
    cmask = jnp.ones((bb, 15)).at[:, 2].set(0.0)
    imask = jnp.ones((bb, 6)).at[:, 4].set(0.0)
    kmask = jnp.ones((k_pad, 3)).at[n_keys:].set(0.0).at[0].set(0.0)
    args = (keyp, jnp.zeros((k_pad, 3)), uv, mask, cmask, imask, kmask)

    ref = make_block_grams(op_fun, widths, loss=loss, f_scale=1.5,
                           loss_semantics=semantics)(
        pieces.cam[blk_cam], pieces.im[blk_im], *args)
    got = pg.make_pallas_selfcal_grams(widths, loss=loss, f_scale=1.5,
                                       loss_semantics=semantics)(
        pieces.cam[blk_cam], pieces.im[blk_im], *args)
    names = ["gcc_b", "gii_b", "wci_b", "hkk", "wck_b", "wik_b",
             "gc_b", "gi_b", "gk", "cost"]
    for name, r, g in zip(names, ref, got):
        r, g = np.asarray(r), np.asarray(g)
        scale = np.abs(r).max() + 1e-12
        assert np.abs(r - g).max() / scale < 1e-6, name


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def _mixed_chain_fixture(with_key_cols, model="standard"):
    """A small multi-target problem on the (B, K) grid, with the c-axis
    keyp/kmask laid out exactly as make_[mixed_]structured_neq builds them."""
    import jax.numpy as jnp
    from pycamset_tpu.optim.blocks import (
        Extrinsic3D, FreePoint, GroupRigidTform3d, ParamSpec, Projection,
        ProjectionFisheye, RigidTform3d, TemplatePoints, key_type)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import (
        GroupWidths, build_block_arrays)
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    class GroupTemplatePoints(TemplatePoints):
        params = ParamSpec(key_type.PER_GROUP, 6)

    n_cams, n_ims, n_groups = 3, 5, 2
    rig = make_synthetic_rig(n_cams=n_cams, n_ims=n_ims, grid=4,
                             visibility=0.85, noise_px=0.4, seed=5,
                             camera_model=model)
    n_keys = rig["n_keys"]
    proj = {"standard": Projection, "fisheye": ProjectionFisheye}[model]
    if with_key_cols:
        op_fun = OptimFunction([proj(), Extrinsic3D(), RigidTform3d(),
                                GroupRigidTform3d(), FreePoint()])
        cw = 9
    else:
        op_fun = OptimFunction([proj(), Extrinsic3D(), RigidTform3d(),
                                GroupTemplatePoints()])
        cw = 6
    widths = GroupWidths(rig["intr"].shape[1] + 6, 6, cw)
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys,
                                k_pad_multiple=8)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(jnp.float64)

    gok = (np.arange(k_pad) >= n_keys // 2).astype(np.int64)
    gok[n_keys:] = 0
    grp = np.array([[0.0] * 6,
                    [0.04, -0.02, 0.06, 0.01, -0.02, 0.03]])
    grp_per_key = jnp.asarray(grp)[gok]
    gmask_per_key = jnp.asarray(
        np.ones((n_groups, 6)), dtype=jnp.float64)[gok]

    cam_rows = np.concatenate([rig["intr"], rig["extr"]], axis=1)
    blk_cam = np.repeat(np.arange(n_cams), n_ims)
    blk_im = np.tile(np.arange(n_ims), n_cams)
    cam_b = jnp.asarray(cam_rows)[blk_cam]
    im_b = jnp.asarray(rig["poses"])[blk_im]
    bb = n_cams * n_ims
    cmask = jnp.ones((bb, widths.a)).at[:, 2].set(0.0)
    imask = jnp.ones((bb, 6)).at[:, 4].set(0.0)

    tpl_pad = np.zeros((k_pad, 3))
    tpl_pad[:n_keys] = rig["template"]
    tpl_pad[n_keys:] = rig["template"][0]
    if with_key_cols:
        keyp = jnp.concatenate([grp_per_key,
                                jnp.asarray(tpl_pad)], axis=1)
        kmask = jnp.concatenate(
            [gmask_per_key,
             jnp.ones((k_pad, 3)).at[n_keys:].set(0.0).at[1, 2].set(0.0)],
            axis=1)
        tpl = jnp.zeros((k_pad, 3))
    else:
        keyp = grp_per_key
        kmask = gmask_per_key.at[n_keys:].set(0.0)
        tpl = jnp.asarray(tpl_pad)
    return (op_fun, widths, cam_b, im_b, keyp, tpl, uv, mask, cmask,
            imask, kmask)


@pytest.mark.parametrize("with_key_cols,loss,model", [
    (True, "linear", "standard"), (True, "huber", "standard"),
    (False, "linear", "standard"), (True, "linear", "fisheye"),
    (False, "linear", "fisheye")])
def test_pallas_mixed_grouped_grams_match_xla(monkeypatch, with_key_cols,
                                              loss, model):
    from pycamset_tpu.optim.structured import make_block_grams

    pg = _interp_shim(monkeypatch)
    (op_fun, widths, cam_b, im_b, keyp, tpl, uv, mask, cmask, imask,
     kmask) = _mixed_chain_fixture(with_key_cols, model=model)

    ref = make_block_grams(op_fun, widths, loss=loss, f_scale=2.0)(
        cam_b, im_b, keyp, tpl, uv, mask, cmask, imask, kmask)
    make = (pg.make_pallas_mixed_grams if with_key_cols
            else pg.make_pallas_grouped_grams)
    got = make(widths, loss=loss, f_scale=2.0)(
        cam_b, im_b, keyp, tpl, uv, mask, cmask, imask, kmask)

    names = ["gcc_b", "gii_b", "wci_b", "hkk", "wck_b", "wik_b",
             "gc_b", "gi_b", "gk", "cost"]
    for name, r, g in zip(names, ref, got):
        r, g = np.asarray(r), np.asarray(g)
        assert r.shape == g.shape, (name, r.shape, g.shape)
        scale = np.abs(r).max() + 1e-12
        assert np.abs(r - g).max() / scale < 1e-6, name


@pytest.mark.parametrize("model,loss,semantics,tile,n_ims", [
    ("standard", "linear", "component", None, 5),    # pad path (5 -> 16)
    ("standard", "huber", "component", None, 5),     # robust, in-kernel rho
    ("standard", "cauchy", "observation", None, 5),
    ("fisheye", "linear", "component", None, 5),     # a=14 polynomial arctan
    ("standard", "linear", "component", 4, 8),       # spc=2: hcc accumulates
])                                                   #   across grid steps
def test_pallas_template_grams_fused_match_reduced_xla(
        monkeypatch, model, loss, semantics, tile, n_ims):
    """Fused-reduction template kernel vs the XLA gram path + host-side
    reductions (the exact contract make_structured_neq::neq_fused relies
    on): in-kernel column masks, in-kernel cam-axis accumulation of
    (hcc, gc), per-block (wci, gii, gi, cost) pieces."""
    import jax.numpy as jnp

    pg = _interp_shim(monkeypatch)
    if tile is not None:
        monkeypatch.setattr(pg, "BLOCK_TILE", tile)
    from pycamset_tpu.optim.blocks import (
        Extrinsic3D, Projection, ProjectionFisheye, TemplatePoints)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import (
        build_block_arrays, chain_widths, make_block_grams,
        split_full_params)
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    proj = {"standard": Projection, "fisheye": ProjectionFisheye}[model]
    rig = make_synthetic_rig(n_cams=3, n_ims=n_ims, grid=4, visibility=0.8,
                             noise_px=2.0, seed=3, camera_model=model)
    n_cams, n_keys = rig["n_cams"], rig["n_keys"]
    op_fun = OptimFunction([proj(), Extrinsic3D(), TemplatePoints()])
    widths = chain_widths(op_fun)
    a = widths.a
    struct = op_fun.param_struct(n_cams, n_ims, n_keys)
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys,
                                k_pad_multiple=8)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(jnp.float64)
    tpl_pad = np.zeros((k_pad, 3))
    tpl_pad[:n_keys] = rig["template"]
    full = np.concatenate([rig["intr"].ravel(), rig["extr"].ravel(),
                           rig["poses"].ravel()])
    pieces = split_full_params(jnp.asarray(full), op_fun, struct,
                               n_cams, n_ims, n_keys, widths)
    blk_cam = np.repeat(np.arange(n_cams), n_ims)
    blk_im = np.tile(np.arange(n_ims), n_cams)
    cam_b = pieces.cam[blk_cam]
    im_b = pieces.im[blk_im]
    bb = n_cams * n_ims
    cmask = jnp.ones((bb, a)).at[:, 3].set(0.0)
    imask = jnp.ones((bb, 6)).at[:, 5].set(0.0)
    tpl = jnp.asarray(tpl_pad)

    (gcc_b, gii_b, wci_b, _, _, _, gc_b, gi_b, _, cost_ref
     ) = make_block_grams(op_fun, widths, loss=loss, f_scale=2.0,
                          loss_semantics=semantics)(
        cam_b, im_b, jnp.zeros((k_pad, 0)), tpl, uv, mask,
        cmask, imask, jnp.ones((k_pad, 0)))
    hcc_ref = gcc_b.reshape(n_cams, n_ims, a, a).sum(axis=1)
    hii_ref = gii_b.reshape(n_cams, n_ims, 6, 6).sum(axis=0)
    wci_ref = wci_b.reshape(n_cams, n_ims, a, 6)
    gc_ref = gc_b.reshape(n_cams, n_ims, a).sum(axis=1)
    gi_ref = gi_b.reshape(n_cams, n_ims, 6).sum(axis=0)

    hcc, hii, wci, gc, gi, cost = pg.make_pallas_template_grams_fused(
        widths, n_cams, n_ims, loss=loss, f_scale=2.0,
        loss_semantics=semantics)(
        cam_b, im_b, tpl, uv, mask, cmask, imask)

    for name, r, g in [("hcc", hcc_ref, hcc), ("hii", hii_ref, hii),
                       ("wci", wci_ref, wci), ("gc", gc_ref, gc),
                       ("gi", gi_ref, gi), ("cost", cost_ref, cost)]:
        r, g = np.asarray(r), np.asarray(g)
        assert r.shape == g.shape, (name, r.shape, g.shape)
        scale = np.abs(r).max() + 1e-12
        assert np.abs(r - g).max() / scale < 1e-6, name


@pytest.mark.parametrize("model,loss,semantics,tile,n_ims", [
    ("standard", "linear", "component", None, 5),    # pad path (5 -> 8|16)
    ("standard", "huber", "component", None, 5),     # robust, in-kernel rho
    ("fisheye", "linear", "component", None, 5),     # a=14 polynomial arctan
    ("standard", "linear", "component", 4, 8),       # spc=2: accumulators
])                                                   #   cross grid steps
def test_pallas_selfcal_grams_fused_match_reduced_xla(
        monkeypatch, model, loss, semantics, tile, n_ims):
    """Fused-reduction self-cal kernel vs the XLA gram path + host-side
    reductions (the contract make_structured_neq::neq_fused_sc relies on):
    in-kernel column/key masks, in-kernel cam-axis accumulation of
    (hcc, gc, wck), per-block (wik, wci, gii, gi, cost) pieces, resident
    (hkk, gk) accumulator."""
    import jax.numpy as jnp

    pg = _interp_shim(monkeypatch)
    if tile is None:
        tile = pg.BLOCK_TILE
    from pycamset_tpu.optim.blocks import (
        Extrinsic3D, FreePoint, Projection, ProjectionFisheye, RigidTform3d)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import (
        build_block_arrays, chain_widths, make_block_grams,
        split_full_params)
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    proj = {"standard": Projection, "fisheye": ProjectionFisheye}[model]
    rig = make_synthetic_rig(n_cams=3, n_ims=n_ims, grid=4, visibility=0.8,
                             noise_px=0.5, seed=2, camera_model=model)
    n_cams, n_keys = rig["n_cams"], rig["n_keys"]
    op_fun = OptimFunction(
        [proj(), Extrinsic3D(), RigidTform3d(), FreePoint()])
    widths = chain_widths(op_fun)
    a, c = widths.a, widths.c
    struct = op_fun.param_struct(n_cams, n_ims, n_keys)
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys,
                                k_pad_multiple=8)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(jnp.float64)
    full = np.concatenate([rig["intr"].ravel(), rig["extr"].ravel(),
                           rig["poses"].ravel(), rig["template"].ravel()])
    pieces = split_full_params(jnp.asarray(full), op_fun, struct,
                               n_cams, n_ims, n_keys, widths)
    keyp = jnp.zeros((k_pad, 3)).at[:n_keys].set(pieces.key)
    blk_cam = np.repeat(np.arange(n_cams), n_ims)
    blk_im = np.tile(np.arange(n_ims), n_cams)
    bb = n_cams * n_ims
    cmask = jnp.ones((bb, a)).at[:, 2].set(0.0)
    imask = jnp.ones((bb, 6)).at[:, 4].set(0.0)
    kmask = (jnp.ones((k_pad, 3)).at[n_keys:].set(0.0)
             .at[0].set(0.0).at[2, 1].set(0.0))
    cam_b, im_b = pieces.cam[blk_cam], pieces.im[blk_im]

    (gcc_b, gii_b, wci_b, hkk_ref, wck_b, wik_b, gc_b, gi_b, gk_ref,
     cost_ref) = make_block_grams(op_fun, widths, loss=loss, f_scale=1.5,
                                  loss_semantics=semantics)(
        cam_b, im_b, keyp, jnp.zeros((k_pad, 3)), uv, mask,
        cmask, imask, kmask)
    hcc_ref = gcc_b.reshape(n_cams, n_ims, a, a).sum(axis=1)
    hii_ref = gii_b.reshape(n_cams, n_ims, 6, 6).sum(axis=0)
    wci_ref = wci_b.reshape(n_cams, n_ims, a, 6)
    wck_ref = wck_b.reshape(n_cams, n_ims, k_pad, a, c).sum(axis=1)
    wik_ref = wik_b.reshape(n_cams, n_ims, k_pad, 6, c).sum(axis=0)
    gc_ref = gc_b.reshape(n_cams, n_ims, a).sum(axis=1)
    gi_ref = gi_b.reshape(n_cams, n_ims, 6).sum(axis=0)

    (hcc, hii, hkk, wci, wck, wik, gc, gi, gk,
     cost) = pg.make_pallas_selfcal_grams_fused(
        widths, n_cams, n_ims, loss=loss, f_scale=1.5,
        loss_semantics=semantics, tile=tile)(
        cam_b, im_b, keyp, uv, mask, cmask, imask, kmask)

    for name, r, g in [("hcc", hcc_ref, hcc), ("hii", hii_ref, hii),
                       ("hkk", hkk_ref, hkk), ("wci", wci_ref, wci),
                       ("wck", wck_ref, wck), ("wik", wik_ref, wik),
                       ("gc", gc_ref, gc), ("gi", gi_ref, gi),
                       ("gk", gk_ref, gk), ("cost", cost_ref, cost)]:
        r, g = np.asarray(r), np.asarray(g)
        assert r.shape == g.shape, (name, r.shape, g.shape)
        scale = np.abs(r).max() + 1e-12
        assert np.abs(r - g).max() / scale < 1e-6, name


@pytest.mark.parametrize("with_key_cols,loss,model,tile,n_ims", [
    (True, "linear", "standard", 4, 5),    # pad path (5 -> 8), spc=2
    (True, "huber", "standard", 4, 5),     # robust, in-kernel rho
    (True, "linear", "fisheye", 4, 5),     # a=14 polynomial arctan
    (False, "linear", "standard", 4, 5),   # grouped chain (cw=6)
    (True, "linear", "standard", 5, 5),    # no-pad path, spc=1
])
def test_pallas_mixed_grams_fused_match_reduced_xla(
        monkeypatch, with_key_cols, loss, model, tile, n_ims):
    """Fused-reduction mixed/grouped kernel vs the XLA gram path +
    host-side reductions (the contract structured_mixed's fused neq path
    relies on): in-kernel cam-axis accumulation of (hcc, gc, wck), the
    per-block (wik, wci, gii, gi, cost) pieces, resident (hkk, gk)."""
    from pycamset_tpu.optim.structured import make_block_grams

    pg = _interp_shim(monkeypatch)
    (op_fun, widths, cam_b, im_b, keyp, tpl, uv, mask, cmask, imask,
     kmask) = _mixed_chain_fixture(with_key_cols, model=model)
    n_cams = cam_b.shape[0] // n_ims
    a, c = widths.a, widths.c
    k_pad = mask.shape[1]

    (gcc_b, gii_b, wci_b, hkk_ref, wck_b, wik_b, gc_b, gi_b, gk_ref,
     cost_ref) = make_block_grams(op_fun, widths, loss=loss, f_scale=2.0)(
        cam_b, im_b, keyp, tpl, uv, mask, cmask, imask, kmask)
    hcc_ref = gcc_b.reshape(n_cams, n_ims, a, a).sum(axis=1)
    hii_ref = gii_b.reshape(n_cams, n_ims, 6, 6).sum(axis=0)
    wci_ref = wci_b.reshape(n_cams, n_ims, a, 6)
    wck_ref = wck_b.reshape(n_cams, n_ims, k_pad, a, c).sum(axis=1)
    wik_ref = wik_b.reshape(n_cams, n_ims, k_pad, 6, c).sum(axis=0)
    gc_ref = gc_b.reshape(n_cams, n_ims, a).sum(axis=1)
    gi_ref = gi_b.reshape(n_cams, n_ims, 6).sum(axis=0)

    (hcc, hii, hkk, wci, wck, wik, gc, gi, gk,
     cost) = pg.make_pallas_mixed_grams_fused(
        widths, n_cams, n_ims, loss=loss, f_scale=2.0,
        with_key_cols=with_key_cols, tile=tile)(
        cam_b, im_b, keyp, tpl, uv, mask, cmask, imask, kmask)

    for name, r, g in [("hcc", hcc_ref, hcc), ("hii", hii_ref, hii),
                       ("hkk", hkk_ref, hkk), ("wci", wci_ref, wci),
                       ("wck", wck_ref, wck), ("wik", wik_ref, wik),
                       ("gc", gc_ref, gc), ("gi", gi_ref, gi),
                       ("gk", gk_ref, gk), ("cost", cost_ref, cost)]:
        r, g = np.asarray(r), np.asarray(g)
        assert r.shape == g.shape, (name, r.shape, g.shape)
        scale = np.abs(r).max() + 1e-12
        assert np.abs(r - g).max() / scale < 1e-6, name


def test_pallas_freepoint_grams_fused_match_reduced_xla(monkeypatch):
    """Fused freepoint delegation (identity poses, masked pose columns)
    vs the XLA gram path + host reductions — the NormalEq pieces the
    structured.py neq_fused_fp path consumes."""
    import jax.numpy as jnp

    pg = _interp_shim(monkeypatch)
    from pycamset_tpu.optim.blocks import Extrinsic3D, FreePoint, Projection
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import (
        build_block_arrays, chain_widths, make_block_grams,
        split_full_params)
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    n_ims = 5
    rig = make_synthetic_rig(n_cams=3, n_ims=n_ims, grid=4, visibility=0.9,
                             noise_px=0.3, seed=11)
    n_cams, n_keys = rig["n_cams"], rig["n_keys"]
    op_fun = OptimFunction([Projection(), Extrinsic3D(), FreePoint()])
    widths = chain_widths(op_fun)
    a, c = widths.a, widths.c
    assert (widths.b, c) == (0, 3)
    struct = op_fun.param_struct(n_cams, n_ims, n_keys)
    blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys,
                                k_pad_multiple=8)
    k_pad = blocks.uv.shape[1]
    uv, mask = blocks.as_device(jnp.float64)
    full = np.concatenate([rig["intr"].ravel(), rig["extr"].ravel(),
                           rig["template"].ravel()])
    pieces = split_full_params(jnp.asarray(full), op_fun, struct,
                               n_cams, n_ims, n_keys, widths)
    keyp = jnp.zeros((k_pad, 3)).at[:n_keys].set(pieces.key)
    blk_cam = np.repeat(np.arange(n_cams), n_ims)
    bb = n_cams * n_ims
    cam_b = pieces.cam[blk_cam]
    im_b = jnp.zeros((bb, 0))
    cmask = jnp.ones((bb, a)).at[:, 1].set(0.0)
    imask = jnp.ones((bb, 0))
    kmask = jnp.ones((k_pad, 3)).at[n_keys:].set(0.0).at[0].set(0.0)

    (gcc_b, _, _, hkk_ref, wck_b, _, gc_b, _, gk_ref,
     cost_ref) = make_block_grams(op_fun, widths)(
        cam_b, im_b, keyp, jnp.zeros((k_pad, 3)), uv, mask,
        cmask, imask, kmask)
    hcc_ref = gcc_b.reshape(n_cams, n_ims, a, a).sum(axis=1)
    wck_ref = wck_b.reshape(n_cams, n_ims, k_pad, a, c).sum(axis=1)
    gc_ref = gc_b.reshape(n_cams, n_ims, a).sum(axis=1)

    hcc, hkk, wck, gc, gk, cost = pg.make_pallas_freepoint_grams_fused(
        widths, n_cams, n_ims, tile=4)(
        cam_b, None, keyp, uv, mask, cmask, None, kmask)

    for name, r, g in [("hcc", hcc_ref, hcc), ("hkk", hkk_ref, hkk),
                       ("wck", wck_ref, wck), ("gc", gc_ref, gc),
                       ("gk", gk_ref, gk), ("cost", cost_ref, cost)]:
        r, g = np.asarray(r), np.asarray(g)
        assert r.shape == g.shape, (name, r.shape, g.shape)
        scale = np.abs(r).max() + 1e-12
        assert np.abs(r - g).max() / scale < 1e-6, name


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fused_template_selfcal_random_mask_fuzz(monkeypatch, seed):
    """Random 0/1 column masks (cam / pose / key), random visibility:
    fused template AND self-cal kernels match the XLA path + reductions.
    Guards the in-kernel mask folding against patterns the fixed-mask
    parity tests don't cover."""
    import jax.numpy as jnp

    pg = _interp_shim(monkeypatch)
    from pycamset_tpu.optim.blocks import (
        Extrinsic3D, FreePoint, Projection, RigidTform3d, TemplatePoints)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import (
        build_block_arrays, chain_widths, make_block_grams,
        split_full_params)
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rng = np.random.default_rng(100 + seed)
    n_ims = int(rng.integers(3, 7))
    rig = make_synthetic_rig(n_cams=3, n_ims=n_ims, grid=4,
                             visibility=float(rng.uniform(0.5, 1.0)),
                             noise_px=0.5, seed=seed)
    n_cams, n_keys = rig["n_cams"], rig["n_keys"]

    for chain in ("template", "selfcal"):
        blocks_list = [Projection(), Extrinsic3D()]
        blocks_list += ([RigidTform3d(), FreePoint()] if chain == "selfcal"
                        else [TemplatePoints()])
        op_fun = OptimFunction(blocks_list)
        widths = chain_widths(op_fun)
        a, c = widths.a, widths.c
        struct = op_fun.param_struct(n_cams, n_ims, n_keys)
        blocks = build_block_arrays(rig["dd"], n_cams, n_ims, n_keys,
                                    k_pad_multiple=8)
        k_pad = blocks.uv.shape[1]
        uv, mask = blocks.as_device(jnp.float64)
        parts = [rig["intr"].ravel(), rig["extr"].ravel(),
                 rig["poses"].ravel()]
        if chain == "selfcal":
            parts.append(rig["template"].ravel())
        full = np.concatenate(parts)
        pieces = split_full_params(jnp.asarray(full), op_fun, struct,
                                   n_cams, n_ims, n_keys, widths)
        bb = n_cams * n_ims
        blk_cam = np.repeat(np.arange(n_cams), n_ims)
        blk_im = np.tile(np.arange(n_ims), n_cams)
        cam_b, im_b = pieces.cam[blk_cam], pieces.im[blk_im]
        # random masks, constant per cam/im row (the production shape)
        cm = jnp.asarray((rng.random((n_cams, a)) > 0.3).astype(float))[
            blk_cam]
        im_m = jnp.asarray((rng.random((n_ims, 6)) > 0.3).astype(float))[
            blk_im]
        if chain == "selfcal":
            keyp = jnp.zeros((k_pad, 3)).at[:n_keys].set(pieces.key)
            kmask = jnp.asarray(
                (rng.random((k_pad, 3)) > 0.3).astype(float)
            ).at[n_keys:].set(0.0)
            args = (keyp, jnp.zeros((k_pad, 3)), uv, mask, cm, im_m, kmask)
            ref = make_block_grams(op_fun, widths)(cam_b, im_b, *args)
            got = pg.make_pallas_selfcal_grams_fused(
                widths, n_cams, n_ims, tile=4)(
                cam_b, im_b, keyp, uv, mask, cm, im_m, kmask)
            (gcc_b, gii_b, wci_b, hkk_r, wck_b, wik_b, gc_b, gi_b, gk_r,
             cost_r) = ref
            refs = [gcc_b.reshape(n_cams, n_ims, a, a).sum(axis=1),
                    gii_b.reshape(n_cams, n_ims, 6, 6).sum(axis=0),
                    hkk_r,
                    wci_b.reshape(n_cams, n_ims, a, 6),
                    wck_b.reshape(n_cams, n_ims, k_pad, a, c).sum(axis=1),
                    wik_b.reshape(n_cams, n_ims, k_pad, 6, c).sum(axis=0),
                    gc_b.reshape(n_cams, n_ims, a).sum(axis=1),
                    gi_b.reshape(n_cams, n_ims, 6).sum(axis=0),
                    gk_r, cost_r]
        else:
            keyp = jnp.zeros((k_pad, 0))
            tpl_pad = np.zeros((k_pad, 3))
            tpl_pad[:n_keys] = rig["template"]
            tpl = jnp.asarray(tpl_pad)
            kmask = jnp.ones((k_pad, 0))
            ref = make_block_grams(op_fun, widths)(
                cam_b, im_b, keyp, tpl, uv, mask, cm, im_m, kmask)
            hcc, hii, wci, gc, gi, cost = pg.make_pallas_template_grams_fused(
                widths, n_cams, n_ims, tile=4)(
                cam_b, im_b, tpl, uv, mask, cm, im_m)
            got = (hcc, hii, wci, gc, gi, cost)
            (gcc_b, gii_b, wci_b, _, _, _, gc_b, gi_b, _, cost_r) = ref
            refs = [gcc_b.reshape(n_cams, n_ims, a, a).sum(axis=1),
                    gii_b.reshape(n_cams, n_ims, 6, 6).sum(axis=0),
                    wci_b.reshape(n_cams, n_ims, a, 6),
                    gc_b.reshape(n_cams, n_ims, a).sum(axis=1),
                    gi_b.reshape(n_cams, n_ims, 6).sum(axis=0), cost_r]
        for i, (r, g) in enumerate(zip(refs, got)):
            r, g = np.asarray(r), np.asarray(g)
            assert r.shape == g.shape, (chain, i, r.shape, g.shape)
            scale = np.abs(r).max() + 1e-12
            assert np.abs(r - g).max() / scale < 1e-6, (chain, i)
