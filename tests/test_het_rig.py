"""Heterogeneous-model rigs: fisheye + Brown cameras in ONE bundle
adjustment (the capability the reference's single-family block system
cannot express — pyCamSet/optimisation/function_block_implementations.py
hard-codes one projection per rig).

Design under test: the selector-extended ProjectionHet chain — per-camera
intr rows [sel | fx px fy py | dist slots] with the family selector and a
fisheye camera's pad slots permanently fixed through the intr_colmask."""
from __future__ import annotations

import numpy as np
import pytest


def _make_het_handler(models=("fisheye", "standard", "fisheye", "standard"),
                      noise=0.1, seed=11, n_ims=12, grid=7,
                      handler_cls=None, options=None,
                      pose_scale=(0.4, 0.15), tangential_px=5e-4):
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import (
        FreePointTarget, TemplateBundleHandler)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    models = list(models)
    rig = make_synthetic_rig(n_cams=len(models), n_ims=n_ims, grid=grid,
                             visibility=0.95, noise_px=noise, seed=seed,
                             camera_model=models, pose_scale=pose_scale,
                             tangential_px=tangential_px)
    names = [f"cam{c}" for c in range(len(models))]
    k_mats, exts, dists = [], [], []
    for c, m in enumerate(models):
        row = rig["intr"][c]
        k_mats.append(np.array([[row[0], 0, row[1]], [0, row[2], row[3]],
                                [0, 0, 1]]))
        # 4-wide = the fisheye marker; Brown keeps its family width
        w = {"fisheye": 4, "standard": 5, "rational": 8,
             "thin_prism": 12, "tilted": 14}[m]
        dists.append(row[4:4 + w])
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        names, exts, k_mats, dists, [[1600, 1200]] * len(models)))
    cls = handler_cls or TemplateBundleHandler
    opts = {"outliers": "n", "camera_model": dict(zip(names, models))}
    opts.update(options or {})
    handler = cls(
        cams, FreePointTarget(rig["template"].reshape(1, -1, 3)),
        TargetDetection(cam_names=names, data=rig["dd"]), options=opts)
    return handler, rig, names


def test_het_block_matches_both_families():
    """ProjectionHet(sel=0) == Projection; ProjectionHet(sel=1) ==
    ProjectionFisheye, on the same underlying coefficients."""
    import jax.numpy as jnp
    from pycamset_tpu.optim.blocks import (Projection, ProjectionFisheye,
                                           ProjectionHet)

    rng = np.random.default_rng(0)
    blk = ProjectionHet("standard")
    assert blk.params.n == 10
    pts = rng.normal(size=(20, 3)) * [0.3, 0.3, 0.1] + [0, 0, 1.0]
    intr9 = np.array([800.0, 640, 810, 480, -0.2, 0.05, 1e-3, -2e-3, 0.01])
    intr8 = np.array([600.0, 640, 610, 480, -0.05, 0.01, -2e-3, 4e-4])
    for pt in pts:
        got_b = np.array(blk.compute(
            jnp.asarray(np.concatenate([[0.0], intr9])), jnp.asarray(pt)))
        want_b = np.array(Projection().compute(jnp.asarray(intr9),
                                               jnp.asarray(pt)))
        np.testing.assert_allclose(got_b, want_b, atol=1e-12)
        het8 = np.concatenate([[1.0], intr8, [0.0]])  # pad slot
        got_f = np.array(blk.compute(jnp.asarray(het8), jnp.asarray(pt)))
        want_f = np.array(ProjectionFisheye().compute(jnp.asarray(intr8),
                                                      jnp.asarray(pt)))
        np.testing.assert_allclose(got_f, want_f, atol=1e-12)


def test_het_block_self_jacobian():
    from pycamset_tpu.optim.blocks import ProjectionHet
    assert ProjectionHet("standard").test_self()
    assert ProjectionHet("rational").test_self()


def test_het_handler_layout():
    from pycamset_tpu.optim.blocks import ProjectionHet
    handler, rig, names = _make_het_handler()
    prim = handler.bundlePrimitive
    assert handler.is_het and handler.camera_model == "het"
    assert prim.intr.shape == (4, 10)
    assert isinstance(handler.op_fun.blocks[0], ProjectionHet)
    # selectors: fixed, correct values
    np.testing.assert_array_equal(prim.intr[:, 0], [1.0, 0.0, 1.0, 0.0])
    assert not prim.intr_colmask[:, 0].any()
    # fisheye pad slot (col 9) fixed; brown full row free
    assert not prim.intr_colmask[0, 9] and prim.intr_colmask[1, 9]
    # free parameter count: fisheye 8 live intr cols, brown 9
    x0 = handler.get_initial_params()
    n_free_intr = 2 * 8 + 2 * 9
    assert x0.size == n_free_intr + 4 * 6 + (rig["n_ims"] - 1) * 6


def test_het_seed_residual_at_truth():
    """The packed het seed (ground-truth cameras) reprojects at the noise
    floor — validates packing, selector wiring and the residual chain."""
    from pycamset_tpu.optim.structured_driver import (
        build_structured_problem)
    from pycamset_tpu.config import default_device_dtype

    handler, rig, _ = _make_het_handler(noise=0.05, seed=4)
    _solve_fn, residual_fn, x0 = build_structured_problem(
        handler, default_device_dtype())
    r = residual_fn(x0)
    rms = np.sqrt(np.mean(r ** 2))
    assert rms < 3 * 0.05, rms


def test_het_bundle_adjustment_recovers_models():
    import jax.numpy as jnp
    from pycamset_tpu.ops.distortion import distort_normalized
    from pycamset_tpu.optim.driver import run_bundle_adjustment

    handler, rig, names = _make_het_handler(noise=0.1, seed=11)
    res, cams = run_bundle_adjustment(handler, backend="structured")
    rms = np.sqrt(np.mean(res["fun"] ** 2))
    assert rms < 2.0 * rig["noise_px"], rms

    dd = rig["dd"]
    for c, name in enumerate(names):
        true_i = rig["intr"][c]
        got_d = np.reshape(cams[name].distortion_coefs, -1)
        # family-correct widths survive extraction (4 = fisheye marker)
        want_w = 4 if rig["camera_models"][c] == "fisheye" else 5
        assert got_d.size == want_w, (name, got_d.size)
        true_d = true_i[4:4 + want_w]
        # distortion FUNCTION parity over each camera's observed field
        grid = np.stack([(dd[dd[:, 0] == c, 3] - true_i[1]) / true_i[0],
                         (dd[dd[:, 0] == c, 4] - true_i[3]) / true_i[2]],
                        axis=-1)
        err_n = np.array(distort_normalized(jnp.asarray(grid),
                                            jnp.asarray(got_d))) \
            - np.array(distort_normalized(jnp.asarray(grid),
                                          jnp.asarray(true_d)))
        assert np.max(np.abs(err_n) * true_i[0]) < 0.5, name


def test_het_backend_parity_structured_vs_generic():
    """The structured Schur backend and the generic backend agree on the
    het chain (same cost at convergence)."""
    from pycamset_tpu.optim.driver import run_bundle_adjustment

    h1, rig, _ = _make_het_handler(noise=0.1, seed=21, n_ims=8, grid=6)
    res1, _ = run_bundle_adjustment(h1, backend="structured")
    h2, _, _ = _make_het_handler(noise=0.1, seed=21, n_ims=8, grid=6)
    res2, _ = run_bundle_adjustment(h2, backend="generic")
    c1 = float(np.sum(np.asarray(res1["fun"]) ** 2))
    c2 = float(np.sum(np.asarray(res2["fun"]) ** 2))
    assert abs(c1 - c2) <= 1e-4 * max(c1, 1.0), (c1, c2)


def test_het_selfcal_runs():
    """The het chain composes with self-calibration (free geometry)."""
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import SelfBundleHandler

    handler, rig, _ = _make_het_handler(
        noise=0.05, seed=31, n_ims=14, grid=6,
        handler_cls=SelfBundleHandler)
    res, cams = run_bundle_adjustment(handler, backend="structured")
    rms = np.sqrt(np.mean(res["fun"] ** 2))
    assert rms < 2.0 * rig["noise_px"], rms


def test_het_camset_persistence_roundtrip(tmp_path):
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.utils.saving import load_CameraSet

    handler, rig, names = _make_het_handler(noise=0.1, seed=11)
    _res, cams = run_bundle_adjustment(handler, backend="structured")
    path = tmp_path / "het.camset"
    cams.save(path)
    back = load_CameraSet(path)
    for c, name in enumerate(names):
        want = np.reshape(cams[name].distortion_coefs, -1)
        got = np.reshape(back[name].distortion_coefs, -1)
        assert got.size == want.size
        np.testing.assert_allclose(got, want, rtol=1e-12)


def test_het_triangulation_round_trip():
    """multi_cam_triangulate on a MIXED camset recovers world points
    (exercises the het [sel|coefs] undistortion encoding)."""
    handler, rig, names = _make_het_handler(noise=0.0, seed=5)
    cams = handler.camset
    dd = rig["dd"]
    # observations of image 0 only: world pts = template (pose 0 = id)
    d0 = dd[dd[:, 1] == 0]
    pts = cams.multi_cam_triangulate(d0)
    # keys seen by >=2 cameras, in sorted key order
    keys, counts = np.unique(d0[:, 2].astype(int), return_counts=True)
    keys = keys[counts >= 2]
    want = rig["template"][keys]
    assert pts.shape == want.shape
    np.testing.assert_allclose(pts, want, atol=1e-6)


def test_auto_per_camera_picks_mixed_families():
    """Per-camera auto selection on a genuinely mixed rig (wide fisheye +
    narrow Brown) picks each camera's true family, and the resulting map
    calibrates heterogeneously."""
    from pycamset_tpu.calibration.model_select import select_camera_model
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import FreePointTarget

    # wide pose spread: field angles on the fisheye cameras must reach
    # ~50+ deg, where Brown can no longer track the equidistant mapping
    # (narrow-angle fisheye data IS Brown-absorbable — test_model_select)
    # strong tangential distortion on the Brown camera: purely-radial
    # Kannala-Brandt cannot absorb it, so the Brown pick is decisive too
    handler, rig, names = _make_het_handler(
        models=("fisheye", "standard", "fisheye"), noise=0.05, seed=7,
        n_ims=14, grid=7, pose_scale=(0.6, 0.45), tangential_px=4e-3)
    det = TargetDetection(cam_names=names, data=rig["dd"])
    target = FreePointTarget(rig["template"].reshape(1, -1, 3))
    picked, scores = select_camera_model(
        det, target, initial_cams=handler.camset,
        candidates=("standard", "fisheye"), per_camera=True,
        problem_options={"outliers": "n"}, seed=2)
    assert isinstance(picked, dict), picked
    assert picked == {"cam0": "fisheye", "cam1": "standard",
                      "cam2": "fisheye"}


def test_het_model_map_validation():
    from pycamset_tpu.optim.handlers import parse_camera_models
    with pytest.raises(ValueError, match="missing cameras"):
        parse_camera_models({"a": "fisheye"}, ["a", "b"])
    with pytest.raises(ValueError, match="Unknown camera_model"):
        parse_camera_models({"a": "fish", "b": "standard"}, ["a", "b"])
    models, het, brown = parse_camera_models(
        ["fisheye", "rational", "standard"], ["a", "b", "c"])
    assert het and brown == "rational"
    # per-camera models survive: the narrower Brown camera keeps its own
    # family (extra columns are pinned by the colmask, not freed)
    assert models == ["fisheye", "rational", "standard"]
    models, het, brown = parse_camera_models(
        ["rational", "standard"], ["a", "b"])
    assert not het and brown == "rational"
    assert models == ["rational", "standard"]


def test_brown_width_mix_keeps_per_camera_parsimony():
    """standard + rational in one rig: the chain runs rational-wide but
    the standard camera's k4..k6 stay pinned at zero, and extraction
    returns family-correct widths (5 and 8)."""
    from pycamset_tpu.optim.driver import run_bundle_adjustment

    handler, rig, names = _make_het_handler(
        models=("rational", "standard", "rational"), noise=0.1, seed=41)
    prim = handler.bundlePrimitive
    assert handler.camera_model == "rational" and not handler.is_het
    assert prim.intr.shape == (3, 12)
    # the standard camera's rational tail is pinned
    assert not prim.intr_colmask[1, 9:].any()
    assert prim.intr_colmask[0, 9:].all()
    res, cams = run_bundle_adjustment(handler, backend="structured")
    rms = np.sqrt(np.mean(res["fun"] ** 2))
    assert rms < 2.0 * rig["noise_px"], rms
    assert np.reshape(cams[names[0]].distortion_coefs, -1).size == 8
    assert np.reshape(cams[names[1]].distortion_coefs, -1).size == 5


def test_het_dress_rehearsal_image_e2e(tmp_path):
    """Full-pipeline dress rehearsal on RENDERED IMAGES: a mixed rig (one
    Kannala-Brandt fisheye + two Brown cameras) renders a ChArUco capture
    through its true lens models, then calibrate_cameras with a
    per-camera model map recovers the generating rig."""
    from pycamset_tpu.calibration.camera_calibrator import calibrate_cameras
    from pycamset_tpu.models.camera import Camera
    from pycamset_tpu.models.camera_set import CameraSet
    from pycamset_tpu.models.charuco import ChArUco
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.render import render_target_views

    res = (800, 600)
    target = ChArUco(10, 10, 25)
    cams = {}
    specs = [
        # (model, f, dist, yaw, x-offset)
        ("fisheye", 420.0, np.array([-0.03, 0.01, -2e-3, 4e-4]), 0.0, 0.0),
        ("standard", 700.0, np.array([-0.12, 0.02, 4e-4, -3e-4, 0.0]),
         -0.25, -0.12),
        ("standard", 730.0, np.array([-0.10, 0.015, -3e-4, 2e-4, 0.0]),
         0.25, 0.12),
    ]
    for i, (model, f, dist, yaw, xoff) in enumerate(specs):
        k = np.array([[f, 0, res[0] / 2 + 2.0],
                      [0, f * 0.995, res[1] / 2 - 3.0], [0, 0, 1.0]])
        ext = make_4x4h_tform(np.array([0.0, yaw, 0.0]),
                              np.array([xoff, 0.0, 0.40]))
        cams[f"cam{i}"] = Camera(extrinsic=ext, intrinsic=k, res=list(res),
                                 distortion_coefs=dist, name=f"cam{i}")
    truth = CameraSet(camera_dict=cams)

    rng = np.random.default_rng(3)
    poses = []
    for _ in range(10):
        rvec = rng.normal(size=3) * 0.25
        tvec = (np.array([-0.115, -0.09, 0.0])
                + rng.normal(size=3) * [0.04, 0.04, 0.05])
        poses.append(np.concatenate([rvec, tvec]))
    render_target_views(truth, target, poses, out_dir=tmp_path)

    model_map = {"cam0": "fisheye", "cam1": "standard", "cam2": "standard"}
    solved = calibrate_cameras(
        f_loc=tmp_path, calibration_target=target, save=False,
        problem_options={"outliers": "n", "camera_model": model_map})
    res_fun = np.asarray(solved.calibration_result).reshape(-1, 2)
    rms = np.sqrt(np.mean(res_fun ** 2))
    assert rms < 0.5, rms  # rendered corners are calibration-grade

    for name, model in model_map.items():
        got, want = solved[name], truth[name]
        # family-correct width survives the pipeline
        assert (np.reshape(got.distortion_coefs, -1).size
                == (4 if model == "fisheye" else 5)), name
        # focal lengths within 0.5%; principal point within 2 px
        np.testing.assert_allclose(
            np.diag(got.intrinsic)[:2], np.diag(want.intrinsic)[:2],
            rtol=5e-3)
        np.testing.assert_allclose(got.intrinsic[:2, 2],
                                   want.intrinsic[:2, 2], atol=2.0)
    # relative pose of cam1 w.r.t. cam0 (the world gauge may differ)
    rel_got = (solved["cam1"].extrinsic
               @ np.linalg.inv(solved["cam0"].extrinsic))
    rel_want = (truth["cam1"].extrinsic
                @ np.linalg.inv(truth["cam0"].extrinsic))
    np.testing.assert_allclose(rel_got[:3, 3], rel_want[:3, 3], atol=2e-3)


def test_het_rig_target_tracking():
    """TargetTracker serves MIXED rigs: per-camera family dispatch via
    the het [sel | fx px fy py | dist] intrinsic packing
    (ops/projection.py::pack_rig_intrinsics)."""
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.tracking import TargetTracker
    from pycamset_tpu.utils.general_utils import make_4x4h_tform

    handler, rig, names = _make_het_handler(
        models=("fisheye", "standard", "fisheye"), noise=0.2, seed=17,
        n_ims=6, grid=6)
    cams = handler.camset  # ground-truth mixed rig
    det = TargetDetection(cam_names=names, data=rig["dd"])
    tracker = TargetTracker(cams, FreePointTarget(
        rig["template"].reshape(1, -1, 3)))
    poses, info = tracker.track_batch(det)
    assert float(np.max(info["rms"])) < 0.5
    for i in range(6):
        want = make_4x4h_tform(rig["poses"][i][:3], rig["poses"][i][3:])
        np.testing.assert_allclose(poses[i], want, atol=6e-3)


def test_het_rig_marker_cloud():
    """The marker-cloud server reconstructs through a MIXED rig."""
    from pycamset_tpu.markers import MarkerTriangulator

    handler, rig, names = _make_het_handler(
        models=("fisheye", "standard", "standard"), noise=0.0, seed=19,
        n_ims=2, grid=5)
    cams = handler.camset
    # markers = the first 8 template points (frame = image; pose 0 = id)
    dd = rig["dd"]
    d0 = dd[(dd[:, 1] == 0) & (dd[:, 2] < 8)]
    mt = MarkerTriangulator(cams, n_markers=8)
    pts, info = mt.reconstruct(d0)
    want = rig["template"][:8]
    seen = np.asarray(info["n_views"][0]) >= 2
    assert seen.sum() >= 4
    np.testing.assert_allclose(pts[0][seen], want[seen], atol=1e-5)


def test_het_scipy_backend():
    """The reference-parity scipy backend handles the het chain too
    (jacfwd CSR assembly over the selector chain)."""
    from pycamset_tpu.optim.driver import run_bundle_adjustment

    handler, rig, _ = _make_het_handler(
        models=("fisheye", "standard"), noise=0.1, seed=3, n_ims=6,
        grid=5)
    res, _cams = run_bundle_adjustment(handler, backend="scipy")
    rms = np.sqrt(np.mean(res["fun"] ** 2))
    assert rms < 2.0 * rig["noise_px"], rms


def test_het_analytic_matches_jacfwd():
    """The het closed-form grams (analytic.make_block_rj_het) match
    jacfwd of the selector chain to 1e-9 for both families, for the
    template AND self-cal chains."""
    import jax
    import jax.numpy as jnp
    from pycamset_tpu.optim.analytic import analytic_block_rj_for_chain
    from pycamset_tpu.optim.blocks import (Extrinsic3D, FreePoint,
                                           ProjectionHet, RigidTform3d,
                                           TemplatePoints)
    from pycamset_tpu.optim.chain import OptimFunction

    rng = np.random.default_rng(2)
    tpl = jnp.asarray(rng.normal(size=(7, 3)) * 0.2)
    uv = jnp.asarray(rng.normal(size=(7, 2)) * 100 + 500)
    pose6 = jnp.asarray(rng.normal(size=6) * 0.2)
    rows = {
        1.0: np.concatenate([[1.0, 620, 800, 615, 600],
                             [-0.04, 0.01, -2e-3, 4e-4, 0.0],
                             rng.normal(size=6) * 0.1]),
        0.0: np.concatenate([[0.0, 1500, 800, 1490, 600],
                             [-0.2, 0.05, 1e-3, -2e-3, 0.01],
                             rng.normal(size=6) * 0.1]),
    }
    for blocks, takes_key in (
            ([ProjectionHet("standard"), Extrinsic3D(), TemplatePoints()],
             False),
            ([ProjectionHet("standard"), Extrinsic3D(), RigidTform3d(),
              FreePoint()], True)):
        op_fun = OptimFunction(blocks)
        rj = analytic_block_rj_for_chain(op_fun)
        assert rj is not None
        point_fn = op_fun.make_point_fn()
        asm = op_fun.make_local_assembler()
        for sel, row in rows.items():
            cam = jnp.asarray(row)
            keyp = tpl if takes_key else jnp.zeros((7, 0))
            r, jc, ji, jk = rj(cam, pose6, tpl, tpl, uv)

            def slot(cp, ip, kp, t, u):
                return point_fn(asm(cp, ip, kp), t) - u

            kvec = tpl if takes_key else jnp.zeros((7, 0))
            f = jax.vmap(lambda kp, t, u: slot(cam, pose6, kp, t, u),
                         in_axes=(0, 0, 0))
            r_ref = f(kvec, tpl, uv)
            np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                                       atol=1e-9)
            jc_ref, ji_ref, jk_ref = jax.vmap(
                lambda kp, t, u: jax.jacfwd(
                    lambda cp, ip, kpp: slot(cp, ip, kpp, t, u),
                    argnums=(0, 1, 2))(cam, pose6, kp),
                in_axes=(0, 0, 0))(kvec, tpl, uv)
            np.testing.assert_allclose(np.asarray(jc), np.asarray(jc_ref),
                                       atol=1e-8)
            np.testing.assert_allclose(np.asarray(ji), np.asarray(ji_ref),
                                       atol=1e-8)
            np.testing.assert_allclose(np.asarray(jk), np.asarray(jk_ref),
                                       atol=1e-8)


def test_het_calibration_uncertainty():
    """First-order uncertainty works on het calibrations: per-camera
    intrinsic sigmas in the het layout (fixed selector/pad columns at
    zero), finite pose sigmas."""
    from pycamset_tpu.optim.driver import run_bundle_adjustment

    handler, rig, names = _make_het_handler(
        models=("fisheye", "standard", "standard"), noise=0.1, seed=23,
        n_ims=8, grid=6)
    _res, cams = run_bundle_adjustment(handler, backend="structured")
    unc = cams.calibration_uncertainty()
    assert np.isfinite(unc["sigma2"])
    for c, name in enumerate(names):
        sig = np.asarray(unc["cameras"][name]["int_sigma"])
        assert sig.shape == (10,)  # het layout [sel | k4 | dist 5]
        assert sig[0] == 0.0       # the family selector is fixed
        if rig["camera_models"][c] == "fisheye":
            assert sig[9] == 0.0   # structural pad slot is fixed
            assert np.all(sig[1:9] > 0)
        else:
            assert np.all(sig[1:] > 0)
    assert np.isfinite(unc["pose_sigma"]).all()
