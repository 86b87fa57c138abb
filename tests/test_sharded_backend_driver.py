"""run_bundle_adjustment(backend="sharded"): the user-facing multi-device
path — handler in, mesh-sharded LM solve out — on the 8-device virtual CPU
mesh, parity-checked against the single-device structured backend."""
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _template_handler(n_cams=2, n_ims=4, grid=4, seed=5, noise=0.2):
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import (FreePointTarget,
                                             TemplateBundleHandler)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=n_cams, n_ims=n_ims, grid=grid,
                             visibility=1.0, noise_px=noise, seed=seed)
    names = [f"cam{c}" for c in range(n_cams)]
    k_mats = [np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]], [0, 0, 1]])
              for i9 in rig["intr"]]
    exts = [make_4x4h_tform(e[:3], e[3:]) for e in rig["extr"]]
    cams = CameraSet(camera_dict=make_cam_dict(
        names, exts, k_mats, [i9[4:] for i9 in rig["intr"]],
        [[1600, 1200]] * n_cams))
    return TemplateBundleHandler(
        cams, FreePointTarget(rig["template"].reshape(1, -1, 3)),
        TargetDetection(cam_names=names, data=rig["dd"]),
        options={"outliers": "n"}), rig


def _selfcal_handler(seed=29, **options):
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import (FreePointTarget,
                                             SelfBundleHandler)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=6, grid=5, visibility=0.95,
                             noise_px=0.2, seed=seed)
    k_mats = [np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]], [0, 0, 1]])
              for i9 in rig["intr"]]
    exts = [make_4x4h_tform(e[:3], e[3:]) for e in rig["extr"]]
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c"], exts, k_mats, [i9[4:] for i9 in rig["intr"]],
        [[1600, 1200]] * 3))
    target = FreePointTarget(rig["template"].reshape(1, -1, 3))
    det = TargetDetection(cam_names=["a", "b", "c"], data=rig["dd"])
    return SelfBundleHandler(cams, target, det,
                             options={"outliers": "n", **options}), rig


def test_sharded_backend_matches_structured_template():
    """Auto axis (2 cams don't divide 8 devices -> pose) on the template
    chain: same converged cost and parameters as single-device."""
    from pycamset_tpu.optim.driver import run_bundle_adjustment

    handler, rig = _template_handler()
    res_ref, _ = run_bundle_adjustment(handler, backend="structured")

    handler2, _ = _template_handler()
    res_sh, cams = run_bundle_adjustment(handler2, backend="sharded")

    assert res_sh.cost == pytest.approx(res_ref.cost, rel=1e-6)
    np.testing.assert_allclose(res_sh.x, res_ref.x, rtol=1e-4, atol=1e-7)
    assert np.sqrt(np.mean(res_sh.fun ** 2)) < 0.3
    assert cams is not None


@pytest.mark.parametrize("shard_axis", ["cam", "key"])
def test_sharded_backend_selfcal_axes(shard_axis):
    """Explicit shard_axis through problem_opts on the self-cal chain
    (3 cams won't divide 8 devices on 'cam' — that must raise clearly;
    'key' shards the structure axis and must match single-device)."""
    from pycamset_tpu.optim.driver import run_bundle_adjustment

    if shard_axis == "cam":
        handler, _ = _selfcal_handler(shard_axis="cam")
        with pytest.raises(ValueError, match="divisible"):
            run_bundle_adjustment(handler, backend="sharded")
        return

    handler_ref, _ = _selfcal_handler()
    res_ref, _ = run_bundle_adjustment(handler_ref, backend="structured")
    handler, _ = _selfcal_handler(shard_axis="key")
    res_sh, _ = run_bundle_adjustment(handler, backend="sharded")
    assert res_sh.cost == pytest.approx(res_ref.cost, rel=1e-6)
    np.testing.assert_allclose(res_sh.x, res_ref.x, rtol=1e-4, atol=1e-7)


def _two_target_handler(seed=17):
    from extend_param_handler import TwoTargetSelfCalibrator

    import pycamset_tpu.utils.general_utils as gu
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.utils.general_utils import h_tform, make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=6, grid=5, visibility=1.0,
                             noise_px=0.1, seed=seed)
    tpl0 = rig["template"]
    rel_true = make_4x4h_tform(np.array([0.05, -0.1, 0.2]),
                               np.array([0.1, 0.02, -0.03]))
    tpl1 = tpl0 + [0.002, 0.001, 0.0]
    k_mats, exts, dists = [], [], []
    for c in range(3):
        i9 = rig["intr"][c]
        k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]],
                                [0, 0, 1]]))
        dists.append(i9[4:])
        exts.append(gu.make_4x4h_tform(rig["extr"][c][:3],
                                       rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))
    rng = np.random.default_rng(2)
    rows1 = []
    for i in range(6):
        t = gu.make_4x4h_tform(rig["poses"][i][:3], rig["poses"][i][3:])
        world = h_tform(h_tform(tpl1, rel_true), t)
        for c in range(3):
            uv = cams[c].project_points(world)
            for kk in range(world.shape[0]):
                rows1.append([c, i, kk, *(uv[kk] + rng.normal(size=2) * 0.1)])
    det0 = TargetDetection(cam_names=["a", "b", "c"], data=rig["dd"])
    det1 = TargetDetection(cam_names=["a", "b", "c"],
                           data=np.array(rows1))
    return TwoTargetSelfCalibrator(
        cams, FreePointTarget(tpl0.reshape(1, -1, 3)),
        FreePointTarget(tpl1.reshape(1, -1, 3)),
        det0, det1, options={"outliers": "n"})


def test_sharded_backend_mixed_chain():
    """A PER_KEY+PER_GROUP multi-target handler routes to the sharded
    MIXED backend and matches the single-device mixed solve."""
    from pycamset_tpu.optim.driver import run_bundle_adjustment

    handler = _two_target_handler()
    res_ref, _ = run_bundle_adjustment(handler, backend="structured")
    handler2 = _two_target_handler()
    res_sh, _ = run_bundle_adjustment(handler2, backend="sharded")
    assert res_sh.cost == pytest.approx(res_ref.cost, rel=1e-6)
    np.testing.assert_allclose(res_sh.x, res_ref.x, rtol=1e-4, atol=1e-7)


def test_pipeline_backend_option():
    """problem_options={"backend": "sharded"} reaches the solver through
    the calibrate_cameras pipeline layer (run_stereo_calibration)."""
    from pycamset_tpu.calibration.camera_calibrator import (
        run_stereo_calibration)

    handler, _rig = _template_handler()
    handler.problem_opts["backend"] = "sharded"
    solved = run_stereo_calibration(
        handler.camset, handler.detection, handler.target,
        param_handler=handler, save=False)
    err = np.mean(np.linalg.norm(
        solved.calibration_result.reshape(-1, 2), axis=1))
    assert err < 0.4


def test_sharded_backend_robust_loss_parity():
    """Robust loss options plumb through the sharded builders (loss folds
    into the per-shard grams as IRLS weights; parity vs single-device)."""
    from pycamset_tpu.optim.driver import run_bundle_adjustment

    def handler():
        h, _ = _template_handler(seed=11)
        h.problem_opts.update({"loss": "huber", "f_scale": 2.0})
        return h

    res_ref, _ = run_bundle_adjustment(handler(), backend="structured")
    res_sh, _ = run_bundle_adjustment(handler(), backend="sharded")
    assert res_sh.cost == pytest.approx(res_ref.cost, rel=1e-6)
    np.testing.assert_allclose(res_sh.x, res_ref.x, rtol=1e-4, atol=1e-7)


def test_sharded_backend_freepoint_chain():
    """Pose-free (SfM) chain through backend="sharded": zero-width image
    params ride the pose-sharded grid (auto axis buckets 1 image to 8)."""
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import (FreePointBundleHandler,
                                             FreePointTarget)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=4, n_ims=1, grid=7, visibility=1.0,
                             noise_px=0.2, seed=17)
    k_mats, exts, dists = [], [], []
    for c in range(4):
        i9 = rig["intr"][c]
        k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]],
                                [0, 0, 1]]))
        dists.append(i9[4:])
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c", "d"], exts, k_mats, dists, [[1600, 1200]] * 4))
    rng = np.random.default_rng(3)
    pts0 = rig["template"] + rng.normal(size=rig["template"].shape) * 0.002
    det = TargetDetection(cam_names=["a", "b", "c", "d"], data=rig["dd"])
    fixed = {n: {"int": k, "dst": d, "ext": e}
             for n, k, d, e in zip("abcd", k_mats, dists, exts)}

    def handler():
        return FreePointBundleHandler(
            cams, FreePointTarget(pts0.reshape(1, -1, 3)), det,
            fixed_params=fixed, options={"outliers": "n"})

    res_ref, _ = run_bundle_adjustment(handler(), backend="structured")
    res_sh, _ = run_bundle_adjustment(handler(), backend="sharded")
    assert res_sh.cost == pytest.approx(res_ref.cost, rel=1e-6)
    np.testing.assert_allclose(res_sh.x, res_ref.x, rtol=1e-4, atol=1e-7)


def test_sharded_backend_rejects_unknown_axis():
    """Typo'd shard_axis fails loudly (both the driver and the structured
    builder now validate, matching the mixed backend's contract)."""
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.parallel.mesh import detection_mesh
    from pycamset_tpu.parallel.sharded_structured import (
        make_sharded_structured_solver)
    from pycamset_tpu.optim.blocks import (Extrinsic3D, Projection,
                                           TemplatePoints)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.structured import ParamPieces, chain_widths

    handler, _ = _template_handler()
    handler.problem_opts["shard_axis"] = "Pose"  # wrong case
    with pytest.raises(ValueError, match="unknown shard_axis"):
        run_bundle_adjustment(handler, backend="sharded")

    op_fun = OptimFunction([Projection(), Extrinsic3D(), TemplatePoints()])
    widths = chain_widths(op_fun)
    cm = ParamPieces(np.ones((8, widths.a)), np.ones((8, widths.b)),
                     np.ones((8, 0)))
    with pytest.raises(ValueError, match="unknown shard_axis"):
        make_sharded_structured_solver(op_fun, widths, 8, 8,
                                       detection_mesh(8), cm,
                                       shard_axis="poze")
