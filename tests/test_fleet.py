"""Fleet bundle adjustment: R same-structure rigs in ONE vmapped solve
(optim/fleet.py) — parity against per-rig single solves on the structured
backend, ragged image counts, per-rig fixed-parameter masks, and the
structural validation errors."""
import numpy as np
import pytest


def _template_handler(n_cams=2, n_ims=4, grid=4, seed=5, noise=0.2,
                      fixed_params=None, options=None, shared_rig=False):
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import (FreePointTarget,
                                             TemplateBundleHandler)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=n_cams, n_ims=n_ims, grid=grid,
                             visibility=1.0, noise_px=noise, seed=seed,
                             shared_intrinsics=shared_rig)
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
        fixed_params=fixed_params,
        options={"outliers": "n", **(options or {})}), rig


def _selfcal_handler(seed=29, n_ims=6, **options):
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import (FreePointTarget,
                                             SelfBundleHandler)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=n_ims, grid=5, visibility=0.95,
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


def _grouped_handler(seed=11, n_ims=6, grid=4):
    """A PER_GROUP (two rigidly-coupled targets) TEMPLATE handler — the
    grouped structured chain, not the mixed self-cal one."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                           / "examples"))
    from extend_param_handler import TwoTargetCalibrator

    import pycamset_tpu.utils.general_utils as gu
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.utils.general_utils import h_tform, make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=n_ims, grid=grid,
                             visibility=1.0, noise_px=0.1, seed=seed)
    tpl0 = rig["template"]
    rel_true = make_4x4h_tform(np.array([0.1, -0.2, 0.3]),
                               np.array([0.15, 0.02, -0.05]))
    tpl1_local = tpl0 + [0.002, 0.001, 0.0]
    tpl1_world = h_tform(tpl1_local, rel_true)
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
    rows1 = []
    rng = np.random.default_rng(seed + 1)
    for i in range(n_ims):
        t = gu.make_4x4h_tform(rig["poses"][i][:3], rig["poses"][i][3:])
        world = gu.h_tform(tpl1_world, t)
        for c in range(3):
            uv = cams[c].project_points(world)
            for kk in range(world.shape[0]):
                rows1.append([c, i, kk, *(uv[kk] + rng.normal(size=2) * 0.1)])
    det0 = TargetDetection(cam_names=["a", "b", "c"], data=rig["dd"])
    det1 = TargetDetection(cam_names=["a", "b", "c"],
                           data=np.array(rows1))
    return TwoTargetCalibrator(
        cams, FreePointTarget(tpl0.reshape(1, -1, 3)),
        FreePointTarget(tpl1_local.reshape(1, -1, 3)),
        det0, det1, options={"outliers": "n"})


def _mixed_handler(seed=17, n_ims=6, grid=4):
    """A MIXED PER_KEY+PER_GROUP handler (two-target self-calibration)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                           / "examples"))
    from extend_param_handler import TwoTargetSelfCalibrator

    import pycamset_tpu.utils.general_utils as gu
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.utils.general_utils import h_tform, make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=n_ims, grid=grid,
                             visibility=1.0, noise_px=0.1, seed=seed)
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
    rng = np.random.default_rng(seed + 1)
    rows1 = []
    for i in range(n_ims):
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


def _tied_handler(seed=5, n_ims=6, n_cams=3, shared_opt=True):
    """A template handler whose TRUE rig shares one lens across cameras,
    solved with options={"shared_intrinsics": shared_opt}."""
    return _template_handler(
        n_cams=n_cams, n_ims=n_ims, grid=7, seed=seed, shared_rig=True,
        options={"shared_intrinsics": shared_opt})


def _single_solve(make_handler):
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    handler, _ = make_handler()
    res, cams = run_bundle_adjustment(handler, backend="structured")
    return res, cams


class TestFleetParity:
    """Two-level parity. (1) Batch invariance, tight: a rig solved in an
    R=3 fleet matches the SAME rig solved as an R=1 fleet (vmap batching
    must not change the solution). (2) Backend agreement, loose: the fleet
    path re-compiles the problem with the column mask as a traced argument
    where the single-rig structured backend folds it as a constant, so the
    LM trajectories part ways in the last ulps and stop within ~1e-4 of
    each other — same optimum, different final step."""

    def test_template_fleet_matches_singles(self):
        from pycamset_tpu.optim.fleet import run_fleet_bundle_adjustment

        seeds = [5, 6, 7]
        handlers = [_template_handler(seed=s)[0] for s in seeds]
        results, camsets = run_fleet_bundle_adjustment(handlers)
        assert len(results) == len(camsets) == 3

        for s, res, cams in zip(seeds, results, camsets):
            solo, _ = run_fleet_bundle_adjustment(
                [_template_handler(seed=s)[0]])
            # R=3 and R=1 are different executables — XLA's reduction
            # orders differ with batch layout, so "tight" means solver
            # tolerance, not ulps
            assert res.cost == pytest.approx(solo[0].cost, rel=1e-5)
            np.testing.assert_allclose(res.x, solo[0].x, rtol=1e-3,
                                       atol=1e-6)

            ref, _ = _single_solve(lambda s=s: _template_handler(seed=s))
            assert res.cost == pytest.approx(ref.cost, rel=1e-5)
            np.testing.assert_allclose(res.x, ref.x, rtol=1e-3, atol=1e-6)
            assert np.sqrt(np.mean(res.fun ** 2)) < 0.3
            assert cams is not None

    def test_ragged_image_counts_pad_to_fleet_grid(self):
        """Rigs with 4/6/8 images share one grid: the shorter rigs pad with
        fully-masked images and still match their solo solves."""
        from pycamset_tpu.optim.fleet import run_fleet_bundle_adjustment

        spec = [(4, 11), (6, 12), (8, 13)]
        handlers = [_template_handler(n_ims=n, seed=s)[0] for n, s in spec]
        results, _ = run_fleet_bundle_adjustment(handlers)
        for (n, s), res in zip(spec, results):
            ref, _ = _single_solve(
                lambda n=n, s=s: _template_handler(n_ims=n, seed=s))
            assert res.cost == pytest.approx(ref.cost, rel=1e-8)
            np.testing.assert_allclose(res.x, ref.x, rtol=1e-6, atol=1e-9)
            # the padded rig solves the same-size free problem
            assert res.x.shape == ref.x.shape

    def test_per_rig_fixed_patterns(self):
        """Fixed-parameter patterns may differ per rig: the column masks
        ride the batch axis. Rig 1 freezes camera 0's intrinsics+distortion
        and must keep them bit-identical through the fleet solve."""
        from pycamset_tpu.optim.fleet import run_fleet_bundle_adjustment

        h_free, _ = _template_handler(seed=5)
        rig = _template_handler(seed=6)[1]
        i9 = rig["intr"][0]
        fixed = {"cam0": {"int": np.array([[i9[0], 0, i9[1]],
                                           [0, i9[2], i9[3]], [0, 0, 1]]),
                          "dst": i9[4:]}}
        h_fixed, _ = _template_handler(seed=6, fixed_params=fixed)
        results, camsets = run_fleet_bundle_adjustment([h_free, h_fixed])

        ref_free, _ = _single_solve(lambda: _template_handler(seed=5))
        np.testing.assert_allclose(results[0].x, ref_free.x, rtol=1e-3,
                                   atol=1e-6)
        ref_fixed, _ = _single_solve(
            lambda: _template_handler(seed=6, fixed_params=fixed))
        assert results[1].x.shape == ref_fixed.x.shape  # fewer free params
        np.testing.assert_allclose(results[1].x, ref_fixed.x, rtol=1e-3,
                                   atol=1e-6)
        got_i9 = np.concatenate([
            [camsets[1]["cam0"].intrinsic[0, 0],
             camsets[1]["cam0"].intrinsic[0, 2],
             camsets[1]["cam0"].intrinsic[1, 1],
             camsets[1]["cam0"].intrinsic[1, 2]],
            np.asarray(camsets[1]["cam0"].distortion_coefs).ravel()])
        np.testing.assert_allclose(got_i9, i9, rtol=0, atol=0)

    def test_grouped_fleet_matches_singles(self):
        """PER_GROUP (two rigidly-coupled targets) fleet parity — the
        grouped structured chain expands group params onto the key grid
        inside the fleet's shared neq."""
        from pycamset_tpu.optim.blocks import key_type
        from pycamset_tpu.optim.fleet import run_fleet_bundle_adjustment
        from pycamset_tpu.optim.structured import chain_widths

        seeds = [11, 13]
        handlers = [_grouped_handler(seed=s) for s in seeds]
        assert chain_widths(handlers[0].op_fun).key_link == key_type.PER_GROUP
        results, _ = run_fleet_bundle_adjustment(handlers)
        for s, res in zip(seeds, results):
            ref, _ = _single_solve(lambda s=s: (_grouped_handler(seed=s),
                                                None))
            assert res.cost == pytest.approx(ref.cost, rel=1e-5)
            np.testing.assert_allclose(res.x, ref.x, rtol=1e-3, atol=1e-6)
            assert np.sqrt(np.mean(res.fun ** 2)) < 0.15

    def test_tied_fleet_matches_singles(self):
        """shared_intrinsics fleet: every rig's cameras must come back
        with ONE lens (regression: the template fleet path used to solve
        this silently UNTIED, dropping the constraint) and match the
        single-rig tied backend."""
        from pycamset_tpu.optim.fleet import run_fleet_bundle_adjustment

        seeds = [5, 6]
        handlers = [_tied_handler(seed=s)[0] for s in seeds]
        results, camsets = run_fleet_bundle_adjustment(handlers)
        for s, res, cams in zip(seeds, results, camsets):
            intr = [cams[f"cam{i}"].intrinsic for i in range(3)]
            dst = [np.ravel(cams[f"cam{i}"].distortion_coefs)
                   for i in range(3)]
            # from_tied broadcasts the group lens: bit-identical rows
            assert np.array_equal(intr[0], intr[1]), "fleet solved untied"
            assert np.array_equal(intr[1], intr[2])
            assert np.array_equal(dst[0], dst[1])
            assert np.array_equal(dst[1], dst[2])
            ref, _ = _single_solve(lambda s=s: _tied_handler(seed=s))
            assert res.cost == pytest.approx(ref.cost, rel=1e-5)
            np.testing.assert_allclose(res.x, ref.x, rtol=1e-3, atol=1e-6)
            assert np.sqrt(np.mean(res.fun ** 2)) < 0.3

    def test_tied_fleet_lens_groups_and_ragged_ims(self):
        """Label-listed lens groups (cams 0+1 share, cam 2 its own) with
        per-rig image counts padding to the fleet grid."""
        from pycamset_tpu.optim.fleet import run_fleet_bundle_adjustment

        groups = ["a", "a", "b"]
        spec = [(4, 11), (6, 12)]
        handlers = [_tied_handler(seed=s, n_ims=n, shared_opt=groups)[0]
                    for n, s in spec]
        results, camsets = run_fleet_bundle_adjustment(handlers)
        for (n, s), res, cams in zip(spec, results, camsets):
            assert np.array_equal(cams["cam0"].intrinsic,
                                  cams["cam1"].intrinsic)
            assert not np.array_equal(cams["cam1"].intrinsic,
                                      cams["cam2"].intrinsic)
            ref, _ = _single_solve(
                lambda n=n, s=s: _tied_handler(seed=s, n_ims=n,
                                               shared_opt=groups))
            assert res.cost == pytest.approx(ref.cost, rel=1e-5)
            np.testing.assert_allclose(res.x, ref.x, rtol=1e-3, atol=1e-6)

    def test_mixed_fleet_matches_singles(self):
        """MIXED PER_KEY+PER_GROUP fleet (two-target self-calibration,
        arrow-structured backend) parity against solo solves."""
        from pycamset_tpu.optim.fleet import run_fleet_bundle_adjustment

        seeds = [17, 19]
        handlers = [_mixed_handler(seed=s) for s in seeds]
        results, _ = run_fleet_bundle_adjustment(handlers)
        for s, res in zip(seeds, results):
            ref, _ = _single_solve(lambda s=s: (_mixed_handler(seed=s),
                                                None))
            assert res.cost == pytest.approx(ref.cost, rel=1e-5)
            np.testing.assert_allclose(res.x, ref.x, rtol=1e-3, atol=1e-6)
            assert np.sqrt(np.mean(res.fun ** 2)) < 0.15

    def test_selfcal_fleet_matches_singles(self):
        """Self-calibration fleet (free points + gauge columns) parity."""
        from pycamset_tpu.optim.fleet import run_fleet_bundle_adjustment

        seeds = [29, 31]
        handlers = [_selfcal_handler(seed=s)[0] for s in seeds]
        results, _ = run_fleet_bundle_adjustment(handlers)
        for s, res in zip(seeds, results):
            ref, _ = _single_solve(lambda s=s: _selfcal_handler(seed=s))
            assert res.cost == pytest.approx(ref.cost, rel=1e-8)
            np.testing.assert_allclose(res.x, ref.x, rtol=1e-5, atol=1e-8)


class TestFleetValidation:
    def test_different_targets_raise(self):
        from pycamset_tpu.optim.fleet import (FleetMismatch,
                                              build_fleet_problem)

        h1, _ = _template_handler(grid=4, seed=5)
        h2, _ = _template_handler(grid=5, seed=6)
        with pytest.raises(FleetMismatch, match="keys"):
            build_fleet_problem([h1, h2])

    def test_different_camera_counts_raise(self):
        from pycamset_tpu.optim.fleet import (FleetMismatch,
                                              build_fleet_problem)

        h1, _ = _template_handler(n_cams=2, seed=5)
        h2, _ = _template_handler(n_cams=3, seed=6)
        with pytest.raises(FleetMismatch, match="cameras"):
            build_fleet_problem([h1, h2])

    def test_different_chains_raise(self):
        from pycamset_tpu.optim.fleet import (FleetMismatch,
                                              build_fleet_problem)

        h1, _ = _template_handler(seed=5)
        h2, _ = _selfcal_handler(seed=29)
        with pytest.raises(FleetMismatch, match="chain"):
            build_fleet_problem([h1, h2])

    def test_different_solver_options_raise(self):
        from pycamset_tpu.optim.fleet import (FleetMismatch,
                                              build_fleet_problem)

        h1, _ = _template_handler(seed=5)
        h2, _ = _template_handler(seed=6, options={"loss": "huber"})
        with pytest.raises(FleetMismatch, match="options"):
            build_fleet_problem([h1, h2])

    def test_mismatched_tying_raises(self):
        from pycamset_tpu.optim.fleet import (FleetMismatch,
                                              run_fleet_bundle_adjustment)
        h_tied = _tied_handler(seed=5)[0]
        h_untied = _tied_handler(seed=6, shared_opt=None)[0]
        with pytest.raises(FleetMismatch, match="options"):
            run_fleet_bundle_adjustment([h_tied, h_untied])

    def test_tied_per_camera_fixed_intrinsics_raise(self):
        from pycamset_tpu.optim.structured import UnsupportedChain
        from pycamset_tpu.optim.fleet import run_fleet_bundle_adjustment
        h0, rig = _template_handler(seed=5, grid=7, n_cams=3,
                                    shared_rig=True,
                                    options={"shared_intrinsics": True})
        i9 = rig["intr"][0]
        fixed = {"cam0": {"int": np.array([[i9[0], 0, i9[1]],
                                           [0, i9[2], i9[3]], [0, 0, 1]]),
                          "dst": i9[4:]}}
        h1, _ = _template_handler(seed=6, grid=7, n_cams=3,
                                  shared_rig=True, fixed_params=fixed,
                                  options={"shared_intrinsics": True})
        with pytest.raises(UnsupportedChain, match="per-camera fixed"):
            run_fleet_bundle_adjustment([h0, h1])

    def test_empty_fleet_raises(self):
        from pycamset_tpu.optim.fleet import (FleetMismatch,
                                              build_fleet_problem)

        with pytest.raises(FleetMismatch, match="empty"):
            build_fleet_problem([])

    def test_auto_model_rejected(self, tmp_path):
        from pycamset_tpu import calibrate_fleet
        from pycamset_tpu.models.charuco import ChArUco

        with pytest.raises(ValueError, match="auto"):
            calibrate_fleet([tmp_path], ChArUco(20, 20, 4, legacy=True),
                            problem_options={"camera_model": "auto"})


class TestFleetMesh:
    """Rig-axis sharding over the virtual device mesh: zero-collective
    SPMD (each device's slab iterates independently), parity with the
    unsharded fleet, and the pad-to-device-multiple path."""

    pytestmark = pytest.mark.skipif(
        __import__("jax").device_count() < 8,
        reason="needs 8 virtual devices")

    def test_sharded_fleet_matches_unsharded(self):
        from pycamset_tpu.optim.fleet import run_fleet_bundle_adjustment
        from pycamset_tpu.parallel.mesh import detection_mesh

        seeds = [5, 6, 7, 9]
        mesh = detection_mesh(4)
        res_m, _ = run_fleet_bundle_adjustment(
            [_template_handler(seed=s)[0] for s in seeds], mesh=mesh)
        res_u, _ = run_fleet_bundle_adjustment(
            [_template_handler(seed=s)[0] for s in seeds])
        assert len(res_m) == 4
        for rm, ru in zip(res_m, res_u):
            assert rm.cost == pytest.approx(ru.cost, rel=1e-5)
            np.testing.assert_allclose(rm.x, ru.x, rtol=1e-3, atol=1e-6)

    def test_sharded_mixed_fleet_matches_unsharded(self):
        """The mixed (arrow-structured) fleet shards its rig axis the
        same way."""
        from pycamset_tpu.optim.fleet import run_fleet_bundle_adjustment
        from pycamset_tpu.parallel.mesh import detection_mesh

        seeds = [17, 19]
        mesh = detection_mesh(2)
        res_m, _ = run_fleet_bundle_adjustment(
            [_mixed_handler(seed=s) for s in seeds], mesh=mesh)
        res_u, _ = run_fleet_bundle_adjustment(
            [_mixed_handler(seed=s) for s in seeds])
        for rm, ru in zip(res_m, res_u):
            assert rm.cost == pytest.approx(ru.cost, rel=1e-5)
            np.testing.assert_allclose(rm.x, ru.x, rtol=1e-3, atol=1e-6)

    def test_sharded_tied_fleet_matches_unsharded(self):
        """The tied (shared-intrinsics) family under shard_map: TiedPieces
        shard the rig axis exactly like ParamPieces."""
        from pycamset_tpu.optim.fleet import run_fleet_bundle_adjustment
        from pycamset_tpu.parallel.mesh import detection_mesh

        seeds = [5, 6]
        mesh = detection_mesh(2)
        res_m, cams_m = run_fleet_bundle_adjustment(
            [_tied_handler(seed=s)[0] for s in seeds], mesh=mesh)
        res_u, _ = run_fleet_bundle_adjustment(
            [_tied_handler(seed=s)[0] for s in seeds])
        for rm, ru, cm in zip(res_m, res_u, cams_m):
            assert rm.cost == pytest.approx(ru.cost, rel=1e-6)
            np.testing.assert_allclose(rm.x, ru.x, rtol=1e-4, atol=1e-7)
            assert np.array_equal(cm["cam0"].intrinsic,
                                  cm["cam1"].intrinsic)

    def test_fleet_pads_to_device_multiple(self):
        """3 rigs over 2 devices: the fleet pads with a copy of rig 0 and
        drops the padding on the host."""
        from pycamset_tpu.optim.fleet import run_fleet_bundle_adjustment
        from pycamset_tpu.parallel.mesh import detection_mesh

        seeds = [5, 6, 7]
        mesh = detection_mesh(2)
        res_m, camsets = run_fleet_bundle_adjustment(
            [_template_handler(seed=s)[0] for s in seeds], mesh=mesh)
        assert len(res_m) == len(camsets) == 3
        res_u, _ = run_fleet_bundle_adjustment(
            [_template_handler(seed=s)[0] for s in seeds])
        for rm, ru in zip(res_m, res_u):
            assert rm.cost == pytest.approx(ru.cost, rel=1e-5)
            np.testing.assert_allclose(rm.x, ru.x, rtol=1e-3, atol=1e-6)


class TestFleetCli:
    def test_fleet_command_wiring(self, monkeypatch, capsys):
        """CLI fleet -> calibrate_fleet option mapping (folders, target,
        tied lenses); the heavy pipeline itself is covered by
        TestCalibrateFleetPipeline."""
        import pycamset_tpu.__main__ as cli
        import pycamset_tpu.calibration.camera_calibrator as cc

        seen = {}

        class _FakeCams:
            calibration_result = np.zeros((10, 2))

            @staticmethod
            def get_n_cams():
                return 2

        def fake_fleet(f_locs, target, save=True, n_lim=None,
                       fixed_params=None, problem_options=None, mesh=None):
            seen.update(f_locs=list(f_locs), target=target, save=save,
                        opts=problem_options)
            return [_FakeCams(), _FakeCams()]

        monkeypatch.setattr(cc, "calibrate_fleet", fake_fleet)
        rc = cli.main(["fleet", "rigA", "rigB", "--target", "charuco",
                       "--nx", "10", "--ny", "10", "--square", "25",
                       "--no-save", "--shared-intrinsics"])
        assert rc == 0
        assert [str(f) for f in seen["f_locs"]] == ["rigA", "rigB"]
        assert seen["save"] is False
        assert seen["opts"]["shared_intrinsics"] is True
        assert seen["opts"]["camera_model"] == "standard"
        out = capsys.readouterr().out
        assert "rigA" in out and "rigB" in out

    def test_fleet_command_lens_groups(self, monkeypatch):
        import pycamset_tpu.__main__ as cli
        import pycamset_tpu.calibration.camera_calibrator as cc

        seen = {}

        class _FakeCams:
            calibration_result = np.zeros((10, 2))

            @staticmethod
            def get_n_cams():
                return 3

        monkeypatch.setattr(
            cc, "calibrate_fleet",
            lambda f_locs, target, **kw: (
                seen.update(opts=kw["problem_options"]),
                [_FakeCams()] * len(f_locs))[1])
        rc = cli.main(["fleet", "rigA", "--target", "charuco",
                       "--lens-groups", "a", "a", "b"])
        assert rc == 0
        assert seen["opts"]["shared_intrinsics"] == ["a", "a", "b"]


class TestCalibrateFleetPipeline:
    """Image-folders-in fleet pipeline (calibration/camera_calibrator.py::
    calibrate_fleet) on the reference ChArUco dataset, staged as two rig
    folders. Limited to 6 images/camera to keep the detection cost down —
    the point here is the plumbing (per-rig detect/seed, one batched BA,
    per-rig saves), not the accuracy threshold of the full E2E test.
    Slow tier: image detection on two rig copies takes minutes of the
    single-core host."""

    REF_DATA = __import__("pathlib").Path(
        "/root/reference/tests/test_data/calibration_charuco")

    pytestmark = [
        pytest.mark.slow,  # image detection on two rig copies: minutes
        pytest.mark.skipif(not REF_DATA.exists(),
                           reason="reference test data unavailable"),
    ]

    def test_two_rig_fleet_from_image_folders(self, tmp_path):
        import shutil

        from pycamset_tpu import calibrate_fleet
        from pycamset_tpu.models.charuco import ChArUco

        rigs = []
        for r in range(2):
            rig_dir = tmp_path / f"rig{r}"
            for sub in ["1", "2", "3"]:
                shutil.copytree(self.REF_DATA / sub, rig_dir / sub)
            rigs.append(rig_dir)

        target = ChArUco(20, 20, 4, legacy=True)
        camsets = calibrate_fleet(rigs, target, save=True, n_lim=6,
                                  problem_options={"outliers": "n"})
        assert len(camsets) == 2
        for rig_dir, cams in zip(rigs, camsets):
            err = np.mean(np.linalg.norm(
                np.reshape(cams.calibration_result, (-1, 2)), axis=1))
            assert err < 1.8, f"{rig_dir}: {err:.3f} px"
            assert (rig_dir / "optimised_cameras.camset").exists()
        # identical data -> identical solutions across the two rigs
        for name in camsets[0].get_names():
            c0, c1 = camsets[0][name], camsets[1][name]
            np.testing.assert_allclose(c0.intrinsic, c1.intrinsic,
                                       rtol=1e-10, atol=1e-12)
            np.testing.assert_allclose(c0.distortion_coefs,
                                       c1.distortion_coefs,
                                       rtol=1e-10, atol=1e-14)
            np.testing.assert_allclose(c0.extrinsic, c1.extrinsic,
                                       rtol=1e-10, atol=1e-14)



class TestCascade:
    def test_cascade_matches_lockstep_per_rig(self):
        """Fleets of >= 16 rigs route through the convergence-cohort
        cascade (make_cascade_solve); every rig's result must match its
        solo (lockstep R=1) solve — the cascade pauses and resumes the
        exact iteration sequence, so agreement is at solver tolerance."""
        import pytest
        from pycamset_tpu.optim.fleet import run_fleet_bundle_adjustment

        seeds = list(range(60, 78))  # 18 rigs -> cascade path
        handlers = [_template_handler(n_cams=2, n_ims=4, grid=5,
                                      seed=s)[0] for s in seeds]
        results, _ = run_fleet_bundle_adjustment(handlers)
        assert len(results) == 18
        for s, res in zip(seeds[:4], results[:4]):
            solo, _ = run_fleet_bundle_adjustment(
                [_template_handler(n_cams=2, n_ims=4, grid=5, seed=s)[0]])
            assert res.cost == pytest.approx(solo[0].cost, rel=1e-5)
            np.testing.assert_allclose(res.x, solo[0].x, rtol=1e-3,
                                       atol=1e-6)
        assert all(np.isfinite(r.cost) for r in results)
        assert all(r.status > 0 for r in results)  # polish net finished
