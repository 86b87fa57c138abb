"""Tests of the extension machinery and exports: two-target handler (PER_GROUP
params), MVSNet scene export, profiling helpers."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


class TestTwoTargetExtension:
    def test_relative_pose_recovered(self):
        from extend_param_handler import synthetic_demo
        rel, rel_true, rms = synthetic_demo()
        assert rms < 0.15  # at the injected 0.1 px noise floor
        np.testing.assert_allclose(rel, rel_true, atol=1e-3)

    def test_group_chain_runs_structured_and_matches_generic(self):
        """PER_GROUP-keyed chains now ride the structured Schur backend
        (group params expand onto the key grid; gram pieces reduce back);
        it must land on the same minimum as the generic scatter backend."""
        from extend_param_handler import TwoTargetCalibrator
        from pycamset_tpu.optim.blocks import key_type
        from pycamset_tpu.optim.driver import run_bundle_adjustment
        from pycamset_tpu.optim.structured import chain_widths

        # construct the handler exactly as synthetic_demo does
        import numpy as _np
        import pycamset_tpu.utils.general_utils as gu
        from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
        from pycamset_tpu.models.detections import TargetDetection
        from pycamset_tpu.optim.handlers import FreePointTarget
        from pycamset_tpu.utils.general_utils import h_tform, make_4x4h_tform
        from pycamset_tpu.utils.synthetic import make_synthetic_rig

        def make_handler():
            rig = make_synthetic_rig(n_cams=3, n_ims=8, grid=5,
                                     visibility=1.0, noise_px=0.1, seed=11)
            tpl0 = rig["template"]
            rel_true = make_4x4h_tform(_np.array([0.1, -0.2, 0.3]),
                                       _np.array([0.15, 0.02, -0.05]))
            tpl1_local = tpl0 + [0.002, 0.001, 0.0]
            tpl1_world = h_tform(tpl1_local, rel_true)
            k_mats, exts, dists = [], [], []
            for c in range(3):
                i9 = rig["intr"][c]
                k_mats.append(_np.array([[i9[0], 0, i9[1]],
                                         [0, i9[2], i9[3]], [0, 0, 1]]))
                dists.append(i9[4:])
                exts.append(gu.make_4x4h_tform(rig["extr"][c][:3],
                                               rig["extr"][c][3:]))
            cams = CameraSet(camera_dict=make_cam_dict(
                ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))
            rows1 = []
            rng = _np.random.default_rng(2)
            for i in range(8):
                t = gu.make_4x4h_tform(rig["poses"][i][:3],
                                       rig["poses"][i][3:])
                world = gu.h_tform(tpl1_world, t)
                for c in range(3):
                    uv = cams[c].project_points(world)
                    for kk in range(world.shape[0]):
                        rows1.append([c, i, kk,
                                      *(uv[kk] + rng.normal(size=2) * 0.1)])
            det0 = TargetDetection(cam_names=["a", "b", "c"],
                                   data=rig["dd"])
            det1 = TargetDetection(cam_names=["a", "b", "c"],
                                   data=_np.array(rows1))
            return TwoTargetCalibrator(
                cams, FreePointTarget(tpl0.reshape(1, -1, 3)),
                FreePointTarget(tpl1_local.reshape(1, -1, 3)),
                det0, det1, options={"outliers": "n"})

        h = make_handler()
        assert chain_widths(h.op_fun).key_link == key_type.PER_GROUP
        res_s, _ = run_bundle_adjustment(h, backend="structured")

        h2 = make_handler()
        res_g, _ = run_bundle_adjustment(h2, backend="generic")
        rms_s = np.sqrt(np.mean(res_s["fun"] ** 2))
        rms_g = np.sqrt(np.mean(res_g["fun"] ** 2))
        assert abs(rms_s - rms_g) < 1e-4, (rms_s, rms_g)


class TestMVSNetExport:
    def test_write_to_txt(self, tmp_path):
        from pycamset_tpu.models.camera import Camera
        from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
        from pycamset_tpu.reconstruction.acmmp_utils import ReconParams
        from pycamset_tpu.utils.general_utils import make_4x4h_tform
        import numpy as np

        k = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]])
        exts = [make_4x4h_tform((0, 2 * np.pi * i / 6, 0), (0, 0, 0.3))
                for i in range(6)]
        cams = CameraSet(camera_dict=make_cam_dict(
            [f"c{i}" for i in range(6)], exts, [k] * 6,
            [np.zeros(5)] * 6, [[640, 480]] * 6))
        out = tmp_path / "mvsnet"
        out.mkdir()
        ims = [np.zeros((480, 640), dtype=np.uint8)] * 6
        cams.write_to_txt(out, ReconParams(max_n_view=3), ims=ims)

        cam_txt = (out / "00000000_cam.txt").read_text()
        assert cam_txt.startswith("extrinsic\n")
        assert "intrinsic" in cam_txt
        pair = (tmp_path / "pair.txt").read_text()
        assert pair.startswith("6\n0\n")
        assert (tmp_path / "images" / "00000000.jpg").exists()

    def test_single_cam_txt_round_trip(self, tmp_path):
        from pycamset_tpu.models.camera import Camera
        cam = Camera()
        f = tmp_path / "cam.txt"
        cam.to_MVSnet_txt(f, (0.1, 0.8), 192)
        lines = f.read_text().splitlines()
        ext = np.array([[float(v) for v in line.split()]
                        for line in lines[1:5]])
        np.testing.assert_allclose(ext, cam.extrinsic)


class TestProfiling:
    def test_step_timer(self):
        import jax.numpy as jnp
        from pycamset_tpu.utils.profiling import StepTimer, annotate
        timer = StepTimer()
        with annotate("test-region"):
            out = timer.timed("matmul", lambda: jnp.ones((64, 64)) @ jnp.ones((64, 64)))
        assert out.shape == (64, 64)
        assert "matmul" in timer.report()


class TestAdaptiveDetection:
    def test_decimation_sweep(self):
        import cv2
        from cv2 import aruco
        from pycamset_tpu.utils.general_utils import (
            adaptive_decimated_charuco_detection_stereo)
        board = aruco.CharucoBoard(
            (8, 8), 0.004, 0.0032,
            aruco.getPredefinedDictionary(aruco.DICT_4X4_1000))
        im = board.generateImage((1600, 1600))
        corners, ids, d = adaptive_decimated_charuco_detection_stereo(im, board)
        assert corners is not None and len(corners) > 30
        assert corners.max() <= 1600


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestTwoTargetSelfCalibration:
    """Mixed PER_KEY + PER_GROUP chain: free geometry for BOTH targets plus
    the free relative pose, on the arrow-structured mixed backend."""

    def test_selfcal_demo_converges(self):
        from extend_param_handler import synthetic_selfcal_demo
        rms, warp0_err, warp1_err = synthetic_selfcal_demo()
        assert rms < 0.15  # at the injected 0.1 px noise floor
        # geometry lands within the planar-grid weak-mode envelope (the
        # injected warp is 5e-4; depth-like modes are weakly observed)
        assert warp0_err < 2e-2 and warp1_err < 2e-2

    def test_mixed_backend_matches_generic(self):
        """The arrow-structured mixed solve and the generic scatter solve
        land on the same minimum."""
        import numpy as _np
        from extend_param_handler import synthetic_selfcal_demo  # noqa: F401
        from extend_param_handler import TwoTargetSelfCalibrator
        import pycamset_tpu.utils.general_utils as gu
        from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
        from pycamset_tpu.models.detections import TargetDetection
        from pycamset_tpu.optim.driver import run_bundle_adjustment
        from pycamset_tpu.optim.handlers import FreePointTarget
        from pycamset_tpu.optim.structured_mixed import mixed_chain_widths
        from pycamset_tpu.utils.general_utils import h_tform, make_4x4h_tform
        from pycamset_tpu.utils.synthetic import make_synthetic_rig

        def make_handler():
            rig = make_synthetic_rig(n_cams=3, n_ims=6, grid=5,
                                     visibility=1.0, noise_px=0.1, seed=17)
            tpl0 = rig["template"]
            rel_true = make_4x4h_tform(_np.array([0.05, -0.1, 0.2]),
                                       _np.array([0.1, 0.02, -0.03]))
            tpl1 = tpl0 + [0.002, 0.001, 0.0]
            k_mats, exts, dists = [], [], []
            for c in range(3):
                i9 = rig["intr"][c]
                k_mats.append(_np.array([[i9[0], 0, i9[1]],
                                         [0, i9[2], i9[3]], [0, 0, 1]]))
                dists.append(i9[4:])
                exts.append(gu.make_4x4h_tform(rig["extr"][c][:3],
                                               rig["extr"][c][3:]))
            cams = CameraSet(camera_dict=make_cam_dict(
                ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))
            rng = _np.random.default_rng(2)
            rows1 = []
            for i in range(6):
                t = gu.make_4x4h_tform(rig["poses"][i][:3],
                                       rig["poses"][i][3:])
                world = h_tform(h_tform(tpl1, rel_true), t)
                for c in range(3):
                    uv = cams[c].project_points(world)
                    for kk in range(world.shape[0]):
                        rows1.append([c, i, kk,
                                      *(uv[kk] + rng.normal(size=2) * 0.1)])
            det0 = TargetDetection(cam_names=["a", "b", "c"],
                                   data=rig["dd"])
            det1 = TargetDetection(cam_names=["a", "b", "c"],
                                   data=_np.array(rows1))
            return TwoTargetSelfCalibrator(
                cams, FreePointTarget(tpl0.reshape(1, -1, 3)),
                FreePointTarget(tpl1.reshape(1, -1, 3)),
                det0, det1, options={"outliers": "n"})

        h = make_handler()
        widths = mixed_chain_widths(h.op_fun)   # raises if not mixed
        assert (widths.ck, widths.cg) == (3, 6)
        res_m, _ = run_bundle_adjustment(h, backend="structured")

        h2 = make_handler()
        res_g, _ = run_bundle_adjustment(h2, backend="generic")
        rms_m = np.sqrt(np.mean(res_m["fun"] ** 2))
        rms_g = np.sqrt(np.mean(res_g["fun"] ** 2))
        assert abs(rms_m - rms_g) < 1e-4, (rms_m, rms_g)
