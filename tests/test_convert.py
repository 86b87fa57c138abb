"""Camera model conversion (refit one distortion family onto another)."""
import logging

import numpy as np
import pytest


def _cam(camera_model="standard", seed=0):
    from pycamset_tpu.models.camera import Camera
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig
    rig = make_synthetic_rig(n_cams=1, n_ims=1, grid=3, seed=seed,
                             camera_model=camera_model)
    i = rig["intr"][0]
    k = np.array([[i[0], 0, i[1]], [0, i[2], i[3]], [0, 0, 1]])
    ext = make_4x4h_tform(rig["extr"][0][:3], rig["extr"][0][3:])
    return Camera(extrinsic=ext, intrinsic=k, distortion_coefs=i[4:],
                  res=(1600, 1200), name="src")


def _projection_gap(a, b, margin=0.1):
    """Max pixel disagreement of two cameras over in-image world points."""
    rng = np.random.default_rng(3)
    # points along rays of camera a, depths 0.4-1.5 m
    res = np.asarray(a.res, float)
    uv = np.column_stack([
        rng.uniform(margin * res[0], (1 - margin) * res[0], 400),
        rng.uniform(margin * res[1], (1 - margin) * res[1], 400)])
    ideal = a.undistort_points(uv, iters=25)
    kinv = np.linalg.inv(a.intrinsic)
    rays = np.concatenate([ideal, np.ones((400, 1))], 1) @ kinv.T
    depths = rng.uniform(0.4, 1.5, 400)[:, None]
    pts_cam = rays * depths
    world = (pts_cam - a.extrinsic[:3, 3]) @ a.extrinsic[:3, :3]
    return float(np.abs(a.project_points(world)
                        - b.project_points(world)).max())


def test_standard_to_rational_is_exact():
    from pycamset_tpu.calibration.convert import convert_camera_model
    cam = _cam("standard")
    new, rep = convert_camera_model(cam, to="rational")
    assert rep["rms_px"] < 1e-4
    assert new.distortion_coefs.size == 8
    assert _projection_gap(cam, new) < 1e-3
    assert np.allclose(new.extrinsic, cam.extrinsic)


def test_rational_to_standard_absorbs_mild_coeffs():
    from pycamset_tpu.calibration.convert import convert_camera_model
    cam = _cam("rational")
    new, rep = convert_camera_model(cam, to="standard")
    assert rep["from"] == "rational" and rep["to"] == "standard"
    assert rep["rms_px"] < 0.3          # narrow field: Brown-absorbable
    assert new.distortion_coefs.size == 5
    assert _projection_gap(cam, new) < 1.5


def test_standard_to_fisheye_narrow_field():
    from pycamset_tpu.calibration.convert import convert_camera_model
    cam = _cam("standard")
    new, rep = convert_camera_model(cam, to="fisheye")
    assert new.distortion_coefs.size == 4   # the fisheye marker width
    assert rep["rms_px"] < 0.3
    assert _projection_gap(cam, new) < 1.5


def test_wide_fisheye_defeats_brown_and_warns(caplog):
    from pycamset_tpu.calibration.convert import convert_camera_model
    cam = _cam("fisheye")
    with caplog.at_level(logging.WARNING,
                         logger="pycamset_tpu.calibration.convert"):
        new, rep = convert_camera_model(cam, to="standard")
    assert rep["rms_px"] > 0.5          # the honest negative result
    assert "cannot fully express" in caplog.text


def test_fisheye_round_trip_is_tight():
    from pycamset_tpu.calibration.convert import convert_camera_model
    cam = _cam("fisheye")
    new, rep = convert_camera_model(cam, to="fisheye")
    assert rep["rms_px"] < 1e-4
    assert np.abs(new.intrinsic - cam.intrinsic).max() < 1.0


def test_convert_camera_set_preserves_rig():
    from pycamset_tpu.calibration.convert import convert_camera_set
    from pycamset_tpu.models.camera_set import CameraSet
    a, b = _cam("standard", seed=1), _cam("standard", seed=2)
    a.name, b.name = "a", "b"
    cams = CameraSet(camera_dict={"a": a, "b": b})
    new, reps = convert_camera_set(cams, to="rational")
    assert new.get_names() == ["a", "b"]
    for n in ("a", "b"):
        assert np.allclose(new[n].extrinsic, cams[n].extrinsic)
        assert reps[n]["rms_px"] < 1e-3


def test_cli_convert(tmp_path, capsys):
    from pycamset_tpu.__main__ import main
    from pycamset_tpu.models.camera_set import CameraSet
    from pycamset_tpu.utils.saving import load_CameraSet
    a = _cam("standard", seed=4)
    a.name = "a"
    cams = CameraSet(camera_dict={"a": a})
    src = tmp_path / "rig.camset"
    cams.save(src)
    rc = main(["convert", str(src), "--to", "rational"])
    assert rc == 0
    out = tmp_path / "rig_rational.camset"
    assert out.exists()
    assert "conversion rms" in capsys.readouterr().out
    new = load_CameraSet(out)
    assert np.reshape(new["a"].distortion_coefs, -1).size == 8
    assert _projection_gap(cams["a"], new["a"]) < 1e-3


def test_unknown_target_raises():
    from pycamset_tpu.calibration.convert import convert_camera_model
    with pytest.raises(ValueError, match="unknown target model"):
        convert_camera_model(_cam(), to="nope")
