"""Interactive MAD outlier handling ('ask' / 'y' / 'n' modes)."""
import numpy as np
import pytest


def _handler_with_bad_pose(outliers, seed=23):
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import (
        FreePointTarget, TemplateBundleHandler)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=8, grid=5, visibility=0.95,
                             noise_px=0.2, seed=seed)
    dd = rig["dd"].copy()
    # wreck one image's observations entirely (a bumped target / bad sync)
    bad_im = 5
    rows = dd[:, 1] == bad_im
    dd[rows, 3:5] += 300.0

    k_mats, exts, dists = [], [], []
    for c in range(3):
        i9 = rig["intr"][c]
        k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]],
                                [0, 0, 1]]))
        dists.append(i9[4:])
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))
    target = FreePointTarget(rig["template"].reshape(1, -1, 3))
    det = TargetDetection(cam_names=["a", "b", "c"], data=dd)
    return TemplateBundleHandler(cams, target, det,
                                 options={"outliers": outliers}), bad_im


def test_outlier_auto_removed_in_y_mode():
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    handler, bad_im = _handler_with_bad_pose("y")
    result, _ = run_bundle_adjustment(handler)
    assert handler.missing_poses[bad_im], "the wrecked image was not excluded"
    # with the bad image gone, the fit reaches the noise floor
    assert np.sqrt(np.mean(result["fun"] ** 2)) < 0.3
    # and the excluded image's rows are absent from the optimisation data
    dd_used = handler.get_detection_data(flatten=True)
    assert not np.any(dd_used[:, 1] == bad_im)


def test_outlier_ask_mode_prompts(monkeypatch):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    monkeypatch.setattr(plt, "show", lambda *a, **k: None)
    answers = iter(["y", "n"])
    prompts = []

    def fake_input(msg):
        prompts.append(msg)
        return next(answers)

    monkeypatch.setattr("builtins.input", fake_input)
    handler, bad_im = _handler_with_bad_pose("ask")
    handler.calc_initial_params()
    assert prompts, "ask mode never prompted"
    assert handler.missing_poses[bad_im]


def test_outlier_kept_in_n_mode():
    handler, bad_im = _handler_with_bad_pose("n")
    handler.calc_initial_params()
    assert not handler.missing_poses[bad_im]


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
