"""FreePointBundleHandler through the full driver (pose-free SfM)."""
import numpy as np
import pytest


def test_freepoint_full_driver():
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import (
        FreePointBundleHandler, FreePointTarget)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    # single time point: every point observed once per camera
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

    # the observed structure: pose-0 is identity so points sit at the template
    rng = np.random.default_rng(3)
    init_points = rig["template"] + rng.normal(size=rig["template"].shape) * 0.002
    target = FreePointTarget(init_points.reshape(1, -1, 3))
    det = TargetDetection(cam_names=["a", "b", "c", "d"], data=rig["dd"])

    handler = FreePointBundleHandler(
        cams, target, det,
        # cameras fixed: classic structure-only refinement has a well-posed
        # gauge; also exercises fixed_params plumbed through a handler
        fixed_params={n: {"int": k, "dst": d, "ext": e}
                      for n, k, d, e in zip("abcd", k_mats, dists, exts)},
        options={"outliers": "n"})
    result, final_cams = run_bundle_adjustment(handler)

    rms = float(np.sqrt(np.mean(result["fun"] ** 2)))
    assert rms < 0.25  # at the injected noise floor
    recovered = handler.get_updated_points(result["x"])
    err = np.linalg.norm(recovered - rig["template"], axis=1)
    assert np.median(err) < 5e-4  # points recovered to sub-mm


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
