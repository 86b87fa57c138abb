"""Heterogeneous rig: a wide fisheye context camera + Brown inspection
lenses calibrated in ONE bundle adjustment, then tracked.

The production pattern this serves: a 120-deg fisheye gives scene
context while narrow lenses inspect details — one capture, one joint
solve, consistent extrinsics. The reference (pyCamSet) supports exactly
one projection family per rig
(pyCamSet/optimisation/function_block_implementations.py:21-140); here
a per-camera model map routes each camera through its own family via
the selector-extended ProjectionHet chain (docs/usage.md
"Heterogeneous rigs").

    python examples/heterogeneous_rig.py
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import (
        FreePointTarget, TemplateBundleHandler)
    from pycamset_tpu.tracking import TargetTracker
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    models = ["fisheye", "standard", "standard", "standard"]
    rig = make_synthetic_rig(n_cams=len(models), n_ims=20, grid=9,
                             visibility=0.9, noise_px=0.2, seed=0,
                             camera_model=models)

    # seed cameras: truth + realistic seeding error; each camera keeps
    # its own family's distortion width (4-wide = the fisheye marker)
    rng = np.random.default_rng(1)
    names = [f"cam{i}" for i in range(len(models))]
    k_mats, exts, dists = [], [], []
    for c, m in enumerate(models):
        row = rig["intr"][c].copy()
        row[:4] += rng.normal(size=4) * [5, 2, 5, 2]
        k_mats.append(np.array([[row[0], 0, row[1]],
                                [0, row[2], row[3]], [0, 0, 1]]))
        dists.append(row[4:8] if m == "fisheye" else row[4:9])
        ext6 = rig["extr"][c] + rng.normal(size=6) * 2e-3
        exts.append(make_4x4h_tform(ext6[:3], ext6[3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        names, exts, k_mats, dists, [[1600, 1200]] * len(models)))

    target = FreePointTarget(rig["template"].reshape(1, -1, 3))
    detection = TargetDetection(cam_names=names, data=rig["dd"])

    # the per-camera model map is the whole API surface of the feature
    handler = TemplateBundleHandler(
        cams, target, detection,
        options={"outliers": "n",
                 "camera_model": dict(zip(names, models))})
    res, solved = run_bundle_adjustment(handler, backend="structured")
    rms = float(np.sqrt(np.mean(res["fun"] ** 2)))
    print(f"joint mixed-family BA: rms {rms:.3f} px "
          f"(injected noise {rig['noise_px']})")
    for name, m in zip(names, models):
        d = np.reshape(solved[name].distortion_coefs, -1)
        print(f"  {name}: {m:>8}, {d.size} distortion coefficients")

    # the calibrated mixed rig serves like a uniform one
    tracker = TargetTracker(solved, target)
    poses, info = tracker.track_batch(detection)
    print(f"tracked {poses.shape[0]} frames through the mixed rig, "
          f"mean rms {float(np.nanmean(info['rms'])):.3f} px")


if __name__ == "__main__":
    main()
