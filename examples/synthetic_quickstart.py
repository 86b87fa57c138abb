"""Quickstart without image data: calibrate a synthetic 8-camera rig.

Generates a ground-truth rig + noisy observations, perturbs the camera
estimates the way real seeding errors would, and runs the TPU-resident
bundle adjustment directly through the handler API.

    python examples/synthetic_quickstart.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # checkout use

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
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=8, n_ims=30, grid=12, visibility=0.9,
                             noise_px=0.25, seed=0)

    # seed cameras: ground truth + the kind of error PnP/calibrateCamera has
    rng = np.random.default_rng(1)
    k_mats, exts, dists = [], [], []
    for c in range(rig["n_cams"]):
        i9 = rig["intr"][c] + rng.normal(size=9) * [5, 2, 5, 2, 1e-3, 1e-4,
                                                    1e-4, 1e-4, 1e-5]
        k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]],
                                [0, 0, 1]]))
        dists.append(i9[4:])
        ext6 = rig["extr"][c] + rng.normal(size=6) * 2e-3
        exts.append(make_4x4h_tform(ext6[:3], ext6[3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        [f"cam{i}" for i in range(rig["n_cams"])], exts, k_mats, dists,
        [[1600, 1200]] * rig["n_cams"]))

    target = FreePointTarget(rig["template"].reshape(1, -1, 3))
    detection = TargetDetection(
        cam_names=cams.get_names(), data=rig["dd"])

    handler = TemplateBundleHandler(cams, target, detection,
                                    options={"outliers": "n"})
    result, calibrated = run_bundle_adjustment(handler)

    rms = np.sqrt(np.mean(result["fun"] ** 2))
    print(f"\nsolved {len(result['x'])} parameters over "
          f"{result['fun'].size // 2} observations in {result['nit']} "
          f"LM iterations; final rms {rms:.3f} px "
          f"(injected noise {rig['noise_px']} px)")

    # recovered vs true focal lengths
    intr, _, _ = handler.bundlePrimitive.return_bundle_primitives(result["x"])
    fx_err = np.abs(intr[:, 0] - rig["intr"][:, 0])
    print(f"focal length recovery: mean |error| {fx_err.mean():.3f} px")
    return calibrated


if __name__ == "__main__":
    main()
