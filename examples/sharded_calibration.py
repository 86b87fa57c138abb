"""Multi-device bundle adjustment with backend="sharded".

One call shards the solve over every local accelerator: the detection
grid splits along the camera, pose, or structure axis (picked
automatically), the per-device normal-equation pieces reduce over the
mesh with one psum, and the same Pallas gram kernels serve each shard.

Run anywhere — on a CPU-only host this demonstrates the API on 8 virtual
devices; on a TPU pod slice the same code uses the real chips:

    python examples/sharded_calibration.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # checkout use

import numpy as np


def main():
    import jax

    if jax.default_backend() == "cpu" and len(jax.devices()) < 2:
        print("single CPU device: restart with 8 virtual devices "
              "(jax_num_cpu_devices) to see the sharded path")
        return

    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import (FreePointTarget,
                                             TemplateBundleHandler)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=8, n_ims=24, grid=12, visibility=0.9,
                             noise_px=0.25, seed=0)
    names = [f"cam{c}" for c in range(rig["n_cams"])]
    k_mats = [np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]], [0, 0, 1]])
              for i9 in rig["intr"]]
    exts = [make_4x4h_tform(e[:3], e[3:]) for e in rig["extr"]]
    cams = CameraSet(camera_dict=make_cam_dict(
        names, exts, k_mats, [i9[4:] for i9 in rig["intr"]],
        [[1600, 1200]] * rig["n_cams"]))

    # options: "shard_axis" = "cam" | "pose" | "key" | "auto" (default),
    # "mesh" = a jax.sharding.Mesh (default: all local devices)
    handler = TemplateBundleHandler(
        cams, FreePointTarget(rig["template"].reshape(1, -1, 3)),
        TargetDetection(cam_names=names, data=rig["dd"]),
        options={"outliers": "n"})

    print(f"devices: {len(jax.devices())} ({jax.default_backend()})")
    res, solved = run_bundle_adjustment(handler, backend="sharded")
    rms = float(np.sqrt(np.mean(res["fun"] ** 2)))
    print(f"sharded solve: {res['nit']} iterations, rms {rms:.3f} px "
          f"(noise floor 0.25 px)")
    assert rms < 0.4


if __name__ == "__main__":
    import jax

    # demo default: 8 virtual devices when only one CPU device exists
    # (must happen before jax initialises; harmless if it already did)
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass
    main()
