"""Fleet calibration: many same-structure rigs in ONE batched solve.

A production line builds identical 4-camera rigs, each photographing the
same ChArUco-style target. Instead of calibrating them one process at a
time (the reference workflow), `run_fleet_bundle_adjustment` batches
every rig's bundle adjustment into a single jitted `jax.vmap` of the
structured LM — and, given a device mesh, shards the RIG axis over the
chips with zero collectives.

Run anywhere:

    python examples/fleet_calibration.py [n_rigs]

With image folders instead of handlers, the pipeline-level entry is

    from pycamset_tpu import calibrate_fleet
    camsets = calibrate_fleet(["/data/rig_a", "/data/rig_b"], target)
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # checkout use

import numpy as np


def make_rig_handler(seed: int):
    """One synthetic 4-cam/12-image rig, as if freshly detected+seeded."""
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import (FreePointTarget,
                                             TemplateBundleHandler)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=4, n_ims=12, grid=8, visibility=0.9,
                             noise_px=0.25, seed=seed)
    names = [f"cam{c}" for c in range(4)]
    k_mats = [np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]], [0, 0, 1]])
              for i9 in rig["intr"]]
    exts = [make_4x4h_tform(e[:3], e[3:]) for e in rig["extr"]]
    cams = CameraSet(camera_dict=make_cam_dict(
        names, exts, k_mats, [i9[4:] for i9 in rig["intr"]],
        [[1600, 1200]] * 4))
    return TemplateBundleHandler(
        cams, FreePointTarget(rig["template"].reshape(1, -1, 3)),
        TargetDetection(cam_names=names, data=rig["dd"]),
        options={"outliers": "n"})


def main():
    import time

    import jax

    from pycamset_tpu import run_fleet_bundle_adjustment

    n_rigs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print(f"building {n_rigs} rigs ({jax.default_backend()} backend, "
          f"{len(jax.devices())} device(s))")
    handlers = [make_rig_handler(seed=100 + r) for r in range(n_rigs)]

    t0 = time.perf_counter()
    results, camsets = run_fleet_bundle_adjustment(handlers)
    dt = time.perf_counter() - t0
    for r, (res, cams) in enumerate(zip(results, camsets)):
        rms = np.sqrt(np.mean(res.fun ** 2))
        print(f"  rig {r}: rms={rms:.3f} px nit={res.nit} "
              f"status={res.status} cams={cams.get_names()}")
    print(f"{n_rigs} calibrations in {dt:.1f} s (one batched solve, "
          "incl. compile)")

    if len(jax.devices()) > 1:
        from pycamset_tpu.parallel.mesh import detection_mesh
        mesh = detection_mesh()
        print(f"re-solving with the rig axis sharded over "
              f"{mesh.devices.size} devices (zero collectives)")
        results, _ = run_fleet_bundle_adjustment(handlers, mesh=mesh)
        print("  sharded costs:",
              [f"{res.cost:.3e}" for res in results])


if __name__ == "__main__":
    main()
