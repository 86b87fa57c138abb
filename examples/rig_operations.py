"""Deployed-rig operations: monitor, repair, register, report, convert.

A calibrated rig leaves the lab and things happen to it: a camera gets
bumped, a lens gets refocused, a robot needs the rig registered into its
base frame, a colleague needs Brown coefficients from your fisheye
calibration, and the boss wants a report. This script walks through each
workflow on a synthetic rig where the ground truth is known.

Run anywhere:

    python examples/rig_operations.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # checkout use

import numpy as np


def make_rig(seed=11, n_cams=4, n_ims=12):
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=n_cams, n_ims=n_ims, grid=6,
                             visibility=0.9, noise_px=0.2, seed=seed)
    names = [f"cam{c}" for c in range(n_cams)]
    k_mats, exts, dists = [], [], []
    for c in range(n_cams):
        i = rig["intr"][c]
        k_mats.append(np.array([[i[0], 0, i[1]], [0, i[2], i[3]],
                                [0, 0, 1]]))
        dists.append(i[4:])
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        names, exts, k_mats, dists, [[1600, 1200]] * n_cams))
    target = FreePointTarget(rig["template"].reshape(1, -1, 3))
    det = TargetDetection(cam_names=names, data=rig["dd"])
    poses = np.stack([make_4x4h_tform(p[:3], p[3:]) for p in rig["poses"]])
    return cams, det, target, poses


def main():
    import copy

    import cv2

    from pycamset_tpu import (calibrate_hand_eye, recalibrate_extrinsics,
                              rig_health, write_calibration_report)
    from pycamset_tpu.calibration.convert import convert_camera_model

    cams, det, target, poses = make_rig()

    # ---- 1. drift monitoring: someone bumped cam2 by 4 mrad / 4 mm
    stale = copy.deepcopy(cams)
    d = np.eye(4)
    d[:3, :3] = cv2.Rodrigues(np.array([0.004, 0, 0]))[0]
    d[:3, 3] = [0.004, 0, 0]
    stale["cam2"].set_extrinsic(d @ stale["cam2"].extrinsic)

    rep = rig_health(stale, det, target)
    print("leave-one-out rms (px):",
          {k: round(v, 2) for k, v in rep["leave_one_out_rms_px"].items()})
    print("drifted:", rep["drifted"])

    # ---- 2. repair: refresh only the flagged extrinsic
    fixed, rrep = recalibrate_extrinsics(stale, det, target,
                                         refresh=rep["drifted"])
    print("refresh rms:", round(rrep["rms_px"], 3), "px; moved:",
          {n: (round(v["rotation_mrad"], 2), round(v["translation_mm"], 2))
           for n, v in rrep["deltas"].items()})
    assert rig_health(fixed, det, target)["drifted"] == []

    # ---- 3. hand-eye: register the rig to a robot (eye-in-hand).
    # Synthesize robot kinematics consistent with a known X (gripper_T_rig)
    # and Z (base_T_target): G_i = Z @ P_i^-1 @ X^-1.
    rng = np.random.default_rng(0)

    def rand_rigid():
        t = np.eye(4)
        t[:3, :3] = cv2.Rodrigues(rng.normal(size=3))[0]
        t[:3, 3] = rng.normal(size=3) * 0.4
        return t

    def inv(t):
        o = np.eye(4)
        o[:3, :3] = t[:3, :3].T
        o[:3, 3] = -t[:3, :3].T @ t[:3, 3]
        return o

    x_true, z_true = rand_rigid(), rand_rigid()
    g = np.stack([z_true @ inv(p) @ inv(x_true) for p in poses])
    res = calibrate_hand_eye(fixed, det, g, target, mode="eye_in_hand")
    print("hand-eye: |X - truth| =",
          f"{np.abs(res.x - x_true).max():.2e},",
          f"refined rms {res.rms:.3f} px")

    # ---- 4. model conversion: Brown -> rational for a downstream tool
    conv, crep = convert_camera_model(fixed["cam0"], to="rational")
    print(f"cam0 {crep['from']} -> rational: conversion rms "
          f"{crep['rms_px']:.5f} px over {crep['n_points']} samples")

    # ---- 5. report: one standalone HTML artifact
    out = Path("/tmp/rig_report.html")
    write_calibration_report(fixed, out, title="Example rig")
    print(f"report -> {out} ({out.stat().st_size // 1024} kB)")


if __name__ == "__main__":
    main()
