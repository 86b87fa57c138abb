#!/usr/bin/env python
"""Serving throughput: TargetTracker batch / stream modes on the chip.

Measures the production serving path (pose of a known target against a
fixed calibrated rig) at 3 cams x 19x19 target (~1k detections/frame):

- device-only batch rate: the vmapped 6-dof LM solve, timed with the
  fetch-forced differenced method over perturbed seed batches;
- end-to-end track_batch: detection table in, (I,4,4) poses out,
  including the host packing/seeding/finalize work (wall clock per call,
  warm);
- end-to-end track_stream: the lax.scan warm-start video path.

Usage: python benchmarks/serving_bench.py [n_frames]   (default 1024)
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import fetch_scalar, log  # noqa: E402


def build(n_frames: int):
    import pycamset_tpu.utils.general_utils as gu
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.tracking import TargetTracker
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=n_frames, grid=19,
                             visibility=0.9, noise_px=0.3, seed=7)
    k_mats, exts, dists = [], [], []
    for c in range(3):
        i9 = rig["intr"][c]
        k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]],
                                [0, 0, 1]]))
        dists.append(i9[4:])
        exts.append(gu.make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))
    det = TargetDetection(cam_names=["a", "b", "c"], data=rig["dd"])
    tracker = TargetTracker(cams, FreePointTarget(
        rig["template"].reshape(1, -1, 3)))
    return tracker, det, rig


def main():
    import jax
    import jax.numpy as jnp

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    tracker, det, rig = build(n_frames)
    log(f"backend={jax.default_backend()} frames={n_frames} "
        f"dets/frame~{len(rig['dd']) / n_frames:.0f} "
        f"capacity={tracker.max_detections}")

    # ---- end-to-end batch (detection table -> poses), warm wall clock
    poses, info = tracker.track_batch(det)          # compile + bring-up
    rms = float(np.median(info["rms"]))
    t0 = time.perf_counter()
    n_rep = 3
    for _ in range(n_rep):
        poses, info = tracker.track_batch(det)
    t_e2e = (time.perf_counter() - t0) / n_rep
    log(f"track_batch e2e: {t_e2e:.3f} s = {n_frames / t_e2e:.0f} poses/s "
        f"(median rms {rms:.3f} px)")

    # ---- device-only batch rate (fetch-forced differenced)
    dd_all, bounds, nf, mask, dev_args = tracker._pack_table(det)
    uv_grid = None
    seeds0 = np.zeros((n_frames, 6))
    # perturbed seed batches defeat result memoization
    seed_list = [jnp.asarray(seeds0 + (i + 1) * 1e-10,
                             dtype=tracker._dtype) for i in range(4)]
    # warm-start near truth so iteration counts match serving reality
    true6 = np.stack([rig["poses"][i] for i in range(n_frames)])
    seed_list = [jnp.asarray(true6 + (i + 1) * 1e-6, dtype=tracker._dtype)
                 for i in range(4)]

    def run_k(k):
        t0 = time.perf_counter()
        r = None
        for i in range(k):
            r, _cov = tracker._solve_batch(seed_list[i % 4], *dev_args)
        fetch_scalar(r.cost[-1])
        return time.perf_counter() - t0

    fetch_scalar(tracker._solve_batch(seed_list[0], *dev_args)[0].cost[-1])
    t_dev = (run_k(8) - run_k(2)) / 6
    log(f"device-only batch solve: {t_dev:.3f} s = "
        f"{n_frames / t_dev:.0f} poses/s")

    # ---- end-to-end stream (ordered video, warm-start scan)
    poses_s, info_s = tracker.track_stream(det)     # compile
    t0 = time.perf_counter()
    for _ in range(n_rep):
        poses_s, info_s = tracker.track_stream(det)
    t_stream = (time.perf_counter() - t0) / n_rep
    log(f"track_stream e2e: {t_stream:.3f} s = "
        f"{n_frames / t_stream:.0f} poses/s "
        f"(median rms {float(np.median(info_s['rms'])):.3f} px)")


if __name__ == "__main__":
    main()
