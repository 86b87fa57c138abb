"""Dress rehearsal: render a synthetic capture, then calibrate from it.

Builds a ground-truth rig, renders a ChArUco capture through the full
lens models (utils/render.py), runs the real image pipeline (detection,
seeding, TPU-resident bundle adjustment) on the rendered frames, and
scores the result against the generating cameras — the workflow behind
the `render` CLI subcommand, usable before any hardware exists.

    python examples/dress_rehearsal.py [out_dir]
"""
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_rig(res=(800, 600)):
    from pycamset_tpu.models.camera import Camera
    from pycamset_tpu.models.camera_set import CameraSet
    from pycamset_tpu.utils.synthetic import look_at_extrinsic

    cams = {}
    for i, x in enumerate([-0.12, 0.0, 0.12]):
        k = np.array([[880.0 + 25 * i, 0, res[0] / 2],
                      [0, 875.0 + 25 * i, res[1] / 2], [0, 0, 1.0]])
        dist = np.array([-0.11 + 0.02 * i, 0.02, 3e-4, -2e-4, 0.0])
        ext = look_at_extrinsic(np.array([x, 0.02 * i, -0.45]),
                                np.zeros(3))
        cams[f"cam{i}"] = Camera(extrinsic=ext, intrinsic=k, res=list(res),
                                 distortion_coefs=dist, name=f"cam{i}")
    return CameraSet(camera_dict=cams)


def main(out_dir=None):
    from pycamset_tpu import calibrate_cameras
    from pycamset_tpu.calibration.plan import synthesize_detections
    from pycamset_tpu.models.charuco import ChArUco
    from pycamset_tpu.utils.render import render_target_views

    out = Path(out_dir) if out_dir else Path(tempfile.mkdtemp(
        prefix="dress_rehearsal_"))
    gt_cams = make_rig()
    target = ChArUco(10, 10, 25)

    # sample realistic poses around the rig's shared workspace (the same
    # sampler the plan/render commands use), then render actual frames
    _, poses = synthesize_detections(gt_cams, target.point_data, 10,
                                     seed=3)
    render_target_views(gt_cams, target, poses, out_dir=out,
                        blur_sigma=0.6, noise=2.0)
    print(f"rendered {len(poses)} views x {gt_cams.get_n_cams()} cameras "
          f"-> {out}")

    cams = calibrate_cameras(f_loc=out, calibration_target=ChArUco(
        10, 10, 25), save=False, problem_options={"outliers": "n"})

    err = np.mean(np.linalg.norm(
        cams.calibration_result.reshape(-1, 2), axis=1))
    print(f"\nreprojection error on rendered frames: {err:.3f} px")

    def rel(cs, name):  # cam0-relative pose (the world gauge differs)
        return cs[name].extrinsic @ np.linalg.inv(cs["cam0"].extrinsic)

    for name in gt_cams.get_names():
        got, want = cams[name], gt_cams[name]
        df = abs(got.intrinsic[0, 0] - want.intrinsic[0, 0])
        db = np.linalg.norm(rel(cams, name)[:3, 3]
                            - rel(gt_cams, name)[:3, 3])
        print(f"  {name}: focal error {df:.2f} px, "
              f"baseline-to-cam0 error {db * 1e3:.2f} mm")
    assert err < 0.4
    print("\ndress rehearsal complete: the pipeline recovers the "
          "generating rig from its own renders")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
