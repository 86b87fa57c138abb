"""Command-line interface: calibrate rigs and inspect .camset files.

The reference has no CLI (calibrate_cameras is driven from scripts); this
adds one without changing the library API:

    python -m pycamset_tpu calibrate DATA --target charuco --nx 20 --ny 20 --square 4
    python -m pycamset_tpu calibrate DATA --target ccube --n-points 10 --length 40
    python -m pycamset_tpu track DATA --camset optimised_cameras.camset \
        --target charuco --nx 20 --ny 20 --square 4 --out poses.json
    python -m pycamset_tpu reconstruct rig.camset --cams cam0 cam1 cam2 \
        --images a.png b.png c.png --near 0.2 --far 2.0 --out cloud.ply
    python -m pycamset_tpu info optimised_cameras.camset
"""
from __future__ import annotations

import argparse
import sys


def _add_target_args(p):
    p.add_argument("--target", choices=["charuco", "ccube", "grid"],
                   default="charuco")
    p.add_argument("--nx", type=int, default=20,
                   help="charuco squares / grid markers in x")
    p.add_argument("--ny", type=int, default=20,
                   help="charuco squares / grid markers in y")
    p.add_argument("--square", type=float, default=4.0,
                   help="charuco square size (mm)")
    p.add_argument("--n-points", type=int, default=10, help="ccube squares/edge")
    p.add_argument("--length", type=float, default=40.0, help="ccube edge (mm)")
    p.add_argument("--border-fraction", type=float, default=0.1)
    p.add_argument("--marker-size", type=float, default=30.0,
                   help="grid marker side (mm)")
    p.add_argument("--separation", type=float, default=6.0,
                   help="grid marker separation (mm)")
    p.add_argument("--first-id", type=int, default=0,
                   help="grid: id of the first marker")
    p.add_argument("--dict", dest="adict", default="DICT_4X4_1000",
                   help="aruco dictionary name")
    p.add_argument("--legacy", action="store_true",
                   help="legacy charuco pattern layout")
    p.add_argument("--photometric-refine", action="store_true",
                   help="fit a photometric X-corner model to every detected "
                        "corner (~3x lower corner error on blurred/noisy "
                        "imagery; charuco/ccube only)")


def _add_calibrate(sub):
    p = sub.add_parser("calibrate", help="calibrate a rig from image folders")
    p.add_argument("folder",
                   help="folder with one image subfolder per camera, OR "
                        "one video file per camera (frames are extracted "
                        "and cached automatically)")
    p.add_argument("--video-stride", type=int, default=1, metavar="N",
                   help="when the folder holds videos: keep every N-th "
                        "frame (default 1 = all)")
    _add_target_args(p)
    p.add_argument("--no-save", action="store_true")
    p.add_argument("--self-calibrate", action="store_true",
                   help="refine the target geometry after the template solve")
    p.add_argument("--outliers", choices=["ask", "y", "n"], default="ask")
    p.add_argument("--loss", choices=["linear", "huber", "soft_l1", "cauchy"],
                   default="linear")
    p.add_argument("--camera-model", default="standard", metavar="MODEL",
                   help="distortion model: 5-coef Brown-Conrady (standard), "
                        "8-coef rational, 12-coef thin-prism, 14-coef "
                        "tilted (Scheimpflug), or fisheye (Kannala-Brandt); "
                        "'auto' cross-validates the Brown-family models on "
                        "held-out images and picks the simplest one within "
                        "2%% of the best. A per-camera map "
                        "'cam0=fisheye,cam1=standard' calibrates a "
                        "HETEROGENEOUS rig (mixed projection families in "
                        "one bundle adjustment)")
    p.add_argument("--auto-per-camera", action="store_true",
                   help="with --camera-model auto: pick a model PER CAMERA "
                        "from the per-camera holdout scores (mixed picks "
                        "calibrate heterogeneously)")
    p.add_argument("--auto-candidates", nargs="+", default=None,
                   metavar="MODEL",
                   help="with --camera-model auto: the candidate models to "
                        "cross-validate (default: the Brown family; add "
                        "'fisheye' explicitly for wide lenses)")
    p.add_argument("--rolling-shutter", nargs="?", type=float,
                   const=1.0, default=None, metavar="REF_READOUT",
                   help="rolling-shutter-aware calibration: per-image "
                        "[pose|velocity] motion + per-camera readout "
                        "estimation; the value pins the REFERENCE "
                        "camera's readout (frame units; other readouts "
                        "are relative to it — pass the true value, e.g. "
                        "from 'sync', for absolute units; default 1.0). "
                        "Needs a MOVING target capture")
    p.add_argument("--f-scale", type=float, default=1.0)
    p.add_argument("--max-nfev", type=int, default=100)
    p.add_argument("--backend",
                   choices=["auto", "structured", "sharded", "generic",
                            "scipy"],
                   default="auto",
                   help="solver backend; 'sharded' splits the solve over "
                        "every local device (mesh + psum)")
    p.add_argument("--shared-intrinsics", action="store_true",
                   help="constrain every camera to ONE lens model (matched "
                        "lens batches; pools evidence across cameras)")
    p.add_argument("--lens-groups", nargs="+", default=None, metavar="LABEL",
                   help="per-camera lens labels in camera (folder) order — "
                        "cameras sharing a label share one lens model "
                        "(mixed lens batches); implies tying")
    p.add_argument("--high-distortion", action="store_true")
    p.add_argument("--draw", action="store_true")



def _add_track(sub):
    p = sub.add_parser(
        "track", help="per-frame target poses against a calibrated rig")
    p.add_argument("folder",
                   help="folder with one image subfolder per camera, OR "
                        "one video file per camera (frames are extracted "
                        "and cached automatically)")
    p.add_argument("--video-stride", type=int, default=1, metavar="N",
                   help="when the folder holds videos: keep every N-th "
                        "frame (default 1 = all)")
    p.add_argument("--camset",
                   help="calibrated rig (.camset file); or serve from a "
                        "frozen --artifact instead")
    _add_target_args(p)
    p.add_argument("--loss", choices=["linear", "huber", "soft_l1", "cauchy"],
                   default="linear")
    p.add_argument("--f-scale", type=float, default=1.0)
    p.add_argument("--out", default=None,
                   help="write poses as JSON (default: print)")
    p.add_argument("--stream", action="store_true",
                   help="treat frames as ordered video: each frame "
                        "warm-starts from the previous solution "
                        "(track_stream) instead of independent seeding")
    p.add_argument("--smooth", action="store_true",
                   help="RTS-smooth the trajectory with a constant-"
                        "velocity prior (ordered video): temporally "
                        "coherent poses + velocities, lost frames "
                        "interpolated from the motion model")
    p.add_argument("--q-rot", type=float, default=1e-3,
                   help="smoothing: angular white-noise-acceleration "
                        "density (rad^2/frame^3); smaller = stiffer")
    p.add_argument("--q-trans", type=float, default=1e-3,
                   help="smoothing: translation counterpart (m^2/frame^3)")
    p.add_argument("--no-cache", action="store_true",
                   help="skip the detection pickle cache")
    p.add_argument("--export-artifact", default=None, metavar="FILE",
                   help="after tracking, freeze the compiled solver into "
                        "a serving artifact (jax.export StableHLO) a "
                        "process without the calibration stack can load")
    p.add_argument("--artifact", default=None, metavar="FILE",
                   help="serve from a frozen artifact instead of "
                        "compiling from --camset (same platform as the "
                        "export; device seeding, no PnP rescue)")
    p.add_argument("--sync", default=None, metavar="FILE",
                   help="temporal calibration JSON from the `sync` "
                        "command: applies its per-camera clock offsets "
                        "and rolling-shutter readout (12-dof "
                        "pose+velocity solve; adds per-frame velocities "
                        "to the output)")


def _add_reconstruct(sub):
    p = sub.add_parser(
        "reconstruct",
        help="dense reconstruction from a calibrated rig "
             "(2 cameras: rectified stereo; 3+: multi-view plane sweep; "
             "fused: every listed view swept + consistency-fused)")
    p.add_argument("camset", help="calibrated rig (.camset file)")
    p.add_argument("--cams", nargs="+", required=True,
                   help="camera names; the FIRST is the reference view")
    p.add_argument("--images", nargs="+", required=True,
                   help="one image path per camera, same order")
    p.add_argument("--mode", choices=["stereo", "sweep", "fused", "mesh"],
                   default=None,
                   help="default: stereo for 2 cameras, sweep for 3+")
    p.add_argument("--out", default="cloud.ply",
                   help="output ascii PLY point cloud")
    # stereo options
    p.add_argument("--matcher", choices=["bm", "sgm"], default="sgm",
                   help="stereo matcher: OpenCV StereoBM or the "
                        "on-device census SGM")
    p.add_argument("--num-disp", type=int, default=256)
    p.add_argument("--mind", type=float, default=0.0,
                   help="stereo depth mask minimum")
    p.add_argument("--maxd", type=float, default=2.0,
                   help="stereo depth mask maximum")
    # plane-sweep options
    p.add_argument("--near", type=float, default=None,
                   help="sweep: nearest plane depth (ref-camera frame)")
    p.add_argument("--far", type=float, default=None,
                   help="sweep: farthest plane depth")
    p.add_argument("--n-planes", type=int, default=128)
    p.add_argument("--top-k", type=int, default=None,
                   help="sweep: aggregate the k cheapest source views "
                        "per pixel (occlusion robustness)")
    p.add_argument("--window", type=int, default=7,
                   help="sweep: ZNCC window size")
    p.add_argument("--regularize", action="store_true",
                   help="sweep: SGM-regularise the cost volume")
    # fusion options
    p.add_argument("--min-consistent", type=int, default=2,
                   help="fused: source views that must corroborate a "
                        "point (the emitting view is not counted)")
    p.add_argument("--max-px", type=float, default=1.0,
                   help="fused: mutual reprojection tolerance (px)")
    p.add_argument("--max-rel", type=float, default=0.01,
                   help="fused: relative depth agreement tolerance")
    p.add_argument("--max-sources", type=int, default=4,
                   help="fused: sweep sources per reference view")
    p.add_argument("--voxel", type=float, default=None,
                   help="mesh: TSDF voxel edge (default: auto from the "
                        "fused cloud's bounding box)")


def _add_handeye(sub):
    p = sub.add_parser(
        "handeye",
        help="hand-eye / robot-world calibration of a calibrated rig "
             "against synchronized robot poses")
    p.add_argument("folder",
                   help="folder with one image subfolder per camera, OR "
                        "one video file per camera (frames are extracted "
                        "and cached automatically)")
    p.add_argument("--video-stride", type=int, default=1, metavar="N",
                   help="when the folder holds videos: keep every N-th "
                        "frame (default 1 = all)")
    p.add_argument("--camset", required=True,
                   help="calibrated rig (.camset file)")
    p.add_argument("--robot-poses", required=True,
                   help="robot forward kinematics per image, base_T_gripper:"
                        " .npy with shape (I,4,4), or JSON list of 4x4 "
                        "matrices or 6-vectors [rvec(3), t(3)]")
    _add_target_args(p)
    p.add_argument("--mode", choices=["eye_in_hand", "eye_to_hand"],
                   default="eye_in_hand",
                   help="eye_in_hand: rig rides the gripper, target fixed; "
                        "eye_to_hand: rig fixed, target rides the gripper")
    p.add_argument("--method", choices=["park", "tsai"], default="park",
                   help="closed-form AX=XB seed")
    p.add_argument("--no-refine", action="store_true",
                   help="closed form only: skip the device reprojection LM")
    p.add_argument("--loss", choices=["linear", "huber", "soft_l1", "cauchy"],
                   default="linear")
    p.add_argument("--f-scale", type=float, default=1.0)
    p.add_argument("--out", default=None,
                   help="write the result as JSON (default: print)")
    p.add_argument("--no-cache", action="store_true",
                   help="skip the detection pickle cache")


def _resolve_folder(args):
    """The capture folder to scan: expands per-camera VIDEO files into
    the cached image-folder layout when present (utils/video.py)."""
    from pathlib import Path

    from pycamset_tpu.utils.video import expand_videos
    return expand_videos(Path(args.folder),
                         stride=getattr(args, "video_stride", 1),
                         caching=not getattr(args, "no_cache", False))


def _load_robot_poses(path):
    import json
    from pathlib import Path

    import numpy as np

    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    if str(path).endswith(".npy"):
        arr = np.load(path)
    else:
        arr = np.asarray(json.loads(Path(path).read_text()), dtype=float)
    if arr.ndim == 2 and arr.shape[1] == 6:
        arr = np.stack([make_4x4h_tform(r[:3], r[3:]) for r in arr])
    if arr.ndim != 3 or arr.shape[1:] != (4, 4):
        raise ValueError(
            f"robot poses must be (I,4,4) or (I,6); got {arr.shape}")
    return arr


def cmd_handeye(args) -> int:
    import json
    from pathlib import Path

    import numpy as np

    from pycamset_tpu.calibration.camera_calibrator import (
        detect_datapoints_in_imfile)
    from pycamset_tpu.calibration.handeye import calibrate_hand_eye
    from pycamset_tpu.utils.saving import load_CameraSet

    cams = load_CameraSet(args.camset)
    target = _make_target(args)
    detection, _ = detect_datapoints_in_imfile(
        f_loc=_resolve_folder(args), calibration_target=target,
        caching=not args.no_cache)
    g = _load_robot_poses(args.robot_poses)
    res = calibrate_hand_eye(
        cams, detection, g, target, mode=args.mode, method=args.method,
        refine=not args.no_refine, loss=args.loss, f_scale=args.f_scale)
    x_name, z_name = (("gripper_T_rig", "base_T_target")
                      if args.mode == "eye_in_hand"
                      else ("base_T_rig", "gripper_T_target"))
    record = {
        "mode": args.mode, "method": args.method,
        x_name: res.x.tolist(), z_name: res.z.tolist(),
        "reprojection_rms_px": None if np.isnan(res.rms) else res.rms,
        "images_used": int(np.sum(res.info["usable"])),
    }
    if "xz_sigma" in res.info:
        record["xz_sigma"] = res.info["xz_sigma"].tolist()
    text = json.dumps(record, indent=1)
    if args.out:
        Path(args.out).write_text(text)
        print(f"hand-eye ({args.mode}) -> {args.out}")
    else:
        print(text)
    if not np.isnan(res.rms):
        print(f"refined reprojection rms {res.rms:.3f} px over "
              f"{res.info['n_detections']} detections", file=sys.stderr)
    return 0


def _add_sync(sub):
    p = sub.add_parser(
        "sync",
        help="per-camera time offsets (sub-frame) from a moving-target "
             "capture against a calibrated rig")
    p.add_argument("folder",
                   help="folder with one image subfolder per camera, OR "
                        "one video file per camera (frames are extracted "
                        "and cached automatically)")
    p.add_argument("--video-stride", type=int, default=1, metavar="N",
                   help="when the folder holds videos: keep every N-th "
                        "frame (default 1 = all)")
    p.add_argument("--camset", required=True,
                   help="calibrated rig (.camset file)")
    _add_target_args(p)
    p.add_argument("--fps", type=float, default=None,
                   help="nominal frame rate: also report offsets in ms")
    p.add_argument("--frame-rates", type=float, nargs="+", default=None,
                   metavar="HZ",
                   help="per-camera frame rates for mixed-rate rigs "
                        "(e.g. 30 60 60); offsets are reported in "
                        "camera-0 frames")
    p.add_argument("--max-shift", type=int, default=0,
                   help="search integer frame shifts up to this many "
                        "frames first (0 = offsets are sub-frame)")
    p.add_argument("--skew", action="store_true",
                   help="also estimate per-camera frame-rate skew "
                        "(free-running clocks)")
    p.add_argument("--rolling-shutter", action="store_true",
                   help="also estimate per-camera rolling-shutter "
                        "readout duration (frames per frame scan)")
    p.add_argument("--loss", choices=["linear", "huber", "soft_l1", "cauchy"],
                   default="linear")
    p.add_argument("--f-scale", type=float, default=1.0)
    p.add_argument("--out", default=None,
                   help="write the result as JSON (default: print)")
    p.add_argument("--no-cache", action="store_true",
                   help="skip the detection pickle cache")


def cmd_sync(args) -> int:
    import json
    from pathlib import Path

    from pycamset_tpu.calibration.camera_calibrator import (
        detect_datapoints_in_imfile)
    from pycamset_tpu.calibration.sync import (calibrate_time_offsets,
                                               format_sync_report)
    from pycamset_tpu.utils.saving import load_CameraSet

    cams = load_CameraSet(args.camset)
    target = _make_target(args)
    detection, _ = detect_datapoints_in_imfile(
        f_loc=_resolve_folder(args), calibration_target=target,
        caching=not args.no_cache)
    res = calibrate_time_offsets(
        cams, detection, target, estimate_skew=args.skew,
        estimate_rolling_shutter=args.rolling_shutter,
        max_shift=args.max_shift, fps=args.fps,
        frame_rates=args.frame_rates, loss=args.loss,
        f_scale=args.f_scale)
    record = {
        "cameras": res.info["camera_names"],
        "offsets_frames": res.offsets.tolist(),
        "offset_sigma_frames": res.offset_sigma.tolist(),
        "reprojection_rms_px": res.rms,
        "integer_shifts": res.info["integer_shifts"].tolist(),
        "n_detections": res.info["n_detections"],
    }
    if res.skew is not None:
        record["skew_frames_per_frame"] = res.skew.tolist()
        record["skew_sigma"] = res.skew_sigma.tolist()
    if res.readout is not None:
        record["readout_frames"] = res.readout.tolist()
        record["readout_sigma"] = res.readout_sigma.tolist()
    if args.fps:
        record["offsets_ms"] = (res.offsets / args.fps * 1e3).tolist()
    if args.out:
        Path(args.out).write_text(json.dumps(record, indent=1))
        print(f"sync calibration -> {args.out}")
    else:
        print(json.dumps(record, indent=1))
    print(format_sync_report(res, fps=args.fps), file=sys.stderr)
    return 0


def _add_wand(sub):
    p = sub.add_parser(
        "wand",
        help="targetless extrinsic calibration from a waved marker wand "
             "(intrinsics trusted from --camset)")
    p.add_argument("detections",
                   help="correspondence table (.npy or JSON rows "
                        "[cam, frame, marker, u, v]) OR a capture folder "
                        "with one image subfolder / video file per camera "
                        "(bright-blob wand detection; needs --markers)")
    p.add_argument("--markers", type=int, default=3,
                   help="wand marker count for folder input (use an "
                        "ASYMMETRICALLY spaced wand so marker identity "
                        "is view-independent)")
    p.add_argument("--video-stride", type=int, default=1, metavar="N")
    p.add_argument("--camset", required=True,
                   help="rig with trusted intrinsics (.camset); "
                        "extrinsics may be arbitrary")
    p.add_argument("--wand-template", default=None, metavar="FILE",
                   help=".npy or JSON (M, 3) marker coordinates in the "
                        "wand frame (anchors metric scale)")
    p.add_argument("--spacing", type=float, default=None,
                   help="collinear wand: distance between adjacent "
                        "markers (m) — shorthand for --wand-template")
    p.add_argument("--ransac-px", type=float, default=2.0)
    p.add_argument("--loss", choices=["linear", "huber", "soft_l1", "cauchy"],
                   default="linear")
    p.add_argument("--f-scale", type=float, default=1.0)
    p.add_argument("--save", default="wand_calibrated_cameras.camset",
                   help="write the calibrated rig here")
    p.add_argument("--out", default=None,
                   help="write the report as JSON (default: print)")


def cmd_wand(args) -> int:
    import json
    from pathlib import Path

    import numpy as np

    from pycamset_tpu.calibration.wand import (
        calibrate_extrinsics_from_wand, detect_wand_in_imfolder)
    from pycamset_tpu.utils.saving import load_CameraSet, save_camset

    cam_names = None
    if Path(args.detections).is_dir():
        from pycamset_tpu.utils.video import expand_videos
        folder = expand_videos(Path(args.detections),
                               stride=args.video_stride)
        dd, cam_names = detect_wand_in_imfolder(folder, args.markers)
    elif str(args.detections).endswith(".npy"):
        dd = np.load(args.detections)
    else:
        dd = np.asarray(json.loads(Path(args.detections).read_text()),
                        dtype=float)
    wand = None
    if args.wand_template:
        if str(args.wand_template).endswith(".npy"):
            wand = np.load(args.wand_template)
        else:
            wand = np.asarray(
                json.loads(Path(args.wand_template).read_text()),
                dtype=float)
    elif args.spacing:
        n_markers = int(dd[:, 2].max()) + 1
        wand = np.zeros((n_markers, 3))
        wand[:, 0] = np.arange(n_markers) * args.spacing
    cams = load_CameraSet(args.camset)
    if cam_names is not None:
        # folder order -> the camset's camera order
        order = {n: i for i, n in enumerate(cams.get_names())}
        missing = [n for n in cam_names if n not in order]
        if missing:
            print(f"capture folders {missing} have no camera of that "
                  "name in the camset")
            return 2
        remap = np.array([order[n] for n in cam_names])
        dd = dd.copy()
        dd[:, 0] = remap[dd[:, 0].astype(int)]
    solved, rep = calibrate_extrinsics_from_wand(
        cams, dd, wand_template=wand, ransac_px=args.ransac_px,
        options={"loss": args.loss, "f_scale": args.f_scale})
    save_camset(solved, Path(args.save))
    record = {k: v for k, v in rep.items() if k != "wand_points"}
    text = json.dumps(record, indent=1, default=float)
    if args.out:
        Path(args.out).write_text(text)
        print(f"wand calibration report -> {args.out}")
    else:
        print(text)
    print(f"calibrated rig -> {args.save} "
          f"(rms {rep['rms_px']:.3f} px over {rep['n_points']} points"
          f"{'' if rep['metric'] else '; scale NOT metric'})",
          file=sys.stderr)
    return 0


def _add_markers(sub):
    p = sub.add_parser(
        "markers",
        help="per-frame 3D marker positions (non-rigid point sets) "
             "against a calibrated rig, with sigmas")
    p.add_argument("detections",
                   help="table (.npy/JSON rows [cam, frame, marker, u, v])"
                        " OR a capture folder (bright-blob detection)")
    p.add_argument("--camset", required=True,
                   help="calibrated rig (.camset file)")
    p.add_argument("--markers", type=int, default=None,
                   help="marker count (required for folder input; "
                        "default for tables: max id + 1)")
    p.add_argument("--video-stride", type=int, default=1, metavar="N")
    p.add_argument("--no-refine", action="store_true",
                   help="raw DLT only (skip the pixel-space polish)")
    p.add_argument("--out", default=None,
                   help="write per-frame points as JSON (default: print)")


def cmd_markers(args) -> int:
    import json
    from pathlib import Path

    import numpy as np

    from pycamset_tpu.markers import MarkerTriangulator
    from pycamset_tpu.utils.saving import load_CameraSet

    cams = load_CameraSet(args.camset)
    if Path(args.detections).is_dir():
        if not args.markers:
            print("folder input needs --markers")
            return 2
        from pycamset_tpu.calibration.wand import detect_wand_in_imfolder
        from pycamset_tpu.utils.video import expand_videos
        folder = expand_videos(Path(args.detections),
                               stride=args.video_stride)
        dd, cam_names = detect_wand_in_imfolder(folder, args.markers)
        order = {n: i for i, n in enumerate(cams.get_names())}
        missing = [n for n in cam_names if n not in order]
        if missing:
            print(f"capture folders {missing} have no camera of that "
                  "name in the camset")
            return 2
        remap = np.array([order[n] for n in cam_names])
        dd[:, 0] = remap[dd[:, 0].astype(int)]
    elif str(args.detections).endswith(".npy"):
        dd = np.load(args.detections)
    else:
        dd = np.asarray(json.loads(Path(args.detections).read_text()),
                        dtype=float)
    n_markers = args.markers or int(dd[:, 2].max()) + 1
    tri = MarkerTriangulator(cams, n_markers,
                             refine_iters=0 if args.no_refine else 3)
    pts, info = tri.reconstruct(dd)

    def _row(v):
        return [None if not np.isfinite(x) else float(x) for x in v]

    records = [{"frame": j,
                "points": [_row(pts[j, m]) for m in range(n_markers)],
                "sigma": [_row(info["sigma"][j, m])
                          for m in range(n_markers)],
                "n_views": info["n_views"][j].tolist()}
               for j in range(pts.shape[0])]
    text = json.dumps(records)
    if args.out:
        Path(args.out).write_text(text)
        print(f"{pts.shape[0]} frames x {n_markers} markers -> {args.out}")
    else:
        print(text)
    seen = info["n_views"] >= 2
    if seen.any():
        print(f"mean reprojection rms {np.nanmean(info['rms'][seen]):.3f}"
              f" px over {int(seen.sum())} reconstructed markers",
              file=sys.stderr)
    return 0


def _add_monitor(sub):
    p = sub.add_parser(
        "monitor",
        help="rig health check against fresh detections (leave-one-out "
             "drift localization), optional extrinsic-only refresh")
    p.add_argument("folder",
                   help="folder with one image subfolder per camera, OR "
                        "one video file per camera (frames are extracted "
                        "and cached automatically)")
    p.add_argument("--video-stride", type=int, default=1, metavar="N",
                   help="when the folder holds videos: keep every N-th "
                        "frame (default 1 = all)")
    p.add_argument("--camset", required=True,
                   help="calibrated rig (.camset file)")
    _add_target_args(p)
    p.add_argument("--refresh", nargs="*", default=None, metavar="CAM",
                   help="re-solve these cameras' extrinsics with all lens "
                        "models pinned ('auto' = the drifted cameras from "
                        "the health check); unlisted cameras anchor the "
                        "world frame")
    p.add_argument("--refresh-lens", nargs="*", default=None, metavar="CAM",
                   help="re-solve these cameras' intrinsics + distortion "
                        "with every placement pinned ('auto' = the drifted "
                        "cameras) — the refocus repair")
    p.add_argument("--save", default=None, metavar="FILE",
                   help="write the refreshed rig here (default: "
                        "refreshed_cameras.camset next to --camset)")
    p.add_argument("--out", default=None,
                   help="write the health report as JSON (default: print)")
    p.add_argument("--drift-ratio", type=float, default=2.0)
    p.add_argument("--drift-abs-px", type=float, default=0.5)
    p.add_argument("--no-cache", action="store_true",
                   help="skip the detection pickle cache")


def cmd_monitor(args) -> int:
    import json
    from pathlib import Path

    import numpy as np

    from pycamset_tpu.calibration.camera_calibrator import (
        detect_datapoints_in_imfile)
    from pycamset_tpu.calibration.monitor import (recalibrate_extrinsics,
                                                  recalibrate_intrinsics,
                                                  rig_health)
    from pycamset_tpu.utils.saving import load_CameraSet

    cams = load_CameraSet(args.camset)
    target = _make_target(args)
    detection, _ = detect_datapoints_in_imfile(
        f_loc=_resolve_folder(args), calibration_target=target,
        caching=not args.no_cache)
    rep = rig_health(cams, detection, target,
                     drift_ratio=args.drift_ratio,
                     drift_abs_px=args.drift_abs_px)
    record = {
        "overall_rms_px": rep["overall_rms_px"],
        "per_camera_rms_px": rep["per_camera_rms_px"],
        "per_image_rms_px": rep["per_image_rms_px"],
        "leave_one_out_rms_px": rep["leave_one_out_rms_px"],
        "drifted": rep["drifted"],
        "thresholds": rep["thresholds"],
    }
    refreshed = None
    if args.refresh is not None and args.refresh_lens is not None:
        print("--refresh and --refresh-lens are mutually exclusive")
        return 2
    req = args.refresh if args.refresh is not None else args.refresh_lens
    if req is not None:
        refresh = rep["drifted"] if req == ["auto"] else req
        if not refresh:
            print("health check found no drifted cameras; nothing to "
                  "refresh", file=sys.stderr)
        else:
            fn = (recalibrate_extrinsics if args.refresh is not None
                  else recalibrate_intrinsics)
            refreshed, rrep = fn(cams, detection, target, refresh=refresh)
            record["refresh"] = rrep
    def _json_safe(v):
        if isinstance(v, dict):
            return {k: _json_safe(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [_json_safe(x) for x in v]
        if isinstance(v, float) and not np.isfinite(v):
            return None  # NaN/inf (e.g. an unscorable camera) -> null
        return v

    text = json.dumps(_json_safe(record), indent=1)
    if args.out:
        Path(args.out).write_text(text)
        print(f"health report -> {args.out}")
    else:
        print(text)
    if rep["drifted"]:
        print(f"DRIFT: {rep['drifted']} (leave-one-out rms "
              f"{ {n: round(rep['leave_one_out_rms_px'][n], 2) for n in rep['drifted']} } px)",
              file=sys.stderr)
    if refreshed is not None:
        save = Path(args.save) if args.save else (
            Path(args.camset).parent / "refreshed_cameras.camset")
        refreshed.save(save)
        print(f"refreshed rig -> {save}", file=sys.stderr)
    return 0


def _add_convert(sub):
    p = sub.add_parser(
        "convert",
        help="refit every camera's distortion model with another family "
             "(reports the conversion residual honestly)")
    p.add_argument("camset", help="path to a .camset file")
    p.add_argument("--to", required=True,
                   choices=["standard", "rational", "thin_prism", "tilted",
                            "fisheye"])
    p.add_argument("--out", default=None,
                   help="output .camset (default: <camset>_<to>.camset)")
    p.add_argument("--grid", type=int, default=40)


def cmd_convert(args) -> int:
    from pathlib import Path

    from pycamset_tpu.calibration.convert import convert_camera_set
    from pycamset_tpu.utils.saving import load_CameraSet

    cams = load_CameraSet(args.camset)
    new, reports = convert_camera_set(cams, to=args.to, grid=args.grid)
    out = Path(args.out) if args.out else Path(args.camset).with_name(
        Path(args.camset).stem + f"_{args.to}.camset")
    new.save(out)
    worst = max(reports.values(), key=lambda r: r["rms_px"])
    for name, rep in reports.items():
        print(f"  {name}: {rep['from']} -> {args.to}, conversion rms "
              f"{rep['rms_px']:.4f} px (max {rep['max_px']:.3f})")
    print(f"converted {len(reports)} cameras -> {out}")
    if worst["rms_px"] > 0.5:
        print(f"WARNING: worst conversion rms {worst['rms_px']:.2f} px — "
              f"the {args.to} family cannot fully express this rig's "
              "lenses", file=sys.stderr)
    return 0


def _add_report(sub):
    p = sub.add_parser(
        "report", help="write a standalone HTML calibration report")
    p.add_argument("camset", help="path to a .camset file")
    p.add_argument("--out", default=None,
                   help="output HTML path (default: <camset>.html)")
    p.add_argument("--title", default=None)
    p.add_argument("--no-uncertainty", action="store_true",
                   help="skip the parameter-sigma section")


def cmd_report(args) -> int:
    from pathlib import Path

    from pycamset_tpu.utils.report import write_calibration_report
    from pycamset_tpu.utils.saving import load_CameraSet

    cams = load_CameraSet(args.camset)
    out = Path(args.out) if args.out else \
        Path(args.camset).with_suffix(".html")
    write_calibration_report(cams, out, title=args.title,
                             uncertainty=not args.no_uncertainty)
    print(f"calibration report -> {out}")
    return 0


def _add_fleet(sub):
    p = sub.add_parser(
        "fleet",
        help="calibrate MANY same-structure rigs in one batched device "
             "solve (one folder per rig, usual image layout inside)")
    p.add_argument("folders", nargs="+",
                   help="rig folders (one image subfolder OR one video "
                        "file per camera each; every rig images the same "
                        "target)")
    _add_target_args(p)
    p.add_argument("--video-stride", type=int, default=1, metavar="N",
                   help="when a rig folder holds videos: keep every N-th "
                        "frame (default 1 = all)")
    p.add_argument("--no-save", action="store_true")
    p.add_argument("--outliers", choices=["ask", "y", "n"], default="n")
    p.add_argument("--loss", choices=["linear", "huber", "soft_l1",
                                      "cauchy"], default="linear")
    p.add_argument("--camera-model",
                   choices=["standard", "rational", "thin_prism",
                            "tilted", "fisheye"],
                   default="standard",
                   help="one explicit model for the whole fleet ('auto' "
                        "needs calibrate on a representative rig first)")
    p.add_argument("--f-scale", type=float, default=1.0)
    p.add_argument("--max-nfev", type=int, default=100)
    p.add_argument("--shared-intrinsics", action="store_true",
                   help="tie every camera of each rig to ONE lens model")
    p.add_argument("--lens-groups", nargs="+", default=None, metavar="LABEL",
                   help="per-camera lens labels (same layout every rig)")


def cmd_fleet(args) -> int:
    from pathlib import Path

    import numpy as np

    from pycamset_tpu.calibration.camera_calibrator import calibrate_fleet
    from pycamset_tpu.utils.video import expand_videos

    opts = {"outliers": args.outliers, "loss": args.loss,
            "f_scale": args.f_scale, "max_nfev": args.max_nfev,
            "camera_model": args.camera_model}
    if args.lens_groups:
        opts["shared_intrinsics"] = args.lens_groups
    elif args.shared_intrinsics:
        opts["shared_intrinsics"] = True

    # per-camera video files expand to the image-folder layout, like
    # every other folder-scanning command
    folders = [expand_videos(Path(f), stride=args.video_stride,
                             caching=not args.no_save)
               for f in args.folders]
    camsets = calibrate_fleet(
        folders, _make_target(args), save=not args.no_save,
        problem_options=opts)
    for f_loc, cams in zip(args.folders, camsets):
        err = np.mean(np.linalg.norm(
            np.reshape(cams.calibration_result, (-1, 2)), axis=1))
        print(f"{f_loc}: {cams.get_n_cams()} cameras, "
              f"mean reprojection error {err:.3f} px")
    return 0


def _add_render(sub):
    p = sub.add_parser(
        "render",
        help="render a synthetic calibration capture for a rig: images "
             "in the calibrate folder layout, plus the true target poses")
    p.add_argument("camset", help="generating rig (.camset file)")
    _add_target_args(p)
    p.add_argument("-o", "--out", required=True, help="output folder")
    p.add_argument("--n-ims", type=int, default=12,
                   help="target presentations to sample (ignored with "
                        "--poses)")
    p.add_argument("--poses", default=None,
                   help="JSON file of [rvec|tvec] 6-vectors to render "
                        "instead of sampling poses around the workspace")
    p.add_argument("--noise-grey", type=float, default=0.0,
                   help="additive Gaussian sensor noise (grey levels)")
    p.add_argument("--blur", type=float, default=0.0,
                   help="Gaussian defocus blur sigma (px)")
    p.add_argument("--square-px", type=int, default=60,
                   help="texture resolution (px per target square)")
    p.add_argument("--min-cams", type=int, default=2,
                   help="cameras that must see each sampled presentation")
    p.add_argument("--seed", type=int, default=0)


def cmd_render(args) -> int:
    import json
    from pathlib import Path

    import numpy as np

    from pycamset_tpu.utils.render import render_target_views
    from pycamset_tpu.utils.saving import load_CameraSet

    if args.target == "grid":
        raise SystemExit(
            "render supports charuco and ccube targets (ArucoGrid boards "
            "need a detection margin that would shift the target origin)")
    cams = load_CameraSet(args.camset)
    target = _make_target(args)
    if args.poses:
        poses = np.asarray(json.loads(Path(args.poses).read_text()),
                           dtype=float).reshape(-1, 6)
    else:
        from pycamset_tpu.calibration.plan import synthesize_detections
        _, poses = synthesize_detections(
            cams, target.point_data, args.n_ims, seed=args.seed,
            min_cams=args.min_cams)
    out = Path(args.out)
    render_target_views(cams, target, poses, out_dir=out,
                        square_px=args.square_px, blur_sigma=args.blur,
                        noise=args.noise_grey, seed=args.seed)
    (out / "true_poses.json").write_text(
        json.dumps(np.asarray(poses).tolist(), indent=1))
    print(f"rendered {len(poses)} views x {len(cams.get_names())} "
          f"cameras -> {out}")
    print(f"true poses -> {out / 'true_poses.json'}")
    return 0


def _add_plan(sub):
    p = sub.add_parser(
        "plan",
        help="predict a PROPOSED rig's achievable accuracy before "
             "building it (synthetic capture -> real BA -> uncertainty)")
    p.add_argument("camset", help="proposed rig layout (.camset file)")
    _add_target_args(p)
    p.add_argument("--n-ims", type=int, default=30,
                   help="planned number of target presentations")
    p.add_argument("--noise", type=float, default=0.3,
                   help="expected detector corner noise (px, 1-sigma)")
    p.add_argument("--min-cams", type=int, default=2,
                   help="cameras that must see each presentation")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None,
                   help="also write the report as JSON")


def cmd_plan(args) -> int:
    import json
    from pathlib import Path

    from pycamset_tpu.calibration.plan import (format_plan_report,
                                               plan_calibration)
    from pycamset_tpu.utils.saving import load_CameraSet

    cams = load_CameraSet(args.camset)
    target = _make_target(args)
    rep = plan_calibration(cams, target.point_data, n_ims=args.n_ims,
                           noise_px=args.noise, seed=args.seed,
                           min_cams=args.min_cams)
    print(format_plan_report(rep))
    if args.out:
        Path(args.out).write_text(json.dumps(rep, indent=1))
        print(f"plan report -> {args.out}")
    return 0


def _add_export(sub):
    p = sub.add_parser(
        "export",
        help="export a calibrated rig for external pipelines "
             "(COLMAP sparse model, NeRF transforms.json, OpenCV YAML)")
    p.add_argument("camset", help="path to a .camset file")
    p.add_argument("--format", required=True,
                   choices=["colmap", "nerf", "opencv"])
    p.add_argument("--out", default=None,
                   help="output path (colmap: directory; nerf: "
                        "transforms.json; opencv: .yaml). Defaults next to "
                        "the .camset")


def cmd_export(args) -> int:
    from pathlib import Path

    from pycamset_tpu.utils import interop
    from pycamset_tpu.utils.saving import load_CameraSet

    cams = load_CameraSet(args.camset)
    src = Path(args.camset)
    if args.format == "colmap":
        out = Path(args.out) if args.out else src.with_name(
            src.stem + "_colmap")
        interop.export_colmap(cams, out)
    elif args.format == "nerf":
        out = Path(args.out) if args.out else src.with_name(
            "transforms.json")
        interop.export_nerf(cams, out)
    else:
        out = Path(args.out) if args.out else src.with_suffix(".yaml")
        interop.export_opencv_yaml(cams, out)
    print(f"exported {len(cams)} cameras ({args.format}) -> {out}")
    return 0


def _add_import(sub):
    p = sub.add_parser(
        "import",
        help="build a .camset from an external rig description "
             "(COLMAP text model directory or OpenCV YAML)")
    p.add_argument("source", help="COLMAP model dir or OpenCV .yaml file")
    p.add_argument("--out", default=None,
                   help="output .camset path (default: <source>.camset)")


def cmd_import(args) -> int:
    from pathlib import Path

    from pycamset_tpu.utils import interop

    src = Path(args.source)
    if src.is_dir():
        cams = interop.import_colmap(src)
    else:
        cams = interop.import_opencv_yaml(src)
    out = Path(args.out) if args.out else src.with_suffix(".camset")
    cams.save(out)
    print(f"imported {len(cams)} cameras -> {out}")
    return 0


def _add_info(sub):
    p = sub.add_parser("info", help="summarise a .camset file")
    p.add_argument("--uncertainty", action="store_true",
                   help="compute per-parameter standard errors "
                        "(needs the calibration history)")
    p.add_argument("camset", help="path to a .camset file")


def _add_rectify(sub):
    p = sub.add_parser(
        "rectify",
        help="export row-aligned rectified stereo pairs + the Q "
             "reprojection matrix for external stereo/MVS tools")
    p.add_argument("camset", help="path to a calibrated .camset file")
    p.add_argument("--cams", nargs=2, required=True, metavar=("A", "B"),
                   help="the two camera names forming the stereo pair")
    p.add_argument("--images", nargs=2, default=None, metavar=("IM_A", "IM_B"),
                   help="one image per camera (single-pair mode)")
    p.add_argument("--folder", default=None,
                   help="capture folder (one image subfolder or video per "
                        "camera); frames pair up in natural sort order")
    p.add_argument("--video-stride", type=int, default=1, metavar="N")
    p.add_argument("--out", default="rectified",
                   help="output folder (default ./rectified)")


def cmd_rectify(args) -> int:
    from pathlib import Path

    import cv2
    import numpy as np

    from pycamset_tpu.reconstruction.reconstruction_utils import (
        rectify_camera_images)
    from pycamset_tpu.utils.general_utils import glob_ims, natsorted
    from pycamset_tpu.utils.saving import load_CameraSet
    from pycamset_tpu.utils.video import expand_videos

    cams = load_CameraSet(args.camset)
    missing = [n for n in args.cams if n not in cams.get_names()]
    if missing:
        print(f"unknown cameras {missing}; rig has {cams.get_names()}")
        return 2
    if (args.images is None) == (args.folder is None):
        print("give exactly one of --images (a single pair) or --folder "
              "(a capture folder)")
        return 2
    if args.images is not None:
        pairs = [(Path(args.images[0]), Path(args.images[1]))]
    else:
        f_loc = expand_videos(Path(args.folder), stride=args.video_stride)
        sides = []
        for name in args.cams:
            sub = f_loc / name
            if not sub.is_dir():
                print(f"no image folder for camera {name!r} under {f_loc}")
                return 2
            sides.append(natsorted(glob_ims(sub)))
        if len(sides[0]) != len(sides[1]):
            print(f"frame-count mismatch: {len(sides[0])} vs "
                  f"{len(sides[1])} images")
            return 2
        pairs = list(zip(*sides))
    if not pairs:
        print(f"no images found for cameras {args.cams[0]}/{args.cams[1]}")
        return 2

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    cam_a, cam_b = cams[args.cams[0]], cams[args.cams[1]]
    for i, (pa, pb) in enumerate(pairs):
        ims = []
        for path in (pa, pb):
            im = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
            if im is None:
                print(f"could not read image {path}")
                return 2
            ims.append(im)
        try:
            rect_a, rect_b, q = rectify_camera_images(cam_a, cam_b, *ims)
        except ValueError as err:
            print(f"rectification failed: {err}")
            return 2
        cv2.imwrite(str(out / f"{args.cams[0]}_{i:06d}.png"), rect_a)
        cv2.imwrite(str(out / f"{args.cams[1]}_{i:06d}.png"), rect_b)
        if i == 0:
            # Q maps (u, v, disparity, 1) -> homogeneous XYZ
            # (cv2.reprojectImageTo3D); identical for every frame
            np.savetxt(out / "Q.txt", q)
    print(f"rectified {len(pairs)} pair(s) of "
          f"{args.cams[0]}/{args.cams[1]} -> {out} (Q.txt included)")
    return 0


def _add_undistort(sub):
    p = sub.add_parser(
        "undistort",
        help="write undistorted copies of every image in a capture folder "
             "through the rig's calibrated models (fisheye-aware)")
    p.add_argument("camset", help="path to a calibrated .camset file")
    p.add_argument("folder",
                   help="capture folder: one image subfolder (or one video "
                        "file) per camera, named after the cameras")
    p.add_argument("--out", default=None,
                   help="output folder (default: <folder>_undistorted)")
    p.add_argument("--video-stride", type=int, default=1, metavar="N",
                   help="when the folder holds videos: keep every N-th "
                        "frame (default 1 = all)")


def cmd_undistort(args) -> int:
    from pycamset_tpu.utils.saving import load_CameraSet
    from pycamset_tpu.utils.undistort import undistort_folder

    cams = load_CameraSet(args.camset)
    try:
        out, n = undistort_folder(cams, args.folder, out_dir=args.out,
                                  video_stride=args.video_stride)
    except ValueError as err:
        print(f"undistortion failed: {err}")
        return 2
    print(f"undistorted {n} images from {len(cams)} cameras -> {out}")
    return 0


def _add_doctor(sub):
    p = sub.add_parser(
        "doctor",
        help="self-test the environment and device (versions, config, "
             "blosc codec, aruco detection, a tiny device solve)")
    p.add_argument("--no-device", action="store_true",
                   help="skip the device smoke test (no compile, no "
                        "first-fetch wait on tunnelled TPUs)")
    p.add_argument("--json", dest="json_path", default=None, metavar="PATH",
                   help="also write the report as JSON")


def cmd_doctor(args) -> int:
    from pycamset_tpu.utils.doctor import main as doctor_main
    return doctor_main(device=not args.no_device, json_path=args.json_path)


def _parse_camera_model_arg(spec: str):
    """'standard' -> str; 'cam0=fisheye,cam1=standard' -> per-camera map;
    'fisheye,standard' -> per-camera list (camera folder order)."""
    if "=" in spec:
        return dict(kv.split("=", 1) for kv in spec.split(","))
    if "," in spec:
        return spec.split(",")
    return spec


def cmd_calibrate(args) -> int:
    from pathlib import Path

    import numpy as np

    from pycamset_tpu import calibrate_cameras
    opts = {"outliers": args.outliers, "loss": args.loss,
            "f_scale": args.f_scale, "max_nfev": args.max_nfev,
            "camera_model": _parse_camera_model_arg(args.camera_model),
            "backend": args.backend}
    if args.auto_per_camera or args.auto_candidates:
        if opts["camera_model"] != "auto":
            print("--auto-per-camera / --auto-candidates need "
                  "--camera-model auto")
            return 2
        ms = {}
        if args.auto_per_camera:
            ms["per_camera"] = True
        if args.auto_candidates:
            ms["candidates"] = args.auto_candidates
        opts["model_select"] = ms
    if args.lens_groups:
        opts["shared_intrinsics"] = args.lens_groups
    elif args.shared_intrinsics:
        opts["shared_intrinsics"] = True
    if args.rolling_shutter is not None:
        opts["rolling_shutter"] = args.rolling_shutter

    target = _make_target(args)

    cams = calibrate_cameras(
        f_loc=_resolve_folder(args), calibration_target=target,
        save=not args.no_save, draw=args.draw,
        high_distortion=args.high_distortion, problem_options=opts)

    if args.self_calibrate:
        from pycamset_tpu.calibration.camera_calibrator import (
            detect_datapoints_in_imfile, run_stereo_calibration)
        from pycamset_tpu.optim.handlers import SelfBundleHandler
        det, _ = detect_datapoints_in_imfile(
            f_loc=_resolve_folder(args), calibration_target=target,
            caching=not args.no_save)
        handler = SelfBundleHandler(detection=det, target=target,
                                    camset=cams, options=opts)
        handler.set_from_templated_camset(cams)
        cams = run_stereo_calibration(
            cams, det, target, param_handler=handler, save=not args.no_save,
            save_loc=Path(args.folder) / "self_calibrated_cameras.camset")

    err = np.mean(np.linalg.norm(
        np.reshape(cams.calibration_result, (-1, 2)), axis=1))
    print(f"calibrated {cams.get_n_cams()} cameras; "
          f"mean reprojection error {err:.3f} px")
    handler = cams.calibration_handler
    if hasattr(handler, "get_readouts") and cams.calibration_params is not None:
        ro = handler.get_readouts(cams.calibration_params)
        print("rolling-shutter readouts (frame units, relative to the "
              "reference camera's pin): "
              + ", ".join(f"{k}={v:.3f}" for k, v in ro.items()))
        if not args.no_save:
            # directly consumable by `track --sync` (readout_frames key)
            import json
            out = Path(_resolve_folder(args)) / "rolling_shutter.json"
            out.write_text(json.dumps({
                "cam_names": list(ro.keys()),
                "readout_frames": [ro[k] for k in ro]}, indent=1))
            print(f"readouts -> {out} (use with: track --sync {out.name})")
    return 0


def _make_target(args):
    import cv2
    if args.target == "charuco":
        from pycamset_tpu.models.charuco import ChArUco
        target = ChArUco(args.nx, args.ny, args.square,
                         a_dict=getattr(cv2.aruco, args.adict),
                         legacy=args.legacy)
    elif args.target == "grid":
        from pycamset_tpu.models.grid import ArucoGrid
        target = ArucoGrid(args.nx, args.ny, args.marker_size,
                           args.separation,
                           a_dict=getattr(cv2.aruco, args.adict),
                           first_id=args.first_id)
    else:
        from pycamset_tpu.models.ccube import Ccube
        target = Ccube(n_points=args.n_points, length=args.length,
                       aruco_dict=getattr(cv2.aruco, args.adict),
                       border_fraction=args.border_fraction,
                       legacy=args.legacy)
    if getattr(args, "photometric_refine", False):
        if args.target == "grid":
            raise SystemExit("--photometric-refine models checkerboard "
                             "X-corners; the grid target detects marker "
                             "corners, which it would not improve")
        target.photometric_refine = True
    return target


def cmd_track(args) -> int:
    import json
    from pathlib import Path

    import numpy as np

    from pycamset_tpu.calibration.camera_calibrator import (
        detect_datapoints_in_imfile)
    from pycamset_tpu.tracking import TargetTracker
    from pycamset_tpu.utils.saving import load_CameraSet

    if bool(args.camset) == bool(args.artifact):
        print("track needs exactly one of --camset or --artifact")
        return 2
    target = _make_target(args)
    detection, _ = detect_datapoints_in_imfile(
        f_loc=_resolve_folder(args), calibration_target=target,
        caching=not args.no_cache)
    temporal = {}
    if args.sync:
        sync_rec = json.loads(Path(args.sync).read_text())
        if "offsets_frames" in sync_rec:
            temporal["time_offsets"] = np.asarray(
                sync_rec["offsets_frames"], dtype=float)
        if "readout_frames" in sync_rec:
            temporal["rolling_shutter"] = np.asarray(
                sync_rec["readout_frames"], dtype=float)
        if not temporal:
            print(f"{args.sync} has neither offsets_frames nor "
                  "readout_frames — not a sync-command JSON?")
            return 2
    if args.artifact:
        if temporal:
            print("--sync needs a live --camset tracker (artifacts carry "
                  "their temporal model frozen in)")
            return 2
        from pycamset_tpu.serving import load_tracker_artifact
        tracker = load_tracker_artifact(args.artifact)
    else:
        cams = load_CameraSet(args.camset)
        tracker = TargetTracker(cams, target, loss=args.loss,
                                f_scale=args.f_scale, **temporal)
    if args.stream:
        poses, info = tracker.track_stream(detection)
    else:
        poses, info = tracker.track_batch(detection)
    if args.export_artifact:
        if args.artifact:
            print("--export-artifact needs a live --camset tracker")
            return 2
        from pycamset_tpu.serving import export_tracker
        export_tracker(tracker, args.export_artifact)
        print(f"serving artifact -> {args.export_artifact}")
    vel = info.get("velocity")  # the 12-dof temporal solve reports it
    if args.smooth:
        from pycamset_tpu.smoothing import smooth_pose_trajectory
        poses, vel, sm_sig = smooth_pose_trajectory(
            poses, pose_cov=info["pose_cov"], q_rot=args.q_rot,
            q_trans=args.q_trans, return_velocity=True)
        info = dict(info, pose_sigma=sm_sig)
    # inf sigmas (underdetermined frames) are not valid JSON -> null
    sig = [[float(v) if np.isfinite(v) else None for v in row]
           for row in info["pose_sigma"]]
    records = [{"frame": i, "pose": p.tolist(),
                "rms_px": float(info["rms"][i]),
                "n_detections": int(info["n_used"][i]),
                "pose_sigma": sig[i],
                **({"velocity": vel[i].tolist()} if vel is not None
                   else {})}
               for i, p in enumerate(poses)]
    text = json.dumps(records, indent=1)
    if args.out:
        Path(args.out).write_text(text)
        print(f"tracked {len(poses)} frames -> {args.out} "
              f"(mean rms {float(np.mean(info['rms'])):.3f} px)")
    else:
        print(text)
    return 0


def cmd_reconstruct(args) -> int:
    import cv2
    import numpy as np

    from pycamset_tpu.utils.general_utils import write_colour_ply
    from pycamset_tpu.utils.saving import load_CameraSet

    cams = load_CameraSet(args.camset)
    missing = [n for n in args.cams if n not in cams.get_names()]
    if missing:
        print(f"unknown cameras {missing}; rig has {cams.get_names()}")
        return 2
    if len(args.images) != len(args.cams):
        print("need exactly one --images path per --cams name")
        return 2
    ims = []
    for path in args.images:
        im = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
        if im is None:
            print(f"could not read image {path}")
            return 2
        ims.append(im)
    mode = args.mode or ("stereo" if len(args.cams) == 2 else "sweep")

    if mode in ("fused", "mesh"):
        if len(args.cams) < 3:
            print(f"{mode} mode needs at least 3 cameras")
            return 2
        if args.near is None or args.far is None:
            print(f"{mode} mode needs --near and --far plane depths")
            return 2
        sel = [cams[n] for n in args.cams]
        und = [c.undistort(im) for c, im in zip(sel, ims)]
        gray = [im if im.ndim == 2 else
                cv2.cvtColor(im, cv2.COLOR_BGR2GRAY) for im in und]
        common = dict(near=args.near, far=args.far,
                      n_planes=args.n_planes, window=args.window,
                      top_k=args.top_k, regularize=args.regularize,
                      max_sources=args.max_sources,
                      min_consistent=args.min_consistent,
                      max_px=args.max_px, max_rel=args.max_rel)
        if mode == "mesh":
            from pycamset_tpu.reconstruction.tsdf import dense_mesh
            from pycamset_tpu.utils.general_utils import write_mesh_ply
            out = dense_mesh(sel, gray, voxel=args.voxel, verbose=True,
                             **common)
            write_mesh_ply(args.out, out["verts"], out["faces"])
            print(f"mesh: {len(out['verts'])} vertices, "
                  f"{len(out['faces'])} triangles "
                  f"(voxel {out['voxel']:.4g}) -> {args.out}")
            return 0
        from pycamset_tpu.reconstruction.fusion import dense_reconstruct
        out = dense_reconstruct(sel, gray, verbose=True, **common)
        pts = out["points"]
        cols = np.repeat(np.clip(out["colors"], 0, 255)
                         .astype(np.uint8)[:, None], 3, axis=1)
        write_colour_ply(args.out, pts, cols)
        print(f"fused: {len(pts)} points (>= {args.min_consistent} "
              f"consistent sources) -> {args.out}")
        return 0

    if mode == "stereo":
        if len(args.cams) != 2:
            print("stereo mode needs exactly 2 cameras")
            return 2
        from pycamset_tpu.reconstruction.reconstruction_utils import (
            stereo_reconstruct)
        pts, gray = stereo_reconstruct(
            cams[args.cams[0]], cams[args.cams[1]], ims[0], ims[1],
            num_disp=args.num_disp, mind=args.mind, maxd=args.maxd,
            matcher=args.matcher, return_scalars=True)
        cols = np.repeat(np.clip(gray, 0, 255).astype(np.uint8)[:, None],
                         3, axis=1)
    else:
        if len(args.cams) < 2:
            print("sweep mode needs a reference camera + >=1 source")
            return 2
        if args.near is None or args.far is None:
            print("sweep mode needs --near and --far plane depths")
            return 2
        from pycamset_tpu.reconstruction.plane_sweep import (
            depth_to_cloud, plane_sweep_depth)
        sel = [cams[n] for n in args.cams]
        und = [c.undistort(im) for c, im in zip(sel, ims)]
        gray = [im if im.ndim == 2 else
                cv2.cvtColor(im, cv2.COLOR_BGR2GRAY) for im in und]
        depth, _ = plane_sweep_depth(
            sel[0], sel[1:], gray[0], gray[1:], near=args.near,
            far=args.far, n_planes=args.n_planes, window=args.window,
            top_k=args.top_k, regularize=args.regularize)
        pts, shade = depth_to_cloud(sel[0], depth,
                                    colors=gray[0].astype(float))
        cols = np.repeat(np.clip(shade, 0, 255).astype(np.uint8)[:, None],
                         3, axis=1)
        n_valid = int(np.isfinite(depth).sum())
        print(f"sweep depth: {n_valid}/{depth.size} pixels valid")

    write_colour_ply(args.out, pts, cols)
    print(f"{mode}: {len(pts)} points -> {args.out}")
    return 0


def cmd_info(args) -> int:
    import numpy as np

    from pycamset_tpu.utils.saving import load_CameraSet
    cams = load_CameraSet(args.camset)
    print(f"{args.camset}: {cams.get_n_cams()} cameras")
    for name in cams.get_names():
        cam = cams[name]
        k = cam.intrinsic
        d = np.reshape(cam.distortion_coefs, -1)
        print(f"  {name}: res={list(cam.res)} fx={k[0, 0]:.2f} fy={k[1, 1]:.2f} "
              f"c=({k[0, 2]:.1f},{k[1, 2]:.1f}) "
              f"dist=[{', '.join(f'{v:.4f}' for v in d)}] "
              f"pos={np.round(cam.position, 4).tolist()}")
    if cams.calibration_result is not None:
        err = np.mean(np.linalg.norm(
            np.reshape(cams.calibration_result, (-1, 2)), axis=1))
        print(f"  calibration history: mean reprojection error {err:.3f} px")
    if getattr(args, "uncertainty", False):
        if cams.calibration_handler is None:
            print("  no calibration history: cannot compute uncertainty")
            return 1
        unc = cams.calibration_uncertainty()
        print(f"  residual sigma: {np.sqrt(unc['sigma2']):.4f} px "
              f"({unc['dof']} dof)")
        for name in cams.get_names():
            si = unc["cameras"][name]["int_sigma"]
            se = unc["cameras"][name]["ext_sigma"]
            print(f"  {name}: sigma fx={si[0]:.3f} fy={si[2]:.3f} "
                  f"c=({si[1]:.3f},{si[3]:.3f}) px; "
                  f"rot={np.max(se[:3]) * 1e3:.3f} mrad "
                  f"t={np.max(se[3:]) * 1e3:.3f} mm (max)")
        if "point_sigma" in unc:  # self-cal free geometry (Schur at scale)
            ps = np.linalg.norm(unc["point_sigma"], axis=1)
            free = ps[ps > 0]
            if free.size:
                print(f"  points: sigma median={np.median(free) * 1e3:.4f} "
                      f"p90={np.percentile(free, 90) * 1e3:.4f} "
                      f"max={free.max() * 1e3:.4f} mm "
                      f"({free.size} free of {ps.size})")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="pycamset_tpu",
        description="TPU-native multi-camera calibration")
    sub = parser.add_subparsers(dest="cmd", required=True)
    _add_calibrate(sub)
    _add_track(sub)
    _add_reconstruct(sub)
    _add_handeye(sub)
    _add_sync(sub)
    _add_wand(sub)
    _add_markers(sub)
    _add_monitor(sub)
    _add_convert(sub)
    _add_report(sub)
    _add_plan(sub)
    _add_fleet(sub)
    _add_render(sub)
    _add_export(sub)
    _add_import(sub)
    _add_info(sub)
    _add_rectify(sub)
    _add_undistort(sub)
    _add_doctor(sub)
    args = parser.parse_args(argv)
    if args.cmd == "calibrate":
        return cmd_calibrate(args)
    if args.cmd == "track":
        return cmd_track(args)
    if args.cmd == "reconstruct":
        return cmd_reconstruct(args)
    if args.cmd == "handeye":
        return cmd_handeye(args)
    if args.cmd == "sync":
        return cmd_sync(args)
    if args.cmd == "wand":
        return cmd_wand(args)
    if args.cmd == "markers":
        return cmd_markers(args)
    if args.cmd == "monitor":
        return cmd_monitor(args)
    if args.cmd == "convert":
        return cmd_convert(args)
    if args.cmd == "report":
        return cmd_report(args)
    if args.cmd == "plan":
        return cmd_plan(args)
    if args.cmd == "fleet":
        return cmd_fleet(args)
    if args.cmd == "render":
        return cmd_render(args)
    if args.cmd == "export":
        return cmd_export(args)
    if args.cmd == "import":
        return cmd_import(args)
    if args.cmd == "info":
        return cmd_info(args)
    if args.cmd == "rectify":
        return cmd_rectify(args)
    if args.cmd == "undistort":
        return cmd_undistort(args)
    if args.cmd == "doctor":
        return cmd_doctor(args)
    return 1


if __name__ == "__main__":
    sys.exit(main())
