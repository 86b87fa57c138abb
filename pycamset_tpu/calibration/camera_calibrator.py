"""The calibration pipeline: detection -> seeding -> bundle adjustment.

Capability parity target (reference, behaviour only):
pyCamSet/calibration/camera_calibrator.py — calibrate_cameras (detection with
pickle caching, validation, per-camera initial calibration with an optional
high-distortion second pass, stereo/bundle calibration, saving),
detect_datapoints_in_imfile, run_initial_calibration, run_stereo_calibration,
validate_detections, outlier_rejection, sanitise_input_images.
"""
from __future__ import annotations

import inspect
import logging
from pathlib import Path

import cv2
import numpy as np

from pycamset_tpu.models.abstract_target import AbstractTarget
from pycamset_tpu.models.camera_set import CameraSet
from pycamset_tpu.models.detections import TargetDetection
from pycamset_tpu.optim.driver import run_bundle_adjustment
from pycamset_tpu.optim.handlers import TemplateBundleHandler
from pycamset_tpu.utils.general_utils import (
    get_subfolder_names, glob_ims, mad_outlier_detection)
from pycamset_tpu.utils.saving import load_CameraSet, load_pickle, save_pickle

try:
    from tqdm import tqdm
except ImportError:  # tqdm ships in this environment; degrade to identity
    def tqdm(seq, **_kw):
        return seq

logging.basicConfig(level=logging.INFO)

# an image can only seed a shared pose if every camera saw at least this
# many target features in it
MIN_SHARED_POSE_FEATURES = 6
# validate_detections warning thresholds, in percent
DETECTION_RATE_WARN_PCT = 90.0
BOARD_COMPLETENESS_WARN_PCT = 50.0


def _detector_fingerprint(calibration_target, n_lim, f_loc=None,
                          camset=None) -> str:
    """A stable key for everything that changes WHAT gets detected: the
    target's constructor args, detector-affecting flags, the image limit,
    the image files themselves (path/size/mtime — added or replaced
    images must re-detect), and the seeding camset of undistorting
    detection passes. Objects without a stable repr reduce to their type
    name (an address-bearing repr would bust the cache on every run)."""
    import os

    def safe(v):
        if isinstance(v, (int, float, str, bool, type(None))):
            return v
        if isinstance(v, (list, tuple)):
            return [safe(x) for x in v]
        return type(v).__name__

    args = getattr(calibration_target, "input_args", None) or {}
    # every detector-affecting flag the target declares (AbstractTarget.
    # DETECTOR_FLAGS) — enumerating by name here would silently miss new
    # flags added on the target side
    flags = tuple(
        (f, bool(getattr(calibration_target, f, False)))
        for f in getattr(calibration_target, "DETECTOR_FLAGS",
                         ("photometric_refine",)))
    ims = ()
    if f_loc is not None:
        # enumerate per camera subfolder, mirroring the detection scan
        # itself (a recursive glob misses symlinked camera folders), and
        # relpath via os.path (resolved paths may escape f_loc when the
        # images are symlinks — relative_to would raise)
        base = Path(f_loc)
        folders = get_subfolder_names(base, return_full_path=True) or [base]
        entries = []
        for folder in folders:
            for p in glob_ims(folder):
                st = p.stat()
                entries.append((os.path.relpath(p, base), st.st_size,
                                st.st_mtime_ns))
        ims = tuple(sorted(entries))
    cams_key = None
    if camset is not None:
        cams_key = [(n,
                     np.round(np.asarray(camset[n].intrinsic, dtype=float),
                              9).tolist(),
                     np.round(np.ravel(np.asarray(
                         camset[n].distortion_coefs, dtype=float)),
                         9).tolist())
                    for n in camset.get_names()]
    return repr((type(calibration_target).__name__,
                 sorted((k, safe(v)) for k, v in args.items()),
                 flags, n_lim, ims, cams_key))


def _cache_tail(camera_model) -> str:
    """Per-camera-model .camset cache suffix.

    A cached 5-coefficient seed is also a valid (zero k4..k6) rational seed,
    so without a model-specific name it would silently shadow the real one.
    Per-camera model maps/lists hash their sorted contents.
    """
    if not isinstance(camera_model, str):
        import hashlib
        if isinstance(camera_model, dict):
            key = sorted((str(k), str(v)) for k, v in camera_model.items())
        else:
            key = [str(m) for m in camera_model]
        h = hashlib.sha1(repr(key).encode()).hexdigest()[:8]
        return f"_mixed_{h}.camset"
    return (".camset" if camera_model == "standard"
            else f"_{camera_model}.camset")


def calibrate_cameras(
        f_loc: Path | str,
        calibration_target: AbstractTarget,
        save: bool = True,
        save_loc: Path | None = None,
        draw: bool = False,
        n_lim: int | None = None,
        fixed_params: dict | None = None,
        high_distortion: bool = False,
        threads: int | None = None,
        problem_options: dict | None = None,
        initial_cams: CameraSet | None = None,
) -> CameraSet:
    """Coordinate the full calibration: detection to final CameraSet.

    :param f_loc: folder containing one image subfolder per camera.
    :param calibration_target: the calibration target to detect.
    :param save: cache detections and save initial/optimised camsets.
    :param save_loc: where the camsets are saved (defaults to f_loc).
    :param draw: draw detections as they complete.
    :param n_lim: limit on the number of images per camera.
    :param fixed_params: {cam_name: {'int'|'ext'|'dst': value}} fixed params.
    :param high_distortion: run an iterative second detection pass using the
        initial camera models (for heavily distorting lenses).
    :param threads: unused on the TPU path (kept for API parity; the detection
        axis is device-parallel instead of thread-parallel).
    :param problem_options: options dict merged over the handler defaults.
    :param initial_cams: skip initial calibration and use these cameras.
    """
    root = Path(f_loc)
    out_dir = root if save_loc is None else save_loc
    camera_model = (problem_options or {}).get("camera_model", "standard")

    detections, camera_res = detect_datapoints_in_imfile(f_loc=root,
        caching=save, calibration_target=calibration_target, draw=draw,
        n_lim=n_lim)
    validate_detections(detections, calibration_target)

    if camera_model == "auto":
        # cross-validated model selection: train each candidate on a split
        # of the images, score pose-only solves on the holdout, prefer
        # fewer parameters at equal holdout error (model_select.py)
        from pycamset_tpu.calibration.model_select import (
            _family_seed, select_camera_model)
        select_kw = (problem_options or {}).get("model_select", {})
        ba_opts = {k: v for k, v in (problem_options or {}).items()
                   if k not in ("camera_model", "model_select")}
        camera_model, _scores = select_camera_model(
            detections, calibration_target, initial_cams=initial_cams,
            cam_res=camera_res, fixed_params=fixed_params,
            problem_options=ba_opts, **select_kw)
        problem_options = {**(problem_options or {}),
                           "camera_model": camera_model}
        if initial_cams is not None:
            # caller-passed seeds whose projection family differs from the
            # winner would otherwise be reinterpreted coefficient-by-
            # coefficient (Brown k3 is not Kannala-Brandt k3); apply the
            # same family-width correction the selection scored with
            initial_cams = _family_seed(initial_cams, camera_model)
    tail = _cache_tail(camera_model)

    if initial_cams is not None:
        logging.info("Seeding the bundle adjustment from the cameras "
                     "passed by the caller.")
    else:
        initial_cams = run_initial_calibration(detections,
            calibration_target, camera_res, save=save,
            save_loc=out_dir / f"initial_cameras{tail}",
            fixed_params=fixed_params, camera_model=camera_model)
        if high_distortion:
            # second detection pass: the seed cameras undistort each image
            # before detection, recovering corners a raw pass misses
            detections, _ = detect_datapoints_in_imfile(f_loc=root,
                calibration_target=calibration_target, draw=draw,
                n_lim=n_lim, camset=initial_cams)
            initial_cams = run_initial_calibration(detections,
                calibration_target, camera_res, save=save,
                save_loc=out_dir / f"initial_cameras_high_distortion{tail}",
                camera_model=camera_model)
            initial_cams.draw_camera_distortions()

    initial_cams.set_resolutions_from_file(floc=root)
    return run_stereo_calibration(
        initial_cams, detections, calibration_target, save=save,
        save_loc=out_dir / f"optimised_cameras{tail}",
        fixed_params=fixed_params, threads=threads,
        problem_options=problem_options)


def calibrate_fleet(
        f_locs,
        calibration_target: AbstractTarget,
        save: bool = True,
        n_lim: int | None = None,
        fixed_params=None,
        problem_options: dict | None = None,
        mesh=None,
) -> list[CameraSet]:
    """Calibrate MANY same-structure rigs in one batched device solve.

    The fleet counterpart of `calibrate_cameras` (beyond the reference,
    which calibrates one rig per call): each ``f_loc`` is a rig folder in
    the usual layout (one image subfolder per camera), every rig imaging
    the same ``calibration_target`` with the same camera count. Detection,
    validation and per-camera seeding run per rig on the host; the joint
    bundle adjustments then batch into ONE vmapped structured LM
    (`optim/fleet.py::run_fleet_bundle_adjustment`).

    :param f_locs: list of rig folders.
    :param save: cache detections and save initial/optimised camsets into
        each rig folder (same filenames as `calibrate_cameras`).
    :param fixed_params: one dict applied to every rig, or a per-rig list.
    :param problem_options: shared handler options (`camera_model="auto"`
        is not supported here — the fleet shares one compiled chain).
    :param mesh: optional 1-D `jax.sharding.Mesh` — shards the RIG axis
        over its devices.
    :return: list of calibrated CameraSets, in ``f_locs`` order.
    """
    from pycamset_tpu.optim.fleet import run_fleet_bundle_adjustment

    camera_model = (problem_options or {}).get("camera_model", "standard")
    if camera_model == "auto":
        raise ValueError(
            "calibrate_fleet shares one compiled chain across the fleet; "
            "pick an explicit camera_model (run calibrate_cameras with "
            "'auto' on one representative rig first)")
    tail = _cache_tail(camera_model)

    handlers = []
    for r, f_loc in enumerate(f_locs):
        root = Path(f_loc)
        detections, camera_res = detect_datapoints_in_imfile(
            f_loc=root, caching=save,
            calibration_target=calibration_target, n_lim=n_lim)
        validate_detections(detections, calibration_target)
        fp = (fixed_params[r] if isinstance(fixed_params, (list, tuple))
              else fixed_params)
        initial = run_initial_calibration(
            detections, calibration_target, camera_res, save=save,
            save_loc=root / f"initial_cameras{tail}", fixed_params=fp,
            camera_model=camera_model)
        initial.set_resolutions_from_file(floc=root)
        handlers.append(TemplateBundleHandler(
            camset=initial, detection=detections,
            target=calibration_target, fixed_params=fp,
            options=problem_options))

    logging.info(f"Starting the fleet bundle adjustment "
                 f"({len(handlers)} rigs)")
    _results, camsets = run_fleet_bundle_adjustment(handlers, mesh=mesh)
    if save:
        for f_loc, cams in zip(f_locs, camsets):
            cams.save(Path(f_loc) / f"optimised_cameras{tail}")
    return camsets


def _pick_shared_pose_image(detection: TargetDetection) -> int:
    """The image index every camera can seed a pose from.

    Chooses the image maximising the total corner count, restricted to
    images where each camera found at least MIN_SHARED_POSE_FEATURES.
    """
    per_im_counts = detection.features_per_im_per_cam()
    usable = np.all(per_im_counts >= MIN_SHARED_POSE_FEATURES, axis=1)
    return int(np.argmax(per_im_counts.sum(axis=1) * usable))


def run_initial_calibration(detection: TargetDetection,
                            calibration_target: AbstractTarget,
                            cam_res: list, save: bool = True,
                            save_loc: Path = Path("initial_estimate.camset"),
                            ref_cam=0,
                            fixed_params: dict | None = None,
                            camera_model="standard") -> CameraSet:
    """Per-camera initial calibration via the target's calibration method
    (cv2.calibrateCamera by default), with .camset caching.

    ``camera_model`` may be one model name, or a per-camera ``{name:
    model}`` map / list (heterogeneous rigs): each camera is then seeded
    with its OWN family (cv2.fisheye.calibrate vs cv2.calibrateCamera)."""
    if save and save_loc.exists():
        logging.info(f"Reusing the cached initial calibration at {save_loc}")
        return load_CameraSet(save_loc)

    if isinstance(camera_model, str):
        model_of = {str(n): camera_model for n in detection.cam_names}
    elif isinstance(camera_model, dict):
        model_of = {str(k): v for k, v in camera_model.items()}
    else:
        model_of = {str(n): m
                    for n, m in zip(detection.cam_names, camera_model)}

    pose_im = _pick_shared_pose_image(detection)
    logging.info("Seeding each camera with the target's own "
                 "initial-calibration method")

    # custom targets may override initial_calibration without the
    # camera_model kwarg; only forward it when the override accepts it
    seed_fn = calibration_target.initial_calibration
    takes_model = "camera_model" in inspect.signature(seed_fn).parameters
    if not takes_model and any(m != "standard" for m in model_of.values()):
        logging.warning(
            f"Target {type(calibration_target).__name__}.initial_calibration "
            f"does not accept camera_model; seeding with its "
            "default model (extra coefficients start at zero).")

    seeded = {
        name: seed_fn(cam_name=name, detection=per_cam, res=res,
                      pose_im=pose_im, fixed_params=fixed_params,
                      **({"camera_model": model_of[str(name)]}
                         if takes_model else {}))
        for name, per_cam, res in zip(
            detection.cam_names, detection.get_cam_list(), cam_res)
    }
    cams = CameraSet(camera_dict=seeded)
    if save:
        cams.save(save_loc)
    return cams


def run_stereo_calibration(
        cams: CameraSet, detections: TargetDetection, target: AbstractTarget,
        param_handler=None, save: bool = True, save_loc: Path | None = None,
        fixed_params: dict | None = None, floc: Path | None = None,
        threads: int = 1, problem_options: dict | None = None) -> CameraSet:
    """The full multiview calibration: a target-pose bundle adjustment."""
    logging.info("Starting the joint multiview bundle adjustment")
    if param_handler is None:
        handler_cls = TemplateBundleHandler
        if (problem_options or {}).get("rolling_shutter"):
            from pycamset_tpu.optim.handlers import RSTemplateBundleHandler
            handler_cls = RSTemplateBundleHandler
        param_handler = handler_cls(camset=cams,
            detection=detections, target=target,
            fixed_params=fixed_params, options=problem_options)

    _opt_result, solved_cams = run_bundle_adjustment(
        param_handler=param_handler, threads=threads,
        backend=param_handler.problem_opts.get("backend", "auto"))
    param_handler.camset = solved_cams

    if save:
        if floc is not None:
            solved_cams.set_resolutions_from_file(floc)
        solved_cams.save(save_loc if save_loc is not None
                         else Path("optimised_cameras.camset"))
    return solved_cams


def detect_datapoints_in_imfile(
        f_loc: Path, calibration_target: AbstractTarget, caching: bool = True,
        cache_name: str = "detected_datapoints.pickle", draw: bool = False,
        n_lim: int | None = None, camset: CameraSet | None = None,
        subfolder_string: str | None = None
) -> tuple[TargetDetection, list[tuple]]:
    """Detect the target in every camera subfolder, with pickle caching."""
    if camset is not None:
        # undistorting detections get their own cache file
        cache_name = cache_name.split(".")[0] + "_with_calib.pickle"
    cache_path = f_loc / cache_name
    fingerprint = None
    if caching:  # a non-caching call never pays the directory walk
        fingerprint = _detector_fingerprint(calibration_target, n_lim,
                                            f_loc=f_loc, camset=camset)
        if cache_path.exists():
            cached = load_pickle(cache_path)
            if len(cached) == 3 and cached[2] == fingerprint:
                logging.info(
                    f"Reusing cached detections from {cache_path}")
                return cached[0], cached[1]
            # a stale cache would silently ignore a changed target
            # geometry, new images, or a detector option
            logging.info(
                f"Cached detections at {cache_path} were made with a "
                "different target/detector/image configuration; "
                "re-detecting")

    logging.info("Scanning the camera folders for target detections")
    cam_folders = get_subfolder_names(f_loc, return_full_path=True)
    if not cam_folders:
        raise ValueError(f"no subfolders were found in {f_loc}")
    sanitise_input_images(cam_folders)
    cam_names = get_subfolder_names(f_loc=f_loc)

    seed_cams = ([camset[folder.parts[-1]] for folder in cam_folders]
                 if camset is not None else [None] * len(cam_folders))
    merged: TargetDetection | None = None
    for folder, seed_cam in zip(tqdm(cam_folders), seed_cams):
        im_dir = folder if subfolder_string is None else folder / subfolder_string
        found = calibration_target.find_in_imfolder(
            im_dir, cam_names=cam_names, draw=draw, n_lim=n_lim,
            camera=seed_cam)
        merged = found if merged is None else merged + found

    resolutions = [cv2.imread(str(glob_ims(f_loc / name)[0])).shape[:2]
                   for name in cam_names]
    if caching:
        save_pickle((merged, resolutions, fingerprint), cache_path)
    return merged, resolutions


def validate_detections(detected: TargetDetection, target: AbstractTarget):
    """Per-camera detection-rate and board-completeness warnings."""
    cam_names = detected.cam_names
    face_corners = target.point_data.shape[-2]
    hit_rate: dict[str, float] = {}
    completeness: dict[str, list[float]] = {}

    for per_cam in detected.get_cam_list():
        rows = per_cam.get_data()
        if rows is None:
            continue
        name = cam_names[int(rows[0, 0])]
        fractions = completeness.setdefault(name, [])
        images_with_board = 0
        for per_im in per_cam.get_image_list():
            im_rows = per_im.get_data()
            if im_rows is None:
                continue
            images_with_board += 1
            key_width = im_rows.shape[1] - 4
            if key_width == 1:
                # planar board: fraction of the single face's corners
                fractions.append(im_rows.shape[0] / face_corners)
            else:
                # faceted target: normalise by the number of faces seen
                faces_seen = len(np.unique(im_rows[:, 2:-3], axis=0))
                fractions.append(
                    im_rows.shape[0] / face_corners / faces_seen)
        hit_rate[name] = images_with_board / detected.max_ims

    for name in cam_names:
        found_pct = 100.0 * hit_rate.get(name, 0)
        complete_pct = 100.0 * float(np.mean(completeness.get(name, [0])))
        logging.info(f'\tCamera "{name}" detected boards: {found_pct: .1f}%, '
                     f'board completeness: {complete_pct: .1f}%')
        if found_pct < DETECTION_RATE_WARN_PCT:
            logging.warning(
                f'\tCamera "{name}" failed to detect the target in many images')
        if complete_pct < BOARD_COMPLETENESS_WARN_PCT:
            logging.warning(
                f'\tCamera "{name}" rarely saw the complete board')


def outlier_rejection(results, params) -> tuple[TargetDetection | None, bool]:
    """Per-image MAD outlier rejection on residuals, with boxplots."""
    from matplotlib import pyplot as plt
    rows = params.get_detection_data()
    per_image: list[list] = [[] for _ in range(params.detection.max_ims)]
    for im_idx, err in zip(rows[:, 1], results):
        per_image[int(im_idx)].append(err)

    # indices into the compacted (non-empty) list map back to image numbers
    populated = np.array([i for i, errs in enumerate(per_image) if errs])
    flagged = mad_outlier_detection(
        [np.mean(per_image[i]) for i in populated], draw=False, out_thresh=5)

    plt.boxplot([errs for errs in per_image if errs])
    plt.ylabel("Average Pixels Reprojection error")
    if flagged is None:
        plt.title("Reprojection error per image")
        plt.show()
        return None, False

    bad_images = populated[flagged[0]]
    plt.title(f"Images {list(bad_images)} are likely outliers")
    plt.show()
    logging.info(f"Dropping the detections of outlier images {list(bad_images)}")
    return params.detection.delete_row(im_num=bad_images), True


def sanitise_input_images(detected_sub_folders: list[Path], optmode: str = "na"):
    """Require the same number of images per camera folder."""
    counts = {len(glob_ims(folder)) for folder in detected_sub_folders}
    if len(counts) > 1:
        raise ValueError(
            "The camera folders hold differing numbers of calibration "
            f"images ({sorted(counts)}); every camera must see every pose.")
