"""The calibration pipeline: detection -> seeding -> bundle adjustment.

Capability parity target (reference, behaviour only):
pyCamSet/calibration/camera_calibrator.py — calibrate_cameras (detection with
pickle caching, validation, per-camera initial calibration with an optional
high-distortion second pass, stereo/bundle calibration, saving),
detect_datapoints_in_imfile, run_initial_calibration, run_stereo_calibration,
validate_detections, outlier_rejection, sanitise_input_images.
"""
from __future__ import annotations

import logging
from functools import reduce
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
except ImportError:  # tqdm is available in this environment; belt and braces
    def tqdm(x, **kw):
        return x

logging.basicConfig(level=logging.INFO)


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
    if isinstance(f_loc, str):
        f_loc = Path(f_loc)
    if save_loc is None:
        save_loc = f_loc
    camera_model = (problem_options or {}).get("camera_model", "standard")

    detections, camera_res = detect_datapoints_in_imfile(
        f_loc=f_loc, caching=save, calibration_target=calibration_target,
        draw=draw, n_lim=n_lim)

    validate_detections(detections, calibration_target)

    # distinct cache per camera model: a cached 5-coef seed is a valid (zero
    # k4..k6) rational seed but would silently shadow a real rational one
    string_tail = (".camset" if camera_model == "standard"
                   else f"_{camera_model}.camset")
    if initial_cams is None:
        initial_cams = run_initial_calibration(
            detections, calibration_target, camera_res, save=save,
            save_loc=save_loc / ("initial_cameras" + string_tail),
            fixed_params=fixed_params, camera_model=camera_model)

        if high_distortion:
            detections, _ = detect_datapoints_in_imfile(
                f_loc=f_loc, calibration_target=calibration_target, draw=draw,
                n_lim=n_lim, camset=initial_cams)
            initial_cams = run_initial_calibration(
                detections, calibration_target, camera_res, save=save,
                save_loc=save_loc / ("initial_cameras_high_distortion" + string_tail),
                camera_model=camera_model)
            initial_cams.draw_camera_distortions()
    else:
        logging.info("Using the provided initial cameras.")

    initial_cams.set_resolutions_from_file(floc=f_loc)
    calibrated_cameras = run_stereo_calibration(
        initial_cams, detections, calibration_target, save=save,
        save_loc=save_loc / ("optimised_cameras" + string_tail),
        fixed_params=fixed_params, threads=threads,
        problem_options=problem_options)
    return calibrated_cameras


def run_initial_calibration(detection: TargetDetection,
                            calibration_target: AbstractTarget,
                            cam_res: list, save: bool = True,
                            save_loc: Path = Path("initial_estimate.camset"),
                            ref_cam=0,
                            fixed_params: dict | None = None,
                            camera_model: str = "standard") -> CameraSet:
    """Per-camera initial calibration via the target's calibration method
    (cv2.calibrateCamera by default), with .camset caching."""
    if save_loc.exists() and save:
        logging.info(f"Loading a previously saved initial calib from {save_loc}")
        return load_CameraSet(save_loc)

    # pick the best shared pose image (most features, >=6 in every camera)
    c_m = detection.features_per_im_per_cam()
    mask = ~np.any(c_m < 6, axis=1)
    pose_im = int(np.argmax(np.sum(c_m, axis=1) * mask))

    logging.info("Pulling calibration method from target")
    cam_names = detection.cam_names
    cam_detections = detection.get_cam_list()
    # custom targets may override initial_calibration without the
    # camera_model kwarg; only pass it when the signature accepts it
    import inspect
    kw = {}
    sig = inspect.signature(calibration_target.initial_calibration)
    if "camera_model" in sig.parameters:
        kw["camera_model"] = camera_model
    elif camera_model != "standard":
        logging.warning(
            f"Target {type(calibration_target).__name__}.initial_calibration "
            f"does not accept camera_model={camera_model!r}; seeding with its "
            "default model (extra coefficients start at zero).")
    raw = [calibration_target.initial_calibration(
        cam_name=name, detection=det, res=res, pose_im=pose_im,
        fixed_params=fixed_params, **kw)
        for name, det, res in zip(cam_names, cam_detections, cam_res)]
    cams = CameraSet(camera_dict={n: c for n, c in zip(cam_names, raw)})
    if save:
        cams.save(save_loc)
    return cams


def run_stereo_calibration(
        cams: CameraSet, detections: TargetDetection, target: AbstractTarget,
        param_handler=None, save: bool = True, save_loc: Path | None = None,
        fixed_params: dict | None = None, floc: Path | None = None,
        threads: int = 1, problem_options: dict | None = None) -> CameraSet:
    """The full multiview calibration: a target-pose bundle adjustment."""
    logging.info("Running the full multiview calibration")
    if save_loc is None:
        save_loc = Path("optimised_cameras.camset")
    if param_handler is None:
        param_handler = TemplateBundleHandler(
            detection=detections, target=target, camset=cams,
            fixed_params=fixed_params, options=problem_options)

    optimisation, optimised_cams = run_bundle_adjustment(
        param_handler=param_handler, threads=threads)
    param_handler.camset = optimised_cams

    if save:
        if floc is not None:
            optimised_cams.set_resolutions_from_file(floc)
        optimised_cams.save(save_loc)
    return optimised_cams


def detect_datapoints_in_imfile(
        f_loc: Path, calibration_target: AbstractTarget, caching: bool = True,
        cache_name: str = "detected_datapoints.pickle", draw: bool = False,
        n_lim: int | None = None, camset: CameraSet | None = None,
        subfolder_string: str | None = None
) -> tuple[TargetDetection, list[tuple]]:
    """Detect the target in every camera subfolder, with pickle caching."""
    logging.info("starting image detection")
    if camset is not None:
        cache_name = cache_name.split(".")[0] + "_with_calib.pickle"

    if not (f_loc / cache_name).exists() or not caching:
        logging.info("Not caching, starting detection")
        detected_sub_folders = get_subfolder_names(f_loc, return_full_path=True)
        if not detected_sub_folders:
            raise ValueError(f"no subfolders were found in {f_loc}")
        sanitise_input_images(detected_sub_folders)
        cam_names = get_subfolder_names(f_loc=f_loc)

        def work_fn(file, cam=None):
            return calibration_target.find_in_imfolder(
                file if subfolder_string is None else file / subfolder_string,
                cam_names=cam_names, draw=draw, n_lim=n_lim, camera=cam)

        if camset is not None:
            cam_zip = [camset[f.parts[-1]] for f in detected_sub_folders]
            detections = [work_fn(f, cam) for f, cam
                          in zip(tqdm(detected_sub_folders), cam_zip)]
        else:
            detections = [work_fn(f) for f in tqdm(detected_sub_folders)]
        detected = reduce(lambda x, y: x + y, detections)
        cam_res = [cv2.imread(str(glob_ims(f_loc / c)[0])).shape[:2]
                   for c in cam_names]
        if caching:
            save_pickle((detected, cam_res), f_loc / cache_name)
    else:
        logging.info("loading cached detection")
        detected, cam_res = load_pickle(f_loc / cache_name)
    return detected, cam_res


def validate_detections(detected: TargetDetection, target: AbstractTarget):
    """Per-camera detection-rate and board-completeness warnings."""
    n_detected = {}
    board_fraction: dict = {}
    corners_per_face = target.point_data.shape[-2]
    cam_names = detected.cam_names

    for cam_list in detected.get_cam_list():
        data = cam_list.get_data()
        if data is None:
            continue
        cam_name = cam_names[int(data[0, 0])]
        board_detected = 0
        for im_list in cam_list.get_image_list():
            datum = im_list.get_data()
            if datum is not None:
                total_seen = datum.shape[0]
                board_detected += 1
                n_keys = datum.shape[1] - 4
                seen = board_fraction.setdefault(cam_name, [])
                if n_keys == 1:
                    seen.append(total_seen / corners_per_face)
                else:
                    n_boards = len(np.unique(datum[:, 2:-3], axis=0))
                    seen.append(total_seen / corners_per_face / n_boards)
        n_detected[cam_name] = board_detected / detected.max_ims

    for cam in cam_names:
        metric0 = n_detected.get(cam, 0) * 100
        metric1 = np.mean(board_fraction.get(cam, [0])) * 100
        logging.info(f'\tCamera "{cam}" detected boards: {metric0: .1f}%, '
                     f'board completeness: {metric1: .1f}%')
        if metric0 < 90:
            logging.warning(f'\tCamera "{cam}" has a high number of failed detections')
        if metric1 < 50:
            logging.warning(f'\tCamera "{cam}" struggled to detect full complete boards')


def outlier_rejection(results, params) -> tuple[TargetDetection | None, bool]:
    """Per-image MAD outlier rejection on residuals, with boxplots."""
    from matplotlib import pyplot as plt
    detection = params.get_detection_data()
    d_list: list[list] = [[] for _ in range(params.detection.max_ims)]
    for im_num, errs in zip(detection[:, 1], results):
        d_list[int(im_num)].append(errs)

    # indices into the compacted (non-empty) list map back to image numbers
    im_ids = np.array([i for i, d in enumerate(d_list) if d])
    per_im_outliers = mad_outlier_detection(
        [np.mean(d_list[i]) for i in im_ids], draw=False, out_thresh=5)
    plt.boxplot([d for d in d_list if d])
    plt.ylabel("Average Pixels Reprojection error")
    if per_im_outliers is not None:
        outlier_ims = im_ids[per_im_outliers[0]]
        plt.title(f"Images {list(outlier_ims)} are likely outliers")
    else:
        plt.title("Reprojection error per image")
    plt.show()

    if per_im_outliers is None:
        return None, False
    logging.info("deleting datum associated with the above outliers")
    return params.detection.delete_row(im_num=outlier_ims), True


def sanitise_input_images(detected_sub_folders: list[Path], optmode: str = "na"):
    """Require the same number of images per camera folder."""
    equal_ims = [len(glob_ims(fol)) for fol in detected_sub_folders]
    if not len(set(equal_ims)) <= 1:
        raise ValueError(
            "An unequal number of calibration images were passed in the input folders.")
