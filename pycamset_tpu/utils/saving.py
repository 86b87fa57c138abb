"""Persistence: the `.camset` JSON checkpoint format and pickle helpers.

Capability parity target (reference, behaviour only): pyCamSet/utils/saving.py
— save_camset/load_CameraSet with reflective re-instantiation of the Camera,
CameraSet, TargetDetection, target and handler from saved module/class names,
with graceful degradation to a bare CameraSet on any failure; array compression
embedded in the JSON.

blosc is unavailable in this environment, so arrays are compressed with zlib
(stdlib); the compression dict carries a 'codec' field. Files written by the
reference (blosc codec) degrade gracefully: cameras load, the detection table
does not. Module names from the reference namespace ('pyCamSet.*') are remapped
onto this package so reference-written files resolve to our classes.
"""
from __future__ import annotations

import base64
import importlib
import json
import logging
import pickle
import zlib
from copy import copy
from pathlib import Path

import numpy as np

from pycamset_tpu.utils.general_utils import numpy_dict_to_list

# reference-namespace -> our-namespace remapping for reflective loads
_MODULE_ALIASES = {
    "pyCamSet.cameras.camera": "pycamset_tpu.models.camera",
    "pyCamSet.cameras.camera_set": "pycamset_tpu.models.camera_set",
    "pyCamSet.calibration_targets.target_detections": "pycamset_tpu.models.detections",
    "pyCamSet.calibration_targets.target_charuco": "pycamset_tpu.models.charuco",
    "pyCamSet.calibration_targets.target_Ccube": "pycamset_tpu.models.ccube",
    "pyCamSet.optimisation.template_handler": "pycamset_tpu.optim.handlers",
    "pyCamSet.optimisation.standard_bundle_handler": "pycamset_tpu.optim.handlers",
    "pyCamSet.optimisation.free_point_handler": "pycamset_tpu.optim.handlers",
}


def save_pickle(obj, filename):
    """Pickle an object to a file."""
    with open(filename, "wb") as f:
        pickle.dump(obj, f)


def load_pickle(filename):
    """Load a pickled object from a file."""
    with open(filename, "rb") as f:
        return pickle.load(f)


def instance_obj(class_module: str, class_name: str, **kwargs):
    """Instantiate class_module.class_name(**kwargs), remapping ref names."""
    class_module = _MODULE_ALIASES.get(class_module, class_module)
    cls = getattr(importlib.import_module(class_module), class_name)
    return cls(**kwargs)


def compress(arr: np.ndarray, clevel: int = 3) -> dict:
    """Compress an ndarray to a JSON-able dict (zlib + base64)."""
    arr = np.ascontiguousarray(arr)
    raw = zlib.compress(arr.tobytes(), clevel)
    return {
        "codec": "zlib",
        "shape": list(arr.shape),
        "dtype": str(arr.dtype),
        "data": base64.b64encode(raw).decode(),
    }


def decompress(save_dict: dict) -> np.ndarray:
    """Invert :func:`compress`. Raises on unknown codecs (e.g. blosc files)."""
    codec = save_dict.get("codec", "blosc")
    if codec != "zlib":
        raise ValueError(f"Unsupported array codec {codec!r} "
                         "(file written by a different implementation)")
    raw = zlib.decompress(base64.b64decode(save_dict["data"]))
    arr = np.frombuffer(raw, dtype=np.dtype(save_dict["dtype"])).copy()
    return arr.reshape(save_dict["shape"])


def save_camset(cams, f_name: Path = Path("cams.camset")) -> None:
    """Save a CameraSet (+ calibration history if present) to JSON."""
    save_dict: dict = {}
    cam_dict = save_dict.setdefault("cams", {})
    cam_config = save_dict.setdefault("cam_config", {})
    cam_config["camset_module"] = cams.__class__.__module__
    cam_config["camset_name"] = cams.__class__.__name__
    cam_config["cam_name"] = cams[0].__class__.__name__

    for cam in cams:
        cam_dict[cam.name] = {
            "int": np.asarray(cam.intrinsic).tolist(),
            "ext": np.asarray(cam.extrinsic).tolist(),
            "dst": np.asarray(cam.distortion_coefs).reshape(-1).tolist(),
            "res": np.asarray(cam.res).tolist(),
        }

    optim_dict = save_dict.setdefault("optim", {})
    if getattr(cams, "calibration_params", None) is not None:
        optim_dict["params"] = np.asarray(cams.calibration_params).tolist()

    handler = getattr(cams, "calibration_handler", None)
    handler_config = optim_dict.setdefault("handler_config", {})
    if handler is not None:
        handler_config["handler_module"] = handler.__class__.__module__
        handler_config["handler_name"] = handler.__class__.__name__
        handler_config["fixed_params"] = numpy_dict_to_list(copy(handler.fixed_params))
        handler_config["options"] = handler.problem_opts
        if handler.missing_poses is not None:
            handler_config["missing_poses"] = (
                np.asarray(handler.missing_poses).astype(int).tolist())

        target_config = optim_dict.setdefault("target_config", {})
        target = handler.target
        target_config["target_name"] = target.__class__.__name__
        target_config["target_module"] = target.__class__.__module__
        if hasattr(target, "input_args"):
            target_config["input"] = target.input_args

        dtct_config = optim_dict.setdefault("dtct_config", {})
        dtct = handler.detection
        dtct_config["dtct_name"] = dtct.__class__.__name__
        dtct_config["dtct_module"] = dtct.__class__.__module__
        dtct_config["cam_names"] = dtct.cam_names
        dtct_config["max_ims"] = int(dtct.max_ims)
        dtct_config["compressed_data"] = compress(dtct.get_data())

    if getattr(cams, "calibration_result", None) is not None:
        optim_dict["results"] = compress(np.asarray(cams.calibration_result))
    if getattr(cams, "calibration_jac", None) is not None:
        optim_dict["jac"] = compress(np.asarray(cams.calibration_jac))

    with open(f_name, "w") as f:
        json.dump(save_dict, fp=f, indent=4)


def load_CameraSet(f_loc: Path | str):
    """Load a CameraSet from JSON, reflectively rebuilding the calibration
    history (detection, target, handler) and degrading gracefully on failure.
    """
    with open(f_loc) as f:
        saved = json.load(fp=f)

    cam_dict = {}
    for cam_name, data in saved["cams"].items():
        cam_dict[cam_name] = instance_obj(
            "pycamset_tpu.models.camera", "Camera",
            extrinsic=np.array(data["ext"]), intrinsic=np.array(data["int"]),
            distortion_coefs=np.array(data["dst"]), res=np.array(data["res"]),
            name=cam_name)
    camset = instance_obj(
        "pycamset_tpu.models.camera_set", "CameraSet", camera_dict=cam_dict)

    try:
        optim = saved["optim"]
        dtct = optim["dtct_config"]
        detection = instance_obj(
            dtct["dtct_module"], dtct["dtct_name"],
            data=decompress(dtct["compressed_data"]),
            cam_names=dtct["cam_names"], max_ims=dtct["max_ims"])
    except Exception:
        logging.warning("Failed to load detections, returning just the CameraSet")
        return camset

    try:
        target_config = optim["target_config"]
        target = instance_obj(
            target_config["target_module"], target_config["target_name"],
            **target_config["input"])
    except Exception:
        logging.warning("Failed to load calibration target, returning just the CameraSet")
        return camset

    try:
        handler_config = optim["handler_config"]
        input_args = dict(
            camset=camset, target=target, detection=detection,
            fixed_params=handler_config["fixed_params"],
            options=handler_config["options"])
        if "missing_poses" in handler_config:
            input_args["missing_poses"] = np.array(
                handler_config["missing_poses"]).astype(bool)
        handler = instance_obj(
            handler_config["handler_module"], handler_config["handler_name"],
            **input_args)
    except Exception as e:
        logging.warning(f"Failed to initialise the parameter handler ({e}), "
                        "returning just the CameraSet")
        return camset

    try:
        camset.calibration_result = decompress(optim["results"])
        camset.calibration_params = np.array(optim["params"])
    except Exception:
        logging.warning("Failed to load calibration data, returning just the CameraSet")
        return camset

    camset.calibration_handler = handler
    return camset
