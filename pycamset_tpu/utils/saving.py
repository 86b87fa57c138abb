"""Persistence: the `.camset` JSON checkpoint format and pickle helpers.

Capability parity target (reference, behaviour only): pyCamSet/utils/saving.py
— save_camset/load_CameraSet with reflective re-instantiation of the Camera,
CameraSet, TargetDetection, target and handler from saved module/class names,
with graceful degradation to a bare CameraSet on any failure; array compression
embedded in the JSON.

New files compress arrays with zlib (stdlib); the compression dict carries a
'codec' field. Files written by the REFERENCE (chunked blosc lz4+shuffle
dicts) are read through utils/blosc_compat (ctypes libblosc, pure-Python
fallback), and module names from the reference namespace ('pyCamSet.*') are
remapped onto this package — a reference-written .camset loads completely,
detection table included (tests/test_blosc_compat.py).
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

# our-class -> reference-module map for reflective SAVES: files written by
# this package name the reference namespace for classes both libraries
# have, so the reference's load_CameraSet can rebuild them without any
# alias table on its side (classes outside this package keep their names)
_REFERENCE_MODULE_FOR = {
    "Camera": "pyCamSet.cameras.camera",
    "CameraSet": "pyCamSet.cameras.camera_set",
    "TargetDetection": "pyCamSet.calibration_targets.target_detections",
    "ImageDetection": "pyCamSet.calibration_targets.target_detections",
    "ChArUco": "pyCamSet.calibration_targets.target_charuco",
    "Ccube": "pyCamSet.calibration_targets.target_Ccube",
    "TemplateBundleHandler": "pyCamSet.optimisation.template_handler",
    "SelfBundleHandler": "pyCamSet.optimisation.standard_bundle_handler",
    "FreePointBundleHandler": "pyCamSet.optimisation.free_point_handler",
    "FreePointTarget": "pyCamSet.optimisation.free_point_handler",
}

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
    """Compress an ndarray to a JSON-able dict in the REFERENCE's
    chunked-blosc layout (pyCamSet/utils/saving.py:240-295), so files this
    package writes load in the reference too. Frames come from the system
    libblosc (lz4+shuffle, the reference's own settings) when present, else
    a pure-Python zlib-codec c-blosc1 writer (utils/blosc_compat)."""
    from pycamset_tpu.utils.blosc_compat import compress_reference_dict
    return compress_reference_dict(np.asarray(arr), clevel=clevel)


def decompress(save_dict: dict) -> np.ndarray:
    """Invert :func:`compress`; also reads the reference's chunked-blosc
    array dicts (lz4+shuffle frames) via utils/blosc_compat."""
    if "num_chunk" in save_dict:  # the reference's blosc layout (also ours)
        from pycamset_tpu.utils.blosc_compat import decompress_reference_dict
        return decompress_reference_dict(save_dict)
    # legacy layout written by early versions of this package
    codec = save_dict.get("codec", "blosc")
    if codec != "zlib":
        raise ValueError(f"Unsupported array codec {codec!r} "
                         "(file written by a different implementation)")
    raw = zlib.decompress(base64.b64decode(save_dict["data"]))
    arr = np.frombuffer(raw, dtype=np.dtype(save_dict["dtype"])).copy()
    return arr.reshape(save_dict["shape"])


def save_camset(cams, f_name: Path = Path("cams.camset")) -> None:
    """Save a CameraSet (+ calibration history if present) to JSON."""
    def type_record(obj, prefix):
        cls = type(obj)
        module = cls.__module__
        if module.startswith("pycamset_tpu"):
            # name the reference namespace for shared classes so the file
            # also loads in the reference (our loader aliases it back)
            module = _REFERENCE_MODULE_FOR.get(cls.__name__, module)
        return {f"{prefix}_module": module, f"{prefix}_name": cls.__name__}

    doc: dict = {
        "cams": {
            cam.name: {
                "int": np.asarray(cam.intrinsic).tolist(),
                "ext": np.asarray(cam.extrinsic).tolist(),
                "dst": np.ravel(np.asarray(cam.distortion_coefs)).tolist(),
                "res": np.asarray(cam.res).tolist(),
            } for cam in cams
        },
        "cam_config": {**type_record(cams, "camset"),
                       "cam_name": type(cams[0]).__name__},
        "optim": {},
    }
    optim = doc["optim"]
    if getattr(cams, "calibration_params", None) is not None:
        optim["params"] = np.asarray(cams.calibration_params).tolist()

    handler = getattr(cams, "calibration_handler", None)
    optim["handler_config"] = {}
    if handler is not None:
        optim["handler_config"] = type_record(handler, "handler") | {
            "fixed_params": numpy_dict_to_list(copy(handler.fixed_params)),
            "options": handler.problem_opts,
        }
        if handler.missing_poses is not None:
            optim["handler_config"]["missing_poses"] = (
                np.asarray(handler.missing_poses).astype(int).tolist())

        target = handler.target
        optim["target_config"] = type_record(target, "target")
        if hasattr(target, "input_args"):
            optim["target_config"]["input"] = target.input_args

        table = handler.detection
        optim["dtct_config"] = type_record(table, "dtct") | {
            "cam_names": table.cam_names,
            "max_ims": int(table.max_ims),
            "compressed_data": compress(table.get_data()),
        }

    if getattr(cams, "calibration_result", None) is not None:
        optim["results"] = compress(np.asarray(cams.calibration_result))
    if getattr(cams, "calibration_jac", None) is not None:
        optim["jac"] = compress(np.asarray(cams.calibration_jac))

    Path(f_name).write_text(json.dumps(doc, indent=4))


def load_CameraSet(f_loc: Path | str):
    """Load a CameraSet from JSON, reflectively rebuilding the calibration
    history (detection, target, handler) and degrading gracefully on failure.
    """
    saved = json.loads(Path(f_loc).read_text())

    cam_dict = {
        name: instance_obj(
            "pycamset_tpu.models.camera", "Camera", name=name,
            extrinsic=np.array(rec["ext"]), intrinsic=np.array(rec["int"]),
            distortion_coefs=np.array(rec["dst"]), res=np.array(rec["res"]))
        for name, rec in saved["cams"].items()
    }
    camset = instance_obj(
        "pycamset_tpu.models.camera_set", "CameraSet", camera_dict=cam_dict)

    # each stage of the calibration history rebuilds reflectively; the
    # first stage that fails downgrades the load to a bare CameraSet
    def rebuild_detection():
        rec = saved["optim"]["dtct_config"]
        return instance_obj(rec["dtct_module"], rec["dtct_name"],
                            data=decompress(rec["compressed_data"]),
                            cam_names=rec["cam_names"],
                            max_ims=rec["max_ims"])

    def rebuild_target():
        rec = saved["optim"]["target_config"]
        return instance_obj(rec["target_module"], rec["target_name"],
                            **rec["input"])

    def rebuild_handler(detection, target):
        rec = saved["optim"]["handler_config"]
        kwargs = dict(camset=camset, target=target, detection=detection,
                      fixed_params=rec["fixed_params"],
                      options=rec["options"])
        if "missing_poses" in rec:
            kwargs["missing_poses"] = np.array(
                rec["missing_poses"]).astype(bool)
        return instance_obj(rec["handler_module"], rec["handler_name"],
                            **kwargs)

    def attach_results():
        camset.calibration_result = decompress(saved["optim"]["results"])
        camset.calibration_params = np.array(saved["optim"]["params"])

    try:
        stage = "detection table"
        detection = rebuild_detection()
        stage = "calibration target"
        target = rebuild_target()
        stage = "parameter handler"
        handler = rebuild_handler(detection, target)
        stage = "optimisation results"
        attach_results()
    except Exception as err:
        logging.warning(
            f"Could not rebuild the {stage} from {f_loc} ({err}); "
            "loading the bare CameraSet without calibration history")
        return camset

    camset.calibration_handler = handler
    return camset
