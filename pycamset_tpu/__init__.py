"""pycamset_tpu — a TPU-native multi-camera calibration framework.

A from-scratch JAX/XLA rebuild of the capabilities of pyCamSet
(github.com/rlav440/pyCamSet): multi-camera calibration from ChArUco /
Ccube targets, with a TPU-resident Levenberg–Marquardt bundle adjustment,
sharded residual evaluation over device meshes, triangulation, reconstruction
helpers and MVSNet export.

Public API mirrors the reference's top level (pyCamSet/__init__.py:1-5):
CameraSet, Camera, load_CameraSet, calibrate_cameras, ChArUco, Ccube.
Imports are lazy so `import pycamset_tpu.ops` stays lightweight.
"""
from pycamset_tpu import config  # noqa: F401  (must be first: enables x64)

__version__ = "0.1.0"

__all__ = [
    "Camera", "CameraSet", "load_CameraSet", "calibrate_cameras",
    "ChArUco", "Ccube", "TargetTracker", "export_tracker",
    "load_tracker_artifact", "run_fleet_bundle_adjustment",
    "calibrate_fleet", "calibrate_hand_eye", "rig_health",
    "recalibrate_extrinsics", "recalibrate_intrinsics",
    "write_calibration_report", "convert_camera_model",
    "convert_camera_set", "calibrate_time_offsets",
    "calibrate_extrinsics_from_wand", "MarkerTriangulator",
]

_LAZY = {
    "Camera": ("pycamset_tpu.models.camera", "Camera"),
    "CameraSet": ("pycamset_tpu.models.camera_set", "CameraSet"),
    "load_CameraSet": ("pycamset_tpu.utils.saving", "load_CameraSet"),
    "calibrate_cameras": ("pycamset_tpu.calibration.camera_calibrator", "calibrate_cameras"),
    "ChArUco": ("pycamset_tpu.models.charuco", "ChArUco"),
    "Ccube": ("pycamset_tpu.models.ccube", "Ccube"),
    "TargetTracker": ("pycamset_tpu.tracking", "TargetTracker"),
    "export_tracker": ("pycamset_tpu.serving", "export_tracker"),
    "load_tracker_artifact": ("pycamset_tpu.serving",
                              "load_tracker_artifact"),
    "run_fleet_bundle_adjustment": ("pycamset_tpu.optim.fleet",
                                    "run_fleet_bundle_adjustment"),
    "calibrate_fleet": ("pycamset_tpu.calibration.camera_calibrator",
                        "calibrate_fleet"),
    "calibrate_hand_eye": ("pycamset_tpu.calibration.handeye",
                           "calibrate_hand_eye"),
    "rig_health": ("pycamset_tpu.calibration.monitor", "rig_health"),
    "recalibrate_extrinsics": ("pycamset_tpu.calibration.monitor",
                               "recalibrate_extrinsics"),
    "recalibrate_intrinsics": ("pycamset_tpu.calibration.monitor",
                               "recalibrate_intrinsics"),
    "write_calibration_report": ("pycamset_tpu.utils.report",
                                 "write_calibration_report"),
    "convert_camera_model": ("pycamset_tpu.calibration.convert",
                             "convert_camera_model"),
    "convert_camera_set": ("pycamset_tpu.calibration.convert",
                           "convert_camera_set"),
    "calibrate_time_offsets": ("pycamset_tpu.calibration.sync",
                               "calibrate_time_offsets"),
    "calibrate_extrinsics_from_wand": ("pycamset_tpu.calibration.wand",
                                       "calibrate_extrinsics_from_wand"),
    "MarkerTriangulator": ("pycamset_tpu.markers", "MarkerTriangulator"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'pycamset_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
