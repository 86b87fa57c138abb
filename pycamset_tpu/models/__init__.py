"""Model objects: cameras, camera sets, calibration targets and detections."""
from pycamset_tpu.models.camera import Camera
from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
from pycamset_tpu.models.detections import ImageDetection, TargetDetection
from pycamset_tpu.models.abstract_target import AbstractTarget

__all__ = [
    "Camera", "CameraSet", "make_cam_dict", "ImageDetection",
    "TargetDetection", "AbstractTarget",
]
