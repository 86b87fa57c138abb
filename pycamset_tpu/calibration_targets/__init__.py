"""Reference-layout alias: pyCamSet users import targets from here
(pyCamSet/calibration_targets/__init__.py:1-3)."""
from pycamset_tpu.models.abstract_target import AbstractTarget
from pycamset_tpu.models.charuco import ChArUco
from pycamset_tpu.models.ccube import Ccube
from pycamset_tpu.models.detections import ImageDetection, TargetDetection
from pycamset_tpu.models.shape_by_faces import FaceToShape

__all__ = ["TargetDetection", "ImageDetection", "AbstractTarget",
           "FaceToShape", "ChArUco", "Ccube"]
