"""Manually assemble a calibration instead of using calibrate_cameras
(ref: examples/manual_calibration.py, de-bit-rotted).

For a real calibration, populate the CameraSet with initial per-camera
estimates and the TargetDetection with detected features — the pieces
calibrate_cameras() otherwise creates for you.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # checkout use

from pycamset_tpu import CameraSet, ChArUco
from pycamset_tpu.models.detections import TargetDetection
from pycamset_tpu.optim.driver import run_bundle_adjustment
from pycamset_tpu.optim.handlers import TemplateBundleHandler

# the standard initialisation finds each camera's intrinsics first
init_cams = CameraSet()           # populate with Camera objects
calibration_target = ChArUco(10, 10, 4)
detected_data = TargetDetection(cam_names=[])  # populate with detections

# any handler (Template / Self / FreePoint / custom subclass) drops in here
param_handler = TemplateBundleHandler(
    camset=init_cams, target=calibration_target, detection=detected_data)

# the TPU-resident bundle adjustment
optimisation, optimised_cameras = run_bundle_adjustment(
    param_handler=param_handler)
