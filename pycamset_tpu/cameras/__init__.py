"""Reference-layout alias: pyCamSet users import cameras from here."""
from pycamset_tpu.models.camera import Camera
from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict

__all__ = ["Camera", "CameraSet", "make_cam_dict"]
