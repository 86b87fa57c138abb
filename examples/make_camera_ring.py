"""Manually build a ring of cameras and project/triangulate through it
(ref: examples/make_camera_ring.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # checkout use

import numpy as np

from pycamset_tpu import Camera, CameraSet
from pycamset_tpu.utils.general_utils import make_4x4h_tform


def make_cams(nc, plot=False):
    # make_4x4h_tform uses the opencv rotation-vector convention
    tforms = [make_4x4h_tform((0, b / nc * 2 * np.pi, 0), (0, 0, 0.2))
              for b in range(nc)]
    cams = {f"cam_{i}": Camera(extrinsic=t) for i, t in enumerate(tforms)}
    ring_cameras = CameraSet(camera_dict=cams)
    if plot:
        ring_cameras.plot()
    return ring_cameras


def project_point(point, cameras: CameraSet):
    return cameras.project_points_to_all_cams(point)


if __name__ == "__main__":
    ring = make_cams(8)
    uv_per_cam = project_point(np.array([0.0, 0.0, 0.05]), ring)
    print(uv_per_cam)
    recon = ring.multi_cam_triangulate(uv_per_cam)
    print("triangulated back to:", recon)
