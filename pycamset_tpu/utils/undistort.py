"""Batch image undistortion for a calibrated rig (CLI ``undistort``).

Takes the capture-folder layout every other command consumes (one image
subfolder — or one video file — per camera) and writes undistorted copies
through each camera's calibrated model, fisheye-aware via
:meth:`~pycamset_tpu.models.camera.Camera.undistort`. This is the everyday
"give downstream software pinhole images" step; the reference exposes only
the per-image method (pyCamSet/cameras/camera.py ``im_to_world_ray`` /
sensor maps) with no batch driver.
"""
from __future__ import annotations

from pathlib import Path

import cv2

from pycamset_tpu.utils.general_utils import glob_ims
from pycamset_tpu.utils.video import expand_videos


def undistort_folder(cams, f_loc, out_dir=None, video_stride: int = 1):
    """Undistort every image of every camera folder under ``f_loc``.

    ``f_loc`` must contain one subfolder per camera named after the
    cameras in ``cams`` (videos are expanded to frames first, like the
    other folder-scanning commands). Writes to ``out_dir`` (default:
    sibling ``<f_loc>_undistorted``) mirroring the input layout, and
    returns ``(out_dir, n_images)``.
    """
    src = Path(f_loc)
    # Default output is a sibling of the ORIGINAL capture folder — video
    # captures expand to <folder>/_frames, which must not nest the output.
    out = Path(out_dir) if out_dir is not None else \
        src.parent / (src.name + "_undistorted")
    f_loc = expand_videos(src, stride=video_stride)
    n_written = 0
    for name in cams.get_names():
        sub = f_loc / str(name)
        if not sub.is_dir():
            raise ValueError(
                f"no image folder for camera {name!r} under {f_loc}")
        frames = glob_ims(sub)
        if not frames:
            raise ValueError(f"no images found in {sub}")
        cam = cams[name]
        for frame in frames:
            img = cv2.imread(str(frame), cv2.IMREAD_UNCHANGED)
            if img is None:
                raise ValueError(f"could not read image {frame}")
            # Mirror the relative layout so same-named images in nested
            # subfolders cannot overwrite each other.
            target = out / str(name) / frame.relative_to(sub.resolve())
            target.parent.mkdir(parents=True, exist_ok=True)
            if not cv2.imwrite(str(target), cam.undistort(img)):
                raise ValueError(f"could not write {target}")
            n_written += 1
    return out, n_written
