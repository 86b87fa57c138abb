"""Video ingestion: calibrate/track/sync directly from video recordings.

The reference pipeline consumes folders of still images (one subfolder
per camera — pyCamSet/calibration/camera_calibrator.py's folder layout).
Production captures are usually VIDEO files, one per camera;
:func:`expand_videos` turns a folder of videos into that layout by
extracting frames (cached, stride-able), so every CLI entry point works
on either input without the user shelling out to ffmpeg first.

Frame filenames carry the SOURCE frame index (``%06d.png``), so frame
numbering stays aligned across cameras — which the temporal sync
calibration (calibration/sync.py) depends on.
"""
from __future__ import annotations

import logging
from pathlib import Path

VIDEO_EXTS = {".mp4", ".avi", ".mov", ".mkv", ".mjpeg", ".webm", ".m4v"}
FRAMES_DIRNAME = "_frames"


def find_videos(f_loc: Path) -> list[Path]:
    """Video files directly inside ``f_loc`` (one per camera), sorted."""
    f_loc = Path(f_loc)
    if not f_loc.is_dir():
        return []
    return sorted(p for p in f_loc.iterdir()
                  if p.is_file() and p.suffix.lower() in VIDEO_EXTS)


def extract_frames(video: Path, out_dir: Path, stride: int = 1,
                   n_lim: int | None = None) -> int:
    """Decode ``video`` into ``out_dir/%06d.png`` (every ``stride``-th
    frame, at most ``n_lim`` written). Returns the number written."""
    import cv2
    video, out_dir = Path(video), Path(out_dir)
    cap = cv2.VideoCapture(str(video))
    if not cap.isOpened():
        raise ValueError(f"could not open video {video} (missing codec?)")
    out_dir.mkdir(parents=True, exist_ok=True)
    idx = written = 0
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if idx % stride == 0:
                cv2.imwrite(str(out_dir / f"{idx:06d}.png"), frame)
                written += 1
                if n_lim is not None and written >= n_lim:
                    break
            idx += 1
    finally:
        cap.release()
    if not written:
        raise ValueError(f"video {video} decoded zero frames")
    return written


def expand_videos(f_loc: Path, stride: int = 1, n_lim: int | None = None,
                  caching: bool = True) -> Path:
    """If ``f_loc`` holds per-camera VIDEO files, extract them into the
    image-folder layout the pipeline consumes and return that folder;
    otherwise return ``f_loc`` unchanged.

    Extraction is cached under ``f_loc/_frames/<video stem>/`` and only
    re-runs when the video is newer than its extracted frames (or when
    ``caching`` is False).
    """
    f_loc = Path(f_loc)
    videos = find_videos(f_loc)
    if not videos:
        return f_loc
    frames_root = f_loc / FRAMES_DIRNAME
    meta = f"stride={stride} n_lim={n_lim}"
    for video in videos:
        out_dir = frames_root / video.stem
        have = sorted(out_dir.glob("*.png")) if out_dir.is_dir() else []
        marker = out_dir / ".extract_meta"
        if (caching and have
                and marker.is_file() and marker.read_text() == meta
                and marker.stat().st_mtime >= video.stat().st_mtime):
            logging.info("reusing %d extracted frames for %s",
                         len(have), video.name)
            continue
        for old in have:  # stale stride/limit must not leave extras
            old.unlink()
        n = extract_frames(video, out_dir, stride=stride, n_lim=n_lim)
        marker.write_text(meta)
        logging.info("extracted %d frames from %s", n, video.name)
    return frames_root
