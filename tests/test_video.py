"""Video ingestion (utils/video.py): videos -> the image-folder layout."""
import numpy as np
import pytest

from pycamset_tpu.utils.video import (expand_videos, extract_frames,
                                      find_videos)


def _write_video(path, n_frames=12, size=(64, 48)):
    import cv2
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"),
                         10.0, size)
    if not vw.isOpened():
        pytest.skip("no MJPG encoder in this OpenCV build")
    rng = np.random.default_rng(0)
    for i in range(n_frames):
        frame = np.full((size[1], size[0], 3), i * 16 % 255, np.uint8)
        frame[:8, :8] = rng.integers(0, 255, (8, 8, 3))
        vw.write(frame)
    vw.release()
    assert path.stat().st_size > 0


def test_passthrough_when_no_videos(tmp_path):
    (tmp_path / "cam0").mkdir()
    assert expand_videos(tmp_path) == tmp_path
    assert find_videos(tmp_path) == []


def test_expand_videos_layout_and_cache(tmp_path):
    _write_video(tmp_path / "cam0.avi")
    _write_video(tmp_path / "cam1.avi", n_frames=10)
    out = expand_videos(tmp_path)
    assert out == tmp_path / "_frames"
    c0 = sorted((out / "cam0").glob("*.png"))
    c1 = sorted((out / "cam1").glob("*.png"))
    assert len(c0) == 12 and len(c1) == 10
    # source-frame-indexed names keep frame numbering aligned across cams
    assert c0[0].name == "000000.png" and c0[-1].name == "000011.png"
    # second call reuses the cache (no rewrite)
    mtimes = [p.stat().st_mtime_ns for p in c0]
    out2 = expand_videos(tmp_path)
    assert out2 == out
    assert [p.stat().st_mtime_ns for p in c0] == mtimes
    # a different stride invalidates the cache and leaves no stale extras
    out3 = expand_videos(tmp_path, stride=3)
    frames = sorted((out3 / "cam0").glob("*.png"))
    assert [f.name for f in frames] == [
        "000000.png", "000003.png", "000006.png", "000009.png"]


def test_extract_frames_stride_and_limit(tmp_path):
    _write_video(tmp_path / "v.avi", n_frames=12)
    n = extract_frames(tmp_path / "v.avi", tmp_path / "out", stride=2,
                       n_lim=4)
    assert n == 4
    names = sorted(p.name for p in (tmp_path / "out").glob("*.png"))
    assert names == ["000000.png", "000002.png", "000004.png",
                     "000006.png"]


def test_extract_rejects_unreadable(tmp_path):
    bad = tmp_path / "bad.avi"
    bad.write_bytes(b"not a video")
    with pytest.raises(ValueError, match="zero frames|could not open"):
        extract_frames(bad, tmp_path / "out")


def test_cli_track_accepts_video_folder(tmp_path, monkeypatch):
    """The CLI resolves a video folder through expand_videos before
    detection (full wiring, detection monkeypatched)."""
    import pycamset_tpu.__main__ as cli
    import pycamset_tpu.calibration.camera_calibrator as cc

    _write_video(tmp_path / "cam0.avi")
    seen = {}

    def fake_detect(**kw):
        seen["f_loc"] = kw["f_loc"]
        raise RuntimeError("stop here")

    monkeypatch.setattr(cc, "detect_datapoints_in_imfile", fake_detect)
    monkeypatch.setattr(cli, "_make_target", lambda args: None)
    with pytest.raises(RuntimeError, match="stop here"):
        cli.main(["track", str(tmp_path), "--camset", "x.camset",
                  "--video-stride", "2"])
    assert seen["f_loc"] == tmp_path / "_frames"
    assert len(list((tmp_path / "_frames" / "cam0").glob("*.png"))) == 6
