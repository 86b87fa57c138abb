"""Serving artifacts: jax.export round trip (pycamset_tpu/serving.py).

Beyond-reference capability (the reference has no serving path); the
contract pinned here is that a deserialized artifact reproduces the live
tracker's device-seeded results without retracing, across frame counts
(the exported programs carry a symbolic frame axis).
"""
import numpy as np
import pytest

from tests.test_tracking import _rig


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    from pycamset_tpu.serving import export_tracker
    from pycamset_tpu.tracking import TargetTracker

    cams, target, det, true, rig = _rig(n_ims=12)
    tracker = TargetTracker(cams, target)
    path = export_tracker(tracker,
                          tmp_path_factory.mktemp("srv") / "rig.trkz")
    return tracker, det, true, path


def test_batch_roundtrip_matches_live_tracker(artifact):
    from pycamset_tpu.serving import load_tracker_artifact

    tracker, det, true, path = artifact
    ref_poses, ref_info = tracker.track_batch(det, seed_mode="device")
    st = load_tracker_artifact(path)
    poses, info = st.track_batch(det)
    np.testing.assert_allclose(poses, ref_poses, atol=1e-9)
    np.testing.assert_allclose(info["rms"], ref_info["rms"], atol=1e-12)
    np.testing.assert_allclose(info["pose_sigma"], ref_info["pose_sigma"],
                               rtol=1e-6)
    # and it actually solved the problem, not just matched a failure
    np.testing.assert_allclose(poses, true, atol=2e-2)


def test_symbolic_frame_axis_serves_other_counts(artifact):
    """The artifact was built with no fixed frame count: a 5-frame table
    and a 12-frame table run through the same exported program."""
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.serving import load_tracker_artifact

    tracker, det, true, path = artifact
    st = load_tracker_artifact(path)
    rows = det.get_data()
    small = TargetDetection(cam_names=det.cam_names,
                            data=rows[rows[:, 1] < 5], max_ims=5)
    poses, info = st.track_batch(small)
    assert poses.shape == (5, 4, 4)
    np.testing.assert_allclose(poses, true[:5], atol=2e-2)


def test_stream_roundtrip(artifact):
    from pycamset_tpu.serving import load_tracker_artifact

    tracker, det, true, path = artifact
    st = load_tracker_artifact(path)
    # default init: the device triangulation seed of the first frame
    poses, info = st.track_stream(det)
    np.testing.assert_allclose(poses, true, atol=2e-2)
    # explicit 4x4 init is accepted too
    poses2, _ = st.track_stream(det, init=true[0])
    np.testing.assert_allclose(poses2, true, atol=2e-2)


def test_artifact_needs_no_calibration_stack(artifact):
    """Loading must not construct a TargetTracker (no retracing, no
    CameraSet): the ServingTracker works from the header alone."""
    from pycamset_tpu.serving import ServingTracker, load_tracker_artifact

    tracker, det, true, path = artifact
    st = load_tracker_artifact(path)
    assert isinstance(st, ServingTracker)
    assert not hasattr(st, "camset")
    assert st.meta["cam_names"] == ["a", "b", "c"]
    assert st.max_detections == tracker.max_detections


def test_stream_seed_skips_non_stereo_frames(artifact):
    """An early frame seen by two cameras with DISJOINT keys is not
    seedable (no stereo keys): the default-init scan must skip it and
    seed from a later genuinely stereo frame, not hand back the
    seeder's zeros fallback."""
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.serving import load_tracker_artifact

    tracker, det, true, path = artifact
    st = load_tracker_artifact(path)
    rows = det.get_data()
    # frame 0: cam 0 sees keys 0-5, cam 1 sees keys 6-11 — no overlap
    f0 = rows[:, 1] == 0
    keep = ~f0 | ((rows[:, 0] == 0) & (rows[:, 2] < 6)) \
        | ((rows[:, 0] == 1) & (rows[:, 2] >= 6) & (rows[:, 2] < 12))
    det2 = TargetDetection(cam_names=det.cam_names, data=rows[keep],
                           max_ims=int(det.max_ims))
    poses, info = st.track_stream(det2)
    # later frames must still be tracked correctly from the good seed
    np.testing.assert_allclose(poses[1:], true[1:], atol=2e-2)


def test_bad_file_raises(tmp_path):
    import zipfile

    from pycamset_tpu.serving import load_tracker_artifact

    p = tmp_path / "not_an_artifact.trkz"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("meta.json", "{}")
    with pytest.raises(ValueError, match="not a tracker artifact"):
        load_tracker_artifact(p)
